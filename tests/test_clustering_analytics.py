"""Cluster-analytics helper parity: per-cluster grouping, prediction-metadata
resolution, and the LLM description helper (reference ``cluster.py:290-451``)."""

import numpy as np
import pytest

from recformer_tpu.utils.clustering import (
    get_cluster_description,
    prediction_metadata_per_cluster,
    predictions_per_cluster,
    sequence_ids_per_cluster,
)


def test_predictions_per_cluster_groups_by_label():
    labels = np.array([0, 1, 0, 2, 1])
    preds = [10, 11, 12, 13, 14]
    out = predictions_per_cluster(labels, preds)
    assert out == {0: [10, 12], 1: [11, 14], 2: [13]}


def test_predictions_per_cluster_length_mismatch_raises():
    with pytest.raises(ValueError):
        predictions_per_cluster(np.array([0, 1]), [1, 2, 3])


def test_sequence_ids_per_cluster_matches_grouping():
    labels = np.array([1, 1, 0])
    assert sequence_ids_per_cluster(labels, ["u0", "u1", "u2"]) == {
        0: ["u2"], 1: ["u0", "u1"]}


def test_prediction_metadata_resolution():
    # reference cluster.py:396-426: ids -> names -> metadata, per cluster
    id2item = {0: "itemA", 1: "itemB"}
    meta = {"itemA": {"title": "A"}, "itemB": {"title": "B"}}
    per_cluster = {0: [0, 1], 1: [1]}
    metas, names = prediction_metadata_per_cluster(per_cluster, meta, id2item)
    assert names == {0: ["itemA", "itemB"], 1: ["itemB"]}
    assert metas[0] == [{"title": "A"}, {"title": "B"}]
    assert metas[1] == [{"title": "B"}]


def test_cluster_description_with_injected_completer():
    seen = {}

    def fake_completer(system, task):
        seen["system"] = system
        seen["task"] = task
        return "  A cluster of vinyl collectors.  "

    desc = get_cluster_description([{"title": "LP 1"}, {"title": "LP 2"}],
                                   completer=fake_completer)
    assert desc == "A cluster of vinyl collectors."
    assert "Items in Cluster" in seen["task"]
    assert "LP 1" in seen["task"]
    assert "persona generation" in seen["system"]


def test_cluster_description_truncates_past_50_items():
    captured = {}

    def fake_completer(system, task):
        captured["task"] = task
        return "many items"

    items = [{"title": f"item {i}"} for i in range(60)]
    get_cluster_description(items, completer=fake_completer)
    assert "Showing first 50 of 60 items" in captured["task"]
    assert "item 49" in captured["task"]
    assert "item 50" not in captured["task"]


def test_cluster_description_empty_raises():
    with pytest.raises(ValueError):
        get_cluster_description([], completer=lambda s, t: "x")


def test_cluster_description_requires_key_without_completer(monkeypatch):
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    with pytest.raises(ValueError):
        get_cluster_description([{"title": "x"}])


def test_describe_clusters_driver_helper():
    from recformer_tpu.cli.cluster import describe_clusters

    labels = np.array([0, 0, 1])
    preds = np.array([0, 1, 1])
    id2item = {0: "a", 1: "b"}
    meta = {"a": {"title": "A"}, "b": {"title": "B"}}
    out = describe_clusters(labels, preds, meta, id2item,
                            completer=lambda s, t: "desc")
    assert out == {0: "desc", 1: "desc"}
