"""Worker for ``test_multiprocess.py`` — a REAL multi-process JAX program.

Each process owns ``8 // nproc`` CPU devices (gloo collectives across
processes), builds the deterministic tiny world, iterates ITS OWN shard of
the epoch order (``SequenceDataset.batches(process_index=..., process_count=...)``
— the multi-host ingestion path ``data/datasets.py`` that ``cli/pretrain.py``
uses per ``jax.process_index()``), assembles global device arrays from
process-local rows, and runs pretrain steps over the global 8-device mesh.

The global batch is always composed of ``VSHARDS`` interleaved shards so a
single-process reference run (``nproc=1``) sees byte-identical batches to the
two-process run and must produce identical losses — the parity the reference
only gets by launching real multi-rank GPU jobs (``lightning_pretrain.py:137-147``).
"""
import json
import sys

VSHARDS = 2  # virtual shard count: fixed so batch composition is nproc-invariant
GLOBAL_BATCH = 8
STEPS = 3


def build_world():
    """Deterministic tiny corpus (mirrors tests/test_training.py::world)."""
    import numpy as np

    from recformer_tpu.config import RecformerConfig
    from recformer_tpu.data.item_table import ItemTable
    from recformer_tpu.data.tokenization import RecformerTokenizer
    from recformer_tpu.data.vocab import SimpleVocab

    cfg = RecformerConfig.tiny(
        max_token_num=64, max_item_embeddings=6, item_seq_len=32,
        attention_window=(16, 16), finetune_negative_sample_size=5,
    )
    tok = RecformerTokenizer(cfg, SimpleVocab(vocab_size=cfg.vocab_size))
    rng = np.random.default_rng(0)
    n_items = 20
    words = ["red", "blue", "big", "tiny", "wood", "iron", "soft", "loud"]
    tokenized = {
        i: tok.encode_item({"make": words[i % len(words)],
                            "hue": words[(i * 3 + 1) % len(words)]})
        for i in range(n_items)
    }
    table_np = ItemTable.build(tokenized, cfg, tok.backend.pad_token_id)
    n_users = 24
    user2train = {
        u: list(rng.integers(0, n_items, size=rng.integers(3, 9)))
        for u in range(n_users)
    }
    return cfg, table_np.as_arrays(), user2train


def main():
    pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    import jax

    jax.config.update("jax_num_cpu_devices", 8 // nproc)
    if nproc > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                                   num_processes=nproc, process_id=pid)
    assert jax.process_index() == pid and jax.device_count() == 8

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from recformer_tpu.data.datasets import SequenceDataset
    from recformer_tpu.data.device_pipeline import make_pretrain_batch
    from recformer_tpu.models.heads import RecformerForPretraining
    from recformer_tpu.parallel.mesh import make_mesh
    from recformer_tpu.training.optimizer import create_optimizer
    from recformer_tpu.training.steps import TrainState, make_pretrain_step

    cfg, table_np, user2train = build_world()
    mesh = make_mesh(n_data=8)
    rep = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))

    def globalize(x, sharding):
        # replicated: every process supplies the whole array;
        # data-sharded: this process contributes its local rows
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    table = {k: globalize(v, rep) for k, v in table_np.items()}

    ds = SequenceDataset(user2train, max_items=16)
    # Per-process ingestion: each process walks the VSHARDS it owns and
    # stacks their rows; nproc=1 walks all of them (identical global order).
    my_vshards = range(pid * (VSHARDS // nproc), (pid + 1) * (VSHARDS // nproc))
    local_batches = []
    per_shard = GLOBAL_BATCH // VSHARDS
    iters = [ds.batches(per_shard, drop_last=True, process_index=v,
                        process_count=VSHARDS) for v in my_vshards]
    for rows in zip(*iters):
        ids = np.concatenate([r.item_ids for r in rows])
        lens = np.concatenate([r.seq_lens for r in rows])
        local_batches.append((ids, lens))
    assert len(local_batches) >= STEPS

    model = RecformerForPretraining(cfg)
    ids0, lens0 = local_batches[0]
    g_ids0 = globalize(ids0, data_sh)
    g_lens0 = globalize(lens0, data_sh)
    ba, bb = jax.jit(
        lambda r, t, i, s: make_pretrain_batch(r, t, i, s, cfg),
        out_shardings=None,
    )(jax.random.PRNGKey(0), table, g_ids0, g_lens0)
    params = jax.jit(model.init, out_shardings=rep)(jax.random.PRNGKey(0), ba, bb)
    tx = create_optimizer(learning_rate=1e-3, warmup_steps=2, total_steps=100)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step = make_pretrain_step(cfg, model, mesh=mesh)

    losses = []
    key = jax.random.PRNGKey(1)
    with mesh:
        for ids, lens in local_batches[:STEPS]:
            state, metrics = step(state, key, table,
                                  globalize(ids, data_sh),
                                  globalize(lens, data_sh))
            losses.append(float(np.asarray(
                jax.device_get(metrics["loss"]))))
    # param fingerprint: the updated weights must match across runs too
    leaves = jax.tree.leaves(state.params)
    fp = float(np.sum([np.sum(np.abs(np.asarray(jax.device_get(l)))) for l in leaves]))
    with open(out_path, "w") as f:
        json.dump({"pid": pid, "nproc": nproc, "losses": losses,
                   "param_fp": fp}, f)


if __name__ == "__main__":
    main()
