"""Unit test for the trace parser behind benchmarks/profile_step.py."""

import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                                "benchmarks"))


def test_parse_trace_sums_only_xla_ops_thread(tmp_path, capsys):
    from profile_step import parse_trace

    trace = {"traceEvents": [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 1, "tid": 10, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 1, "tid": 11, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        # module-level event must NOT be counted (it spans the whole step)
        {"ph": "X", "pid": 1, "tid": 11, "name": "jit_step", "dur": 999999},
        {"ph": "X", "pid": 1, "tid": 10, "name": "fusion.1", "dur": 3000,
         "args": {"hlo_category": "convolution fusion", "bytes_accessed": "12"}},
        {"ph": "X", "pid": 1, "tid": 10, "name": "pallas_window_attention.1",
         "dur": 1500, "args": {"hlo_category": "custom-call"}},
        # host-side event on another pid: ignored
        {"ph": "X", "pid": 2, "tid": 10, "name": "hostcall", "dur": 500},
    ]}
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump(trace, f)

    parse_trace(str(tmp_path), steps=3)
    out = capsys.readouterr().out
    assert "device total: 1.5 ms/step" in out  # (3000+1500)us / 3 steps
    assert "convolution fusion" in out and "custom-call" in out
    assert "jit_step" not in out
