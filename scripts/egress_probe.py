#!/usr/bin/env python
"""Per-round egress probe (VERDICT r4 item 7).

Attempts the exact external fetches the real-data runbook needs — the Amazon
v2 category dumps (``/root/reference/pretrain_data/download_data.py:17-100``)
and the HF ``allenai/longformer-base-4096`` assets — and records the outcome
to ``docs/artifacts/download_attempt_round{N}.txt`` whatever happens. If any
probe ever SUCCEEDS, docs/RUNBOOK.md's real-data protocol becomes the next
round's top item.

Usage: python scripts/egress_probe.py [--round N]
"""
import argparse
import datetime
import os
import socket
import time
import urllib.request

URLS = [
    "https://datarepo.eng.ucsd.edu/mcauley_group/data/amazon_v2/categoryFiles/Industrial_and_Scientific.json.gz",
    "https://datarepo.eng.ucsd.edu/mcauley_group/data/amazon_v2/metaFiles2/meta_Industrial_and_Scientific.json.gz",
    "https://huggingface.co/allenai/longformer-base-4096/resolve/main/config.json",
    "https://pypi.org",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--timeout", type=float, default=15.0)
    args = ap.parse_args()

    now = datetime.datetime.now(datetime.timezone.utc)
    lines = [f"host: vm | date: {now:%Y-%m-%d %H:%M:%S} UTC"]
    any_ok = False
    for url in URLS:
        t0 = time.time()
        try:
            req = urllib.request.Request(url, method="HEAD")
            with urllib.request.urlopen(req, timeout=args.timeout) as r:
                lines.append(f"OK   {url} -> HTTP {r.status} ({time.time()-t0:.1f}s)")
                any_ok = True
        except Exception as e:  # noqa: BLE001 — record every failure mode
            lines.append(f"FAIL {url} -> {type(e).__name__}: {e} ({time.time()-t0:.1f}s)")
    try:
        socket.getaddrinfo("huggingface.co", 443)
        lines.append("DNS huggingface.co: resolves")
    except OSError as e:
        lines.append(f"DNS huggingface.co: {type(e).__name__}: {e}")

    lines.append("")
    lines.append(
        "conclusion: EGRESS AVAILABLE — run docs/RUNBOOK.md real-data protocol next."
        if any_ok
        else "conclusion: no network egress from this box; north-star metrics continue "
             "on the documented fallback (structured synthetic corpus, full protocol, "
             "real TPU) — see docs/RESULTS.md."
    )
    out = os.path.join(os.path.dirname(__file__), "..", "docs", "artifacts",
                       f"download_attempt_round{args.round}.txt")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
