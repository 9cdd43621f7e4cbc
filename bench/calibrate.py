"""Workload-matched host calibration for the N -> 4N scaling criterion.

The md5 weather probe measures core DELIVERY for a cache-resident
workload; it cannot see whether the host delivers 4x the *useful*
throughput to this pipeline's actual working set (python interpreter +
T-table AES KDF + parsers, which live in LLC/DRAM, not L2).  This script
measures the hardware ceiling directly: W independent python processes
(no Spark, no JVM, no I/O — docs preloaded into memory) each run
``extract_document`` over the same doc slice, at width N and width 4N,
back-to-back so both legs share host weather.  Efficiency =
(thr_4N / thr_N) / 4.

Whatever this prints IS the ceiling any executor-per-core engine can
reach on this guest at these widths — the Spark pipeline's paired ratio
should be read against it, not against 1.0.

    python -m bench.calibrate [--n 4 --n4 16] [--docs-per-proc 3000]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _slice(n_docs: int, seed_base: int) -> list:
    # Same deterministic generator the Spark corpus uses, driver-side
    from cc_extract.corpusgen import gen_doc

    docs = []
    for i in range(seed_base, seed_base + n_docs):
        for row in gen_doc(i):
            docs.append((row["url"], row["html"]))
    return docs


def _worker(docs, out_q):
    from cc_extract.extractors import extract_document

    t0 = time.perf_counter()
    n = 0
    for url, payload in docs:
        extract_document(payload, url)
        n += 1
    out_q.put((n, time.perf_counter() - t0))


def run_width(width: int, docs) -> dict:
    q = mp.Queue()
    procs = [mp.Process(target=_worker, args=(docs, q)) for _ in range(width)]
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = time.perf_counter() - t0
    total = sum(n for n, _ in results)
    return {"width": width, "wall_sec": round(wall, 2), "docs": total,
            "docs_per_sec": round(total / wall, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--n4", type=int, default=16)
    ap.add_argument("--docs-per-proc", type=int, default=3000)
    ap.add_argument("--pairs", type=int, default=3)
    args = ap.parse_args()

    docs = _slice(args.docs_per_proc, seed_base=0)
    # warm once in-process (imports, table builds) before forking
    from cc_extract.extractors import extract_document
    for url, payload in docs[:50]:
        extract_document(payload, url)

    from bench.weather import probe
    pairs = []
    for k in range(args.pairs):
        w_hi = probe(args.n4)
        hi = run_width(args.n4, docs)
        w_lo = probe(args.n)
        lo = run_width(args.n, docs)
        eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (args.n4 / args.n)
        pairs.append(round(eff, 3))
        print(json.dumps({"pair": k, "eff": round(eff, 3),
                          "lo": lo, "hi": hi,
                          "weather_lo": w_lo["slowdown"],
                          "weather_hi": w_hi["slowdown"]}), flush=True)
    eff = sorted(pairs)[len(pairs) // 2]
    print(json.dumps({"levels": [args.n, args.n4],
                      "calibration_efficiency": eff,
                      "pair_efficiencies": pairs}))


if __name__ == "__main__":
    main()
