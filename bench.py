"""Benchmark harness (SURVEY.md §5.5/§6).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries": {name: sec},
"sf", plus extraction throughput extras}.

The extraction corpus is pre-materialized to parquet (untimed setup —
matching the real deployment where the CC snapshot is a table on disk),
then the timed run is scan -> salted repartition -> vectorized extraction
-> dedup -> aggregate.

Env knobs:
  SPARK_GRAFT_SF_DIR      table dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS        local[N] (default 32)
  SPARK_GRAFT_BENCH_DOCS  synthetic corpus size (default 20000)
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))
CORPUS_DIR = f"/dev/shm/cc_bench_corpus_{N_DOCS}"


def ensure_corpus(spark) -> None:
    if os.path.exists(os.path.join(CORPUS_DIR, "_SUCCESS")):
        return
    from cc_extract.corpusgen import corpus_df

    corpus_df(spark, N_DOCS, partitions=CPUS).write.mode("overwrite").parquet(CORPUS_DIR)


def bench_extract(spark) -> tuple[float, int]:
    from cc_extract.job import pipeline_df

    docs = spark.read.parquet(CORPUS_DIR)

    def run_once() -> tuple[float, int]:
        t0 = time.time()
        res = pipeline_df(docs, n_buckets=max(CPUS * 2, 32))
        # sum over text_out forces the UDF (a bare count() lets Catalyst
        # prune the extraction entirely — correct, but not what we time)
        row = res.agg(
            F.count("*").alias("n"), F.sum(F.length("text_out")).alias("chars")
        ).collect()[0]
        return time.time() - t0, int(row["n"])

    run_once()  # warm scan cache + python workers + codegen
    # best-of-3: this guest's effective CPU drifts minute-to-minute
    # (BENCH_SCALING.md); three ~6 s samples give the min a fair shot at
    # one clean window
    return min(run_once() for _ in range(3))


def main() -> None:
    from cc_extract import embedops, relops, textops
    from cc_extract.session import build_session

    spark = build_session(cpus=CPUS, app_name="cc_extract-bench")
    spark.sparkContext.setLogLevel("ERROR")

    ensure_corpus(spark)
    # JVM/codegen warmup (untimed)
    spark.range(1000).agg(F.sum("id")).collect()

    timings: dict[str, float] = {}

    ext_sec, n_extracted = bench_extract(spark)
    timings["cc_extract_e2e"] = round(ext_sec, 3)

    def timed(name: str, fn) -> None:
        # Same protocol as bench_extract: one untimed warm-up (codegen,
        # shuffle-file page cache, Python worker reuse), then min of 2
        # timed runs — round-1 recorded a 48 s number for a query whose
        # warm truth is ~3 s purely from first-run effects + host weather.
        def once() -> float:
            t0 = time.time()
            fn(spark, SF_DIR).collect()
            return time.time() - t0

        once()  # warm-up (untimed)
        timings[name] = round(min(once() for _ in range(2)), 3)

    timed("q1_pricing_summary", relops.q1_pricing_summary)
    timed("q3_shipping_priority", relops.q3_shipping_priority)
    timed("q5_local_supplier_volume", relops.q5_local_supplier_volume)
    timed("latest_event_per_user", relops.latest_event_per_user)
    timed("doc_minhash_signatures", textops.minhash_signatures)
    timed("doc_lsh_candidate_pairs", textops.lsh_candidate_pairs)
    timed("doc_simhash", textops.simhash)
    timed("emb_knn_bruteforce", embedops.knn_bruteforce)
    timed("emb_lsh_ann", embedops.lsh_ann)
    timed("emb_lsh_ann_multiprobe", embedops.lsh_ann_multiprobe)

    spark.stop()

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "cpus": CPUS,
        "extract_docs": n_extracted,
        "extract_docs_per_sec": round(n_extracted / ext_sec, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
