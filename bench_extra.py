"""Round-6 optimization measurement harness (guide §1) — NOT the frozen
driver bench (bench.py).  Per-query isolation with the same warm-up +
steal-gated methodology, plus:

  - ``--queries a,b,c`` to time a subset (fast iteration loop)
  - ``--attempts N``    to bound the retry budget while iterating
  - ``--explain DIR``   to dump .explain("formatted") per query
  - ``--noop``          to force computation through the noop sink
                        instead of collect() (guide §1.4) for the
                        DataFrame-returning queries

Prints one JSON line per query (name, sec, steal, attempts) and a final
total line, so interleaved runs stay parseable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

STEAL_GATE = 0.02
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))
CORPUS_PARTS = 128
CORPUS_DIR = f"/dev/shm/cc_bench_corpus_{N_DOCS}_p{CORPUS_PARTS}"


def cpu_jiffies():
    with open("/proc/stat") as f:
        vals = list(map(int, f.readline().split()[1:]))
    return sum(vals), vals[7]


def gated_best(run, max_attempts: int, min_clean: int = 2):
    best = None
    best_clean = None
    clean = 0
    attempts = 0
    hard_max = max(max_attempts, max_attempts * 2)
    while attempts < max_attempts or (clean == 0 and attempts < hard_max):
        tot0, st0 = cpu_jiffies()
        t0 = time.time()
        run()
        wall = time.time() - t0
        tot1, st1 = cpu_jiffies()
        steal = (st1 - st0) / max(tot1 - tot0, 1)
        attempts += 1
        if best is None or wall < best[0]:
            best = (wall, steal)
        if steal < STEAL_GATE:
            if best_clean is None or wall < best_clean[0]:
                best_clean = (wall, steal)
            clean += 1
            if clean >= min_clean:
                break
    kept = best_clean if best_clean is not None else best
    return kept[0], kept[1], attempts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="all")
    ap.add_argument("--attempts", type=int, default=2)
    ap.add_argument("--explain", default=None)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from cc_extract import embedops, relops, textops
    from cc_extract.session import build_session

    spark = build_session(cpus=args.cpus, app_name="cc_extract-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    SF_DIR = args.sf_dir

    # corpus-frame queries need the bench corpus
    def ensure_corpus():
        if os.path.exists(os.path.join(CORPUS_DIR, "_SUCCESS")):
            return
        from cc_extract.corpusgen import corpus_df
        corpus_df(spark, N_DOCS, partitions=CORPUS_PARTS).write.mode(
            "overwrite").parquet(CORPUS_DIR)

    sf_fns = {
        "q1_pricing_summary": relops.q1_pricing_summary,
        "q3_shipping_priority": relops.q3_shipping_priority,
        "q5_local_supplier_volume": relops.q5_local_supplier_volume,
        "latest_event_per_user": relops.latest_event_per_user,
        "doc_minhash_signatures": textops.minhash_signatures,
        "doc_lsh_candidate_pairs": textops.lsh_candidate_pairs,
        "doc_simhash": textops.simhash,
        "doc_simhash_near_dups": textops.simhash_near_dups,
        "doc_benchmark_decontamination": textops.benchmark_decontamination,
        "doc_segment_boilerplate": textops.segment_boilerplate,
        "doc_duplicate_spans": textops.duplicate_spans,
        "doc_unigram_logprob": textops.unigram_logprob,
        "doc_quality_classifier": textops.quality_classifier,
        "doc_bm25_rank": textops.bm25_rank,
        "doc_dsir_weights": textops.dsir_weights,
        "doc_curation_funnel": textops.curation_funnel,
        "emb_knn_bruteforce": embedops.knn_bruteforce,
        "emb_ivf_ann": embedops.ivf_ann,
        "emb_lsh_ann": embedops.lsh_ann,
        "emb_lsh_ann_multiprobe": embedops.lsh_ann_multiprobe,
        "emb_pq_ann": embedops.pq_ann,
        "emb_sq8_ann": embedops.sq8_ann,
    }
    corpus_names = ("cc_extract_e2e", "cc_html_spans", "cc_snapshot_diff")

    if args.queries == "all":
        names = list(corpus_names) + list(sf_fns)
    else:
        names = [q.strip() for q in args.queries.split(",") if q.strip()]

    timings = {}

    def report(name, sec, steal, attempts):
        timings[name] = round(sec, 3)
        print(json.dumps({"query": name, "sec": round(sec, 3),
                          "steal": round(steal, 4),
                          "attempts": attempts}), flush=True)

    def dump_plan(name, df):
        if not args.explain:
            return
        os.makedirs(args.explain, exist_ok=True)
        with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))

    def force(df):
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()

    for name in names:
        spark.sparkContext.setJobDescription(name)
        if name in corpus_names:
            ensure_corpus()
            docs = spark.read.parquet(CORPUS_DIR)
            if name == "cc_extract_e2e":
                from cc_extract.job import pipeline_df

                def run_once():
                    res = pipeline_df(docs, n_buckets=max(args.cpus * 2, 32))
                    res.agg(F.count("*"),
                            F.sum(F.length("text_out"))).collect()

                dump_plan(name, pipeline_df(
                    docs, n_buckets=max(args.cpus * 2, 32)))
                run_once()
                sec, steal, att = gated_best(run_once, args.attempts)
                report(name, sec, steal, att)
            else:
                from cc_extract.job import html_spans_df, snapshot_diff_df
                df = (html_spans_df(docs) if name == "cc_html_spans"
                      else snapshot_diff_df(docs, "2025-07-02 00:00:00"))
                dump_plan(name, df)
                fn = lambda: df.agg(  # noqa: E731
                    F.count("*"), F.sum(F.length(df.columns[0]))).collect()
                fn()
                sec, steal, att = gated_best(fn, args.attempts)
                report(name, sec, steal, att)
        else:
            fn = sf_fns[name]
            dump_plan(name, fn(spark, SF_DIR))
            runner = (lambda f=fn: force(f(spark, SF_DIR)))
            runner()  # warm-up
            sec, steal, att = gated_best(runner, args.attempts)
            report(name, sec, steal, att)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"metric": "bench_extra_total",
                      "value": round(sum(timings.values()), 3),
                      "queries": timings,
                      "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1]}),
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
