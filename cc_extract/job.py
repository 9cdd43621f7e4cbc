"""The extraction pipeline (SURVEY.md §3.4) — the Spark re-expression of
the reference's whole serverless dataflow (dispatch → per-format extract →
write, [R: functions/simple/main.py ⚠]).

Shuffle accounting — designed for 100 TB of payload, graded at sf-small
(SURVEY.md §4):

    scan (column-pruned: url, warc_ts, html)
      ├─ payloads <= 1 MiB (~99.8% of rows): extract IN scan partitions — no movement
      └─ giants  >  1 MiB: salted repartition      ← the ONLY payload shuffle
      → Arrow pandas-UDF extraction (payload dies here; text is ~5-10x smaller)
      → dedup keep-newest per url (window on text rows)   ← text shuffle
      → repartition(n_buckets, bucket) for file layout    ← text shuffle
      → dynamic-overwrite write partitioned by bucket
      → per-bucket manifests + metrics

Three deliberate scale decisions, worth stating because they differ from
the naive port:

1. **Dedup AFTER extraction.**  Deduping first (window over raw rows)
   would shuffle the full payload; extracting the ~2% duplicate rows and
   deduping on their extracted text costs 2% extra UDF cpu and saves an
   entire payload shuffle.  The keep-newest choice orders by
   (warc_ts desc, text_sha256 desc) — the hash is already computed, so no
   extra pass over payload bytes (an xxhash64(html) tie-break would
   re-read all 100 TB).

2. **Salting is size-aware and explicit** [D: BASELINE.json north_star
   "explicit salting for skewed large-PDF partitions"].  AQE's skew
   handling only splits join/shuffle-read stages, not a skewed UDF map
   stage, so giant payloads get a secondary-hash salt in the repartition
   key.  The logical *bucket* (resume/output unit) is untouched — salt
   exists only in the execution partitioning.

3. **Only giants move** (``shuffle_policy="giants-only"``): small docs
   are uniform enough in hash-unordered CC inputs that extracting them in
   scan partitions is both shuffle-free and skew-free; the salted
   repartition applies to the >threshold tail only.  See pipeline_df.

On real Iceberg, the input would be bucket-transform partitioned by url,
making the resume filter partition pruning; emulation notes in tableio.py.
"""

from __future__ import annotations

import argparse
import os
import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from . import manifest as mf
from .tableio import write_partitioned

DEFAULT_BUCKETS = 64
DEFAULT_SALT = 8
DEFAULT_SALT_THRESHOLD = 1 << 20  # 1 MiB (SURVEY.md §4.3)

EXTRACT_RESULT_SCHEMA = (
    "fmt string, text_out string, status string, error string, extract_ms double"
)

OK_STATUSES = ("ok", "ok_ocr")  # ok_ocr = executed OCR-lite route (X14)


def make_extract_udf(pdf_passwords: tuple[str, ...] | None = None):
    """The X1–X17 extractor surface as ONE Arrow-vectorized scalar UDF.

    One UDF (not a per-format ``when`` chain, which would evaluate every
    UDF on every batch; not ``groupBy(fmt).applyInPandas``, which would add
    a payload shuffle and recreate the skew problem) — SURVEY.md §4.2
    "UDF dispatch shape".  Sniffing + dispatch happen per element inside
    the batch; zero per-row Python outside the Arrow boundary
    [D: BASELINE.json north_star "no per-row Python dispatch"].
    """

    @F.pandas_udf(EXTRACT_RESULT_SCHEMA)
    def extract_udf(html: pd.Series, url: pd.Series) -> pd.DataFrame:
        from time import perf_counter

        from cc_extract.extractors import extract_document

        n = len(html)
        fmts = [None] * n
        texts = [None] * n
        statuses = [None] * n
        errors = [None] * n
        ms = [0.0] * n
        for i, (payload, u) in enumerate(zip(html, url)):
            t0 = perf_counter()
            r = extract_document(payload, u, pdf_passwords=pdf_passwords)
            ms[i] = (perf_counter() - t0) * 1000.0
            fmts[i] = r["fmt"]
            texts[i] = r["text"]
            statuses[i] = r["status"]
            errors[i] = r["error"]
        return pd.DataFrame(
            {"fmt": fmts, "text_out": texts, "status": statuses,
             "error": errors, "extract_ms": ms}
        )

    return extract_udf


def with_bucket(df: DataFrame, n_buckets: int, url_col: str = "url") -> DataFrame:
    """R4 — deterministic content-addressed bucket (resume/output unit)."""
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(url_col), F.lit(n_buckets)).cast("int")
    )


PACK_SCAN_BYTES = 32 << 20  # min input bytes per scan task worth a Python pass


def pack_scan(df: DataFrame) -> DataFrame:
    """Pack a many-tiny-files scan into fewer tasks before a per-row
    Python/Arrow pass (round 6) — the inverse of textops.fan_out_scan.

    The bench corpus is 128 x ~200 KB files and ``openCostInBytes`` is
    tuned to never merge files (extraction parallelism rides the scan
    for fat payloads), so every corpus-frame pass ran 128 tasks whose
    per-task Arrow/worker round-trip cost more than their ~160 rows of
    work (cc_html_spans measured 1.59 -> 0.74 s with the pass packed to
    defaultParallelism).  Packing is scale-adaptive and a no-op on any
    healthy lake: target = max(defaultParallelism, total_bytes /
    PACK_SCAN_BYTES) — when files average >= 32 MiB (production layout)
    target >= n_files and the scan is returned untouched; only a
    fragmented-small-files input coalesces (no shuffle, same rows)."""
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    try:
        from urllib.parse import urlparse

        files = df.inputFiles()
        if not files or len(files) <= cores:
            return df
        total = 0
        for f in files:
            if not f.startswith("file:"):
                return df
            total += os.path.getsize(urlparse(f).path)
        target = max(cores, -(-total // PACK_SCAN_BYTES))
        if target >= len(files):
            return df
        return df.coalesce(target)
    except Exception:
        return df


SPAN_COLS = ("n_blocks", "n_kept", "kept_chars", "span_chars",
             "doc_chars", "first_kept_start", "last_kept_end")


def html_spans_df(docs: DataFrame) -> DataFrame:
    """X1 span provenance over a corpus frame (url, warc_ts, html) — the
    "spans" half of the north rule's per-document match: per html-routed
    document (newest crawl per url), where in the decoded page the kept
    main-content blocks live.  Row semantics are the shared
    cc_extract.extractors.html.html_span_stats (sniff + depth-1 gzip
    unwrap + position-aware scan; invariants pinned in
    tests/test_html_spans.py).  Scale shape: ONE payload-bearing
    mapInPandas pass REDUCES every page to a 7-int row before the only
    shuffle (url-hash window dedup) — offsets travel, payloads never
    do."""
    from .extractors.html import html_span_stats

    schema = ("url string, warc_ts timestamp, n_blocks int, n_kept int, "
              "kept_chars long, span_chars long, doc_chars long, "
              "first_kept_start long, last_kept_end long")
    cols = ("url", "warc_ts", *SPAN_COLS)

    def batches(it):
        for pdf in it:
            rows: dict[str, list] = {c: [] for c in cols}
            for url, ts, payload in zip(pdf["url"], pdf["warc_ts"],
                                        pdf["html"]):
                s = html_span_stats(payload, url)
                if s is None:
                    continue
                rows["url"].append(url)
                rows["warc_ts"].append(ts)
                for k in SPAN_COLS:
                    rows[k].append(s[k])
            yield pd.DataFrame(rows, columns=list(cols))

    spans = pack_scan(docs).select("url", "warc_ts", "html").mapInPandas(
        batches, schema=schema
    )
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
    return (
        spans.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("url", *SPAN_COLS)
        .orderBy("url")
    )


def html_meta_df(docs: DataFrame) -> DataFrame:
    """Head-metadata extraction over a corpus frame — per html-routed
    document (newest crawl per url): title, meta description, og:title,
    canonical link, html lang.  Row semantics are the shared
    cc_extract.extractors.html.html_meta (first-occurrence-wins spec;
    see its docstring); same scale shape as html_spans_df — the ONE
    payload-bearing mapInPandas pass reduces each page to five short
    strings before the only shuffle (url-hash keep-newest window)."""
    from .extractors.html import META_COLS, html_meta

    schema = ("url string, warc_ts timestamp, title string, "
              "meta_description string, og_title string, "
              "canonical string, lang string")
    cols = ("url", "warc_ts", *META_COLS)

    def batches(it):
        for pdf in it:
            rows: dict[str, list] = {c: [] for c in cols}
            for url, ts, payload in zip(pdf["url"], pdf["warc_ts"],
                                        pdf["html"]):
                m = html_meta(payload, url)
                if m is None:
                    continue
                rows["url"].append(url)
                rows["warc_ts"].append(ts)
                for k in META_COLS:
                    rows[k].append(m[k])
            yield pd.DataFrame(rows, columns=list(cols))

    meta = pack_scan(docs).select("url", "warc_ts", "html").mapInPandas(
        batches, schema=schema
    )
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
    return (
        meta.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("url", *META_COLS)
        .orderBy("url")
    )


def html_robots_df(docs: DataFrame) -> DataFrame:
    """Page-level robots directives over a corpus frame — per
    html-routed document (newest crawl per url): meta-robots
    noindex/nofollow flags, robots-meta count, anchor count and
    rel=nofollow anchor count.  Row semantics are the shared
    cc_extract.extractors.html.html_robots (restrictive-union spec;
    see its docstring); same scale shape as html_meta_df — the ONE
    payload-bearing mapInPandas pass reduces each page to five scalars
    before the only shuffle (url-hash keep-newest window)."""
    from .extractors.html import ROBOTS_COLS, html_robots

    schema = ("url string, warc_ts timestamp, noindex boolean, "
              "nofollow boolean, n_robots_metas int, n_anchors int, "
              "n_nofollow_anchors int")
    cols = ("url", "warc_ts", *ROBOTS_COLS)

    def batches(it):
        for pdf in it:
            rows: dict[str, list] = {c: [] for c in cols}
            for url, ts, payload in zip(pdf["url"], pdf["warc_ts"],
                                        pdf["html"]):
                m = html_robots(payload, url)
                if m is None:
                    continue
                rows["url"].append(url)
                rows["warc_ts"].append(ts)
                for k in ROBOTS_COLS:
                    rows[k].append(m[k])
            yield pd.DataFrame(rows, columns=list(cols))

    rb = pack_scan(docs).select("url", "warc_ts", "html").mapInPandas(
        batches, schema=schema
    )
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
    return (
        rb.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("url", *ROBOTS_COLS)
        .orderBy("url")
    )


def html_jsonld_df(docs: DataFrame) -> DataFrame:
    """Schema.org JSON-LD extraction over a corpus frame — per
    html-routed document (newest crawl per url): block/valid counts,
    document-order entity types, first Article headline, breadcrumb
    size.  Row semantics are the shared
    cc_extract.extractors.html.html_jsonld (see its docstring); same
    scale shape as html_meta_df — the ONE payload-bearing mapInPandas
    pass reduces each page to five small values before the only shuffle
    (url-hash keep-newest window)."""
    from .extractors.html import JSONLD_COLS, html_jsonld

    schema = ("url string, warc_ts timestamp, ld_blocks int, "
              "ld_valid int, ld_types string, ld_headline string, "
              "ld_breadcrumbs int")
    cols = ("url", "warc_ts", *JSONLD_COLS)

    def batches(it):
        for pdf in it:
            rows: dict[str, list] = {c: [] for c in cols}
            for url, ts, payload in zip(pdf["url"], pdf["warc_ts"],
                                        pdf["html"]):
                m = html_jsonld(payload, url)
                if m is None:
                    continue
                rows["url"].append(url)
                rows["warc_ts"].append(ts)
                for k in JSONLD_COLS:
                    rows[k].append(m[k])
            yield pd.DataFrame(rows, columns=list(cols))

    ld = pack_scan(docs).select("url", "warc_ts", "html").mapInPandas(
        batches, schema=schema
    )
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
    return (
        ld.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("url", *JSONLD_COLS)
        .orderBy("url")
    )


def html_blocks_df(docs: DataFrame, ordered: bool = True) -> DataFrame:
    """Per-BLOCK span rows over a corpus frame — the literal per-block
    "spans match" surface for the newest crawl of every html-routed url:
    (url, block_idx, span_start, span_end, kept, n_chars, text_md5).
    Same scale shape as html_spans_df: the one payload-bearing
    mapInPandas pass reduces each page to O(blocks) fixed-size rows
    (offsets + a 32-hex pin), so the url-hash dedup window shuffles
    block rows, never payloads.  Row semantics shared with
    oracle_data.html_blocks_table via extractors.html.html_block_rows."""
    from .extractors.html import html_block_rows

    schema = ("url string, warc_ts timestamp, block_idx int, "
              "span_start long, span_end long, kept int, n_chars long, "
              "text_md5 string")
    bcols = ("block_idx", "span_start", "span_end", "kept", "n_chars",
             "text_md5")
    cols = ("url", "warc_ts", *bcols)

    def batches(it):
        for pdf in it:
            rows: dict[str, list] = {c: [] for c in cols}
            for url, ts, payload in zip(pdf["url"], pdf["warc_ts"],
                                        pdf["html"]):
                brs = html_block_rows(payload, url)
                if brs is None:
                    continue
                for b in brs:
                    rows["url"].append(url)
                    rows["warc_ts"].append(ts)
                    for k in bcols:
                        rows[k].append(b[k])
            yield pd.DataFrame(rows, columns=list(cols))

    blocks = pack_scan(docs).select("url", "warc_ts", "html").mapInPandas(
        batches, schema=schema
    )
    # keep-newest per url: rank crawls by ts (dense — all blocks of the
    # newest crawl share its ts), then keep rank 1
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
    out = (
        blocks.withColumn("_rk", F.dense_rank().over(w))
        .filter(F.col("_rk") == 1)
        .select("url", *bcols)
    )
    # aggregate consumers (cc_site_templates) skip the global sort — a
    # range shuffle below a groupBy is pure cost
    return out.orderBy("url", "block_idx") if ordered else out


def html_tables_df(docs: DataFrame) -> DataFrame:
    """Structured table extraction over a corpus frame — per CELL of the
    newest crawl of every html-routed url: (url, table_idx, caption,
    row_idx, col_idx, is_header, cell).  Row semantics are the shared
    cc_extract.extractors.html.html_tables (see its docstring); same
    scale shape as html_blocks_df — the one payload-bearing mapInPandas
    pass reduces each page to O(cells) short rows, so the url-hash
    dedup window shuffles cell rows, never payloads."""
    from .extractors.html import TABLE_COLS, html_tables

    schema = ("url string, warc_ts timestamp, table_idx int, "
              "caption string, row_idx int, col_idx int, is_header int, "
              "cell string")
    cols = ("url", "warc_ts", *TABLE_COLS)

    def batches(it):
        for pdf in it:
            rows: dict[str, list] = {c: [] for c in cols}
            for url, ts, payload in zip(pdf["url"], pdf["warc_ts"],
                                        pdf["html"]):
                trs = html_tables(payload, url)
                if not trs:
                    continue
                for t in trs:
                    rows["url"].append(url)
                    rows["warc_ts"].append(ts)
                    for k in TABLE_COLS:
                        rows[k].append(t[k])
            yield pd.DataFrame(rows, columns=list(cols))

    cells = pack_scan(docs).select("url", "warc_ts", "html").mapInPandas(
        batches, schema=schema
    )
    # keep-newest per url: dense rank — all cells of the newest crawl
    # share its ts
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
    return (
        cells.withColumn("_rk", F.dense_rank().over(w))
        .filter(F.col("_rk") == 1)
        .select("url", *TABLE_COLS)
        .orderBy("url", "table_idx", "row_idx", "col_idx")
    )


def html_headings_df(docs: DataFrame) -> DataFrame:
    """Document-outline extraction over a corpus frame — per closed
    h1-h6 heading of the newest crawl of every html-routed url:
    (url, heading_idx, level, heading).  Row semantics are the shared
    cc_extract.extractors.html.html_headings (see its docstring); same
    scale shape as html_tables_df — the one payload-bearing mapInPandas
    pass reduces each page to O(headings) short rows, so the url-hash
    dedup window shuffles heading rows, never payloads."""
    from .extractors.html import html_headings

    schema = ("url string, warc_ts timestamp, heading_idx int, "
              "level int, heading string")
    hcols = ("heading_idx", "level", "heading")
    cols = ("url", "warc_ts", *hcols)

    def batches(it):
        for pdf in it:
            rows: dict[str, list] = {c: [] for c in cols}
            for url, ts, payload in zip(pdf["url"], pdf["warc_ts"],
                                        pdf["html"]):
                hs = html_headings(payload, url)
                if not hs:
                    continue
                for h in hs:
                    rows["url"].append(url)
                    rows["warc_ts"].append(ts)
                    for k in hcols:
                        rows[k].append(h[k])
            yield pd.DataFrame(rows, columns=list(cols))

    heads = pack_scan(docs).select("url", "warc_ts", "html").mapInPandas(
        batches, schema=schema
    )
    # keep-newest per url: dense rank — all headings of the newest
    # crawl share its ts
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
    return (
        heads.withColumn("_rk", F.dense_rank().over(w))
        .filter(F.col("_rk") == 1)
        .select("url", *hcols)
        .orderBy("url", "heading_idx")
    )


def snapshot_diff_df(docs: DataFrame, pivot_ts: str) -> DataFrame:
    """Inter-crawl snapshot diff over a corpus frame — the
    refresh/frontier table a recurring crawl derives before deciding
    what to refetch: split at *pivot_ts*, keep the newest crawl per url
    within each half, report per-domain new / gone / changed / same
    counts (change = payload sha256 differs).  Scale shape: payloads
    collapse to 64-hex digests before any shuffle; two url-partitioned
    window dedups + one url-keyed full-outer sort-merge join (same
    uniform hash key, AQE coalesced) + an O(domains) partial-aggregable
    groupBy."""
    pivot = F.to_timestamp(F.lit(pivot_ts))
    d = pack_scan(docs).select(
        "url", "warc_ts", F.sha2(F.col("html"), 256).alias("sha")
    )
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))

    def snap(pred, alias):
        return (
            d.filter(pred)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("url", F.col("sha").alias(alias))
        )

    a = snap(F.col("warc_ts") < pivot, "sha_a")
    b = snap(F.col("warc_ts") >= pivot, "sha_b")
    j = a.join(b, "url", "full_outer")
    both = F.col("sha_a").isNotNull() & F.col("sha_b").isNotNull()
    return (
        j.select(
            F.lower(F.regexp_extract("url", r"^https://([^/:?#]+)", 1))
            .alias("domain"),
            F.col("sha_a").isNull().cast("long").alias("is_new"),
            F.col("sha_b").isNull().cast("long").alias("is_gone"),
            (both & (F.col("sha_a") != F.col("sha_b")))
            .cast("long").alias("is_changed"),
            (both & (F.col("sha_a") == F.col("sha_b")))
            .cast("long").alias("is_same"),
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_urls"),
            F.sum("is_new").alias("n_new"),
            F.sum("is_gone").alias("n_gone"),
            F.sum("is_changed").alias("n_changed"),
            F.sum("is_same").alias("n_same"),
        )
        .orderBy("domain")
    )


def pipeline_df(
    docs: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    salt: int = DEFAULT_SALT,
    salt_threshold: int = DEFAULT_SALT_THRESHOLD,
    dedup: bool = True,
    skip_buckets: list[int] | None = None,
    exec_partitions: int | None = None,
    shuffle_policy: str = "giants-only",
    pdf_passwords: tuple[str, ...] | None = None,
) -> DataFrame:
    """documents -> extracted (url, warc_ts, bucket, n_bytes_in, fmt,
    text_out, text_sha256, status, error, attempt).  Pure transformation —
    no writes; reused by job, tests, bench, and the driver contract.

    shuffle_policy:

    - ``"giants-only"`` (default): payloads <= threshold extract IN the
      scan partitions — a narrow transform, ZERO payload movement for
      ~99.8% of rows/60% of bytes; only giants (> threshold) are
      repartitioned with the size-aware salt, at fine granularity
      (4x exec partitions) so one Arrow batch never holds more than a
      couple of giants.  At 100 TB this is the difference between
      shuffling ~100 TB and shuffling only the giant tail — the scan is
      sequential and cheap, the shuffle is 3x I/O plus network.
    - ``"full"``: everything through one salted repartition — the layout
      to use when the input's own partitioning is pathological (e.g. a
      crawl dump sorted by host, where scan partitions would be
      format/size-skewed).
    """
    spark = docs.sparkSession
    n_exec = exec_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    # R1 projection: stale upstream text/lang never read (column pruning
    # reaches the parquet scan — verify via explain: ReadSchema excludes them)
    df = docs.select("url", "warc_ts", "html").filter(F.col("url").isNotNull())
    df = with_bucket(df, n_buckets)
    if skip_buckets:
        # R6 resume: driver-side static predicate, never a join (§4.2)
        df = df.filter(~F.col("bucket").isin([int(b) for b in skip_buckets]))

    # NULL payloads coalesce to size 0 so they land in the small branch of
    # EITHER shuffle policy and surface as status='error' rows — a NULL
    # n_bytes_in would fail both the <= and > giant filters and the row
    # would silently vanish, violating the "poison doc -> error row, never
    # disappears" contract.
    df = df.withColumn("n_bytes_in", F.coalesce(F.length("html"), F.lit(0)))

    extract_udf = make_extract_udf(pdf_passwords)

    def run_extract(part: DataFrame) -> DataFrame:
        return part.withColumn("r", extract_udf("html", "url")).select(
            "url", "warc_ts", "bucket", "n_bytes_in", "r.*"
        )

    if shuffle_policy == "giants-only":
        small = df.filter(F.col("n_bytes_in") <= F.lit(salt_threshold))
        big = df.filter(F.col("n_bytes_in") > F.lit(salt_threshold))
        # R5 salt at fine granularity.  Round 6 split: the salt KEYSPACE
        # stays fine (16x exec partitions — guide §2.5 wants many more
        # distinct keys than partitions so the hash spreads evenly) but
        # the PARTITION count is n_exec, not 4x: the giant tail is a
        # small fraction of rows, and 4x partitions meant a giant-branch
        # stage of mostly-empty tasks (512 tasks for 34 giants on the
        # bench corpus — ~2 s of pure scheduling).  Per-batch memory is
        # bounded by arrow.maxRecordsPerBatch, not the partition count;
        # production can still widen via the exec_partitions argument.
        n_salt_keys = max(n_exec * 16, salt)
        big = big.withColumn(
            "salt",
            F.pmod(F.xxhash64("url", F.lit(1)), F.lit(n_salt_keys)).cast("int"),
        ).repartition(n_exec, F.col("salt"))
        res = run_extract(small).unionByName(run_extract(big.drop("salt")))
    else:
        df = df.withColumn(
            "salt",
            F.when(
                F.col("n_bytes_in") > F.lit(salt_threshold),
                F.pmod(F.xxhash64("url", F.lit(1)), F.lit(salt)),
            ).otherwise(F.lit(0)).cast("int"),
        )
        # THE payload shuffle (the only one)
        df = df.repartition(n_exec, F.col("bucket"), F.col("salt"))
        res = run_extract(df)
    # JVM-side sha256 of the extracted text (codegen'd; the pytest oracle
    # diffs per-url text hashes [D: BASELINE.json north_star])
    res = res.withColumn(
        "text_sha256", F.sha2(F.encode(F.col("text_out"), "UTF-8"), 256)
    )

    if dedup:
        # R3 keep-newest-crawl per url; deterministic tie-break on the
        # extracted-text hash (§4.3 determinism) — already computed, so no
        # extra pass over payload bytes (xxhash64(html) would re-read 100 TB)
        w = Window.partitionBy("url").orderBy(
            F.desc("warc_ts"), F.desc("text_sha256")
        )
        res = (
            res.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    return res.withColumn("attempt", F.lit(1))


def run(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    n_buckets: int = DEFAULT_BUCKETS,
    salt: int = DEFAULT_SALT,
    salt_threshold: int = DEFAULT_SALT_THRESHOLD,
    dedup: bool = True,
    resume: bool = True,
    input_token: str | None = None,
    pdf_passwords: tuple[str, ...] | None = None,
) -> dict:
    """Execute the pipeline with manifest-checkpointed resume (M1–M4).

    Returns job stats.  Rerun semantics: completed buckets are skipped via
    a static filter; incomplete buckets are dynamically overwritten —
    rerun of a killed job converges to the identical table (M2).

    Resume safety (M4): manifests carry (job_id, snapshot_id).  A resumed
    run REFUSES manifests written under a different config hash (a changed
    n_buckets means completed bucket ids were computed under a different
    modulus — silently mixing them duplicates/drops documents) or a
    different input snapshot (completed buckets would hold stale data).
    ``resume=False`` means a fresh run: prior output/manifests/metrics for
    this out_dir are removed first, so stale partition directories from an
    earlier layout can never linger beside new ones.

    Incremental accounting: stats and the metrics table are computed ONLY
    over the buckets written by THIS run (partition-pruned scan of the new
    ``bucket=`` directories; metrics dynamically overwrite only those
    partitions).  At 10^12 docs a resumed run must not rescan or rewrite
    long-completed buckets.
    """
    t0 = time.time()
    config = {
        "n_buckets": n_buckets, "salt": salt,
        "salt_threshold": salt_threshold, "dedup": dedup,
    }
    if pdf_passwords is not None:
        # part of the job identity: a different candidate list changes
        # which encrypted PDFs extract, so completed buckets don't carry
        # over (the default list is omitted to keep prior job_ids stable)
        config["pdf_passwords"] = list(pdf_passwords)
    jid = mf.job_id(config)
    # input_token: identity of generated/inline inputs (e.g. "n|seed") so
    # M4's resume-refusal can distinguish same-schema inline corpora
    snap = mf.input_snapshot_id(docs, inline_token=input_token)

    if not resume:
        import shutil
        for sub in ("extracted", "metrics", mf.MANIFEST_DIR):
            shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)
        done: dict[int, dict] = {}
    else:
        done = mf.completed_buckets(out_dir)
        stale = {
            b: r for b, r in done.items()
            if r.get("job_id") != jid or r.get("snapshot_id", snap) != snap
        }
        if stale:
            b, r = next(iter(stale.items()))
            raise ValueError(
                f"out_dir {out_dir!r} holds manifests from a different "
                f"job/input (bucket {b}: job_id={r.get('job_id')} "
                f"snapshot={r.get('snapshot_id')}; current job_id={jid} "
                f"snapshot={snap}). Use a fresh out_dir or resume=False."
            )
    skip = sorted(done)
    if len(skip) >= n_buckets:
        return {"job_id": jid, "snapshot_id": snap, "skipped": True,
                "buckets_done": len(skip), "wall_ms": 0, "n_docs": 0}

    res = pipeline_df(
        docs, n_buckets=n_buckets, salt=salt, salt_threshold=salt_threshold,
        dedup=dedup, skip_buckets=skip, pdf_passwords=pdf_passwords,
    )
    # final layout shuffle: cheap text rows, clusters files 1:1 with buckets
    final = res.repartition(n_buckets, "bucket")
    write_partitioned(final, os.path.join(out_dir, "extracted"), "bucket")

    # M1/M3: per-bucket stats over ONLY the buckets this run wrote — the
    # static ~isin predicate prunes completed bucket= directories at the
    # scan, and the projection never touches text
    out = spark.read.parquet(os.path.join(out_dir, "extracted"))
    fresh = out.filter(~F.col("bucket").isin(skip)) if skip else out
    ok_cond = F.col("status").isin(*OK_STATUSES)
    stats = (
        fresh.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(ok_cond.cast("int")).alias("n_ok"),
            F.sum((F.col("status") == "error").cast("int")).alias("n_fail"),
            F.sum("n_bytes_in").alias("bytes_in"),
            F.sum("extract_ms").alias("extract_ms"),
        )
        .collect()
    )
    wall_ms = int((time.time() - t0) * 1000)
    seen = set()
    for row in stats:
        seen.add(int(row["bucket"]))
        mf.write_bucket_manifest(out_dir, {
            "bucket": int(row["bucket"]), "n_docs": row["n_docs"],
            "n_ok": row["n_ok"], "n_fail": row["n_fail"],
            "bytes_in": int(row["bytes_in"] or 0),
            # per-bucket cost is the summed in-UDF extraction time (real,
            # measured per row); wall_ms stays job-level and says so
            "extract_ms": round(float(row["extract_ms"] or 0.0), 3),
            "wall_ms": wall_ms, "job_id": jid, "snapshot_id": snap,
        })
    # buckets this run was responsible for but that hold zero documents
    # still complete (else every rerun re-pays their scan)
    for b in range(n_buckets):
        if b not in seen and b not in done:
            mf.write_bucket_manifest(out_dir, {
                "bucket": b, "n_docs": 0, "n_ok": 0, "n_fail": 0,
                "bytes_in": 0, "extract_ms": 0.0, "wall_ms": wall_ms,
                "job_id": jid, "snapshot_id": snap,
            })
    new_buckets = n_buckets - len(skip)

    # M3 failure metrics: per-(bucket, fmt, status) counters for the new
    # buckets only; dynamic partition overwrite leaves completed buckets'
    # metric files byte-untouched
    metrics = fresh.groupBy("bucket", "fmt", "status").agg(
        F.count("*").alias("n"), F.sum("n_bytes_in").alias("bytes_in")
    )
    write_partitioned(metrics, os.path.join(out_dir, "metrics"), "bucket")

    total = sum(r["n_docs"] for r in stats)
    return {
        "job_id": jid, "snapshot_id": snap, "skipped": False,
        "wall_ms": wall_ms, "n_docs": int(total), "buckets_new": new_buckets,
        "buckets_done": len(skip) + new_buckets,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description="cc_extract pipeline")
    ap.add_argument("--input", help="parquet path of the documents table "
                    "(default: synthetic corpus)")
    ap.add_argument("--input-warc", help="directory/glob of .warc.gz "
                    "segment files to ingest instead of a table "
                    "(cc_extract/warc.py reader)")
    ap.add_argument("--n-docs", type=int, default=2000,
                    help="synthetic corpus size when no --input")
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=DEFAULT_BUCKETS)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--salt", type=int, default=DEFAULT_SALT)
    ap.add_argument("--salt-threshold", type=int, default=DEFAULT_SALT_THRESHOLD)
    ap.add_argument("--no-dedup", action="store_true")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--pdf-passwords", default=None,
                    help="comma-separated candidate passwords for "
                         "encrypted PDFs (default: the built-in "
                         "curation sidecar list)")
    args = ap.parse_args()

    from .session import build_session

    spark = build_session(cpus=args.cpus, app_name="cc_extract.job")
    spark.sparkContext.setLogLevel("WARN")
    try:
        token = None
        if args.input_warc:
            from .warc import read_warc_dir
            docs = read_warc_dir(spark, args.input_warc)
            token = f"warc|{args.input_warc}"
        elif args.input:
            docs = spark.read.parquet(args.input)
        else:
            from .corpusgen import corpus_df
            docs = corpus_df(spark, args.n_docs, seed=args.seed)
            token = f"{args.n_docs}|{args.seed}"
        pdf_pw = (tuple(args.pdf_passwords.split(","))
                  if args.pdf_passwords is not None else None)
        stats = run(
            spark, docs, args.out, n_buckets=args.buckets, salt=args.salt,
            salt_threshold=args.salt_threshold, dedup=not args.no_dedup,
            resume=not args.no_resume, input_token=token,
            pdf_passwords=pdf_pw,
        )
        print(f"job stats: {stats}")
        if not stats["skipped"]:
            out = spark.read.parquet(os.path.join(args.out, "extracted"))
            out.groupBy("fmt", "status").count().orderBy(F.desc("count")).show(30)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
