"""Similarity search over embedding columns (``embeddings`` table:
vec_id bigint, embedding array<float> (64-d), label int).

Three tiers, mirroring how ANN is actually deployed over 10^12 vectors:

- ``knn_bruteforce`` — exact cosine top-k against a query vector.  The
  correctness baseline; at scale it's the per-partition scan you run
  *inside* a pruned candidate set.
- ``lsh_ann``       — random-hyperplane (sign) LSH: deterministic planes,
  bucket = bit-string of dot-product signs; search only the query's
  bucket.  Bucketing is a pure projection (no shuffle); candidates
  shrink by ~2^n_planes.
- ``ivf_ann``       — IVF coarse quantization over LEARNED cells: a
  deterministic k-means (Lloyd iterations as DataFrame aggs) builds the
  centroid index, then nearest-centroid(s) first, exact search within.
  The probe is a partition-pruned scan at scale.

All math is float64, built from JVM-side functions (zip_with/aggregate —
no Python UDFs), with deterministic constants shared verbatim with the
DuckDB oracles in ``__spark_entry__.py``: planes are seeded-numpy literals
rounded to 6 dp; centroids are rounded to 6 dp *before* use in both
engines so distance comparisons bit-agree.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, functions as F

DIM = 64
N_PLANES = 8
PLANE_SEED = 7
QUERY_SEED = 13
DEFAULT_K = 10


def load_embeddings(spark, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def serving_scan(spark, sf_dir: str) -> DataFrame:
    """The embeddings scan used by the SERVING paths (ANN score+top-k).

    Round 6 (guide §2.5 "input skew — one unsplittable file"): the test
    tables are one parquet file with ONE row group, so Spark's scan is a
    single task and every per-row scoring expression (PQ's 8 argmin
    folds, SQ8's integer ADC, the cosine fold) ran on one core —
    emb_pq_ann measured 3.6 s at sf1.0 with 31 idle cores.  fan_out_scan
    spreads the rows across defaultParallelism first (a no-op whenever
    the scan already has enough splits — any real 100 TB table); the
    one-time shuffle moves the raw vectors once and is trivially cheap
    next to the scoring work it parallelizes (measured 3.585 -> 0.33 s).

    The TRAINING passes (kmeans_centroids, pq_codebooks, sq8_bounds)
    deliberately keep the raw scan: their aggregation results feed
    6-dp-rounded literals shared with the DuckDB oracle, so their
    accumulation order is left exactly as measured in rounds 3-5."""
    from .textops import fan_out_scan

    return fan_out_scan(load_embeddings(spark, sf_dir))


def lsh_planes(n_planes: int = N_PLANES) -> list[list[float]]:
    """Deterministic hyperplanes, rounded so both engines parse identical
    float64 literals.  Planes are drawn sequentially from one seeded
    stream, so ``lsh_planes(n)[:m] == lsh_planes(m)`` — widening the
    signature for the banded near-dup path never perturbs the 8-plane
    ANN bucket index."""
    rng = np.random.RandomState(PLANE_SEED)
    return [[round(float(x), 6) for x in rng.randn(DIM)] for _ in range(n_planes)]


def query_vector() -> list[float]:
    """Deterministic seeded query vector, rounded like the planes.

    A fixed literal (not a row read from the data) so the Spark queries
    and the DuckDB oracle SQL share EXACTLY the same constants at every
    scale factor — reading vec_id=0 from one hardcoded sf path silently
    diverged whenever the contract ran at a different sf."""
    rng = np.random.RandomState(QUERY_SEED)
    return [round(float(x), 6) for x in rng.randn(DIM)]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _lit_vec(v: list[float]):
    return F.array(*[F.lit(float(x)) for x in v])


def _cosine(emb_col, qvec: list[float]):
    qnorm = math.sqrt(sum(x * x for x in qvec))
    e = emb_col.cast("array<double>")
    q = _lit_vec(qvec)
    return _dot(e, q) / (F.sqrt(_dot(e, e)) * F.lit(qnorm))


# --- SQL-string twins of the serving expressions (round 6) -------------
# The serving queries build their scoring expressions as ONE SQL string
# parsed JVM-side (the _cell_expr_sql precedent): assembling a 64-d
# literal vector from py4j Column calls costs ~600 driver round-trips
# per query — measured 0.3-0.6 s of pure DataFrame CONSTRUCTION per
# serving call, comparable to the execution itself after the scan
# fan-out.  The generated text spells the identical zip_with/aggregate
# fold with CAST('<repr>' AS DOUBLE) literals, so the evaluated
# arithmetic (and therefore every result) is bit-identical.

def _vec_sql(v: list[float]) -> str:
    return "array(" + ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in v) + ")"


def _dot_sql(e_sql: str, v_sql: str) -> str:
    return (f"aggregate(zip_with({e_sql}, {v_sql}, (x, y) -> x * y), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")


def _cosine_sql(emb_sql: str, qvec: list[float]) -> str:
    qnorm = math.sqrt(sum(x * x for x in qvec))
    e = f"CAST({emb_sql} AS ARRAY<DOUBLE>)"
    q = _vec_sql(qvec)
    return (f"({_dot_sql(e, q)} / (sqrt({_dot_sql(e, e)}) "
            f"* CAST('{qnorm!r}' AS DOUBLE)))")


def _probed_topk(emb: DataFrame, probe_cond, score, score_name: str,
                 k: int, ascending: bool = False) -> DataFrame:
    """Top-k within a probed subset WITHOUT a pre-exchange filter.

    ``emb.filter(probe_cond)`` looks right but the deterministic probe
    predicate (8x64-dot LSH bucket match, 8-centroid argmin) gets pushed
    below serving_scan's fan-out exchange and evaluated inside the ONE
    scan task the fan-out exists to relieve (measured: the whole filter
    ran single-core).  Instead the membership flag joins the top-k
    ORDERING — (flag DESC, score, vec_id) limit k, then a post-limit
    filter drops any non-member tail rows.  Equivalent by case split: if
    the probed set has >= k rows the top k are all members (flag sorts
    first) in the original (score, vec_id) order; if it has m < k rows,
    the limit returns those m members first and k-m non-members the
    filter removes — exactly the m rows the original returned.  Filters
    never push through Limit, and projections stay above the exchange,
    so every scoring expression runs partition-parallel.  At 10^12
    vectors membership is a partition column and the probe is partition
    pruning (see ivf_ann) — this flag ordering is the test-scale
    stand-in with the identical result."""
    order_score = F.asc(score_name) if ascending else F.desc(score_name)
    return (
        emb.select("vec_id", "label", probe_cond.alias("_probed"),
                   score.alias(score_name))
        .orderBy(F.desc("_probed"), order_score, F.asc("vec_id"))
        .limit(k)
        .filter(F.col("_probed"))
        .select("vec_id", "label", score_name)
    )


def _bucket_expr_sql(emb_sql: str, planes: list[list[float]]) -> str:
    e = f"CAST({emb_sql} AS ARRAY<DOUBLE>)"
    bits = ", ".join(
        f"CASE WHEN {_dot_sql(e, _vec_sql(p))} >= 0 THEN '1' ELSE '0' END"
        for p in planes
    )
    return f"concat({bits})"


def knn_bruteforce(spark, sf_dir: str, k: int = DEFAULT_K) -> DataFrame:
    """Exact cosine top-k: TakeOrderedAndProject over a single projection
    scan — the plan you want (no shuffle, no sort of the full table)."""
    emb = serving_scan(spark, sf_dir)
    q = query_vector()
    scored = emb.select(
        "vec_id", "label",
        F.round(F.expr(_cosine_sql("embedding", q)), 5).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)


def _bucket_expr(emb_col, planes: list[list[float]]):
    e = emb_col.cast("array<double>")
    bits = [
        F.when(_dot(e, _lit_vec(p)) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def lsh_buckets(spark, sf_dir: str) -> DataFrame:
    """Bucket histogram — the data-layout view of the LSH index."""
    emb = load_embeddings(spark, sf_dir)
    planes = lsh_planes()
    return (
        emb.select(_bucket_expr(F.col("embedding"), planes).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"))
        .orderBy("bucket")
    )


def query_bits(q: list[float] | None = None) -> str:
    planes = lsh_planes()
    if q is None:  # only the sentinel substitutes; an empty vector is an error
        q = query_vector()
    return "".join(
        "1" if sum(a * b for a, b in zip(q, p)) >= 0 else "0" for p in planes
    )


def hamming1_buckets(qbits: str) -> list[str]:
    """The multi-probe sequence: query bucket + every Hamming-distance-1
    neighbor (the buckets a near-neighbor most likely fell into when one
    plane's sign flipped)."""
    return [qbits] + [
        qbits[:i] + ("0" if qbits[i] == "1" else "1") + qbits[i + 1:]
        for i in range(len(qbits))
    ]


def lsh_ann(spark, sf_dir: str, k: int = DEFAULT_K) -> DataFrame:
    """ANN: restrict the exact search to the query's LSH bucket.
    Single-probe — cheapest, recall-starved; see lsh_ann_multiprobe."""
    emb = serving_scan(spark, sf_dir)
    planes = lsh_planes()
    q = query_vector()
    return _probed_topk(
        emb,
        F.expr(_bucket_expr_sql("embedding", planes)) == query_bits(q),
        F.round(F.expr(_cosine_sql("embedding", q)), 5),
        "cos_sim", k,
    )


def lsh_ann_multiprobe(spark, sf_dir: str, k: int = DEFAULT_K) -> DataFrame:
    """Production-shaped LSH ANN: probe the query bucket PLUS all
    Hamming-distance-1 buckets (1 + n_planes probes).  Single-probe with 8
    planes inspects ~1/256 of the corpus and routinely returns < k rows;
    multi-probe recovers the recall at ~9/256 inspected — still a
    projection + filter, no shuffle, so the scan stays partition-parallel
    at any corpus size."""
    emb = serving_scan(spark, sf_dir)
    planes = lsh_planes()
    q = query_vector()
    probes = hamming1_buckets(query_bits(q))
    return _probed_topk(
        emb,
        F.expr(_bucket_expr_sql("embedding", planes)).isin(probes),
        F.round(F.expr(_cosine_sql("embedding", q)), 5),
        "cos_sim", k,
    )


N_CELLS = 8
KMEANS_ITERS = 3


def _sqdist(e_col, vec: list[float]):
    return F.aggregate(
        F.zip_with(e_col, _lit_vec(vec), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _cell_expr(e_col, cents: list[list[float]]):
    """argmin cell over literal centroids, ties to the lower cell index
    (array_min on struct(dist, cell) orders lexicographically)."""
    return F.array_min(
        F.array(
            *[
                F.struct(_sqdist(e_col, c).alias("d"), F.lit(i).alias("cell"))
                for i, c in enumerate(cents)
            ]
        )
    )["cell"]


def _cell_expr_sql(e_sql: str, cents: list[list[float]]):
    """The SAME argmin expression as ``_cell_expr`` built as ONE SQL
    string parsed JVM-side (``F.expr``) instead of thousands of py4j
    Column calls — semantically identical (same zip_with/aggregate
    fold, same struct array_min tie-break), but DataFrame construction
    drops from ~2 s to milliseconds for the PQ plans, whose 8 subspace
    argmins otherwise dominate wall time on small inputs.  Literals go
    through CAST('<repr>' AS DOUBLE) so they parse to the exact doubles
    Python holds."""
    def vec(c):
        return "array(" + ", ".join(
            f"CAST('{x!r}' AS DOUBLE)" for x in c) + ")"

    def sqd(c):
        return (f"aggregate(zip_with({e_sql}, {vec(c)}, "
                f"(x, y) -> (x - y) * (x - y)), "
                f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")

    structs = ", ".join(
        f"struct({sqd(c)} AS d, {i} AS cell)" for i, c in enumerate(cents)
    )
    return F.expr(f"array_min(array({structs})).cell")


_kmeans_cache: dict[str, list[list[float]]] = {}


def kmeans_centroids(spark, sf_dir: str, iters: int = KMEANS_ITERS) -> list[list[float]]:
    """LEARNED IVF cells: ``N_CELLS``-means via *iters* Lloyd iterations,
    entirely as DataFrame aggs (r3 verdict "missing" #3 — the per-label
    centroid stand-in is gone).

    - init: the embeddings of the ``N_CELLS`` vec_ids that sort first by
      ``md5(cast(vec_id as string))`` — a deterministic pseudo-random,
      label-free sample both engines express identically.
    - assign: in-row argmin over the broadcast (literal) centroids — a
      projection, no shuffle.
    - update: posexplode -> groupBy(cell, pos).avg, rounded to 6 dp so
      both engines feed bit-identical centroids into the next iteration;
      an emptied cell keeps its previous centroid.

    Each update is one partial-aggregable shuffle of N_CELLS x DIM rows;
    the driver holds only the centroids (the index, not the data).  At
    10^12 vectors this is the standard IVF build: sample-then-iterate,
    then persist the assignment as a partition column."""
    key = f"{sf_dir}|{iters}"
    if key in _kmeans_cache:
        return _kmeans_cache[key]
    emb = (
        load_embeddings(spark, sf_dir)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .persist()
    )
    seeds = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(N_CELLS)
        .collect()
    )
    cents = [[float(x) for x in r["e"]] for r in seeds]
    for _ in range(iters):
        upd = (
            emb.select(_cell_expr_sql("e", cents).alias("cell"), "e")
            .select("cell", F.posexplode("e").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg("v"), 6).alias("c"))
            .collect()
        )
        new: dict[int, list[float]] = {}
        for r in upd:
            new.setdefault(r["cell"], [0.0] * DIM)[r["pos"]] = r["c"]
        cents = [new.get(i, cents[i]) for i in range(N_CELLS)]
    emb.unpersist()
    _kmeans_cache[key] = cents
    return cents


def ivf_ann(spark, sf_dir: str, k: int = DEFAULT_K, nprobe: int = 1) -> DataFrame:
    """IVF ANN over LEARNED k-means cells: *nprobe* nearest centroids to
    the query, exact cosine within their members.  Cell membership is the
    same argmin-vs-final-centroids projection as the index build (no
    stored column at test scale; at 10^12 vectors you materialize it as a
    partition column at build time and the probe becomes partition
    pruning).  nprobe is the standard recall/cost dial (measured by
    emb_ann_recall)."""
    q = query_vector()
    cents = kmeans_centroids(spark, sf_dir)
    probe_cells = sorted(
        range(N_CELLS),
        key=lambda i: (sum((a - b) ** 2 for a, b in zip(cents[i], q)), i),
    )[:nprobe]
    return _probed_topk(
        serving_scan(spark, sf_dir),
        _cell_expr_sql("CAST(embedding AS ARRAY<DOUBLE>)",
                       cents).isin(probe_cells),
        F.round(F.expr(_cosine_sql("embedding", q)), 5),
        "cos_sim", k,
    )


def cosine_near_dup_pairs(spark, sf_dir: str, threshold: float = 0.4) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: exact all-pairs baseline.

    O(n^2) by construction — this is the ground-truth oracle for the
    LSH/IVF paths above, exactly like ngram_jaccard_pairs is for
    MinHash-LSH; at 10^12 vectors you run it only within LSH buckets /
    IVF cells, never globally."""
    emb = load_embeddings(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    a = emb.alias("a")
    b = emb.alias("b")
    pair = a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
    cos = F.round(
        _dot(F.col("a.e"), F.col("b.e"))
        / (F.sqrt(_dot(F.col("a.e"), F.col("a.e")))
           * F.sqrt(_dot(F.col("b.e"), F.col("b.e")))),
        5,
    )
    return (
        pair.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


LSH_ND_BANDS = 4
LSH_ND_BAND_BITS = 4


def lsh_near_dup_pairs(
    spark,
    sf_dir: str,
    threshold: float = 0.4,
    bands: int = LSH_ND_BANDS,
    band_bits: int = LSH_ND_BAND_BITS,
) -> DataFrame:
    """Embedding near-duplicate pairs, the SCALE path: banded sign-LSH
    candidate generation (default 4 bands x 4 planes over a 16-bit
    signature — candidates share any band's key, the minhash-banding
    trick applied to hyperplane bits) followed by exact cosine
    verification on the candidate pairs only — the same
    candidate->verify recipe as ``lsh_verified_near_dups`` on text.
    ``cosine_near_dup_pairs`` is this query's exact-all-pairs ground
    truth; ``lsh_near_dup_recall`` measures this operator's recall at
    three (bands x bits) operating points.

    Verification makes false positives impossible, so recall (missed
    pairs) is the only error.  On this corpus the >=0.4 pairs are the
    tail of the random-cosine distribution (0.40-0.51, no planted
    dups), the hardest case for sign-LSH: per-plane agreement at
    cos 0.4 is ~0.63, so a 4-bit band collides with p~0.16 and 4 bands
    give measured recall ~0.5 at ~4/16 of all pairs inspected.  There
    is no free recall on unclusterable data (same finding as IVF);
    on real corpora near-dups sit at cos >= 0.9 where the same config
    collides with p~0.97 per band.

    100 TB plan shape: the band self-join is an equi-join on (band,
    key) — a signature-sized shuffle, never all-pairs; the verify joins
    fetch vectors for candidate ids only.  At 10^12 vectors the band
    key becomes a partition column of a stored signature table and
    recall is dialed with more bands / fewer bits per band."""
    emb = load_embeddings(spark, sf_dir)
    planes = lsh_planes(bands * band_bits)
    sig = emb.select(
        "vec_id", _bucket_expr(F.col("embedding"), planes).alias("bits")
    )
    bands_df = sig.select(
        "vec_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.substring(
                        "bits", 1 + b * band_bits, band_bits
                    ).alias("key"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("vec_id", "bk.band", "bk.key")
    a, b = bands_df.alias("a"), bands_df.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        .distinct()
    )
    ea = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").cast("array<double>").alias("ea"),
    )
    eb = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").cast("array<double>").alias("eb"),
    )
    j = cand.join(ea, "vec_a").join(eb, "vec_b")
    cos = F.round(
        _dot(F.col("ea"), F.col("eb"))
        / (F.sqrt(_dot(F.col("ea"), F.col("ea")))
           * F.sqrt(_dot(F.col("eb"), F.col("eb")))),
        5,
    )
    return (
        j.select("vec_a", "vec_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


# (name, bands, bits/band, expected candidate fraction on uniform buckets)
ND_CONFIGS = [
    ("band2x4", 2, 4, "2/16 of pairs"),
    ("band4x4", 4, 4, "4/16 of pairs"),
    ("band8x4", 8, 4, "8/16 of pairs"),
]


def lsh_near_dup_recall(spark, sf_dir: str, threshold: float = 0.4) -> DataFrame:
    """Pair-level recall of the banded near-dup path at three
    (bands x bits) operating points, against the exact all-pairs truth
    — the recall-vs-cost frontier for ``lsh_near_dup_pairs``, mirroring
    ``ann_recall`` for the top-k paths.  Verification means every found
    pair is a true pair (found ⊆ truth at the same threshold/rounding),
    so recall = n_found / n_true.  Measured at sf0.01 on the 0.40-0.51
    random-tail pairs: 0.27 / 0.53 / 0.78 at 2/4/8 bands of 4 bits —
    each doubling of bands buys ~2x recall for ~2x candidate cost on
    this worst-case-isotropic corpus.  The truth subplan is the ONE
    documented-quadratic baseline; the measured paths are all banded
    equi-joins."""
    truth = cosine_near_dup_pairs(spark, sf_dir, threshold).agg(
        F.count("*").alias("n_true")
    )
    parts = None
    for name, bands, bits, cost in ND_CONFIGS:
        n = lsh_near_dup_pairs(
            spark, sf_dir, threshold, bands=bands, band_bits=bits
        ).agg(F.count("*").alias("n_pairs"))
        part = n.select(
            F.lit(name).alias("method"), F.lit(cost).alias("cost"), "n_pairs"
        )
        parts = part if parts is None else parts.unionByName(part)
    return (
        parts.crossJoin(truth)
        .select(
            "method",
            "cost",
            "n_pairs",
            "n_true",
            F.round(F.col("n_pairs") / F.col("n_true"), 4).alias("recall"),
        )
        .orderBy("method")
    )


def ann_recall(spark, sf_dir: str, k: int = DEFAULT_K) -> DataFrame:
    """recall@k of every approximate path measured against the exact
    brute-force top-k — the number (not a vibe) that justifies shipping an
    ANN index: |approx top-k ∩ exact top-k| / k per method, with each
    method's statically-known probe cost alongside (the recall-vs-cost
    frontier, round 5).  Reported for single-probe LSH (the baseline
    multiprobe must beat), multiprobe LSH, IVF at nprobe 1-4 (the
    recall/cost dial: measured 0.4 / 0.6 / 0.6 / 0.8 at sf0.01 — these
    embeddings are near-isotropic, so reaching 0.8 honestly costs half
    the cells; easy-to-cluster data would get there at nprobe 1-2), and
    PQ asymmetric distance (the memory/recall trade).

    Both the truth set and each candidate set are k rows, so the joins
    are trivially broadcast; the expensive part is the underlying scans,
    which each method already bounds (multiprobe: bucket filter; IVF:
    cell filter).  The method dimension is left-joined so a method with
    zero overlap still reports recall 0.0 instead of vanishing."""
    truth = knn_bruteforce(spark, sf_dir, k).select("vec_id")
    tagged = [
        ("lsh_single", "1 of 2^8 buckets", lsh_ann(spark, sf_dir, k)),
        ("lsh_multiprobe", "9 of 2^8 buckets",
         lsh_ann_multiprobe(spark, sf_dir, k)),
        ("ivf_nprobe1", "1 of 8 cells", ivf_ann(spark, sf_dir, k, nprobe=1)),
        ("ivf_nprobe2", "2 of 8 cells", ivf_ann(spark, sf_dir, k, nprobe=2)),
        ("ivf_nprobe3", "3 of 8 cells", ivf_ann(spark, sf_dir, k, nprobe=3)),
        ("ivf_nprobe4", "4 of 8 cells", ivf_ann(spark, sf_dir, k, nprobe=4)),
        ("pq_adc", "all codes (ADC)", pq_ann(spark, sf_dir, k)),
        ("ivf_pq", "2 of 8 cells (ADC)",
         ivf_pq_ann(spark, sf_dir, k, nprobe=2)),
        ("sq8_adc", "all codes (int8 ADC)", sq8_ann(spark, sf_dir, k)),
    ]
    cands = None
    for name, _cost, df in tagged:
        part = df.select(F.lit(name).alias("method"), "vec_id")
        cands = part if cands is None else cands.unionByName(part)
    hits = cands.join(truth, "vec_id").groupBy("method").agg(
        F.count("*").alias("n_hits")
    )
    methods = spark.createDataFrame(
        [(name, cost) for name, cost, _ in tagged], "method string, cost string"
    )
    return (
        methods.join(hits, "method", "left")
        .select(
            "method",
            F.lit(k).alias("k"),
            "cost",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.round(F.coalesce("n_hits", F.lit(0)) / F.lit(k), 4).alias("recall"),
        )
        .orderBy("method")
    )


# ---------------------------------------------------- product quantization

PQ_M = 8                 # subspaces
PQ_SUB = DIM // PQ_M     # 8 dims each
PQ_K = 8                 # codewords per subspace (3-bit codes)
PQ_ITERS = 2
# measured at sf0.01: (M=8, K=8) recall@10 = 0.4 vs 0.2 for (M=4, K=8)
# at the same total codebook budget — finer subspaces beat more
# codewords here, the standard PQ finding

_pq_cache: dict[str, list[list[list[float]]]] = {}


def _sub(e_col, m: int):
    return F.slice(e_col, m * PQ_SUB + 1, PQ_SUB)


def pq_codebooks(spark, sf_dir: str,
                 iters: int = PQ_ITERS) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jégou et al., TPAMI'11): an
    independent ``PQ_K``-means per 16-d subspace, trained with the same
    deterministic Lloyd-as-DataFrame-aggs recipe as the IVF cells
    (md5-ordered seeds shared across subspaces, per-iteration 6 dp
    rounding so both engines stay in bit-lockstep, emptied codewords
    keep their previous value).  books[m][j] is codeword j of subspace
    m.  At 10^12 vectors this is the standard memory story: 64 floats
    -> PQ_M small codes, the codebook itself is O(PQ_M x PQ_K x PQ_SUB)
    driver-side constants."""
    key = f"{sf_dir}|{iters}"
    if key in _pq_cache:
        return _pq_cache[key]
    emb = (
        load_embeddings(spark, sf_dir)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .persist()
    )
    seeds = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(PQ_K)
        .collect()
    )
    books: list[list[list[float]]] = []
    for m in range(PQ_M):
        cents = [
            [float(x) for x in r["e"][m * PQ_SUB:(m + 1) * PQ_SUB]]
            for r in seeds
        ]
        for _ in range(iters):
            upd = (
                emb.select(
                    _cell_expr_sql(f"slice(e, {m * PQ_SUB + 1}, {PQ_SUB})",
                                   cents).alias("cell"),
                    _sub(F.col("e"), m).alias("s"),
                )
                .select("cell", F.posexplode("s").alias("pos", "v"))
                .groupBy("cell", "pos")
                .agg(F.round(F.avg("v"), 6).alias("c"))
                .collect()
            )
            new: dict[int, list[float]] = {}
            for r in upd:
                new.setdefault(r["cell"], [0.0] * PQ_SUB)[r["pos"]] = r["c"]
            cents = [new.get(i, cents[i]) for i in range(PQ_K)]
        books.append(cents)
    emb.unpersist()
    _pq_cache[key] = books
    return books


def pq_ann(spark, sf_dir: str, k: int = DEFAULT_K) -> DataFrame:
    """PQ asymmetric-distance ANN: encode every vector as PQ_M argmin
    codes (in-row projection against the literal codebooks — the stored
    representation at scale is just these codes), precompute the
    query-to-codeword distance table driver-side (PQ_M x PQ_K literals,
    6 dp — injected verbatim into BOTH engines so the ADC sum is exact
    literal arithmetic), and rank by the table-lookup sum.  No shuffle
    at all until the top-k (TakeOrderedAndProject): the classic
    scan-speed/memory trade every 10^12-vector serving stack makes.
    Approximation quality is measured (emb_ann_recall)."""
    q = query_vector()
    books = pq_codebooks(spark, sf_dir)
    tables = [
        [
            round(
                sum(
                    (q[m * PQ_SUB + i] - books[m][j][i]) ** 2
                    for i in range(PQ_SUB)
                ),
                6,
            )
            for j in range(PQ_K)
        ]
        for m in range(PQ_M)
    ]
    adc = None
    for m in range(PQ_M):
        lookup = F.element_at(
            F.array(*[F.lit(t) for t in tables[m]]),
            (_cell_expr_sql(
                f"slice(CAST(embedding AS ARRAY<DOUBLE>), "
                f"{m * PQ_SUB + 1}, {PQ_SUB})", books[m]) + 1).cast("int"),
        )
        adc = lookup if adc is None else adc + lookup
    return (
        serving_scan(spark, sf_dir)
        .select("vec_id", "label", F.round(adc, 6).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_pq_ann(spark, sf_dir: str, k: int = DEFAULT_K,
               nprobe: int = 2) -> DataFrame:
    """IVF+PQ — the composed architecture every 10^12-vector serving
    stack actually deploys (the faiss `IVFx,PQy` index): the IVF coarse
    quantizer prunes to *nprobe* cells (partition pruning at scale),
    then PQ asymmetric distance ranks WITHIN the probed cells from
    codes alone.  Both stages reuse the already-trained deterministic
    indexes (kmeans_centroids, pq_codebooks) — composing them adds zero
    new training.

    Scale shape: the cell filter is the ivf_ann projection (a partition
    filter once membership is materialized); ADC is the pq_ann
    table-lookup sum; the only ordering cost is TakeOrderedAndProject
    over the probed fraction of the corpus."""
    q = query_vector()
    cents = kmeans_centroids(spark, sf_dir)
    probe_cells = sorted(
        range(N_CELLS),
        key=lambda i: (sum((a - b) ** 2 for a, b in zip(cents[i], q)), i),
    )[:nprobe]
    books = pq_codebooks(spark, sf_dir)
    tables = [
        [
            round(
                sum(
                    (q[m * PQ_SUB + i] - books[m][j][i]) ** 2
                    for i in range(PQ_SUB)
                ),
                6,
            )
            for j in range(PQ_K)
        ]
        for m in range(PQ_M)
    ]
    adc = None
    for m in range(PQ_M):
        lookup = F.element_at(
            F.array(*[F.lit(t) for t in tables[m]]),
            (_cell_expr_sql(
                f"slice(CAST(embedding AS ARRAY<DOUBLE>), "
                f"{m * PQ_SUB + 1}, {PQ_SUB})", books[m]) + 1).cast("int"),
        )
        adc = lookup if adc is None else adc + lookup
    return _probed_topk(
        serving_scan(spark, sf_dir),
        _cell_expr_sql("CAST(embedding AS ARRAY<DOUBLE>)",
                       cents).isin(probe_cells),
        F.round(adc, 6),
        "adc_dist", k, ascending=True,
    )


SEMDEDUP_EPS = 0.4


def semdedup(spark, sf_dir: str, eps: float = SEMDEDUP_EPS) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means clustering + within-cluster cosine pruning.
    Returns every vector with its cell, centroid similarity and the
    keep/drop decision — the full audit relation, not just survivors.

    The paper's rule, made deterministic and relational:

    - cluster with the SAME learned k-means index the IVF path trains
      (``kmeans_centroids`` — md5-seeded, Lloyd iterations as DataFrame
      aggs, centroids rounded to 6 dp in both engines);
    - within each cell, order members by cosine-to-centroid ASCENDING
      (ties by vec_id) — SemDeDup keeps the LOW-centroid-similarity
      "outlier" representative of each duplicate group and drops the
      redundant near-centroid points;
    - drop a vector iff some lower-ranked member of its OWN cell has
      pairwise cosine >= ``eps`` (rounded to 5 dp, the repo-wide pair
      discipline).  One pass, no iteration: the rule is a triangular
      EXISTS, exactly the paper's upper-triangular similarity-matrix
      sweep.

    Scale shape: all pairwise work is WITHIN cells — that is SemDeDup's
    whole point (O(n^2/k) vs the whitelisted-quadratic
    ``cosine_near_dup_pairs`` baseline).  The self-join is an equi-join
    on cell (hash-partitionable, never CartesianProduct); at 10^12
    vectors k grows so cells stay ~10^5 vectors and membership is a
    partition column, making each cell's sweep a partition-local job.
    Centroid similarity is a pure projection against literal centroids
    (no shuffle); the decision join shuffles only (cell, rank, 64-dim)
    rows."""
    cents = kmeans_centroids(spark, sf_dir)
    cent_lits = ", ".join(
        "array(" + ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in c) + ")"
        for c in cents
    )
    cent_norms = ", ".join(
        f"CAST('{math.sqrt(sum(x * x for x in c))!r}' AS DOUBLE)"
        for c in cents
    )
    csim = F.expr(
        f"round(aggregate(zip_with(e, element_at(array({cent_lits}), "
        f"cell + 1), (x, y) -> x * y), CAST(0.0 AS DOUBLE), "
        f"(acc, v) -> acc + v) / (sqrt(aggregate(zip_with(e, e, "
        f"(x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)) "
        f"* element_at(array({cent_norms}), cell + 1)), 6)"
    )
    from pyspark.sql import Window

    emb = (
        load_embeddings(spark, sf_dir)
        .select("vec_id",
                F.col("embedding").cast("array<double>").alias("e"))
        .withColumn("cell", _cell_expr_sql("e", cents))
        .withColumn("centroid_sim", csim)
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("cell")
                .orderBy(F.asc("centroid_sim"), F.asc("vec_id"))),
        )
    )
    a, b = emb.alias("a"), emb.alias("b")
    pair_cos = F.round(
        _dot(F.col("a.e"), F.col("b.e"))
        / (F.sqrt(_dot(F.col("a.e"), F.col("a.e")))
           * F.sqrt(_dot(F.col("b.e"), F.col("b.e")))),
        5,
    )
    dropped = (
        a.join(b, (F.col("a.cell") == F.col("b.cell"))
               & (F.col("a.rnk") < F.col("b.rnk")))
        .filter(pair_cos >= F.lit(float(eps)))
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
    )
    return (
        emb.join(dropped.withColumn("is_dropped", F.lit(True)),
                 "vec_id", "left")
        .select(
            "vec_id", "cell", "centroid_sim",
            F.coalesce(~F.col("is_dropped"), F.lit(True)).alias("kept"),
        )
        .orderBy("vec_id")
    )


# --------------------------------------------------- power-iteration PCA

POWER_ITERS = 4
_pc_cache: dict[str, list[float]] = {}


def power_iteration_pc(spark, sf_dir: str,
                       iters: int = POWER_ITERS) -> list[float]:
    """Top principal direction of the (uncentered) embedding Gram matrix
    via *iters* power iterations, entirely as DataFrame aggregations —
    the whitening / spectral-dedup primitive an embedding pipeline runs
    before ANN (dominant-direction removal is the standard fix for
    anisotropic embedding collapse).

    Cross-engine lockstep (the k-means + q9 disciplines combined):

    - EVERY accumulation — the per-row dot x_i . v AND the cross-row
      w_j = sum_i x_ij * dot_i — sums addends that are rounded to 9 dp
      then CAST to DECIMAL(38,12), so every sum is EXACT and
      order-insensitive: no float-addition-order hazard anywhere, in
      either engine (the q9 ADVICE fix, applied from the start; no
      reliance on fold order inside list_inner_product/F.aggregate);
    - normalization: v' = round(w / w[argmax |w|], 6) — the division and
      round are evaluated BY THE ENGINE on both sides (a 1-row literal
      select on the Spark path), never by Python, so the 6-dp values
      that feed the next iteration are bit-identical.

    The driver holds only v (64 doubles — the model, not the data); each
    iteration is one in-row projection + one partial-aggregable
    posexplode groupBy of DIM keys.  At 10^12 vectors this is the
    textbook distributed power method: O(iters) passes, O(DIM) state."""
    key = f"{sf_dir}|{iters}|{spark.sparkContext.applicationId}"
    if key in _pc_cache:
        return _pc_cache[key]
    emb = (
        load_embeddings(spark, sf_dir)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .persist()
    )
    ex = emb.select("vec_id", F.posexplode("e").alias("pos", "x")).persist()
    v = [1.0] + [0.0] * (DIM - 1)
    for _ in range(iters):
        vj = F.element_at(_lit_vec(v), F.col("pos") + 1)
        dots = (
            ex.select("vec_id",
                      F.round(F.col("x") * vj, 9)
                      .cast("decimal(38,12)").alias("p"))
            .groupBy("vec_id")
            .agg(F.sum("p").alias("dotd"))
        )
        rows = (
            ex.join(dots, "vec_id")
            .groupBy("pos")
            .agg(F.sum(F.round(F.col("x") * F.col("dotd").cast("double"), 9)
                       .cast("decimal(38,12)")).alias("w"))
            .collect()
        )
        byp = {r["pos"]: r["w"] for r in rows}
        ws = [byp.get(p) for p in range(DIM)]
        # argmax |w|, smallest pos on ties — the same total order the
        # oracle's ORDER BY abs(w) DESC, pos LIMIT 1 applies
        pm = sorted(range(DIM),
                    key=lambda p: (-abs(float(ws[p] or 0)), p))[0]
        wm = float(ws[pm])
        # engine-side divide+round (1-row literal select): Python never
        # rounds, so HALF_UP semantics match the oracle's round() exactly
        vrow = spark.range(1).select(*[
            F.round(F.lit(float(ws[p] or 0)) / F.lit(wm), 6).alias(f"c{p}")
            for p in range(DIM)
        ]).first()
        v = [float(vrow[f"c{p}"]) for p in range(DIM)]
    ex.unpersist()
    emb.unpersist()
    _pc_cache[key] = v
    return v


def top_pc_scores(spark, sf_dir: str) -> DataFrame:
    """Per-vector projection onto the power-iteration top principal
    direction: (vec_id, label, pc1_score) — the column a spectral-dedup
    or all-but-the-top whitening pass consumes.  The learned direction
    enters as 6-dp literals (the ivf_ann pattern: the model is literals,
    the query is a real pruned scan); the oracle re-derives the SAME
    iterations as chained CTEs and scores identically."""
    v = power_iteration_pc(spark, sf_dir)
    emb = load_embeddings(spark, sf_dir)
    ex = emb.select(
        "vec_id", "label",
        F.posexplode(F.col("embedding").cast("array<double>"))
        .alias("pos", "x"),
    )
    vj = F.element_at(_lit_vec(v), F.col("pos") + 1)
    return (
        ex.select("vec_id", "label",
                  F.round(F.col("x") * vj, 9)
                  .cast("decimal(38,12)").alias("p"))
        .groupBy("vec_id", "label")
        .agg(F.round(F.sum("p").cast("double"), 6).alias("pc1_score"))
        .orderBy("vec_id")
    )


def pc_residual_norms(spark, sf_dir: str) -> DataFrame:
    """All-but-the-top whitening diagnostic: per-vector projection onto
    the learned top principal direction AND the norm of what remains
    after removing it — the table that tells an embedding pipeline how
    anisotropic its space is (a dominant direction carrying most of the
    norm is the classic embedding-collapse signature; removal is the
    standard pre-ANN fix).

    Same lockstep discipline as power_iteration_pc: the projection and
    the residual sum-of-squares both accumulate 9-dp-rounded addends as
    DECIMAL(38,12) (exact, order-insensitive); the residual coordinates
    x_j - p*v_j are single IEEE ops on identical inputs; sqrt/round run
    in-engine on both sides.  Shapes: two partial-aggregable groupBys
    over the exploded relation + one equi-join — O(n x DIM), no window,
    no all-pairs."""
    v = power_iteration_pc(spark, sf_dir)
    emb = load_embeddings(spark, sf_dir)
    ex = emb.select(
        "vec_id", "label",
        F.posexplode(F.col("embedding").cast("array<double>"))
        .alias("pos", "x"),
    )
    vj = F.element_at(_lit_vec(v), F.col("pos") + 1)
    proj = (
        ex.select("vec_id",
                  F.round(F.col("x") * vj, 9)
                  .cast("decimal(38,12)").alias("p"))
        .groupBy("vec_id")
        .agg(F.sum("p").alias("pd"))
    )
    r = ex.join(proj, "vec_id").select(
        "vec_id", "label", "pd",
        F.round(F.col("x") - F.col("pd").cast("double") * vj, 9).alias("rx"),
    )
    return (
        r.select("vec_id", "label", "pd",
                 F.round(F.col("rx") * F.col("rx"), 9)
                 .cast("decimal(38,12)").alias("rx2"))
        .groupBy("vec_id", "label", "pd")
        .agg(F.sum("rx2").alias("rn2"))
        .select(
            "vec_id", "label",
            F.round(F.col("pd").cast("double"), 6).alias("pc1_score"),
            F.round(F.sqrt(F.col("rn2").cast("double")), 6)
            .alias("residual_norm"),
        )
        .orderBy("vec_id")
    )


# ------------------------------------------------- int8 scalar quantization

SQ8_LEVELS = 255

_sq8_cache: dict[str, tuple[list[float], list[float]]] = {}


def sq8_bounds(spark, sf_dir: str) -> tuple[list[float], list[float]]:
    """Learned per-dimension (min, span) for the SQ8 codec, rounded to
    6 dp so both engines parse identical float64 literals (min/max are
    exact — no summation — so the values bit-agree by construction).
    One posexplode + 64-group partial-aggregable groupBy, collected as
    a 64x2 sketch: this is the 'train the quantizer' pass, amortized
    once per corpus — at 10^12 vectors it is a map-side-combined agg
    whose reduce side is 64 rows."""
    key = f"{sf_dir}|{spark.sparkContext.applicationId}"
    if key in _sq8_cache:
        return _sq8_cache[key]
    rows = (
        load_embeddings(spark, sf_dir)
        .select(F.posexplode(F.col("embedding").cast("array<double>"))
                .alias("pos", "v"))
        .groupBy("pos")
        .agg(F.round(F.min("v"), 6).alias("mn"),
             F.round(F.max("v"), 6).alias("mx"))
        .collect()
    )
    mn = [0.0] * DIM
    span = [0.0] * DIM
    for r in rows:
        mn[r["pos"]] = r["mn"]
        span[r["pos"]] = r["mx"] - r["mn"]   # IEEE sub of identical doubles
    _sq8_cache[key] = (mn, span)
    return mn, span


def _sq8_quantize(e_col, mn: list[float], span: list[float]):
    """array<double> -> array<bigint> codes in [0, 255]: per element
    floor((v - mn) / span * 255 + 0.5), clamped.  Single IEEE ops on
    identical inputs in both engines (the oracle spells the identical
    expression), so codes are EXACT cross-engine — everything downstream
    is integer arithmetic, order-insensitive by construction."""
    d = F.zip_with(e_col.cast("array<double>"), _lit_vec(mn),
                   lambda v, m: v - m)
    q = F.zip_with(d, _lit_vec(span),
                   lambda x, s: F.floor(x / s * SQ8_LEVELS + 0.5))
    return F.transform(
        q, lambda c: F.greatest(F.lit(0).cast("bigint"),
                                F.least(F.lit(255).cast("bigint"),
                                        c.cast("bigint"))))


SQ8_Q_SCALE = 10_000_000


def sq8_query_ints(mn: list[float], span: list[float]) -> list[int]:
    """Span-scaled integer query for asymmetric (ADC) scoring: the
    candidate side is 8-bit codes, the query side keeps ~23 bits.
    qint_i = floor(span_i * (q_i / |q|) * 1e7 + 0.5), so
    sum(code_i * qint_i) = 1e7*255 * (sum_i v~_i * qn_i - const) where
    v~ is the dequantized vector and the constant (sum mn_i qn_i) is
    candidate-independent — ranking by the integer score IS ranking by
    the dequantized dot.  Quantizing the query itself to 8 bits with
    the DATA's bounds would clip it (the corpus vectors are unit-norm,
    the raw query is not) — measured recall 0.3 vs 1.0 for ADC."""
    q = query_vector()
    qnorm = math.sqrt(sum(x * x for x in q))
    return [int(math.floor(s * (x / qnorm) * SQ8_Q_SCALE + 0.5))
            for x, s in zip(q, span)]


def sq8_ann(spark, sf_dir: str, k: int = DEFAULT_K) -> DataFrame:
    """ANN over int8 scalar-quantized vectors — the 4x-memory tier every
    production vector index ships below float32: store 64 uint8 codes
    per vector, score ASYMMETRICALLY (ADC, the Faiss SQ8/IVF-ADC
    convention): exact int64 dot of the codes against the span-scaled
    integer query (|score| <= 64*255*|qint| < 2^38 — no overflow, no
    float summation, order-insensitive cross-engine by construction).

    Plan: tiny learned sketch (sq8_bounds) -> map-only projection with
    whole-stage-codegen integer math -> TakeOrderedAndProject.  No
    shuffle, no Python in the scoring path, and at 10^12 vectors the
    scan reads 64 B/vector instead of 256 B."""
    mn, span = sq8_bounds(spark, sf_dir)
    qi = sq8_query_ints(mn, span)
    emb = serving_scan(spark, sf_dir)
    # one-shot SQL twin of _sq8_quantize + the integer ADC fold (same
    # construction-cost rationale as _cosine_sql; arithmetic identical)
    d = f"zip_with(CAST(embedding AS ARRAY<DOUBLE>), {_vec_sql(mn)}, (v, m) -> v - m)"
    qarr = (f"zip_with({d}, {_vec_sql(span)}, "
            f"(x, s) -> floor(x / s * {SQ8_LEVELS} + CAST('0.5' AS DOUBLE)))")
    codes = (f"transform({qarr}, c -> greatest(CAST(0 AS BIGINT), "
             f"least(CAST(255 AS BIGINT), CAST(c AS BIGINT))))")
    qints = "array(" + ", ".join(f"CAST({c} AS BIGINT)" for c in qi) + ")"
    adc = (f"aggregate(zip_with({codes}, {qints}, (a, b) -> a * b), "
           f"CAST(0 AS BIGINT), (acc, v) -> acc + v)")
    scored = emb.select("vec_id", "label", F.expr(adc).alias("adc_dot"))
    return scored.orderBy(F.desc("adc_dot"), F.asc("vec_id")).limit(k)


def sq8_recall(spark, sf_dir: str, k: int = DEFAULT_K) -> DataFrame:
    """recall@k of the SQ8 integer-dot ranking against the exact cosine
    top-k, plus the codec's exact reconstruction-error budget: max |v -
    dequant(code)| is bounded by span/510 per dimension, and the
    reported max_q_err (integer, in half-step units scaled by 10^6)
    pins that the clamp never engaged (codes 0 and 255 only at true
    extremes).  Both sides are k-row relations joined broadcast-style;
    the only scans are the two bounded top-k passes."""
    truth = knn_bruteforce(spark, sf_dir, k).select("vec_id")
    approx = sq8_ann(spark, sf_dir, k).select("vec_id")
    mn, span = sq8_bounds(spark, sf_dir)
    # floor(x + 0.5), NOT round(): Python round() is banker's, SQL round
    # is half-up — floor sidesteps the tie convention on both engines.
    max_half_step = max(s / (2 * SQ8_LEVELS) for s in span)
    max_q_err = int(math.floor(max_half_step * 1_000_000 + 0.5))
    return (
        approx.join(truth, "vec_id")
        .agg(F.count("*").alias("n_hits"))
        .select(
            F.lit("sq8_dot").alias("method"),
            F.lit(k).alias("k"),
            F.col("n_hits"),
            F.round(F.col("n_hits") / F.lit(k), 4).alias("recall"),
            F.lit(max_q_err).cast("bigint").alias("max_q_err_1e6"),
        )
    )


def ivf_cell_balance(spark, sf_dir: str) -> DataFrame:
    """IVF index-balance diagnostic: per learned cell, member count and
    the share of the corpus it holds, plus the imbalance factor
    (share x n_cells — 1.0 = perfectly balanced).  The table an ANN
    operator reads before trusting nprobe cost estimates: a hot cell
    means probes that hit it scan far more than corpus/n_cells vectors
    (the IVF equivalent of partition skew), and re-training or
    splitting is the fix.  One argmin projection (identical to the
    ivf_ann membership rule) + a partial-aggregable groupBy on
    N_CELLS keys."""
    from pyspark.sql import Window

    cents = kmeans_centroids(spark, sf_dir)
    emb = load_embeddings(spark, sf_dir)
    member = emb.select(
        _cell_expr_sql("CAST(embedding AS ARRAY<DOUBLE>)", cents)
        .alias("cell")
    )
    w_all = Window.partitionBy()
    return (
        member.groupBy("cell")
        .agg(F.count("*").alias("n_vecs"))
        .withColumn("total", F.sum("n_vecs").over(w_all))
        .select(
            "cell", "n_vecs",
            F.round(F.col("n_vecs").cast("double") / F.col("total"), 6)
            .alias("share"),
            F.round(F.col("n_vecs").cast("double") / F.col("total")
                    * F.lit(float(N_CELLS)), 6).alias("imbalance"),
        )
        .orderBy("cell")
    )
