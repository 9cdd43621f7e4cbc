"""cc_extract — a from-scratch, PySpark-native web-text extraction engine.

Re-expresses the capabilities of the public serverless project
``skylander86/lambda-text-extractor`` (per-document format-sniffed
document→text extraction; see SURVEY.md §0.2) as an idiomatic Spark batch
pipeline over Common-Crawl-style tables:

- ``cc_extract.extractors``  — pure-Python scalar ``bytes -> str`` extractors
  (SURVEY.md §2.3/§2.4).  Shared verbatim by the single-process oracle and
  the Arrow-vectorized pandas UDFs, so byte-identity is by construction.
- ``cc_extract.sniff``       — MIME / magic-byte format dispatch (§2.2).
- ``cc_extract.corpusgen``   — deterministic synthetic corpus (FIXTURES.md).
- ``cc_extract.job``         — the Spark pipeline: dedup → salted bucketing →
  vectorized extraction → partitioned output (§3.4, §4).
- ``cc_extract.manifest``    — per-bucket completion manifests, idempotent
  resume, lineage + metrics (§2.6).
- ``cc_extract.textops``     — training-data text operators over the
  ``documents`` table: dedup (exact / MinHash-LSH / SimHash / n-gram
  Jaccard), language-ID, quality scoring, token counting, fingerprinting.
- ``cc_extract.embedops``    — similarity search over embedding columns
  (brute-force cosine top-k + LSH-bucketed ANN).
- ``cc_extract.multimodal``  — opaque-binary multimodal column plumbing.

The package is pure Python (stdlib + numpy/pandas), zip-able for
``spark-submit --py-files`` [D: BASELINE.json north_star].
"""

__version__ = "0.1.0"
