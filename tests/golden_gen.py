"""Regenerate the checked-in golden oracle (SURVEY.md §5.3 step 1).

Single-process, no Spark: runs the shared normative extractors over the
deterministic fixture corpus, applies the keep-newest-crawl dedup, and
writes ``tests/golden/golden_{N}.csv.gz`` with (url, text_sha256, status).

The file is checked in so that any semantic drift in the extractors (which
would silently move oracle and pipeline together, both being the same
code) breaks the diff and must be a deliberate, reviewed regeneration:

    python -m tests.golden_gen
"""

from __future__ import annotations

import csv
import gzip
import hashlib
import os

from cc_extract.corpusgen import gen_corpus
from cc_extract.extractors import extract_document

N_DOCS = 20_000
GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           f"golden_{N_DOCS}.csv.gz")


def golden_rows(n_docs: int = N_DOCS) -> list[tuple[str, str, str]]:
    rows = gen_corpus(n_docs)
    # keep-newest dedup (R3); corpus dups always have strictly later warc_ts
    newest: dict[str, dict] = {}
    for r in rows:
        cur = newest.get(r["url"])
        if cur is None or r["warc_ts"] > cur["warc_ts"]:
            newest[r["url"]] = r
    out = []
    for url in sorted(newest):
        r = newest[url]
        res = extract_document(r["html"], r["url"])
        sha = hashlib.sha256(res["text"].encode("utf-8")).hexdigest()
        out.append((url, sha, res["status"]))
    return out


def main() -> None:
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    rows = golden_rows()
    with gzip.open(GOLDEN_PATH, "wt", newline="") as f:
        w = csv.writer(f)
        w.writerow(["url", "text_sha256", "status"])
        w.writerows(rows)
    print(f"wrote {len(rows)} golden rows -> {GOLDEN_PATH}")


if __name__ == "__main__":
    main()
