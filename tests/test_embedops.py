"""Embedding near-dup scale-path properties (SURVEY.md §2 similarity
family): the banded-LSH candidate->verify recipe can only MISS pairs,
never invent them, and recall must rise monotonically with bands."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
from cc_extract import embedops  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r["vec_a"], r["vec_b"]) for r in df.select("vec_a", "vec_b").collect()}


def test_lsh_near_dup_is_subset_of_exact(spark):
    """Exact verification makes false positives impossible: every banded
    config's output must be a subset of the all-pairs truth, with
    identical cos_sim on the shared pairs."""
    exact_df = embedops.cosine_near_dup_pairs(spark, SF_DIR)
    exact = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"] for r in exact_df.collect()
    }
    for _name, bands, bits, _cost in embedops.ND_CONFIGS:
        found = embedops.lsh_near_dup_pairs(
            spark, SF_DIR, bands=bands, band_bits=bits
        ).collect()
        for r in found:
            key = (r["vec_a"], r["vec_b"])
            assert key in exact, f"{bands}x{bits}: invented pair {key}"
            assert r["cos_sim"] == exact[key]


def test_lsh_near_dup_recall_monotone_in_bands(spark):
    """More bands can only add candidate pairs (each band is a union
    term), so found-pair sets are nested 2x4 ⊆ 4x4 ⊆ 8x4 — the
    recall-vs-cost dial the docstring promises."""
    p2 = _pairs(embedops.lsh_near_dup_pairs(spark, SF_DIR, bands=2, band_bits=4))
    p4 = _pairs(embedops.lsh_near_dup_pairs(spark, SF_DIR, bands=4, band_bits=4))
    p8 = _pairs(embedops.lsh_near_dup_pairs(spark, SF_DIR, bands=8, band_bits=4))
    assert p2 <= p4 <= p8


def test_lsh_planes_prefix_stable():
    """Widening the plane stream must not perturb the 8-plane ANN index:
    lsh_planes(32)[:8] == lsh_planes(8)."""
    assert embedops.lsh_planes(32)[: embedops.N_PLANES] == embedops.lsh_planes()


def test_recall_frontier_columns(spark):
    rows = embedops.lsh_near_dup_recall(spark, SF_DIR).collect()
    assert [r["method"] for r in rows] == ["band2x4", "band4x4", "band8x4"]
    for r in rows:
        assert 0.0 <= r["recall"] <= 1.0
        assert r["n_pairs"] <= r["n_true"]
