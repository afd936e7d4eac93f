"""Measured pair-recall impact of the star+chain group cap (SURVEY.md §4.2).

pairs.py documents the trade: groups above `band_group_cap` emit star+chain
edges instead of all C(n,2) pairs — connectivity of the CANDIDATE graph is
preserved (so pre-verification cluster recall is unaffected), but a true
pair inside a capped group can be LOST after Jaccard verification when its
star/chain intermediates fail the similarity check (lsh.py:46-52).

This test constructs the loss case exactly and pins the measured numbers:

  * one LSH band group of 12 ids (> cap=8), colliding ONLY in band 0;
  * three true pairs (est J ~0.758 >= 0.7): (1,2) and (10,11) adjacent in
    sorted id order — their chain edges survive; (5,9) separated by three
    verification-failing intermediates (6,7,8) and a dissimilar group min
    (0) — every capped path to it dies at verification;
  * capped pair recall = 2/3, uncapped = 3/3, and the pre-verification
    candidate graphs have IDENTICAL connectivity (one component).

The measured bound lives in BENCH/BASELINE.md §cap-trade.
"""
import pytest
from pyspark.sql import functions as F

from wdd.config import WddConfig
from wdd.operators.lsh import lsh_candidates, verify_jaccard
from wdd.operators.components import connected_components

N_IDS = 12
TRUE_PAIRS = {(1, 2), (5, 9), (10, 11)}


def _signatures():
    """128-slot signatures: band 0 (positions 0..3) shared by ALL ids; each
    true pair also agrees on every position p in 4..127 with p % 4 != 0 —
    estimated J = (4 + 93)/128 ~= 0.758 >= 0.7 threshold, but no full 4-row
    band slice beyond band 0 ever matches (position 4j always differs), so
    the pair collides ONLY inside the capped mega-group."""
    sigs = {i: [1000 * i + p for p in range(128)] for i in range(N_IDS)}
    for i in range(N_IDS):
        for p in range(4):
            sigs[i][p] = 7777  # the shared (oversized) band
    for a, b in TRUE_PAIRS:
        for p in range(4, 128):
            if p % 4 != 0:
                sigs[b][p] = sigs[a][p]
    return sigs


@pytest.fixture(scope="module")
def sig_df(spark):
    sigs = _signatures()
    return spark.createDataFrame(
        [(i, sigs[i]) for i in range(N_IDS)],
        "page_id long, signature array<int>",
    ).localCheckpoint(eager=True)


def _verified_pairs(spark, sig_df, cap):
    cfg = WddConfig(band_group_cap=cap)
    cand = lsh_candidates(sig_df, cfg=cfg)
    verified = verify_jaccard(cand, sig_df, threshold=cfg.jaccard_threshold)
    return cand, {(r.a, r.b) for r in verified.select("a", "b").collect()}


def test_capped_group_loses_isolated_true_pair(spark, sig_df):
    _, capped = _verified_pairs(spark, sig_df, cap=8)
    # adjacent true pairs ride their own chain edges and survive
    assert (1, 2) in capped and (10, 11) in capped
    # (5,9)'s only capped paths run through verification-failing
    # intermediates — the pair is lost: measured capped pair recall 2/3
    assert (5, 9) not in capped
    assert len(capped & TRUE_PAIRS) == 2


def test_uncapped_group_finds_all_true_pairs(spark, sig_df):
    _, uncapped = _verified_pairs(spark, sig_df, cap=64)
    assert uncapped & TRUE_PAIRS == TRUE_PAIRS  # pair recall 3/3
    # and nothing beyond the planted pairs verifies (precision guard)
    assert uncapped == TRUE_PAIRS


def test_cap_preserves_candidate_connectivity(spark, sig_df):
    """Pre-verification, star+chain is connectivity-equivalent to full
    pairing — the documented invariant behind using the cap for CLUSTER
    recall while accepting the PAIR recall trade after verification."""
    cand_capped, _ = _verified_pairs(spark, sig_df, cap=8)
    cand_full, _ = _verified_pairs(spark, sig_df, cap=64)
    vertices = sig_df.select(F.col("page_id").alias("id"))

    def labels(cand):
        cc = connected_components(cand.select("a", "b"), vertices)
        return {(r.id, r.cluster_id) for r in cc.labels.collect()}

    la, lf = labels(cand_capped), labels(cand_full)
    assert la == lf
    # everything shares band 0 -> one candidate component either way
    assert len({c for _, c in la}) == 1
