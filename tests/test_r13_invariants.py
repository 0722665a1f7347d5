"""Round-13 invariants: BPE merge training reproduces its own
segmentation when the learned merges are re-applied, and the trainer's
iteration-1 winner coincides with the character-pair ranking."""

from __future__ import annotations

import hashlib

import duckdb

from pyspark.sql import functions as F

from batch_public_spark.plans import QUERIES
from tests.conftest import SF_DIR


def _reapply_merges(sf_dir: str, merges: list[str]) -> tuple[set, int]:
    """Independent (pure-Python) re-application of a learned merge list
    over the trainer's exact fixture: token types from the same corpus
    slice, spaced-symbol representation, each merge applied in rank
    order via str.replace — the same single-pass non-overlapping
    left-to-right convention both engines' replace() implements.
    Returns the surviving-symbol vocabulary and its md5 fingerprint
    input, for comparison against the query's emitted vocab_hash."""
    con = duckdb.connect()
    toks = con.sql(
        rf"""
        SELECT DISTINCT lower(tk.tok) AS tok
        FROM '{sf_dir}/documents.parquet',
             UNNEST(list_filter(string_split_regex(trim(text), '\s+'),
                                s -> length(s) > 0)) AS tk(tok)
        WHERE doc_id < 400
        """
    ).fetchall()
    vocab: set[str] = set()
    for (tok,) in toks:
        sym = " " + " ".join(tok) + " "
        for pair in merges:
            sym = sym.replace(f" {pair} ", " " + pair.replace(" ", "") + " ")
        vocab.update(s for s in sym.split() if s)
    return vocab, len(vocab)


def test_bpe_train_reapplying_merges_reproduces_segmentation(spark):
    """The trainer's emitted vocab_hash must equal the hash of the
    vocabulary obtained by independently re-applying its merge list, in
    rank order, to the fixture's token types — i.e. the learned merges
    ARE sufficient to reproduce the trainer's final segmentation (the
    apply-side contract of llmops_bpe_apply_merges, now pinned against
    the learning loop)."""
    rows = sorted(
        QUERIES["llmops_bpe_train_merges"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.iter,
    )
    assert [r.iter for r in rows] == [1, 2, 3, 4, 5]
    merges = [r.pair for r in rows]
    assert all(r.merged == r.pair.replace(" ", "") for r in rows)
    vocab, size = _reapply_merges(SF_DIR, merges)
    assert size == rows[0].vocab_size
    fingerprint = hashlib.md5("|".join(sorted(vocab)).encode()).hexdigest()
    assert fingerprint == rows[0].vocab_hash


def test_bpe_train_iteration1_matches_char_pair_ranking(spark):
    """Before any merge exists, the trainer's candidate space IS the raw
    character-pair space, so iteration 1's winner must be the
    top-weighted character pair (count desc, pair asc) computed
    independently; and the winner sequence must be strictly
    non-increasing in count (a later merge can never outweigh an earlier
    one at the time it was chosen... its RECORDED count is the max of a
    shrinking candidate pool)."""
    rows = sorted(
        QUERIES["llmops_bpe_train_merges"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.iter,
    )
    counts = [r.n for r in rows]
    assert counts == sorted(counts, reverse=True), counts
    top_char_pair = duckdb.sql(
        rf"""
        WITH d AS (
          SELECT lower(tk.tok) AS tok
          FROM '{SF_DIR}/documents.parquet',
               UNNEST(list_filter(string_split_regex(trim(text), '\s+'),
                                  s -> length(s) > 0)) AS tk(tok)
          WHERE doc_id < 400
        )
        SELECT substr(tok, i, 1) || ' ' || substr(tok, i + 1, 1) AS pair,
               count(*) AS n
        FROM d, UNNEST(generate_series(1, length(tok) - 1)) AS g(i)
        WHERE length(tok) >= 2
        GROUP BY pair ORDER BY n DESC, pair LIMIT 1
        """
    ).fetchall()[0]
    assert (rows[0].pair, rows[0].n) == (top_char_pair[0], top_char_pair[1])


def test_corpus_build_funnel_telescopes_and_matches_cascade(spark):
    """Reconciliation (verdict-r12 item #5): (a) the corpus build's first
    three funnel rows equal llmops_dedup_cascade_e2e's output exactly —
    the composition reuses the cascade verbatim, so any drift in keys,
    survivor policy, or the near-dup anchor shows up here; (b) the
    funnel telescopes: every filtering row's n_removed + n_remaining ==
    the previous row's n_remaining (docs are never invented or silently
    dropped between stages); (c) the unit-change rows are consistent
    (mixture/card keep the decontaminate survivor count; pack windows
    cover the tokens implied by card's mean at >=50% fill)."""
    build = {
        r.stage: r
        for r in QUERIES["llmops_corpus_build_e2e"].fn(spark, SF_DIR).collect()
    }
    cascade = {
        r.stage: r
        for r in QUERIES["llmops_dedup_cascade_e2e"].fn(spark, SF_DIR).collect()
    }
    assert set(build) == {
        "exact", "prefix", "neardup", "quality_gate",
        "decontaminate", "mixture", "pack", "card",
    }
    for s in ("exact", "prefix", "neardup"):
        assert (build[s].n_removed, build[s].n_remaining) == (
            cascade[s].n_removed,
            cascade[s].n_remaining,
        ), s
    chain = ["exact", "prefix", "neardup", "quality_gate", "decontaminate"]
    for prev, cur in zip(chain, chain[1:]):
        assert (
            build[cur].n_removed + build[cur].n_remaining
            == build[prev].n_remaining
        ), (prev, cur)
    n_final = build["decontaminate"].n_remaining
    assert build["mixture"].n_remaining == n_final
    assert build["card"].n_remaining == n_final
    # pack: windows hold all tokens (mean * docs), each window half-full+
    total_tokens = build["card"].metric * n_final
    n_windows = build["pack"].n_remaining
    assert n_windows * 512 >= total_tokens - 1e-6
    assert 0.0 < build["pack"].metric <= 1.0


def test_corpus_build_gate_is_subset_of_standalone_filter(spark):
    """The gate stage can only keep documents the standalone
    llmops_quality_filter would keep: its keep-count over the cascade
    survivors is bounded by the standalone filter's corpus-wide keeps,
    and its survivor mean quality is >= 0.5 (the gate threshold)."""
    build = {
        r.stage: r
        for r in QUERIES["llmops_corpus_build_e2e"].fn(spark, SF_DIR).collect()
    }
    standalone_keeps = sum(
        r.n_keep
        for r in QUERIES["llmops_quality_filter"].fn(spark, SF_DIR).collect()
    )
    assert build["quality_gate"].n_remaining <= standalone_keeps
    assert build["quality_gate"].metric >= 0.5


def test_mondrian_fallback_fires_exactly_for_small_groups(spark):
    """Coverage-per-group invariant beside the marginal gate (verdict-r12
    item #6): the skewed fixture's rare groups (rare_e / rare_f, 1/16 of
    calibration mass each) must use the coarse-parent fallback at every
    SF, the major/mid groups must not; the fallback rule is exactly
    n_calib*10 < N (recomputed from the emitted columns); qhat_used
    switches accordingly; and each NON-fallback group's realized test
    coverage honors the conformal bound within binomial noise
    (>= 0.9 - 3*sqrt(0.09/n_test))."""
    rows = {
        r.g: r
        for r in QUERIES["eval_conformal_mondrian"].fn(spark, SF_DIR).collect()
    }
    assert set(rows) == {"major0", "major1", "mid", "rare_e", "rare_f"}
    n_total = sum(r.n_calib for r in rows.values())
    for r in rows.values():
        assert r.used_fallback == (r.n_calib * 10 < n_total), r
        assert r.qhat_used == (r.qhat_coarse if r.used_fallback else r.qhat_group), r
    assert rows["rare_e"].used_fallback and rows["rare_f"].used_fallback
    assert not any(rows[g].used_fallback for g in ("major0", "major1", "mid"))
    for g in ("major0", "major1", "mid"):
        r = rows[g]
        slack = 3.0 * (0.09 / r.n_test) ** 0.5
        assert r.coverage >= 0.9 - slack, (g, r.coverage, slack)
    # hierarchy is consistent: both rare groups share one coarse parent
    assert rows["rare_e"].gc == rows["rare_f"].gc == "c_rare"
    assert rows["rare_e"].qhat_coarse == rows["rare_f"].qhat_coarse


def test_dp_accountant_refuses_exactly_at_the_cap(spark):
    """Refusal invariant (verdict-r12 item #7): cumulative epsilon under
    basic composition is exactly the ledger prefix sums [0.8, 1.4, 1.9,
    2.6, 3.5, 4.0]; grants flip to refusals exactly when the running sum
    first exceeds the 3.0 cap (hard-stop: request 5 AND everything
    after); refused releases emit NULL noisy_value / NULL bound verdict
    (the true statistic never leaves); granted noise respects the
    per-release scale (|noisy - true| <= (sens/eps) * 6.907755 for
    within-bound rows, checked on the count releases whose true value
    is recomputable exactly)."""
    import duckdb as _dk

    rows = sorted(
        QUERIES["dq_dp_budget_accountant"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.seq,
    )
    assert [r.seq for r in rows] == [1, 2, 3, 4, 5, 6]
    assert [round(r.cum_epsilon, 3) for r in rows] == [0.8, 1.4, 1.9, 2.6, 3.5, 4.0]
    assert [r.granted for r in rows] == [True, True, True, True, False, False]
    for r in rows:
        if r.granted:
            assert r.noisy_value is not None and r.within_utility_bound is not None
        else:
            assert r.noisy_value is None and r.within_utility_bound is None
    n_events = _dk.sql(
        f"SELECT count(*) FROM '{SF_DIR}/events.parquet'"
    ).fetchall()[0][0]
    r1 = rows[0]
    assert r1.release == "n_events"
    if r1.within_utility_bound:
        assert abs(r1.noisy_value - n_events) <= (1.0 / 0.8) * 6.907755 + 1e-6


def test_wordpiece_objective_diverges_from_bpe_and_is_correct(spark):
    """The WordPiece rule is real, not a renamed BPE: on this corpus the
    two trainers choose DIFFERENT first merges (WordPiece picks the
    high-likelihood 'q u' — q is nearly always followed by u — over
    BPE's merely-frequent 'e r'); iteration 1's winner equals the
    independent argmax of count(ab)/(count(a)·count(b)) over raw
    character pairs; and every winner's log_score is consistent with
    its emitted counts."""
    import math

    wp = sorted(
        QUERIES["llmops_wordpiece_train_merges"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.iter,
    )
    bpe = sorted(
        QUERIES["llmops_bpe_train_merges"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.iter,
    )
    assert [r.iter for r in wp] == [1, 2, 3, 4]
    assert [r.pair for r in wp] != [r.pair for r in bpe[: len(wp)]]
    assert wp[0].pair == "q u"  # the canonical WordPiece pick
    for r in wp:
        assert 0 < r.n_pair <= min(r.na, r.nb), r
        expect = math.log(r.n_pair) - math.log(r.na) - math.log(r.nb)
        assert abs(r.log_score - expect) < 1e-5, r
    top = duckdb.sql(
        rf"""
        WITH d AS (
          SELECT lower(tk.tok) AS tok
          FROM '{SF_DIR}/documents.parquet',
               UNNEST(list_filter(string_split_regex(trim(text), '\s+'),
                                  s -> length(s) > 0)) AS tk(tok)
          WHERE doc_id < 400
        ), pc AS (
          SELECT substr(tok, i, 1) || ' ' || substr(tok, i + 1, 1) AS pair,
                 count(*) AS n
          FROM d, UNNEST(generate_series(1, length(tok) - 1)) AS g(i)
          WHERE length(tok) >= 2 GROUP BY pair
        ), u AS (
          SELECT substr(tok, i, 1) AS s, count(*) AS n
          FROM d, UNNEST(generate_series(1, length(tok))) AS g(i)
          GROUP BY s
        )
        SELECT pc.pair FROM pc
        JOIN u ua ON ua.s = split_part(pc.pair, ' ', 1)
        JOIN u ub ON ub.s = split_part(pc.pair, ' ', 2)
        ORDER BY CAST(pc.n AS DOUBLE) / (CAST(ua.n AS DOUBLE) * CAST(ub.n AS DOUBLE))
                 DESC, pc.pair
        LIMIT 1
        """
    ).fetchall()[0][0]
    assert wp[0].pair == top
