"""Round-12 invariants: doubly-robust off-policy identities, the
conformal approx twin's gate, bitext ANN-candidate agreement, and the
partitioned changelog stream reader's contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from batch_public_spark.plans import QUERIES
from tests.conftest import SF_DIR


def test_dr_degenerates_to_dm_when_correction_zeroed(spark):
    """The doubly-robust estimator's defining identity: with the IPS
    correction term scaled to zero, V_DR == the direct-model baseline
    EXACTLY (same column, same rounding); at full scale the two must
    differ somewhere (a DR that silently ignores the correction would
    pass any approximate check — this pins both directions)."""
    from batch_public_spark.plans.eval_mining_queries import _dr_policy_frame

    zeroed = _dr_policy_frame(spark, SF_DIR, correction_scale=0.0).collect()
    assert len(zeroed) == 4, zeroed
    for r in zeroed:
        assert r.dr_value == r.dm_model_value, r

    full = {r.c: r for r in _dr_policy_frame(spark, SF_DIR).collect()}
    assert any(
        abs(full[c].dr_value - full[c].dm_model_value) > 1e-6 for c in full
    ), "DR correction is identically zero across every context"


def test_dr_sits_between_estimator_identities(spark):
    """Cross-estimator consistency from EMITTED columns only: the DR
    correction reconstructed as ips − dm·(match rate)/p̂ must agree with
    dr − dm (round-6 columns ⇒ loose tolerance), and SNIPS must be a
    convex combination of the per-context matched-reward means (it is a
    weighted average of them), hence inside their [min, max]."""
    rows = QUERIES["eval_dr_policy_value"].fn(spark, SF_DIR).collect()
    assert len(rows) == 4
    means = []
    for r in rows:
        assert 0.0 < r.propensity < 1.0, r
        assert 0 <= r.n_match <= r.n_logs, r
        expected_corr = r.ips_value - r.dm_model_value * (r.n_match / r.n_logs) / r.propensity
        assert abs((r.dr_value - r.dm_model_value) - expected_corr) < 5e-3 * max(
            1.0, abs(r.ips_value)
        ), (r, expected_corr)
        if r.n_match:
            means.append(r.ips_value * r.n_logs * r.propensity / r.n_match)
    snips = rows[0].snips_value
    assert all(r.snips_value == snips for r in rows)
    assert min(means) - 1e-3 <= snips <= max(means) + 1e-3, (snips, means)


def test_bitext_ann_agrees_with_exact_twin(spark):
    """The ANN-candidate production shape vs its exact oracle-hashed
    anchor (llmops_bitext_margin_mining), same even/odd pools: mined-pair
    recall AND precision >= 0.75 (measured 0.85-0.89 across
    sf0.001/0.01/0.1), and on every commonly-mined pair the exact-cosine
    column is IDENTICAL (both paths compute true cosine on the pair;
    only candidate membership is approximate)."""
    exact = {
        (r.a_id, r.b_id): r.cosine
        for r in QUERIES["llmops_bitext_margin_mining"].fn(spark, SF_DIR).collect()
    }
    ann = {
        (r.a_id, r.b_id): r.cosine
        for r in QUERIES["llmops_bitext_margin_ann"].fn(spark, SF_DIR).collect()
    }
    assert len(exact) > 20 and len(ann) > 20, (len(exact), len(ann))
    common = set(exact) & set(ann)
    recall = len(common) / len(exact)
    precision = len(common) / len(ann)
    assert recall >= 0.75, (recall, len(exact), len(ann))
    assert precision >= 0.75, (precision, len(exact), len(ann))
    for pair in common:
        assert exact[pair] == ann[pair], (pair, exact[pair], ann[pair])
