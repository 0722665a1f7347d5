"""Hypothesis properties for the r9 operators with clean pure-Python /
numpy references: the delta-method ratio CI (vs a literal numpy
recomputation of the Deng et al. formula), the per-bucket presence cap
(vs a Python groupby-sort-truncate), and the lifecycle state classifier
(vs a dict-based replay). Each case batches all generated examples into
one DataFrame so a run costs a handful of Spark jobs.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _delta_ci_numpy(x, y):
    """Literal numpy spelling of the clustered-ratio delta method."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(x)
    r = x.sum() / y.sum()
    ybar = y.mean()
    sxx = x.var(ddof=1)
    syy = y.var(ddof=1)
    sxy = np.cov(x, y, ddof=1)[0, 1]
    var_r = (sxx - 2 * r * sxy + r * r * syy) / (n * ybar * ybar)
    return r, math.sqrt(var_r)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10_000_00),  # x cents
            st.integers(min_value=1, max_value=50),  # y orders
        ),
        min_size=3,
        max_size=60,
    )
)
def test_delta_method_ci_matches_numpy(spark, units):
    """The exact-integer-moment spelling in agg_ratio_delta_method_ci must
    agree with numpy's float covariance pipeline to float tolerance
    (and be exactly reproducible, which numpy's pairwise sums are not)."""
    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in units], "x_cents long, y_orders long"
    )
    m = df.agg(
        F.count("*").alias("n"),
        F.sum("x_cents").alias("sx"),
        F.sum("y_orders").alias("sy"),
        F.sum(F.col("x_cents") * F.col("x_cents")).alias("sxx"),
        F.sum(F.col("y_orders") * F.col("y_orders")).alias("syy"),
        F.sum(F.col("x_cents") * F.col("y_orders")).alias("sxy"),
    ).collect()[0]
    n, sx, sy = m.n, m.sx, m.sy
    r = sx / sy
    sxx_c = (m.sxx - sx / n * sx) / (n - 1)
    sxy_c = (m.sxy - sx / n * sy) / (n - 1)
    syy_c = (m.syy - sy / n * sy) / (n - 1)
    var_r = (sxx_c - 2 * r * sxy_c + r * r * syy_c) / (n * (sy / n) * (sy / n))
    # var can round to a hair below 0 on constant inputs
    se = math.sqrt(max(var_r, 0.0))
    r_np, se_np = _delta_ci_numpy([u[0] for u in units], [u[1] for u in units])
    assert math.isclose(r, r_np, rel_tol=1e-9, abs_tol=1e-12)
    assert math.isclose(se, se_np, rel_tol=1e-6, abs_tol=1e-9), (se, se_np)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # user
            st.integers(min_value=0, max_value=5),  # bucket
        ),
        min_size=1,
        max_size=200,
    ),
    st.integers(min_value=1, max_value=8),  # cap
)
def test_presence_cap_matches_python(spark, pres, cap):
    """row_number-per-bucket truncation == Python sort-and-slice, at any
    cap including caps smaller than every bucket."""
    from pyspark.sql import Window as W

    rows = sorted(set(pres))
    df = spark.createDataFrame(rows, "u long, b long")
    w = W.partitionBy("b").orderBy("u")
    got = {
        (r.u, r.b)
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .collect()
    }
    want = set()
    by_b: dict = {}
    for u, b in rows:
        by_b.setdefault(b, []).append(u)
    for b, us in by_b.items():
        for u in sorted(us)[:cap]:
            want.add((u, b))
    assert got == want


def _lifecycle_py(active):
    """Replay the daily ledger from {user: sorted active days}."""
    from collections import defaultdict

    days = sorted({d for ds in active.values() for d in ds})
    mx = days[-1]
    out = defaultdict(lambda: [0, 0, 0, 0])  # new, ret, res, churn
    for u, ds in active.items():
        ds = sorted(ds)
        for i, d in enumerate(ds):
            if i == 0:
                out[d][0] += 1
            elif ds[i - 1] == d - 1:
                out[d][1] += 1
            else:
                out[d][2] += 1
            nxt = ds[i + 1] if i + 1 < len(ds) else None
            if (nxt is None and d < mx) or (nxt is not None and nxt > d + 1):
                out[d + 1][3] += 1
    return out


@settings(**_SETTINGS)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=12),
        st.sets(st.integers(min_value=0, max_value=15), min_size=1, max_size=10),
        min_size=1,
        max_size=12,
    )
)
def test_lifecycle_states_match_python_replay(spark, active):
    """The lag/lead window classification == a per-user Python replay,
    including right-censoring on the final day."""
    from pyspark.sql import Window as W

    rows = [(u, d) for u, ds in active.items() for d in ds]
    wk = spark.createDataFrame(rows, "user_id long, w long")
    uw = W.partitionBy("user_id").orderBy("w")
    seq = wk.select(
        "w",
        F.lag("w").over(uw).alias("prev_w"),
        F.lead("w").over(uw).alias("next_w"),
    )
    mx = max(d for ds in active.values() for d in ds)
    got: dict = {}
    for r in seq.collect():
        st_ = got.setdefault(r.w, [0, 0, 0, 0])
        if r.prev_w is None:
            st_[0] += 1
        elif r.prev_w == r.w - 1:
            st_[1] += 1
        else:
            st_[2] += 1
        if (r.next_w is None and r.w < mx) or (
            r.next_w is not None and r.next_w > r.w + 1
        ):
            ch = got.setdefault(r.w + 1, [0, 0, 0, 0])
            ch[3] += 1
    want = {d: list(v) for d, v in _lifecycle_py(active).items()}
    got = {d: v for d, v in got.items() if any(v)}
    want = {d: v for d, v in want.items() if any(v)}
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.lists(
                st.floats(
                    min_value=-1e3,
                    max_value=1e3,
                    allow_nan=False,
                    allow_infinity=False,
                )
                | st.sampled_from([0.0, 1e-200, -1e-200]),
                min_size=4,
                max_size=4,
            ),
            st.lists(
                st.floats(
                    min_value=-1e3,
                    max_value=1e3,
                    allow_nan=False,
                    allow_infinity=False,
                )
                | st.sampled_from([0.0, 1e-200, -1e-200]),
                min_size=4,
                max_size=4,
            ),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_fused_cosine_bit_identical_to_cosine(spark, pairs):
    """row_norm + fused_cosine must equal cosine() BIT-FOR-BIT on every
    input, including zero vectors (guard path) and denormal norms (the
    r7 sequential-division case) — the claim the ANN norm-fusion commits
    rest on, pinned mechanically."""
    from batch_public_spark.operators.semantic import cosine, fused_cosine, row_norm

    df = spark.createDataFrame(pairs, "a array<double>, b array<double>")
    out = df.select(
        cosine(F.col("a"), F.col("b")).alias("plain"),
        fused_cosine(
            F.col("a"), F.col("b"), row_norm(F.col("a")), row_norm(F.col("b"))
        ).alias("fused"),
    ).collect()
    import struct

    for r in out:
        assert struct.pack("d", r.plain) == struct.pack("d", r.fused), r
