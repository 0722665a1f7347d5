"""Hypothesis properties for the r8 operators whose engine-side kernels
have clean pure-Python references: the Holt fold (aggregate HOF), the
winnowing selection rule, and the Welch t statistics. Each case batches
all generated examples into ONE DataFrame so a run costs a handful of
Spark jobs.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_HOLT_EXPR = """
aggregate(
  s,
  cast(array() as array<struct<l: double, b: double>>),
  (acc, e) -> CASE WHEN size(acc) = 0
    THEN array(struct(e * 1.0D AS l, 0.0D AS b))
    ELSE array_append(acc, struct(
      0.3D * e + 0.7D * (element_at(acc, -1).l + element_at(acc, -1).b) AS l,
      0.2D * ((0.3D * e + 0.7D * (element_at(acc, -1).l + element_at(acc, -1).b))
             - element_at(acc, -1).l)
        + 0.8D * element_at(acc, -1).b AS b))
  END)
"""


def _holt_py(ys):
    out = []
    for y in ys:
        if not out:
            out.append((y * 1.0, 0.0))
        else:
            pl, pb = out[-1]
            nl = 0.3 * y + 0.7 * (pl + pb)
            nb = 0.2 * (nl - pl) + 0.8 * pb
            out.append((nl, nb))
    return out


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40),
        min_size=1,
        max_size=8,
    )
)
def test_holt_fold_matches_python_reference(spark, series_batch):
    df = spark.createDataFrame(
        [(i, ys) for i, ys in enumerate(series_batch)], "i int, s array<bigint>"
    )
    got = {
        r.i: [(x.l, x.b) for x in r.hw]
        for r in df.select("i", F.expr(_HOLT_EXPR).alias("hw")).collect()
    }
    for i, ys in enumerate(series_batch):
        want = _holt_py(ys)
        assert len(got[i]) == len(want)
        for (gl, gb), (wl, wb) in zip(got[i], want):
            # identical IEEE op sequence -> bit equality, not tolerance
            assert gl == wl and gb == wb, (i, ys)


def _hex4_py(h: str) -> int:
    return int(h[:4], 16)


def _winnow_py(text: str, k: int = 8, w: int = 16):
    n = max(len(text) - (k - 2), 1)
    hs = [
        _hex4_py(hashlib.md5(text[i : i + k].encode()).hexdigest())
        for i in range(n)
    ]
    n_windows = max(len(hs) - (w - 1), 1)
    sel = []
    for j in range(n_windows):
        m = min(hs[j : j + w])
        if m not in sel:
            sel.append(m)
    return len(hs), n_windows, len(set(sel))


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=1,
            max_size=120,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_winnowing_selection_matches_python_reference(spark, texts):
    from batch_public_spark.plans.llmops_queries import _GRAM_HASH

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "i int, text string"
    )
    g = df.select(
        "i",
        F.expr(
            f"transform(sequence(1, greatest(length(text) - 6, 1)), "
            f"i -> {_GRAM_HASH})"
        ).alias("hs"),
    )
    out = g.select(
        "i",
        F.size("hs").alias("n_grams"),
        F.expr(
            "size(array_distinct(transform(sequence(1, greatest(size(hs) - 15, 1)), "
            "j -> array_min(slice(hs, CAST(j AS INT), 16)))))"
        ).alias("n_selected"),
    ).collect()
    got = {r.i: (r.n_grams, r.n_selected) for r in out}
    for i, s in enumerate(texts):
        n_grams, _, n_sel = _winnow_py(s)
        assert got[i] == (n_grams, n_sel), (i, repr(s))


def _welch_py(a, b):
    n1, n2 = len(a), len(b)
    if n1 < 2 or n2 < 2:
        return None
    s1, q1 = sum(a), sum(x * x for x in a)
    s2, q2 = sum(b), sum(x * x for x in b)
    m1, m2 = s1 * 1.0 / n1, s2 * 1.0 / n2
    v1 = (q1 - s1 * 1.0 * s1 / n1) / (n1 - 1)
    v2 = (q2 - s2 * 1.0 * s2 / n2) / (n2 - 1)
    se2 = v1 / n1 + v2 / n2
    if not se2 > 0:
        return None
    return (m1 - m2) / math.sqrt(se2)


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=5_000), min_size=2, max_size=60),
    st.lists(st.integers(min_value=0, max_value=5_000), min_size=2, max_size=60),
)
def test_welch_t_matches_python_reference(spark, a, b):
    rows = [(0, int(x)) for x in a] + [(1, int(x)) for x in b]
    df = spark.createDataFrame(rows, "g int, v bigint")
    s = df.groupBy("g").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("q"),
    )
    got = {r.g: (r.n, r.s, r.q) for r in s.collect()}
    # the query's moment algebra, applied to Spark's exact sums
    n1, s1, q1 = got[0]
    n2, s2, q2 = got[1]
    m1, m2 = s1 * 1.0 / n1, s2 * 1.0 / n2
    v1 = (q1 - s1 * 1.0 * s1 / n1) / (n1 - 1)
    v2 = (q2 - s2 * 1.0 * s2 / n2) / (n2 - 1)
    se2 = v1 / n1 + v2 / n2
    want = _welch_py(a, b)
    if want is None:
        assert not se2 > 0 or (n1 < 2 or n2 < 2)
    else:
        assert (m1 - m2) / math.sqrt(se2) == want
