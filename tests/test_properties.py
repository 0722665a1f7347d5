"""Property-based checks (SURVEY §5): behaviors the DuckDB oracle can't
see, driven by hypothesis-generated inputs.

Each property batches all generated examples into ONE DataFrame per case
so a hypothesis run costs a handful of Spark jobs, not hundreds.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from batch_public_spark.functions.json_repair import loosen_json_py
from batch_public_spark.functions.timestamps import normalize_ts
from batch_public_spark.operators.dedup import first_wins

_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _ts_to_int_py(value) -> int | None:
    """Python port of the reference cascade (reference
    dynamo_fetcher.py:205-279) — the property oracle for normalize_ts."""
    if isinstance(value, (int, float)):
        v = float(value)
    else:
        s = str(value).strip()
        try:
            v = float(s)
        except ValueError:
            if s.endswith(" EST") or s.endswith(" EDT"):
                off = 5 * 3600 if s.endswith(" EST") else 4 * 3600
                base = s[:-4].strip()
                for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%dT%H:%M:%S"):
                    try:
                        dt = datetime.strptime(base, fmt)
                        return int(dt.replace(tzinfo=timezone.utc).timestamp()) + off
                    except ValueError:
                        continue
                return None
            try:
                iso = s.replace("Z", "+00:00")
                dt = datetime.fromisoformat(iso)
                if dt.tzinfo is None:
                    dt = dt.replace(tzinfo=timezone.utc)
                return int(dt.timestamp())
            except ValueError:
                return None
    if v > 1e12:
        v = v / 1000.0
    # Engine deviation (documented in normalize_ts): non-finite and
    # beyond-long magnitudes normalize to NULL rather than propagating
    # Python's unbounded int.
    import math

    if not math.isfinite(v) or not (-(2**63) <= v < 2**63):
        return None
    return int(v)


_epochs = st.integers(min_value=0, max_value=4_102_444_800)  # …2100
_epoch_ms = st.integers(min_value=1_100_000_000_000, max_value=4_102_444_800_000)
_iso = st.datetimes(
    min_value=datetime(1971, 1, 1), max_value=datetime(2099, 12, 31)
).map(lambda d: d.replace(microsecond=0).isoformat())
_iso_z = _iso.map(lambda s: s + "Z")
_eastern = st.tuples(
    st.datetimes(min_value=datetime(1971, 1, 1), max_value=datetime(2099, 12, 31)),
    st.sampled_from([" EST", " EDT"]),
).map(lambda t: t[0].replace(microsecond=0).strftime("%Y-%m-%d %H:%M:%S") + t[1])
_garbage = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=12
)
_pathological = st.sampled_from(["nan", "inf", "-infinity", "1e40", "-1e40", "9e18"])
_ts_values = st.one_of(_epochs, _epoch_ms, _iso, _iso_z, _eastern, _garbage, _pathological)


@settings(**_SETTINGS)
@given(st.lists(_ts_values, min_size=1, max_size=30))
def test_normalize_ts_matches_reference_port(spark, values):
    rows = [(i, str(v)) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "i int, raw string")
    got = {
        r.i: r.ts
        for r in df.select("i", normalize_ts(F.col("raw")).alias("ts")).collect()
    }
    for i, v in enumerate(values):
        assert got[i] == _ts_to_int_py(v), f"value {v!r}: spark={got[i]}"


@settings(**_SETTINGS)
@given(st.lists(_garbage | st.text(max_size=40), min_size=1, max_size=30))
def test_loosen_json_never_throws_and_matches_python(spark, texts):
    """The repair regexes must be total (no exceptions on any input) and
    the JVM regexp_replace chain must agree with the Python port."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "i int, raw string")
    from batch_public_spark.functions.json_repair import loosen_json

    got = {r.i: r.out for r in df.select("i", loosen_json(F.col("raw")).alias("out")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == loosen_json_py(t), f"input {t!r}"


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 1_000_000)),
        min_size=1,
        max_size=40,
    )
)
def test_first_wins_deterministic_and_idempotent(spark, rows):
    """first_wins must pick the same survivor regardless of input order,
    and applying it twice must equal applying it once."""
    data = [(k, o, f"p{k}_{o}") for k, o in rows]
    df = spark.createDataFrame(data, "k int, ord long, payload string")
    shuffled = spark.createDataFrame(list(reversed(data)), "k int, ord long, payload string")
    a = first_wins(df, F.col("k"), F.col("ord"))
    b = first_wins(shuffled, F.col("k"), F.col("ord"))
    sa = sorted(map(tuple, a.collect()))
    assert sa == sorted(map(tuple, b.collect()))
    twice = first_wins(a, F.col("k"), F.col("ord"))
    assert sa == sorted(map(tuple, twice.collect()))


_doc_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=120
)


@settings(**_SETTINGS)
@given(st.lists(st.tuples(_doc_text, _doc_text), min_size=1, max_size=12))
def test_jaccard_text_equals_column_form(spark, pairs):
    """The Arrow-UDF verify path (jaccard_text) must agree exactly with the
    Column-expression form jaccard(word_shingles(a), word_shingles(b)) —
    the minhash candidate verifier swaps one in for the other purely for
    plan-shape reasons (the filter must not collapse into the join)."""
    from batch_public_spark.operators.semantic import jaccard, jaccard_text, word_shingles

    rows = [(i, a, b) for i, (a, b) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "i int, a string, b string")
    out = df.select(
        "i",
        jaccard(word_shingles(F.col("a")), word_shingles(F.col("b"))).alias("col_form"),
        jaccard_text(F.col("a"), F.col("b")).alias("udf_form"),
    ).collect()
    for r in out:
        assert r.col_form == pytest.approx(r.udf_form, abs=1e-12), (
            pairs[r.i],
            r.col_form,
            r.udf_form,
        )
