"""Property-based checks (SURVEY §5): behaviors the DuckDB oracle can't
see, driven by hypothesis-generated inputs.

Each property batches all generated examples into ONE DataFrame per case
so a hypothesis run costs a handful of Spark jobs, not hundreds.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from hypothesis import HealthCheck, example, given, settings
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


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(min_value=1, max_value=10_000)),
        min_size=1,
        max_size=60,
    )
)
def test_systematic_resample_selects_exactly_k_per_group(spark, rows):
    """The integer cumulative-weight crossing test behind
    llmops_importance_resample: across any positive integer weights, the
    total number of stride boundaries crossed per group is EXACTLY k, and
    the number of selected docs equals k whenever no single doc carries
    >= 1/k of the group's mass (a heavier doc absorbs several strides but
    is selected once — the without-replacement convention; hypothesis
    found the single-doc group counterexample that motivates the split
    assertion)."""
    k = 5
    df = spark.createDataFrame(
        [(g, i, w) for i, (g, w) in enumerate(rows)], "g string, id long, w long"
    )
    from pyspark.sql import Window as W

    win = W.partitionBy("g").orderBy(F.md5(F.col("id").cast("string")), "id")
    ranked = df.select(
        "g",
        "w",
        F.sum("w").over(win.rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
        F.sum("w").over(W.partitionBy("g")).alias("tot"),
    )
    strides = F.expr(f"(cum * {k}) div tot - ((cum - w) * {k}) div tot")
    got = {
        r["g"]: (r["n_sel"], r["n_strides"], r["mx"], r["tot"])
        for r in ranked.groupBy("g")
        .agg(
            F.sum(F.when(strides > 0, 1).otherwise(0)).alias("n_sel"),
            F.sum(strides).alias("n_strides"),
            F.max("w").alias("mx"),
            F.max("tot").alias("tot"),
        )
        .collect()
    }
    for g, (n_sel, n_strides, mx, tot) in got.items():
        assert n_strides == k, (g, got[g])  # strides always partition into k
        if mx * k < tot:  # no doc holds >= 1/k of the mass
            assert n_sel == k, (g, got[g])


@settings(**_SETTINGS)
@given(st.lists(st.text(max_size=60), min_size=1, max_size=40))
def test_intradoc_repetition_ratio_bounded(spark, texts):
    """1 − distinct/total trigrams stays in [0, 1] for arbitrary text
    (including whitespace-only and sub-3-token docs, which are excluded
    by the same len >= 3 predicate the query uses)."""
    from batch_public_spark.operators.textops import tokens

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    tk = tokens(F.lower(F.col("text")))
    base = df.select("id", tk.alias("toks")).filter(F.size("toks") >= 3)
    grams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at("toks", i),
            F.element_at("toks", i + F.lit(1)),
            F.element_at("toks", i + F.lit(2)),
        ),
    )
    rows = base.select(
        (F.lit(1.0) - F.size(F.array_distinct(grams)) / F.size(grams).cast("double")).alias("rep")
    ).collect()
    assert all(r.rep is not None and 0.0 <= r.rep <= 1.0 for r in rows)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
            ),
            min_size=2,
            max_size=8,
        ),
        min_size=1,
        max_size=20,
    )
)
@example([[0.0, 5e-324]])  # r6 hypothesis shrink: subnormal maxabs, scale underflows to 0.0
def test_int8_quantize_error_within_half_step(spark, vecs):
    """Nearest-step rounding error is bounded by scale/2 per dimension for
    any finite vector with a positive derived scale — the invariant behind
    llmops_embedding_quantize_error. The guard is on the DERIVED divisor
    (scale > 0): a subnormal maxabs (e.g. 5e-324, hypothesis-found) passes
    maxabs > 0 but underflows maxabs/127 to exactly 0.0, which would raise
    DIVIDE_BY_ZERO under ANSI mode."""
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id long, vv array<double>"
    )
    d = (
        df.withColumn("scale", F.array_max(F.transform("vv", F.abs)) / 127)
        .filter(F.col("scale") > 0)
        .select("id", "scale", F.explode("vv").alias("x"))
    )
    rows = d.select(
        (
            F.abs(F.col("x") - F.round(F.col("x") / F.col("scale"), 0) * F.col("scale"))
            - F.col("scale") / 2
        ).alias("slack")
    ).collect()
    assert all(r.slack <= 1e-12 for r in rows)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(alphabet=" \t\n\r\f\v  abcXYZ0.,-", max_size=60),
        min_size=1,
        max_size=20,
    )
)
@example(["a\vb", " c ", "x\fy\tz", "", "  lead trail  "])
def test_span_tokens_duckdb_parity(texts):
    """The udtf_corruption_spans tokenizer must agree with its DuckDB
    oracle fragment on EXOTIC whitespace, not just the ASCII fixture:
    Python's re.ASCII \\s matches \\v where RE2's does not, and
    str.strip() strips NBSP where DuckDB trim() does not — both engines
    now pin the explicit class [ \\t\\n\\r\\f] and space-only strip
    (r7 ADVICE)."""
    import duckdb

    from batch_public_spark.plans.sql_surface import _span_tokens

    con = duckdb.connect()
    try:
        for txt in texts:
            [(got,)] = con.execute(
                "SELECT list_filter(string_split_regex("
                "trim(regexp_replace(lower(?), '[ \\t\\n\\r\\f]+', ' ', 'g'),"
                " ' '), ' '), x -> length(x) > 0)",
                [txt],
            ).fetchall()
            assert got == _span_tokens(txt), repr(txt)
    finally:
        con.close()


@given(
    st.lists(
        st.lists(st.text(alphabet="ab c", min_size=1, max_size=6), min_size=1, max_size=12),
        min_size=2,
        max_size=24,
    )
)
@settings(max_examples=200, deadline=None)
def test_prefix_families_are_contiguous_in_lexicographic_sort(token_lists):
    """The lemma test_snm_blocking_recovers_prefix_dup_families relies on:
    in a lexicographic sort of whitespace-normalized strings, every group
    sharing an 8-token prefix (members having ≥ 9 tokens) occupies a
    CONTIGUOUS run — no non-member string can sort strictly between two
    members, because members all start with "<prefix><space>" and string
    prefixes define closed intervals in lexicographic order."""
    norms = []
    for toks in token_lists:
        toks = [t for t in " ".join(toks).split() if t]
        if toks:
            norms.append(" ".join(toks))
    norms.sort()
    keys = []
    for n in norms:
        tk = n.split()
        keys.append(" ".join(tk[:8]) if len(tk) >= 9 else None)
    for key in set(k for k in keys if k):
        idx = [i for i, k in enumerate(keys) if k == key]
        lo, hi = min(idx), max(idx)
        for i in range(lo, hi + 1):
            assert keys[i] == key, (norms[i], key)
