"""Skew mitigation: salted two-stage aggregation and salted joins.

The reference runs single-threaded so skew never bites it; at 100 TB a
handful of hot keys (a viral URL in dedup, a dominant event_type, an empty
text hash) serializes whole stages. AQE's skew-join splitting handles the
JOIN side at runtime; these helpers handle the AGGREGATION side — and the
join case where a deterministic, pre-planned salt beats runtime splitting
(e.g. when the skew is known and extreme).

Pattern (aggregation): groupBy(keys + salt) computes algebraic partials in
B buckets per key, then groupBy(keys) merges them — the hot key's work
spreads over B tasks at the cost of one extra (tiny, |keys|×B rows)
shuffle. Only algebraic aggregates (sum/count/min/max, and avg derived as
sum/count) decompose this way, which is exactly why the helper takes a
spec, not arbitrary expressions.

Pattern (join): salt the probe side by a per-row uniquifier hash, explode
the build side across all B salts, equi-join on (key, salt). Deterministic
(hash, not rand()) so retried tasks and re-runs produce identical plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"

# (merge function used in stage 2) per supported algebraic aggregate.
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def salted_group_agg(
    df: DataFrame,
    keys: list[str],
    specs: list[tuple[str, str, str]],
    *,
    buckets: int = 16,
    salt_on: Column | None = None,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``specs`` is a list of ``(agg, col, alias)`` with ``agg`` one of
    sum/count/min/max ("count" ignores ``col``). ``salt_on`` is the per-row
    expression hashed into the salt — defaults to all non-key columns'
    first key... callers should pass a high-cardinality column (a PK) for
    an even spread; xxhash64 keeps it deterministic across retries.
    """
    salt_src = salt_on if salt_on is not None else F.monotonically_increasing_id()

    partials = []
    for agg, col, alias in specs:
        if agg == "count":
            partials.append(F.count("*").alias(alias))
        elif agg in _MERGE:
            partials.append(getattr(F, agg)(col).alias(alias))
        else:
            raise ValueError(f"non-algebraic aggregate {agg!r} cannot be salted")
    stage1 = (
        df.withColumn(_SALT, F.pmod(F.xxhash64(salt_src), F.lit(buckets)))
        .groupBy(*keys, _SALT)
        .agg(*partials)
    )

    merged = [_MERGE[agg](alias).alias(alias) for agg, _, alias in specs]
    return stage1.groupBy(*keys).agg(*merged)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    buckets: int = 16,
    salt_on: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (large, skewed) ``left`` side and
    replicate the (smaller) ``right`` side across all ``buckets`` salts.

    Replication multiplies the build side by B — use only when the build
    side is modest (it usually is: the probe side is skewed precisely
    because it's the big one) and the skew is too extreme for AQE's
    median-based splitting.

    Only left-preserving joins are valid: the right side is replicated
    across all B salts, so a right/full outer join would emit each
    unmatched right row B times."""
    if how not in {"inner", "left", "left_outer", "left_semi", "left_anti"}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}: "
            "the replicated right side would duplicate unmatched right rows"
        )
    salt_src = salt_on if salt_on is not None else F.monotonically_increasing_id()
    l_salted = left.withColumn(_SALT, F.pmod(F.xxhash64(salt_src), F.lit(buckets)))
    r_exploded = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(b).cast("bigint") for b in range(buckets)]))
    )
    return l_salted.join(r_exploded, on + [_SALT], how).drop(_SALT)
