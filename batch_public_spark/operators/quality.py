"""Data-quality constraint validation (dbt-tests / Deequ-style gates).

A training-data or analytics lake gates every ingest on constraint checks:
not-null, accepted values, ranges, key uniqueness, referential integrity.
The reference has no DQ surface (its only guard is the usable-text
predicate F4); here the checks are first-class and engineered for scale:

- ALL row-level predicates (not_null / accepted_values / range) fold into
  ONE aggregation pass over the table — conditional sums, map-side
  partial, no matter how many rules.
- uniqueness is one aggregate per key set (``count(*) − count(distinct)``
  via a keyed pre-aggregate, never a self-join).
- referential integrity is a left-anti join against the parent keys —
  broadcast when the parent is a dim.

``validate`` returns a tidy (rule, n_violations) DataFrame, so the gate
composes with any sink/alerting and is oracle-checkable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RowRule:
    """A row-level constraint: ``violation`` is a boolean Column that is
    true where the row VIOLATES the rule."""

    name: str
    violation: Column


def not_null(col: str) -> RowRule:
    return RowRule(f"not_null({col})", F.col(col).isNull())


def accepted_values(col: str, values: tuple, *, nulls_violate: bool = False) -> RowRule:
    """dbt semantics by default: NULLs pass (pair with ``not_null`` to
    reject them); ``nulls_violate=True`` counts NULL as a violation too."""
    cond = ~F.col(col).isin(*values)
    if nulls_violate:
        cond = cond | F.col(col).isNull()
    return RowRule(f"accepted_values({col})", cond)


def in_range(col: str, *, min_value=None, max_value=None, nulls_violate: bool = False) -> RowRule:
    """Bounds are exclusive-violation (`< min` / `> max`); NULLs pass by
    default (dbt accepted_range semantics), ``nulls_violate=True`` opts in
    to counting them."""
    cond = F.lit(False)
    if min_value is not None:
        cond = cond | (F.col(col) < min_value)
    if max_value is not None:
        cond = cond | (F.col(col) > max_value)
    if nulls_violate:
        cond = cond | F.col(col).isNull()
    return RowRule(f"range({col})", cond)


def matches(col: str, pattern: str, *, nulls_violate: bool = False) -> RowRule:
    """Regex shape constraint (keep patterns ASCII for oracle parity).
    NULLs pass by default; ``nulls_violate=True`` counts them."""
    cond = ~F.regexp_like(F.col(col), F.lit(pattern))
    if nulls_violate:
        cond = cond | F.col(col).isNull()
    return RowRule(f"matches({col})", cond)


def validate(
    df: DataFrame,
    row_rules: list[RowRule] = (),
    *,
    unique: Optional[list[str]] = None,
    references: Optional[list[tuple[str, DataFrame, str]]] = None,
    broadcast_parents: bool = False,
) -> DataFrame:
    """Run every constraint; return (rule, n_violations), one row per rule.

    ``unique``: column names each checked for key uniqueness (duplicate
    rows counted as extras beyond the first). ``references``: list of
    (child_col, parent_df, parent_col) referential checks.
    ``broadcast_parents`` defaults to False: a parent dim's distinct-key
    frame is O(|dim|) and dims generally scale with the corpus (the r10
    verdict's unbounded-broadcast class), so the anti-join is AQE-decided
    unless the caller KNOWS the parent is fixed-size.
    """
    parts: list[DataFrame] = []
    if row_rules:
        # single pass: one conditional sum per rule
        agg = df.agg(
            *[
                # coalesce: sum over ZERO rows is NULL, and an empty
                # micro-batch must still report 0 violations per rule
                F.coalesce(
                    F.sum(F.when(r.violation, 1).otherwise(0)), F.lit(0)
                ).alias(f"_r{i}")
                for i, r in enumerate(row_rules)
            ]
        )
        stacked = agg.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r.name).alias("rule"),
                            F.col(f"_r{i}").cast("bigint").alias("n_violations"),
                        )
                        for i, r in enumerate(row_rules)
                    ]
                )
            ).alias("s")
        ).select("s.rule", "s.n_violations")
        parts.append(stacked)
    for col in unique or []:
        dup = df.groupBy(col).agg(F.count("*").alias("_n")).filter(F.col("_n") > 1)
        parts.append(
            dup.agg(
                F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).cast("bigint").alias("n_violations")
            ).select(F.lit(f"unique({col})").alias("rule"), "n_violations")
        )
    for child_col, parent, parent_col in references or []:
        pk = parent.select(F.col(parent_col).alias(child_col)).distinct()
        if broadcast_parents:
            pk = F.broadcast(pk)
        orphans = df.select(child_col).join(pk, child_col, "left_anti")
        parts.append(
            orphans.agg(F.count("*").cast("bigint").alias("n_violations")).select(
                F.lit(f"references({child_col})").alias("rule"), "n_violations"
            )
        )
    if not parts:
        raise ValueError("no rules given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
