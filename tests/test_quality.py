"""Data-quality constraint checks (operators.quality): each rule must
count planted violations exactly, and the row-level rules must share one
aggregation pass."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_public_spark.operators.quality import (
    RowRule,
    accepted_values,
    in_range,
    matches,
    not_null,
    validate,
)


def _fixture(spark):
    rows = [
        (1, "F", 10.0, "a@x.com", 1),
        (2, "O", -5.0, "bad-email", 1),     # range + matches violations
        (3, None, 20.0, None, 2),           # accepted(None) + matches(None)
        (3, "Z", 30.0, "c@x.com", 99),      # dup key + accepted + orphan ref
    ]
    return spark.createDataFrame(
        rows, "id int, status string, price double, email string, cust int"
    )


def test_all_rule_kinds_count_planted_violations(spark):
    df = _fixture(spark)
    parents = spark.createDataFrame([(1,), (2,)], "c int")
    out = validate(
        df,
        [
            not_null("status"),
            accepted_values("status", ("F", "O")),
            in_range("price", min_value=0.0),
            matches("email", r"^[a-z]+@[a-z]+\.[a-z]+$"),
        ],
        unique=["id"],
        references=[("cust", parents, "c")],
    )
    got = {r.rule: r.n_violations for r in out.collect()}
    assert got == {
        "not_null(status)": 1,
        "accepted_values(status)": 1,  # 'Z' (dbt default: NULL passes)
        "range(price)": 1,
        "matches(email)": 1,  # 'bad-email' (NULL passes)
        "unique(id)": 1,  # one extra row beyond the first id=3
        "references(cust)": 1,  # cust=99 orphan
    }


def test_nulls_violate_opt_in_counts_nulls(spark):
    """nulls_violate=True counts NULL as a violation per rule (the pre-r4
    behavior, now opt-in)."""
    df = _fixture(spark)
    out = validate(
        df,
        [
            accepted_values("status", ("F", "O"), nulls_violate=True),
            matches("email", r"^[a-z]+@[a-z]+\.[a-z]+$", nulls_violate=True),
            in_range("price", min_value=0.0, nulls_violate=True),
        ],
    )
    got = {r.rule: r.n_violations for r in out.collect()}
    assert got == {
        "accepted_values(status)": 2,  # None + 'Z'
        "matches(email)": 2,  # 'bad-email' + None
        "range(price)": 1,  # -5.0 (no NULL prices planted)
    }


def test_reference_counts_orphan_rows(spark):
    df = _fixture(spark)
    parents = spark.createDataFrame([(1,), (2,)], "c int")
    out = validate(df, [], references=[("cust", parents, "c")])
    [r] = out.collect()
    assert r.rule == "references(cust)" and r.n_violations == 1  # cust=99


def test_clean_table_all_zero(spark):
    df = _fixture(spark).filter(F.col("id") == 1)
    out = validate(
        df,
        [not_null("status"), in_range("price", min_value=0.0, max_value=100.0)],
        unique=["id"],
    )
    assert all(r.n_violations == 0 for r in out.collect())


def test_row_rules_fold_into_single_aggregate(spark):
    """All row-level rules must share ONE aggregation pass (one scan)."""
    df = _fixture(spark)
    out = validate(df, [not_null("status"), in_range("price", min_value=0.0)])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1, plan


def test_empty_table_reports_zero_not_null_counts(spark):
    """An empty micro-batch (the common ingest case) must report 0
    violations per rule, never NULL (review r3)."""
    df = _fixture(spark).filter(F.lit(False))
    out = validate(
        df,
        [not_null("status"), in_range("price", min_value=0.0)],
        unique=["id"],
    )
    got = {r.rule: r.n_violations for r in out.collect()}
    assert all(v == 0 for v in got.values()), got
