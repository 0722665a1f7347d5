"""Unit tests for the plan-lint parser itself (plans.lint): the
registry-wide gate is only as trustworthy as the windowspecdefinition
parsing underneath it, so the string mechanics are pinned on synthetic
plan fragments — no Spark session needed."""

from __future__ import annotations

from batch_public_spark.plans.lint import (
    _balanced_args,
    _split_top_level,
    _window_partition_keys,
)


def test_balanced_args_honors_nesting():
    s = "windowspecdefinition(f(a, b), c ASC NULLS FIRST, frame(x, y))"
    args = _balanced_args(s, s.index("("))
    assert args == "f(a, b), c ASC NULLS FIRST, frame(x, y)"


def test_split_top_level_ignores_nested_commas():
    assert _split_top_level("f(a, b), c, g(h(i, j), k)") == [
        "f(a, b)",
        "c",
        "g(h(i, j), k)",
    ]


def test_partition_keys_detected_before_order_items():
    args = (
        "d#8, ts#19 ASC NULLS FIRST, delta#20 DESC NULLS LAST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())"
    )
    assert _window_partition_keys(args) == ["d#8"]


def test_unpartitioned_spec_has_no_keys():
    args = (
        "n#1L ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())"
    )
    assert _window_partition_keys(args) == []


def test_expression_partition_key_counts():
    # pmod(n#1L, 1) — the bounded_window_key idiom — must read as a key.
    args = (
        "pmod(n#1L, 1)#7L, n#1L ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())"
    )
    assert _window_partition_keys(args) == ["pmod(n#1L, 1)#7L"]


def test_frame_only_spec_has_no_keys():
    args = "specifiedwindowframe(RowFrame, unboundedpreceding$(), unboundedfollowing$())"
    assert _window_partition_keys(args) == []


# --- uncapped-bucket-self-join (r9) -----------------------------------

_BUCKET_PROJECT = (
    "Project [user_id#5L AS u#50L, FLOOR((cast(unix_timestamp(ts#3) as double)"
    " / 60.0)) AS b#51L]"
)
_CAP_WINDOW = (
    "Window [row_number() windowspecdefinition(b#51L, u#50L ASC NULLS FIRST, "
    "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) "
    "AS rn#60]"
)
_SELF_JOIN = "SortMergeJoin [b#51L], [b#151L], Inner"


def test_uncapped_bucket_self_join_flagged():
    from batch_public_spark.plans.lint import _self_join_bucket_findings

    plan = "\n".join([_BUCKET_PROJECT, _SELF_JOIN])
    kinds = [f.kind for f in _self_join_bucket_findings(plan)]
    assert kinds == ["uncapped-bucket-self-join"]


def test_row_number_cap_suppresses_finding():
    from batch_public_spark.plans.lint import _self_join_bucket_findings

    plan = "\n".join([_BUCKET_PROJECT, _CAP_WINDOW, _SELF_JOIN])
    assert _self_join_bucket_findings(plan) == []


def test_non_self_join_on_bucket_not_flagged():
    # Different key names on the two sides (a bucket joined against a
    # pre-aggregated dimension) is not the self-join shape.
    from batch_public_spark.plans.lint import _self_join_bucket_findings

    plan = "\n".join(
        [_BUCKET_PROJECT, "SortMergeJoin [b#51L], [bucket_id#9L], Inner"]
    )
    assert _self_join_bucket_findings(plan) == []


def test_self_join_on_natural_key_not_flagged():
    # Same-named keys but NOT bucket-derived (plain column) — out of scope.
    from batch_public_spark.plans.lint import _self_join_bucket_findings

    plan = "SortMergeJoin [user_id#5L], [user_id#105L], Inner"
    assert _self_join_bucket_findings(plan) == []
