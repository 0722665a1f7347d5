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
