"""Static scale-antipattern linter for physical plans.

Round 3's verdict hunt for "WindowExec: No Partition Defined" was manual;
this makes it systematic: every registered query's executed plan is swept
for the three antipatterns that are invisible at test scale and fatal at
100 TB —

* **unpartitioned-window** — a window function whose spec has no
  partition keys funnels the whole input through ONE task. (The
  registry's deliberate bounded cases use a constant-valued non-foldable
  partition key, e.g. ``F.col("n") * 0``, precisely so they stay visible
  to the planner as partitioned AND to reviewers as acknowledged.)
* **cartesian-product** — a ``CartesianProduct`` node means neither side
  broadcast: |L|×|R| row pairs materialize. Broadcast variants
  (BroadcastNestedLoopJoin) are allowed; they stream the big side once.
* **row-python-udf** — ``BatchEvalPython`` is the row-at-a-time Python
  UDF path (pickled rows over a socket); the Arrow-vectorized operators
  (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas / MapInArrow)
  do not trip this.

Used by tests/test_plan_lint.py as a registry-wide gate with an explicit,
justified allowlist; importable for ad-hoc use::

    from batch_public_spark.plans.lint import lint_plan
    for f in lint_plan(df):
        print(f.kind, f.detail)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Finding:
    kind: str
    detail: str


def bounded_window_key(int_col: Column) -> Column:
    """The acknowledged-bounded-global-window idiom: a constant-valued,
    NON-FOLDABLE partition key (``pmod(x, 1)`` — always 0 for integer
    inputs, but data-dependent so the optimizer cannot fold it away, and
    the plan's windowspecdefinition keeps an explicit partition key).

    Use this ONLY when the window's input is provably bounded (e.g. the
    survivors of a TakeOrdered ``limit(k)``): it documents in code AND in
    the physical plan that the single partition is deliberate. Pass an
    integer-typed column — ``pmod`` on doubles keeps the fraction and
    would split partitions. A naive ``col * 0`` is silently
    constant-folded and the window reverts to an (apparently)
    unpartitioned spec, which lint_plan flags."""
    return F.pmod(int_col, F.lit(1))


def _executed_plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def _balanced_args(text: str, start: int) -> str:
    """Return the argument string of the call whose '(' sits at
    ``start``, honoring nested parens."""
    depth = 0
    for i in range(start, len(text)):
        c = text[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return text[start + 1 : i]
    return text[start + 1 :]


def _split_top_level(args: str) -> list[str]:
    out, depth, cur = [], 0, []
    for c in args:
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
    if cur:
        out.append("".join(cur).strip())
    return out


def _window_partition_keys(spec_args: str) -> list[str]:
    """Partition keys are the leading windowspecdefinition args that are
    neither ORDER BY items (suffixed ``ASC``/``DESC`` at top level) nor
    the trailing ``specifiedwindowframe(...)``."""
    keys = []
    for arg in _split_top_level(spec_args):
        if arg.startswith("specifiedwindowframe"):
            break
        if arg.endswith("NULLS FIRST") or arg.endswith("NULLS LAST"):
            break
        keys.append(arg)
    return keys


def lint_plan(df: DataFrame) -> list[Finding]:
    """Lint a (batch) DataFrame's executed plan. Streaming DataFrames
    have no executed plan before ``start()`` — callers skip them."""
    plan = _executed_plan_string(df)
    findings: list[Finding] = []

    idx = 0
    while True:
        idx = plan.find("windowspecdefinition(", idx)
        if idx < 0:
            break
        args = _balanced_args(plan, idx + len("windowspecdefinition"))
        if not _window_partition_keys(args):
            findings.append(Finding("unpartitioned-window", args[:120]))
        idx += len("windowspecdefinition(")

    for line in plan.splitlines():
        stripped = line.strip().lstrip(":+- ")
        if stripped.startswith("CartesianProduct"):
            findings.append(Finding("cartesian-product", stripped[:120]))
        if stripped.startswith("BatchEvalPython"):
            findings.append(Finding("row-python-udf", stripped[:120]))
    return findings
