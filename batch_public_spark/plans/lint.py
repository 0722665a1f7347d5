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
* **uncapped-bucket-self-join** — an equi-join whose left and right keys
  are the SAME-NAMED attribute (the self-join shape: the analyzer keeps
  the name and re-ids one side) and whose key is a DERIVED BUCKET
  (floor/date_trunc/time-window/div expression), with no row_number cap
  partitioned by that bucket anywhere in the plan. Such a join emits
  m²/2 pairs for a bucket with m rows — invisible at test scale, a
  quadratic single-task killer on one hot key at 100 TB (the
  co-presence-graph antipattern r8's verdict flagged; the fix template
  is analytics_queries._capped_presence).

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


_BUCKET_FNS = ("floor(", "date_trunc(", "window(", " div ", "unix_seconds(")


def _attr_name(expr: str) -> str | None:
    """First attribute reference's base name in a join-key expression
    (strips casts/normalizers: ``knownfloatingpointnormalized(cast(b#51L
    ...`` → ``b``)."""
    import re

    m = re.search(r"([A-Za-z_][A-Za-z0-9_]*)#\d+", expr)
    return m.group(1) if m else None


def _defining_arg(plan: str, pos: int) -> str:
    """The full projection argument ending at the ``AS name#`` located at
    ``pos``: scan backwards to the enclosing top-level ``,`` or ``[``,
    honoring nested parens, so bucket-function detection inspects ONLY
    the expression assigned to that alias, not its whole Project line."""
    depth = 0
    i = pos - 1
    while i >= 0:
        c = plan[i]
        if c == ")":
            depth += 1
        elif c == "(":
            if depth == 0:
                break
            depth -= 1
        elif c in ",[" and depth == 0:
            break
        elif c == "\n":
            break
        i -= 1
    return plan[i + 1 : pos]


def _bucket_derived_names(plan: str) -> set[str]:
    """Attribute base names whose defining projection expression contains
    a bucket-derivation function (floor / date_trunc / window / div)."""
    import re

    names: set[str] = set()
    for m in re.finditer(r" AS ([A-Za-z_][A-Za-z0-9_]*)#\d+", plan):
        arg = _defining_arg(plan, m.start()).lower()
        if any(fn in arg for fn in _BUCKET_FNS):
            names.add(m.group(1))
    return names


def _row_number_capped_names(plan: str) -> set[str]:
    """Base names that appear as partition keys of a row_number window —
    the deterministic per-bucket cap idiom (_capped_presence)."""
    import re

    capped: set[str] = set()
    idx = 0
    while True:
        idx = plan.find("row_number() windowspecdefinition(", idx)
        if idx < 0:
            break
        args = _balanced_args(plan, idx + len("row_number() windowspecdefinition"))
        for key in _window_partition_keys(args):
            m = re.match(r"([A-Za-z_][A-Za-z0-9_]*)#\d+", key.strip())
            if m:
                capped.add(m.group(1))
        idx += len("row_number() windowspecdefinition(")
    return capped


def _self_join_bucket_findings(plan: str) -> list[Finding]:
    import re

    bucket_names = _bucket_derived_names(plan)
    if not bucket_names:
        return []
    capped = _row_number_capped_names(plan)
    findings: list[Finding] = []
    join_re = re.compile(
        r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)\s*"
        r"(?:\w+\s+)?\[([^\]]*)\],\s*\[([^\]]*)\]"
    )
    for m in join_re.finditer(plan):
        lkeys = [_attr_name(k) for k in _split_top_level(m.group(2))]
        rkeys = [_attr_name(k) for k in _split_top_level(m.group(3))]
        if not lkeys or lkeys != rkeys:
            continue  # not the self-join shape (different key names)
        hot = [n for n in lkeys if n in bucket_names and n not in capped]
        if hot:
            findings.append(
                Finding(
                    "uncapped-bucket-self-join",
                    f"keys {sorted(set(hot))}: {m.group(0)[:100]}",
                )
            )
    return findings


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
    findings.extend(_self_join_bucket_findings(plan))
    return findings
