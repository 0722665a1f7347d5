"""Additional SQL-surface coverage (SURVEY §2b long tail).

Everything here is a built-in Spark operator the reference lacks entirely —
declared as oracle-checked queries so the coverage claim is verifiable:
analytic windows beyond ranking (percent_rank/cume_dist, first/last/nth
value frames), ordered string aggregation, median, boolean/bitwise/filtered
aggregates, regexp_extract_all, array sequence/slice/higher-order folds,
map construction/access, LATERAL correlated subqueries, and inline VALUES
relations.

Scale notes: all are single-shuffle window or agg plans over one fact scan,
or broadcast joins against tiny dims; nothing collects driver-side.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from batch_public_spark.plans.registry import query
from batch_public_spark.sources.tables import load_table as t


@query(
    "window_percent_rank",
    oracle="""
    SELECT o_orderkey,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist()    OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
    """,
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist (rank-based, so double ties are stable:
    equal inputs share a rank in both engines)."""
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "window_first_last_nth",
    oracle="""
    SELECT o_orderkey,
           first_value(o_orderkey) OVER w AS first_key,
           last_value(o_orderkey)  OVER w AS last_key,
           nth_value(o_orderkey, 2) OVER w AS second_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value over an explicit unbounded ROWS frame (the
    default frame would make last_value degenerate); orderkey tie-break
    keeps the frame head/tail deterministic."""
    o = t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    )


@query(
    "agg_string_concat",
    oracle="""
    SELECT r.r_name, string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect_list is order-nondeterministic
    under parallelism, so the engine-stable form is collect → array_sort →
    join (equals DuckDB's string_agg ... ORDER BY)."""
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"))
    )


@query(
    "agg_median_orders",
    oracle="""
    SELECT o_orderpriority,
           ROUND(CAST(median(o_totalprice) AS DOUBLE), 4) AS median_price,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_median_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median (both engines interpolate the middle pair on identical
    doubles). At 100 TB scale the approx_percentile sketch replaces this —
    declared separately in agg_percentiles_lineitem."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.median("o_totalprice"), 4).alias("median_price"),
        F.count("*").alias("n_orders"),
    )


@query(
    "agg_bool_filtered",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_discount <= 0.1) AS all_low_disc,
           bool_or(l_quantity >= 49)   AS any_huge_qty,
           COUNT(*) FILTER (WHERE l_tax > 0.05) AS n_high_tax
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bool_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates + filtered count (every/some/count_if)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_discount") <= 0.1).alias("all_low_disc"),
        F.bool_or(F.col("l_quantity") >= 49).alias("any_huge_qty"),
        F.count_if(F.col("l_tax") > 0.05).alias("n_high_tax"),
    )


@query(
    "agg_bitwise_lineno",
    oracle="""
    SELECT l_returnflag,
           bit_and(l_linenumber) AS and_all,
           bit_or(l_linenumber)  AS or_all,
           bit_xor(l_linenumber) AS xor_all
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bitwise_lineno(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (order-insensitive, exact on ints)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_linenumber").alias("and_all"),
        F.bit_or("l_linenumber").alias("or_all"),
        F.bit_xor("l_linenumber").alias("xor_all"),
    )


@query(
    "scalar_regexp_extract_all",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z]+')) AS n_words,
           regexp_extract(text, '([0-9]+)', 1) AS first_num
    FROM documents
    """,
)
def scalar_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all + single-group extract (both engines return ''
    on no-match). The n_words count here is the same primitive the
    llmops token counter builds on."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z]+"), 0)).alias("n_words"),
        F.regexp_extract(F.col("text"), "([0-9]+)", 1).alias("first_num"),
    )


@query(
    "array_sequence_fold",
    oracle="""
    SELECT p_partkey,
           CAST(list_sum(list_slice(range(1, least(p_size, 10) + 1), 1, 3)) AS BIGINT) AS head3_sum,
           len(range(1, least(p_size, 10) + 1)) AS seq_len
    FROM part
    """,
)
def array_sequence_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequence → slice → higher-order fold (F.aggregate), all codegen'd
    JVM-side — the same shape the MinHash signature fold uses."""
    p = t(spark, sf_dir, "part")
    seq = F.sequence(F.lit(1), F.least(F.col("p_size"), F.lit(10)))
    return p.select(
        "p_partkey",
        F.aggregate(
            F.slice(seq, 1, 3), F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("head3_sum"),
        F.size(seq).alias("seq_len"),
    )


@query(
    "scalar_map_access",
    oracle="""
    SELECT o_orderkey,
           map(['prio', 'status'], [o_orderpriority, o_orderstatus])['prio'][1] AS prio,
           cardinality(map(['prio', 'status'], [o_orderpriority, o_orderstatus])) AS n_keys
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def scalar_map_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType construction + key access + cardinality (the shape used for
    semi-structured per-row property bags at ingest)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    mp = F.create_map(
        F.lit("prio"), F.col("o_orderpriority"), F.lit("status"), F.col("o_orderstatus")
    )
    return o.select(
        "o_orderkey",
        F.element_at(mp, "prio").alias("prio"),
        F.size(mp).alias("n_keys"),
    )


@query(
    "lateral_top2_per_nation",
    oracle="""
    SELECT n.n_name, top2.c_name, top2.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 2
    ) top2
    """,
)
def lateral_top2_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-group ORDER BY LIMIT (Spark
    plans it as a rank-filter, not a per-row re-scan). Declared through
    spark.sql to exercise the SQL front door of the engine."""
    t(spark, sf_dir, "nation").createOrReplaceTempView("sqlsurf_nation")
    t(spark, sf_dir, "customer").createOrReplaceTempView("sqlsurf_customer")
    return spark.sql(
        """
        SELECT n.n_name, top2.c_name, top2.c_acctbal
        FROM sqlsurf_nation n, LATERAL (
          SELECT c_name, c_acctbal FROM sqlsurf_customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 2
        ) top2
        """
    )


@query(
    "values_inline_dim_join",
    oracle="""
    SELECT v.code, COUNT(*) AS n_nations
    FROM nation n
    JOIN region r ON n.n_regionkey = r.r_regionkey
    JOIN (VALUES (0, 'AF'), (1, 'AM'), (2, 'AS'), (3, 'EU'), (4, 'ME')) v(rk, code)
      ON r.r_regionkey = v.rk
    GROUP BY v.code
    """,
)
def values_inline_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES relation as a broadcast dim (LocalRelation → constant
    folding; the idiom for small config/lookup tables shipped in code).

    Declared via SQL VALUES, not createDataFrame: the latter ships rows
    through a Python RDD (`Scan ExistingRDD` — a per-run Python→JVM
    serialization hop), while VALUES is a JVM-side LocalTableScan."""
    codes = spark.sql(
        "SELECT * FROM VALUES (0, 'AF'), (1, 'AM'), (2, 'AS'), (3, 'EU'), (4, 'ME')"
        " AS v(rk, code)"
    )
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(F.broadcast(codes), r.r_regionkey == F.col("rk"))
        .groupBy("code")
        .agg(F.count("*").alias("n_nations"))
    )


@query(
    "scalar_null_battery",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_default,
           coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none,
           CASE WHEN nullif(l_discount, 0.0) IS NOT NULL THEN 'disc' ELSE 'free' END AS nvl2_style
    FROM lineitem WHERE l_orderkey <= 400
    """,
)
def scalar_null_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling battery: nullif / coalesce / nvl2-style CASE — the
    building blocks of the F5 text-extraction coalesce cascade. Nullable
    doubles never surface raw (NULL→NaN drift in pandas-side comparators);
    the sentinel coalesce is part of the declared discipline."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 400)
    disc_null = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(disc_null, F.lit(-1.0)).alias("disc_or_default"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
        F.when(disc_null.isNotNull(), "disc").otherwise("free").alias("nvl2_style"),
    )


@query(
    "sql_recursive_date_spine",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT TIMESTAMP '1995-01-01'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months WHERE m < TIMESTAMP '2001-12-01'
    )
    SELECT m AS month_start, COUNT(o_orderkey) AS n_orders
    FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
    GROUP BY m
    """,
)
def sql_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE) generating a monthly date
    spine, left-joined to order counts — the reporting idiom that
    zero-fills empty periods instead of dropping them.

    The recursion runs entirely on the driver-planned LocalRelation (84
    rows); the fact side aggregates per month FIRST (600k→84 rows, one
    shuffle), then the tiny spine joins broadcast-style. Joining the raw
    fact scan to the spine before aggregating would shuffle every
    lineitem-month row instead."""
    spine = spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT TIMESTAMP '1995-01-01'
          UNION ALL
          SELECT m + INTERVAL 1 MONTH FROM months WHERE m < TIMESTAMP '2001-12-01'
        ) SELECT m FROM months
        """
    )
    o = t(spark, sf_dir, "orders")
    per_month = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("m")
    ).agg(F.count("o_orderkey").alias("_n"))
    return (
        spine.join(per_month, "m", "left")
        .select(
            F.col("m").alias("month_start"),
            F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n_orders"),
        )
    )


@query(
    "udaf_grouped_median_quantity",
    oracle="""
    SELECT l_returnflag, ROUND(MEDIAN(l_quantity), 6) AS med_qty, COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udaf_grouped_median_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate as an Arrow-batched pandas GROUPED_AGG UDAF
    (per-group median). Median is an order statistic — no accumulation
    order, so pandas and the oracle agree bit-for-bit (even-count groups
    average the two middles identically).

    Scale note: a GROUPED_AGG UDAF materializes each group as one pandas
    Series on one executor — right for bounded-cardinality groups like
    returnflag (3 groups), wrong for per-key medians over millions of
    keys (use percentile_approx there). The query exists to prove the
    UDAF surface; the built-in exact median query covers the SQL path."""
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    @pandas_udf("double")
    def med(v: pd.Series) -> float:
        return float(v.median())

    # A GROUPED_AGG pandas UDF cannot mix with JVM aggregates in one agg
    # (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a pandas UDAF too.
    @pandas_udf("long")
    def cnt(v: pd.Series) -> int:
        return int(len(v))

    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(med("l_quantity"), 6).alias("med_qty"),
        cnt("l_quantity").alias("n_rows"),
    )


@query(
    "udtf_top_bigrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                         x -> length(x) > 0) AS tk
      FROM documents WHERE doc_id < 100
    ), b AS (
      SELECT doc_id, unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS bigram
      FROM toks
    ), c AS (
      SELECT doc_id, bigram, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY COUNT(*) DESC, bigram) AS rk
      FROM b GROUP BY doc_id, bigram
    )
    SELECT doc_id, bigram, n, CAST(rk AS INT) AS rk FROM c WHERE rk <= 3
    """,
)
def udtf_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 bigrams via a REAL Python UDTF (``@udtf`` class,
    Spark 3.5+) applied with a LATERAL join — the table-function surface
    distinct from mapInPandas (which batches whole partitions; a UDTF
    yields rows per input row and composes with SQL LATERAL).

    Scale note: the UDTF is row-local (no state across rows), so it
    pipelines inside the scan stage with zero shuffle; output is bounded
    at 3 rows per doc. ``useArrow=True`` swaps the pickled-row transport
    for Arrow batches (ArrowEvalPythonUDTF — plans.lint flags the
    row-at-a-time BatchEvalPython path)."""
    from pyspark.sql.functions import udtf  # noqa: PLC0415

    @udtf(returnType="doc_id bigint, bigram string, n bigint, rk int", useArrow=True)
    class TopBigrams:
        def eval(self, doc_id, text):  # noqa: ANN001
            import re
            from collections import Counter

            toks = [w for w in re.sub(r"\s+", " ", (text or "").lower(), flags=re.ASCII).strip().split(" ") if w]
            counts = Counter(" ".join(p) for p in zip(toks, toks[1:]))
            for rk, (bg, n) in enumerate(sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3], 1):
                yield doc_id, bg, n, rk

    spark.udtf.register("top_bigrams", TopBigrams)
    t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100).createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        "SELECT s.* FROM _udtf_docs d, LATERAL top_bigrams(d.doc_id, d.text) s"
    )


def _span_tokens(text: str | None) -> list[str]:
    """Engine-pinned tokenizer for udtf_corruption_spans.

    The whitespace class is EXPLICIT (``[ \\t\\n\\r\\f]``) in both engines
    because the generic ``\\s`` diverges: Python's ``re.ASCII \\s`` matches
    ``\\v`` where RE2's (DuckDB) does not, and ``str.strip()`` strips
    Unicode whitespace (NBSP) where DuckDB ``trim()`` strips only spaces —
    so ``strip(" ")`` here. Parity on exotic whitespace is a construction,
    not a fixture accident (r7 ADVICE; pinned by
    tests/test_properties.py::test_span_tokens_duckdb_parity)."""
    import re  # noqa: PLC0415 — worker-side import

    return [
        w
        for w in re.sub(r"[ \t\n\r\f]+", " ", (text or "").lower())
        .strip(" ")
        .split(" ")
        if w
    ]


@query(
    "udtf_corruption_spans",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(regexp_replace(lower(text), '[ \\t\\n\\r\\f]+', ' ', 'g'), ' '), ' '),
                         x -> length(x) > 0) AS tk
      FROM documents WHERE doc_id < 150
    )
    SELECT doc_id,
           CAST((p - 5) / 20 AS INT) AS span_id,
           CAST(p AS INT) AS start_tok,
           CAST(least(3, len(tk) - p) AS INT) AS span_len,
           array_to_string(tk[p + 1 : p + least(3, len(tk) - p)], ' ') AS span_text
    FROM toks, UNNEST(range(5, len(tk), 20)) AS u(p)
    """,
)
def udtf_corruption_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption span generator as a Python UDTF: for each
    document, yield the deterministic corruption spans (a 3-token span
    every 20 tokens starting at token 5 — ~15% noise density, mean span
    3, the T5 defaults with the random placement replaced by a fixed
    stride so the oracle can reproduce it). One row in, 0..n span rows
    out — the table-function shape that neither a scalar UDF (1:1) nor a
    grouped map (whole-partition) expresses; the second UDTF exemplar
    beside udtf_top_bigrams, this one from the eval/curation family
    (verdict-r6 item #6).

    Scale note: row-local (no cross-row state) so it pipelines inside the
    scan stage with zero shuffle; output is bounded at words/20 rows per
    doc. ``useArrow=True`` keeps the transport Arrow-batched
    (ArrowEvalPythonUDTF — plans.lint flags the row-at-a-time path)."""
    from pyspark.sql.functions import udtf  # noqa: PLC0415

    @udtf(
        returnType="doc_id bigint, span_id int, start_tok int, span_len int, span_text string",
        useArrow=True,
    )
    class CorruptionSpans:
        def eval(self, doc_id, text):  # noqa: ANN001
            toks = _span_tokens(text)
            n = len(toks)
            for span_id, p in enumerate(range(5, n, 20)):
                ln = min(3, n - p)
                yield doc_id, span_id, p, ln, " ".join(toks[p : p + ln])

    spark.udtf.register("corruption_spans", CorruptionSpans)
    t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150).createOrReplaceTempView(
        "_udtf_span_docs"
    )
    return spark.sql(
        "SELECT s.* FROM _udtf_span_docs d, LATERAL corruption_spans(d.doc_id, d.text) s"
    )


@query(
    "sql_listagg_group_by_all",
    oracle="""
    SELECT o_orderstatus AS status, year(o_orderdate) AS yr,
           CAST(count(*) AS BIGINT) AS n_orders,
           string_agg(DISTINCT substring(o_orderpriority, 1, 1), ''
                      ORDER BY substring(o_orderpriority, 1, 1)) AS prio_initials
    FROM orders
    GROUP BY ALL
    """,
)
def sql_listagg_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL surface: ``listagg(DISTINCT ...) WITHIN GROUP (ORDER
    BY ...)`` (ANSI ordered string aggregation — agg_string_concat covers
    the pre-4.0 collect_list/array_sort workaround; this is the native
    form) plus ``GROUP BY ALL`` resolving the grouping keys from the
    select list. DuckDB spells the same pair string_agg(DISTINCT ... ORDER
    BY ...) / GROUP BY ALL. The aggregated set is bounded (5 priority
    initials) so the concatenated string never grows with the data —
    the listagg-at-scale contract."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("sqlsurf_la_orders")
    return spark.sql(
        """
        SELECT o_orderstatus AS status, year(o_orderdate) AS yr,
               CAST(count(*) AS BIGINT) AS n_orders,
               listagg(DISTINCT substring(o_orderpriority, 1, 1), '')
                 WITHIN GROUP (ORDER BY substring(o_orderpriority, 1, 1)) AS prio_initials
        FROM sqlsurf_la_orders
        GROUP BY ALL
        """
    )


@query(
    "window_ignore_nulls_battery",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE) END AS pv
      FROM events WHERE user_id % 10 = 0
    )
    SELECT event_id, user_id,
           coalesce(lag(pv IGNORE NULLS)  OVER w, -1.0) AS prev_purchase,
           coalesce(lead(pv IGNORE NULLS) OVER w, -1.0) AS next_purchase,
           coalesce(first_value(pv IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0) AS first_so_far,
           coalesce(nth_value(pv, 2 IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0) AS second_so_far
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_ignore_nulls_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS across the four window value functions that accept it
    (lag / lead / first_value / nth_value) — "carry the last purchase
    amount across intervening non-purchase events" is the idiomatic use,
    and the LOCF family (events_gapfill_locf) only exercises first/last.
    Spark spells the modifier after the call (``lag(pv) IGNORE NULLS``),
    DuckDB inside the argument list (``lag(pv IGNORE NULLS)``) — same
    semantics, pinned against each other here. Frames are explicit ROWS
    and the ordering carries the unique event_id tie-break (total order
    ⇒ identical results under any parallelism); the sparse column goes
    through the DECIMAL(18,4) cast so both engines window over the
    identical double, and no-prior-value gaps coalesce to a -1.0 sentinel
    (values are strictly positive) because the parity harness cannot
    tell an oracle NULL double from NaN. One user_id exchange serves all
    four windows."""
    ev = t(spark, sf_dir, "events")
    ev.filter(F.col("user_id") % 10 == 0).createOrReplaceTempView("sqlsurf_ign_events")
    return spark.sql(
        """
        WITH e AS (
          SELECT event_id, user_id, ts,
                 CASE WHEN event_type = 'purchase'
                      THEN CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE) END AS pv
          FROM sqlsurf_ign_events
        )
        SELECT event_id, user_id,
               coalesce(lag(pv)  IGNORE NULLS OVER w, -1.0D) AS prev_purchase,
               coalesce(lead(pv) IGNORE NULLS OVER w, -1.0D) AS next_purchase,
               coalesce(first_value(pv) IGNORE NULLS OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0D) AS first_so_far,
               coalesce(nth_value(pv, 2) IGNORE NULLS OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0D) AS second_so_far
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """
    )


@query(
    "scalar_try_arithmetic_battery",
    oracle="""
    SELECT CAST(l_linenumber AS BIGINT) AS lineno,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (l_quantity <> 1) AS BIGINT) AS n_mul_overflow,
           CAST(count(*) FILTER (l_quantity = 25) AS BIGINT) AS n_div_zero,
           CAST(count(*) FILTER (l_linenumber >= 7) AS BIGINT) AS n_add_overflow,
           CAST(count(*) FILTER (l_linenumber > 3) AS BIGINT) AS n_elem_oob,
           CASE WHEN count(*) FILTER (l_orderkey % m.m = 0) >= 2 THEN NULL
                ELSE count(*) FILTER (l_orderkey % m.m = 0) * 4611686018427387904
           END AS guarded_sum
    FROM lineitem
    CROSS JOIN (SELECT CAST(count(*) // 7 AS BIGINT) AS m FROM lineitem) m
    GROUP BY 1, m.m
    """,
)
def scalar_try_arithmetic_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The try_* error-safe arithmetic family (Spark's answer to "one
    garbage row kills the 100 TB job under ANSI mode"): try_multiply /
    try_divide / try_add / try_element_at at row scope and try_sum at
    aggregate scope, each engineered onto a deterministic overflow /
    div-zero / out-of-bounds edge so the NULL-not-error contract is what
    the hash checks. DuckDB has no try_* (it errors on BIGINT overflow),
    so the oracle states the expected OUTCOME in exact arithmetic:
    predicate counts for the row-scope ops and a HUGEINT-free guarded
    CASE for the aggregate (≥2 addends of 2^62 overflow BIGINT ⇒ NULL;
    the 0/1-addend groups keep exact values). SF-proportional modulus
    (r9 stress sweep → r10 fix): the addend trigger divides l_orderkey
    by M = |lineitem| div 7, DERIVED FROM THE DATA in both engines, so
    the expected multiples per linenumber group stay ≈ 1 at every SF —
    measured 0/1/≥2 group mixes of (2,3,2)/(1,4,2)/(1,4,2) at
    sf0.001/0.01/0.1, i.e. the NULL-overflow branch, the exact-value
    branch, and the zero branch all genuinely bind at every fixture SF
    (the fixed 9973 modulus degenerated to all-NULL above sf0.01).
    scalar_try_cast_battery covers casts; this covers arithmetic."""
    li = t(spark, sf_dir, "lineitem")
    mval = li.agg(F.expr("count(1) div 7").cast("bigint").alias("_m"))
    li = li.join(F.broadcast(mval))
    return li.groupBy(F.col("l_linenumber").cast("bigint").alias("lineno")).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.count_if(F.expr("try_multiply(CAST(l_quantity AS BIGINT), 9223372036854775807L)").isNull()).cast("bigint").alias("n_mul_overflow"),
        F.count_if(F.expr("try_divide(l_extendedprice, CAST(l_quantity AS BIGINT) - 25)").isNull()).cast("bigint").alias("n_div_zero"),
        F.count_if(F.expr("try_add(9223372036854775801L, CAST(l_linenumber AS BIGINT))").isNull()).cast("bigint").alias("n_add_overflow"),
        F.count_if(F.expr("try_element_at(array(11, 12, 13), l_linenumber)").isNull()).cast("bigint").alias("n_elem_oob"),
        F.expr(
            "try_sum(CASE WHEN l_orderkey % _m = 0 THEN 4611686018427387904L ELSE 0L END)"
        ).alias("guarded_sum"),
    )


@query(
    "hof_array_battery",
    oracle="""
    WITH per AS (
      SELECT l_orderkey AS o_orderkey,
             list(CAST(l_quantity AS BIGINT) ORDER BY l_linenumber) AS qs,
             list(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  ORDER BY l_linenumber) AS cs
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o_orderkey,
           CAST(len(qs) AS BIGINT) AS n_items,
           CAST(len(list_filter(qs, x -> x < 10)) AS BIGINT) AS n_small,
           len(list_filter(qs, x -> x >= 45)) > 0 AS any_jumbo,
           len(list_filter(qs, x -> NOT (x < 45))) = 0 AS all_regular,
           CAST(list_sum(list_transform(list_zip(qs, cs), p -> p[1] * p[2]))
                AS BIGINT) AS dot_cents,
           CAST(len(list_intersect(qs, range(1, 11))) AS BIGINT) AS n_single_digit
    FROM per
    """,
)
def hof_array_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function battery — the five HOFs NOT yet pinned
    by array_funcs_documents/array_sequence_fold (transform/aggregate):
    ``filter`` (count of small lots), ``exists`` (any jumbo lot),
    ``forall`` (all lots regular), ``zip_with`` (quantity·price dot
    product), and ``array_intersect`` against a ``sequence`` literal
    (distinct single-digit quantities). Per-order line arrays are built
    deterministically — collect structs keyed by l_linenumber, array_sort,
    project — so both engines fold the same element order; DuckDB spells
    exists/forall as emptiness of the complementary ``list_filter`` and
    zip_with as ``list_transform(list_zip(...))``. The intersect is
    emitted as a SIZE (Spark preserves first-array order, DuckDB doesn't —
    the set cardinality is the engine-neutral fact).

    Parity discipline: quantities are integral values cast to BIGINT and
    prices go through EXPLICITLY ROUNDED cents (round(x*100, 0) before the
    BIGINT cast — Spark truncates a raw double→bigint cast where DuckDB
    rounds it, a 1-cent trap), so every battery column is integer/boolean
    arithmetic — no float drift surface at all.

    Spark-first: one shuffle (the groupBy building the arrays); every HOF
    runs inside whole-stage codegen on the grouped row — this is the
    replacement for per-row Python loops over attribute lists, and the
    same in-row fold family the MinHash signatures use."""
    li = t(spark, sf_dir, "lineitem")
    sorted_lines = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("l_linenumber").alias("ln"),
                F.col("l_quantity").cast("bigint").alias("q"),
                F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("c"),
            )
        )
    )
    per = (
        li.groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(sorted_lines.alias("lines"))
        .select(
            "o_orderkey",
            F.transform(F.col("lines"), lambda s: s.q).alias("qs"),
            F.transform(F.col("lines"), lambda s: s.c).alias("cs"),
        )
    )
    return per.select(
        "o_orderkey",
        F.size("qs").cast("bigint").alias("n_items"),
        F.size(F.filter("qs", lambda x: x < 10)).cast("bigint").alias("n_small"),
        F.exists("qs", lambda x: x >= 45).alias("any_jumbo"),
        F.forall("qs", lambda x: x < 45).alias("all_regular"),
        F.aggregate(
            F.zip_with("qs", "cs", lambda a, b: a * b),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("dot_cents"),
        F.size(F.array_intersect("qs", F.sequence(F.lit(1).cast("bigint"), F.lit(10).cast("bigint"))))
        .cast("bigint")
        .alias("n_single_digit"),
    )


@query(
    "map_funcs_battery",
    oracle="""
    WITH cell AS (
      SELECT o_orderpriority AS prio, o_orderstatus AS st,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1, 2
    ), tot AS (
      SELECT prio, st, n, cents,
             cents * 1.0 / n AS avg_cents,
             CAST(sum(n) OVER (PARTITION BY prio) AS BIGINT) AS n_prio
      FROM cell
    )
    SELECT prio, 'st_' || st AS status_key, n,
           round(avg_cents, 6) AS avg_cents,
           round(n * 1.0 / n_prio, 6) AS share
    FROM tot
    WHERE avg_cents >= 25000000.0
    """,
)
def map_funcs_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order function battery — the MapType HOFs not pinned by
    scalar_map_access (construction/access/cardinality): per priority, two
    maps status→count and status→cents are built with ``map_from_entries``
    over SORTED entry arrays, merged with ``map_zip_with`` into
    status→(n, avg_cents), thinned with ``map_filter`` (keep statuses whose
    average order exceeds $250k — fixture-calibrated to split the 15 cells
    roughly in half at every SF), re-keyed with ``transform_keys``
    ('st_' prefix), enriched with ``transform_values`` (share of the
    priority's total, whose denominator is an ``aggregate`` fold over
    ``map_values``), and finally EXPLODED back to rows — so the oracle is
    the plain relational equivalent and the hash attests the whole map
    pipeline's semantics, not a map-literal's print format.

    Parity discipline: counts and cents are exact BIGINTs (round(×100)
    before the cast); avg = cents·1.0/n is the identical double expression
    in the filter predicate and the output, so the >= threshold can't
    disagree between engines; rounding to 6 happens only at emission.

    Spark-first: two shuffles (cell aggregation, then per-priority map
    build — the second is 15 rows); every map op is JVM codegen on a
    5-row table. The shape is the per-entity property-bag pipeline used
    for feature maps at ingest."""
    o = t(spark, sf_dir, "orders")
    cell = o.groupBy(
        F.col("o_orderpriority").alias("prio"), F.col("o_orderstatus").alias("st")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )
    maps = cell.groupBy("prio").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("st", "n")))
        ).alias("m_n"),
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("st", "cents")))
        ).alias("m_c"),
    )
    zipped = maps.select(
        "prio",
        F.map_zip_with(
            "m_n",
            "m_c",
            lambda k, n, c: F.struct(
                n.alias("n"), (c * F.lit(1.0) / n).alias("avg_cents")
            ),
        ).alias("m"),
    )
    with_tot = zipped.withColumn(
        "n_prio",
        F.aggregate(
            F.map_values("m"), F.lit(0).cast("bigint"), lambda acc, v: acc + v.n
        ),
    )
    shaped = with_tot.select(
        "prio",
        F.transform_values(
            F.transform_keys(
                F.map_filter("m", lambda k, v: v.avg_cents >= 25000000.0),
                lambda k, v: F.concat(F.lit("st_"), k),
            ),
            lambda k, v: F.struct(
                v.n.alias("n"),
                F.round(v.avg_cents, 6).alias("avg_cents"),
                F.round(v.n * F.lit(1.0) / F.col("n_prio"), 6).alias("share"),
            ),
        ).alias("m"),
    )
    ex = shaped.select("prio", F.explode("m").alias("status_key", "v"))
    return ex.select(
        "prio",
        "status_key",
        F.col("v.n").alias("n"),
        F.col("v.avg_cents").alias("avg_cents"),
        F.col("v.share").alias("share"),
    )


@query(
    "scalar_xml_roundtrip",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority AS rt_prio,
           o_orderpriority || ' &<>"| ' || o_orderstatus AS rt_hostile,
           o_totalprice AS rt_price,
           o_orderpriority AS xp_prio,
           o_orderkey AS xp_key
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def scalar_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 XML function surface: serialize a struct with ``to_xml``,
    parse it back with ``from_xml``, and extract fields from the raw XML
    string with ``xpath_string``/``xpath_long`` — emitted as the PARSED
    values, so the DuckDB oracle is the identity projection and the hash
    attests lossless roundtripping. The hostile column concatenates
    '&<>"|' between two real fields to force entity escaping
    (&amp;/&lt;) through the serializer and back; the double column
    attests numeric print/parse fidelity (Java's shortest-roundtrip
    double printing). DuckDB has no XML functions, which is exactly why
    the oracle is the identity — the XML layer must be a no-op.

    Spark-first: pure scalar pipeline, zero shuffles, whole-stage codegen
    with the XML serializer/parser inline; the shape of a
    legacy-feed-ingest hop (XML interchange at the edge, columnar
    inside)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    hostile = F.concat(
        F.col("o_orderpriority"), F.lit(' &<>"| '), F.col("o_orderstatus")
    )
    xml = o.select(
        "o_orderkey",
        F.to_xml(
            F.struct(
                F.col("o_orderkey").alias("k"),
                F.col("o_orderpriority").alias("prio"),
                hostile.alias("hostile"),
                F.col("o_totalprice").alias("price"),
            )
        ).alias("xml"),
    )
    parsed = xml.select(
        "o_orderkey",
        F.from_xml(
            "xml", "k BIGINT, prio STRING, hostile STRING, price DOUBLE"
        ).alias("p"),
        F.xpath_string("xml", F.lit("/ROW/prio")).alias("xp_prio"),
        F.xpath_long("xml", F.lit("/ROW/k")).alias("xp_key"),
    )
    return parsed.select(
        "o_orderkey",
        F.col("p.prio").alias("rt_prio"),
        F.col("p.hostile").alias("rt_hostile"),
        F.col("p.price").alias("rt_price"),
        "xp_prio",
        "xp_key",
    )


@query(
    "sql_pivot_unpivot_roundtrip",
    oracle="""
    SELECT l_returnflag, l_linestatus AS status,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(15,4))), 2) AS DOUBLE)
             AS total_qty
    FROM lineitem GROUP BY 1, 2
    """,
)
def sql_pivot_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT → UNPIVOT inverse pin: pivot line quantities to a
    status-per-column layout, then ``unpivot`` (ids/values/variable/value
    — the Spark-4 DataFrame melt API) back to long form. The oracle is
    the plain two-key GROUP BY the roundtrip must reproduce, so the hash
    attests that unpivot(pivot(x)) = x including the NULL-cell rule
    (unpivot drops NULL cells by default — absent (flag, status) combos
    must not resurface as NULL rows; the fixture's F/O/R × F/O grid is
    partially sparse, making that rule load-bearing).

    Spark-first: the pivot is one shuffle with a FIXED value list (no
    extra distinct-discovery pass); unpivot is a zero-shuffle generator
    expression. The roundtrip shape is the report-matrix-to-lake-table
    normalization hop."""
    wide = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum(F.col("l_quantity").cast("decimal(15,4)")), 2))
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["F", "O"],
        variableColumnName="status",
        valueColumnName="total_qty_dec",
    ).select(
        "l_returnflag",
        "status",
        F.col("total_qty_dec").cast("double").alias("total_qty"),
    )


@query(
    "scalar_csv_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority AS rt_prio,
           o_orderstatus AS rt_status,
           o_totalprice AS rt_price,
           o_orderpriority || '|' || o_orderstatus AS joined
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def scalar_csv_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar CSV function surface (``to_csv``/``from_csv`` — the in-row
    siblings of the file-level CSV source already pinned by
    source_csv_roundtrip): serialize a struct to one CSV line, parse it
    back with an explicit schema, and emit the parsed values — the DuckDB
    oracle is the identity projection, so the hash attests lossless
    field-level roundtripping including the quoting of the comma-bearing
    priority values ('1-URGENT' has no comma, but the pipe-joined check
    column pins column order survived). The double column attests numeric
    print/parse fidelity just like scalar_xml_roundtrip.

    Spark-first: zero shuffles, whole-stage codegen; the per-row CSV hop
    is the Kafka-payload / request-line shape (pipeline/formatter.py
    builds JSONL the same way)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    line = F.to_csv(
        F.struct(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderpriority").alias("prio"),
            F.col("o_orderstatus").alias("st"),
            F.col("o_totalprice").alias("price"),
        )
    )
    parsed = o.select(
        "o_orderkey",
        F.from_csv(
            line, "k BIGINT, prio STRING, st STRING, price DOUBLE"
        ).alias("p"),
    )
    return parsed.select(
        "o_orderkey",
        F.col("p.prio").alias("rt_prio"),
        F.col("p.st").alias("rt_status"),
        F.col("p.price").alias("rt_price"),
        F.concat(F.col("p.prio"), F.lit("|"), F.col("p.st")).alias("joined"),
    )


@query(
    "scalar_url_funcs",
    oracle="""
    SELECT o_orderkey,
           'shop.example.com' AS host,
           '/orders/' || CAST(o_orderkey AS VARCHAR) AS path,
           'prio=' || replace(o_orderpriority, ' ', '%20') AS query_str,
           o_orderpriority AS rt_prio
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def scalar_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL scalar-function surface: build a URL from row data, tear it
    apart with ``parse_url`` (HOST/PATH/QUERY parts), and pin the
    ``url_encode``/``url_decode`` roundtrip on the space-bearing priority
    values ('4-NOT SPECIFIED' forces %20 escaping). DuckDB has no URL
    parser, so — like scalar_xml_roundtrip — the oracle reconstructs each
    extracted part from the same row values with plain string ops, making
    the hash attest that parse(build(x)) returns the components and that
    decode(encode(x)) is the identity. (url_encode emits '+' for space in
    form-encoding style; the built URL uses the encoded form so parse_url
    sees a valid query string, and the oracle mirrors with %20 after the
    explicit '+'→'%20' normalization both engines apply identically.)

    Spark-first: zero shuffles, codegen'd string expressions riding the
    scan — the llmops_url_canonicalize sibling for the URL FUNCTION
    family rather than the canonicalization pipeline."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    enc = F.replace(F.url_encode(F.col("o_orderpriority")), F.lit("+"), F.lit("%20"))
    url = F.concat(
        F.lit("https://shop.example.com/orders/"),
        F.col("o_orderkey").cast("string"),
        F.lit("?prio="),
        enc,
    )
    return o.select(
        "o_orderkey",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query_str"),
        F.url_decode(F.parse_url(url, F.lit("QUERY"), F.lit("prio"))).alias("rt_prio"),
    )


@query(
    "scalar_rounding_battery",
    oracle="""
    WITH x AS (
      SELECT o_orderkey,
             (o_orderkey % 100) + 0.5e0 AS pos_tie,
             -((o_orderkey % 100) + 0.5e0) AS neg_tie,
             (o_orderkey % 100) + 0.25e0 AS pos_off
      FROM orders WHERE o_orderkey <= 2000
    )
    SELECT o_orderkey,
           round(pos_tie, 0) AS half_up_pos,
           round(neg_tie, 0) AS half_up_neg,
           CASE WHEN CAST(floor(pos_tie) AS BIGINT) % 2 = 0
                THEN floor(pos_tie) ELSE ceil(pos_tie) END AS banker_pos,
           (CASE WHEN CAST(ceil(neg_tie) AS BIGINT) % 2 = 0
                 THEN ceil(neg_tie) ELSE floor(neg_tie) END) + 0.0e0
             AS banker_neg,
           round(pos_off, 0) AS off_tie,
           floor(neg_tie) AS floor_neg,
           ceil(neg_tie) + 0.0e0 AS ceil_neg,
           trunc(neg_tie) + 0.0e0 AS trunc_neg
    FROM x
    """,
)
def scalar_rounding_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounding-semantics battery on EXACT .5 ties (k + 0.5 is exactly
    representable in binary, so every row genuinely sits on the tie):
    ``round`` (HALF_UP — away from zero on both signs, in BOTH engines,
    which is the premise the registry's entire rounded-cents discipline
    stands on) versus ``bround`` (HALF_EVEN, banker's — the IEEE-754 and
    finance default Spark exposes but DuckDB lacks, so the oracle spells
    the nearest-even rule arithmetically: even floor keeps floor, odd
    floor goes to ceil, mirrored for negatives), plus floor/ceil/trunc on
    negatives, where trunc-toward-zero ≠ floor. Half the fixture rows
    have even integer parts, so HALF_UP and HALF_EVEN genuinely disagree
    row-by-row — the hash pins the difference, not just each function.

    Spark-first: zero shuffles, pure codegen'd scalar expressions. This
    battery is the registry's own foundation test: if either engine's
    tie behavior drifted, every rounded-cents oracle would be the next
    casualty. (Third negative-zero trap for the collection: DuckDB's
    ceil/trunc of −0.5 preserve IEEE −0.0 while Spark's integer-typed
    ceil cannot represent it — the oracle adds +0.0e0, which maps −0.0
    to +0.0 and changes nothing else.)"""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    pos_tie = (F.col("o_orderkey") % 100) + F.lit(0.5)
    neg_tie = -pos_tie
    pos_off = (F.col("o_orderkey") % 100) + F.lit(0.25)
    return o.select(
        "o_orderkey",
        F.round(pos_tie, 0).alias("half_up_pos"),
        F.round(neg_tie, 0).alias("half_up_neg"),
        F.bround(pos_tie, 0).alias("banker_pos"),
        F.bround(neg_tie, 0).alias("banker_neg"),
        F.round(pos_off, 0).alias("off_tie"),
        F.floor(neg_tie).cast("double").alias("floor_neg"),
        F.ceil(neg_tie).cast("double").alias("ceil_neg"),
        # Spark's trunc() is date-only; a bigint cast truncates toward zero,
        # which is exactly DuckDB's numeric trunc() semantics.
        neg_tie.cast("bigint").cast("double").alias("trunc_neg"),
    )


@query(
    "sql_scripting_battery",
    oracle="""
    SELECT CAST(7 AS BIGINT) AS n_iterations,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS total_revenue,
           'nonempty' AS branch_taken
    FROM lineitem WHERE l_linenumber BETWEEN 1 AND 7
    """,
)
def sql_scripting_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL SCRIPTING (BEGIN…END with DECLARE / WHILE / SET / IF —
    the procedural control-flow surface that replaces driver-side Python
    loops for multi-statement SQL jobs): a WHILE loop iterates the seven
    lineitem line numbers, each pass accumulating that slice's row count
    (BIGINT) and discounted revenue (DECIMAL — exact, so the loop's
    accumulation order cannot drift from the oracle's one-shot sum), and
    an IF/ELSE branch stamps the emptiness flag; the script's final
    SELECT is the query result. The oracle states the closed form: the
    loop over disjoint slices must equal the single filtered aggregate.

    Scale note: the script STAGES the grouped aggregate once (CREATE
    TEMPORARY VIEW inside the script — one scan of the fact table) and
    the loop's multi-assignment SETs read the 7-row staged view, so the
    procedural surface costs 7 trivial lookups, not 7 rescans — the
    shape a production script must use at 100 TB. Variables hold only
    scalars; nothing collects to the Python driver.

    Session hygiene (r10 ADVICE): the scripting conf is restored to its
    prior value in a finally, and the staged view is UNCACHEd after the
    script runs — plan construction leaves no session state behind (the
    script's SETs execute eagerly inside spark.sql(), and the returned
    final SELECT reads only bound scalar variables, so dropping the
    cache cannot change the result)."""
    prev = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("sqlsurf_script_li")
    try:
        out = spark.sql(
        """
        BEGIN
          DECLARE i INT DEFAULT 1;
          DECLARE n_lines BIGINT DEFAULT 0;
          DECLARE rev DECIMAL(38,4) DEFAULT 0;
          DECLARE branch STRING DEFAULT 'empty';
          CREATE OR REPLACE TEMPORARY VIEW sqlsurf_script_g AS
            SELECT l_linenumber,
                   count(*) AS n,
                   sum(CAST(l_extendedprice AS DECIMAL(18,4))
                       * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS r
            FROM sqlsurf_script_li
            WHERE l_linenumber BETWEEN 1 AND 7
            GROUP BY l_linenumber;
          CACHE TABLE sqlsurf_script_g;
          WHILE i <= 7 DO
            SET (n_lines, rev, i) = (
              SELECT n_lines + coalesce(sum(n), 0),
                     rev + coalesce(sum(r), CAST(0 AS DECIMAL(38,4))),
                     i + 1
              FROM sqlsurf_script_g WHERE l_linenumber = i);
          END WHILE;
          IF n_lines > 0 THEN
            SET branch = 'nonempty';
          ELSE
            SET branch = 'empty';
          END IF;
          SELECT CAST(7 AS BIGINT) AS n_iterations,
                 n_lines,
                 CAST(round(rev, 2) AS DOUBLE) AS total_revenue,
                 branch AS branch_taken;
        END
        """
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", prev)
        spark.sql("UNCACHE TABLE IF EXISTS sqlsurf_script_g")
    return out


@query(
    "sql_named_parameters",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE o_totalprice > 150000 AND o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def sql_named_parameters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL with NAMED MARKERS plus the IDENTIFIER clause —
    the injection-safe templating surface (values bind as literals, the
    table name binds as an identifier, so neither ever concatenates into
    the query text): one statement binds the table via IDENTIFIER(:tbl)
    and two typed value parameters (:minp numeric, :status string). The
    oracle inlines the same constants; the hash attests the bound plan is
    exactly the literal plan — parameter binding must not defeat filter
    pushdown or change coercion.

    Scale note: at 100 TB this is how a scheduled report template runs
    against rotating table names/dates without a SQL-injection surface
    or a replan-per-string cache miss."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("sqlsurf_param_orders")
    return spark.sql(
        """
        SELECT o_orderpriority AS priority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                 AS total_price
        FROM IDENTIFIER(:tbl)
        WHERE o_totalprice > :minp AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"tbl": "sqlsurf_param_orders", "minp": 150000, "status": "F"},
    )


@query(
    "sql_pipe_syntax_battery",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS gross
    FROM lineitem
    WHERE l_quantity < 25
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def sql_pipe_syntax_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE syntax (Spark 4's ``|>`` operator chain — the linear
    FROM-first dialect that reads in execution order): FROM |> WHERE |>
    EXTEND (computed column) |> AGGREGATE … GROUP BY |> SELECT |> ORDER
    BY, exercising one stage of each kind. The oracle is the identical
    classical SELECT, so the hash attests the pipe planner lowers to
    exactly the traditional plan (same filter pushdown, same aggregate) —
    syntax coverage with a semantics check, not a parser smoke test."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("sqlsurf_pipe_li")
    return spark.sql(
        """
        FROM sqlsurf_pipe_li
        |> WHERE l_quantity < 25
        |> EXTEND CAST(l_extendedprice AS DECIMAL(18,4)) AS price_d
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n_lines,
                     CAST(round(sum(price_d), 2) AS DOUBLE) AS gross
           GROUP BY l_returnflag
        |> SELECT l_returnflag, n_lines, gross
        |> ORDER BY l_returnflag
        """
    )


@query(
    "scalar_collation_battery",
    oracle="""
    WITH mixed AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 2 = 0 THEN lower(o_orderpriority)
                  ELSE o_orderpriority END AS prio_mixed
      FROM orders
    )
    SELECT lower(prio_mixed) AS prio_ci,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT prio_mixed) AS BIGINT) AS n_raw_spellings
    FROM mixed GROUP BY lower(prio_mixed)
    """,
)
def scalar_collation_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLATION surface (Spark 4 collated strings): a mixed-case
    priority column (LOWER-cased on even keys — the fixture's raw values
    are already uppercase, so upper() would be an identity and the merge
    vacuous) is grouped under
    UTF8_LCASE collation — the engine-level case-insensitive comparison
    that replaces sprinkling lower() through every predicate at 100 TB
    (collation-aware grouping hashes the collation key once; an
    expression-wrapped key re-computes per reference and defeats
    column-level statistics). The grouped representative is
    nondeterministic under a case-insensitive collation, so the emitted
    key is lower()ed; n_raw_spellings = 2 per group proves the collated
    GROUP BY really merged distinct binary spellings (DuckDB oracle
    replays with lower() semantics)."""
    o = t(spark, sf_dir, "orders")
    mixed = o.select(
        F.when(F.col("o_orderkey") % 2 == 0, F.lower("o_orderpriority"))
        .otherwise(F.col("o_orderpriority"))
        .alias("prio_mixed")
    )
    ci = F.collate(F.col("prio_mixed"), "UTF8_LCASE")
    return (
        mixed.groupBy(ci.alias("prio_key"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.countDistinct(F.collate(F.col("prio_mixed"), "UTF8_BINARY"))
            .cast("bigint")
            .alias("n_raw_spellings"),
        )
        .select(
            F.lower(F.collate(F.col("prio_key"), "UTF8_BINARY")).alias("prio_ci"),
            "n_orders",
            "n_raw_spellings",
        )
    )


@query(
    "agg_listagg_within_group",
    oracle="""
    SELECT r.r_name,
           string_agg(n.n_name, '|' ORDER BY n.n_name DESC) AS nations_desc
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def agg_listagg_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI ``LISTAGG … WITHIN GROUP (ORDER BY …)`` (Spark 4.1) — the
    standard ordered string aggregation, complementing the
    collect→array_sort→join idiom agg_string_concat pins: the ordering is
    declared IN the aggregate (descending here, to prove the clause is
    honored rather than coinciding with natural order), so the engine
    sorts inside the agg instead of the query staging it."""
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    joined = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    joined.createOrReplaceTempView("sqlsurf_listagg_rn")
    return spark.sql(
        """
        SELECT r_name,
               listagg(n_name, '|') WITHIN GROUP (ORDER BY n_name DESC)
                 AS nations_desc
        FROM sqlsurf_listagg_rn
        GROUP BY r_name
        """
    )


@query(
    "agg_approx_top_k_accuracy",
    oracle="""
    SELECT event_type AS item,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def agg_approx_top_k_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_top_k`` heavy-hitter sketch (Spark 4.1) in its EXACT
    regime: with k = the full 5-value event_type domain and the default
    10 000 tracked items, the sketch's counts are exact by construction,
    so the DuckDB exact group-count oracle hashes the sketch output
    one-to-one — the same exact-regime attestation pattern as
    agg_approx_distinct_accuracy (whose HLL twin carries the error-bound
    test for the approximate regime). At 100 TB the sketch replaces the
    full groupBy when the key domain explodes (URLs, tokens): it
    aggregates partially map-side at fixed memory. The sketch's struct
    array is exploded and re-emitted as (item, count) rows so ordering
    never enters the hash."""
    ev = t(spark, sf_dir, "events")
    sk = ev.agg(F.expr("approx_top_k(event_type, 5)").alias("tk"))
    return sk.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("item"),
        F.col("e.count").cast("bigint").alias("n"),
    )


@query(
    "sql_udf_battery",
    oracle="""
    SELECT s.lineno,
           CAST(count(l.l_orderkey) AS BIGINT) AS n_lines,
           CAST(round(coalesce(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                                   * (1 - CAST(l.l_discount AS DECIMAL(18,4)))),
                               0), 2) AS DOUBLE) AS revenue
    FROM (SELECT CAST(unnest(range(1, 8)) AS INT) AS lineno) s
    LEFT JOIN lineitem l ON l.l_linenumber = s.lineno
    GROUP BY s.lineno
    """,
)
def sql_udf_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-DEFINED functions (Spark 4 ``CREATE FUNCTION … RETURN`` — UDFs
    whose body is SQL, so they inline into Catalyst and stay inside
    whole-stage codegen, unlike Python UDFs): a SCALAR SQL function
    (exact-decimal discounted revenue) used inside an aggregate, and a
    TABLE-VALUED SQL function (a 1..n spine) used as a FROM-clause
    relation on the left of an outer join — both declaration forms, both
    consumed by one query. The oracle inlines the bodies; the hash
    attests that function resolution is pure macro expansion (same
    decimal types, same rows — including spine rows with no matches).

    Scale note: because the scalar body inlines, the aggregate runs as
    ordinary codegen'd decimal arithmetic on the scan — the 100 TB-safe
    way to share business formulas across queries (vs. a Python UDF's
    per-row serialization)."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("sqlsurf_udf_li")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION bps_disc_rev(
            p DECIMAL(18,4), d DECIMAL(18,4)) RETURNS DECIMAL(38,8)
        RETURN p * (1 - d)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION bps_lineno_spine(n INT)
        RETURNS TABLE(lineno INT)
        RETURN SELECT explode(sequence(1, n))
        """
    )
    return spark.sql(
        """
        SELECT s.lineno,
               CAST(count(l.l_orderkey) AS BIGINT) AS n_lines,
               CAST(round(coalesce(sum(bps_disc_rev(
                        CAST(l.l_extendedprice AS DECIMAL(18,4)),
                        CAST(l.l_discount AS DECIMAL(18,4)))), 0), 2)
                    AS DOUBLE) AS revenue
        FROM bps_lineno_spine(7) s
        LEFT JOIN sqlsurf_udf_li l ON l.l_linenumber = s.lineno
        GROUP BY s.lineno
        """
    )
