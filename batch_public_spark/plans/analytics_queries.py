"""Round-3 surface widening: event-stream analytics (sessionization,
funnels, retention), corpus statistics (token-cost comparison, length
histograms, sentence stats, per-source entropy), embedding quantization,
multimodal resize plumbing, and SQL-surface fill-ins (cume_dist, regr_*,
null-safe join, string/date batteries).

The reference has no analytics surface (it is an ETL pipeline); these are
the queries a user of a 100 TB event/corpus lake runs daily, expressed
Spark-first: window functions for sessionization (one shuffle on user_id,
no self-joins), conditional aggregation for funnels (single pass), and
pre-aggregated counts before any many-to-many join. Oracle discipline per
plans.registry: decimal-exact measures, round-6 ratios, string-formatted
dates, engine-portable regex classes only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from batch_public_spark.operators.textops import token_count_bpe_ish, token_count_ws, tokens
from batch_public_spark.plans.lint import bounded_window_key
from batch_public_spark.plans.registry import query
from batch_public_spark.sources.tables import inline_rows
from batch_public_spark.sources.tables import load_table as t
from batch_public_spark.sources.tables import spread

SESSION_GAP_US = 600 * 1_000_000  # 10 minutes

# Per-minute-bucket participant cap for the co-presence graph family
# (graph_kcore_peel / graph_bfs_distance / graph_label_propagation /
# graph_link_prediction). The bucket self-join emits m²/2 pairs per
# bucket, so one hot minute (launch spike, bot storm) with m active users
# is a quadratic task-killer on a single key at scale; capping each bucket
# to a deterministic top-k by user id bounds every bucket at CAP²/2 pairs
# regardless of skew. The cap is mirrored verbatim in every oracle
# (row_number() OVER (PARTITION BY <bucket key> ORDER BY u) <= 256) so the
# driver hash attests the CAPPED measure, not an uncapped ideal. Fixture
# buckets sit far below the cap (sf0.1 max = 12 participants), so fixture
# results are unchanged; the BINDING case is pinned by
# tests/test_r9_invariants.py, which plants a synthetic hot bucket above
# the cap and checks Spark against DuckDB on the capped edge list.
PRESENCE_BUCKET_CAP = 256


def _capped_presence(pres: DataFrame, *keys: str) -> DataFrame:
    """Deterministic per-bucket participant cap for co-presence graphs:
    keep the first PRESENCE_BUCKET_CAP users (ordered by user id) within
    every bucket key group. One partitioned row_number whose exchange is
    on the same bucket key the self-join shuffles on anyway, so the cap
    adds no extra shuffle — the join reuses the window's partitioning."""
    w = W.partitionBy(*keys).orderBy("u")
    return (
        pres.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PRESENCE_BUCKET_CAP)
        .drop("rn")
    )


_SCRATCH_DIRS: set = set()


def _scratch_dir(spark: SparkSession, sf_dir: str, tag: str) -> str:
    """Session-scoped scratch path for write→read round-trip queries:
    keyed by the Spark applicationId so concurrent sessions (bench +
    pytest on one box) never overwrite each other's intermediates, and
    stable within a session so re-runs reuse mode('overwrite'). Every
    path handed out is removed at interpreter exit — per-session names
    would otherwise accumulate in /tmp unboundedly across runs."""
    import atexit
    import os
    import shutil
    import tempfile

    app = spark.sparkContext.applicationId.replace("-", "_")
    sf = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"bps_{tag}_{sf}_{app}")
    if not _SCRATCH_DIRS:
        atexit.register(
            lambda: [shutil.rmtree(p, ignore_errors=True) for p in _SCRATCH_DIRS]
        )
    _SCRATCH_DIRS.add(path)
    return path


def _const_partition(col: str):
    """Constant-valued but NON-FOLDABLE window partition key for ranking a
    bounded (top-k) survivor set on a single deliberate partition without
    the WindowExec no-partition warning: a plain ``lit(0)`` is folded by
    the analyzer, and ``col * 0`` over a NON-NULLABLE column is folded by
    the arithmetic simplification rules — a CASE WHEN over the column
    survives both while still evaluating to a constant."""
    return F.when(F.length(col) >= 0, F.lit(0))


# ---------------------------------------------------------------------------
# Event-stream analytics
# ---------------------------------------------------------------------------


@query(
    "events_sessionize_gap",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
      FROM ordered
    ), per AS (
      SELECT user_id, sid, count(*) AS n FROM sess GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(max(n) AS BIGINT) AS max_session_events,
           CAST(sum(n) AS BIGINT) AS n_events
    FROM per GROUP BY user_id
    """,
)
def events_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization (the batch twin of
    streaming.session_counts): a session breaks after 10 min of user
    inactivity.

    Spark-first: lag + running-sum windows over ONE shuffle on user_id —
    no self-join, no session-id explosion; (ts, event_id) is a total
    per-user order so the running sum is deterministic. At 100 TB this is
    the canonical sessionize plan: both windows and the final per-user
    aggregate reuse the same hash partitioning on user_id."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    e = t(spark, sf_dir, "events")
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull() | ((F.unix_micros(F.col("ts")) - F.unix_micros(prev)) > SESSION_GAP_US),
        1,
    ).otherwise(0)
    sess = e.select("user_id", "ts", "event_id").withColumn(
        "sid", F.sum(is_new).over(w)
    )
    per = sess.groupBy("user_id", "sid").agg(F.count("*").alias("n"))
    return per.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.max("n").alias("max_session_events"),
        F.sum("n").alias("n_events"),
    )


@query(
    "events_funnel_conversion",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS v,
             min(CASE WHEN event_type = 'click' THEN ts END) AS c,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS p
      FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(v) AS BIGINT) AS n_view,
           CAST(sum(CASE WHEN v IS NOT NULL AND c IS NOT NULL AND v < c
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
           CAST(sum(CASE WHEN v IS NOT NULL AND c IS NOT NULL AND p IS NOT NULL
                          AND v < c AND c < p
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click_purchase
    FROM per_user
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): users whose FIRST view
    precedes their first click precedes their first purchase.

    Spark-first: conditional min-aggregation — one shuffle on user_id,
    one row per user, then a single global roll-up. The naive 3-way
    self-join of events explodes at 100 TB; this never materializes more
    than |users| rows."""
    e = t(spark, sf_dir, "events")

    def first_ts(etype: str):
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    per_user = e.groupBy("user_id").agg(
        first_ts("view").alias("v"), first_ts("click").alias("c"), first_ts("purchase").alias("p")
    )
    v, c, p = F.col("v"), F.col("c"), F.col("p")
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("v").alias("n_view"),
        F.sum(
            F.when(v.isNotNull() & c.isNotNull() & (v < c), 1).otherwise(0)
        ).alias("n_view_click"),
        F.sum(
            F.when(
                v.isNotNull() & c.isNotNull() & p.isNotNull() & (v < c) & (c < p), 1
            ).otherwise(0)
        ).alias("n_view_click_purchase"),
    )


@query(
    "events_daily_retention",
    oracle="""
    WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
    SELECT strftime(a.d, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(count(b.user_id) AS BIGINT) AS n_retained
    FROM du a LEFT JOIN du b ON a.user_id = b.user_id AND b.d = a.d + 1
    GROUP BY a.d
    """,
)
def events_daily_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-day retention: of the users active on day d, how many return
    on d+1.

    Spark-first: dedup to (user, day) FIRST (the distinct is the heavy
    shuffle and it shrinks 10k events → |user×day|), then retention is a
    per-user lead() over the distinct days (r14: replaces the
    (user_id, day+1) self equi-join — du is distinct, so the join matched
    at most the single next active day, which is exactly lead; one
    exchange + sort where the join shape paid two). The day column is
    emitted as a string per the registry timestamp discipline."""
    e = t(spark, sf_dir, "events")
    du = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    nxt = F.lead("d").over(W.partitionBy("user_id").orderBy("d"))
    return (
        du.select("d", (nxt == F.date_add("d", 1)).cast("int").alias("_ret"))
        .groupBy(F.col("d").alias("_d"))
        .agg(
            F.count("*").alias("n_active"),
            F.sum(F.coalesce("_ret", F.lit(0))).cast("bigint").alias("n_retained"),
        )
        .select(F.date_format("_d", "yyyy-MM-dd").alias("day"), "n_active", "n_retained")
    )


# ---------------------------------------------------------------------------
# Corpus statistics
# ---------------------------------------------------------------------------


@query(
    "llmops_token_count_compare",
    oracle=r"""
    WITH per_doc AS (
      SELECT source,
             length(list_filter(string_split_regex(trim(text), '\s+'),
                                s -> length(s) > 0)) AS ws,
             length(regexp_extract_all(text, '\w{1,4}|[^\w\s]')) AS bpe
      FROM documents
    )
    SELECT source,
           CAST(sum(ws) AS BIGINT) AS ws_tokens,
           CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
           round(CAST(sum(bpe) AS DOUBLE) / sum(ws), 6) AS bpe_per_ws
    FROM per_doc GROUP BY source
    """,
)
def llmops_token_count_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer cost model: whitespace vs BPE-ish (4-char subword chunks,
    ``\\w{1,4}|[^\\w\\s]``) token counts per source — the ratio is what a
    training-data budget planner multiplies corpus sizes by. Pure JVM
    column expressions; the regex classes are deliberately ASCII so Java
    and RE2 agree. The subword chunking makes the ratio discriminating on
    punctuation-free corpora (the plain word-count form equals whitespace
    tokenization there — r7 vacuous-fixture audit)."""
    d = t(spark, sf_dir, "documents")
    per = d.select(
        "source",
        token_count_ws(F.col("text")).alias("ws"),
        token_count_bpe_ish(F.col("text")).alias("bpe"),
    )
    return per.groupBy("source").agg(
        F.sum("ws").alias("ws_tokens"),
        F.sum("bpe").alias("bpe_tokens"),
        F.round(F.try_divide(F.sum("bpe").cast("double"), F.sum("ws")), 6).alias("bpe_per_ws"),
    )


@query(
    "llmops_length_histogram",
    oracle="""
    SELECT n_chars // 200 AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1
    """,
)
def llmops_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram (200-char buckets) — the length-filter
    design input for curation. Map-side partial aggregation; integer
    arithmetic only, so hash-exact across engines."""
    d = t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.expr("n_chars div 200").alias("bucket"))
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@query(
    "llmops_sentence_stats",
    oracle=r"""
    WITH per_doc AS (
      SELECT source,
             greatest(
               length(list_filter(string_split_regex(text, '[.!?]+'),
                                  s -> length(trim(s)) > 0)),
               CAST(ceil(length(list_filter(string_split_regex(trim(text), '\s+'),
                                            s -> length(s) > 0)) / 12.0) AS BIGINT)
             ) AS n_sent
      FROM documents
    )
    SELECT source,
           CAST(sum(n_sent) AS BIGINT) AS total_sentences,
           round(CAST(sum(n_sent) AS DOUBLE) / count(*), 6) AS avg_sentences,
           CAST(max(n_sent) AS BIGINT) AS max_sentences
    FROM per_doc GROUP BY source
    """,
)
def llmops_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segmentation stats per source for chunking/packing design: a doc's
    segment count is the larger of its terminal-punctuation sentence count
    and ceil(words / 12) — the 12-word tiling floor is what a packer
    actually uses on text with no sentence punctuation (transcripts, logs,
    and this fixture, where a pure [.!?] split yields exactly one
    "sentence" per doc and a constant metric — r7 vacuous-fixture audit).
    Column expressions only; exact-int sums divided as doubles per the
    registry ratio discipline."""
    d = t(spark, sf_dir, "documents")
    n_punct = F.size(
        F.filter(F.split(F.col("text"), r"[.!?]+"), lambda s: F.length(F.trim(s)) > 0)
    )
    n_tiles = F.ceil(token_count_ws(F.col("text")) / 12.0).cast("bigint")
    per = d.select("source", F.greatest(n_punct.cast("bigint"), n_tiles).alias("n_sent"))
    return per.groupBy("source").agg(
        F.sum("n_sent").alias("total_sentences"),
        F.round(F.sum("n_sent").cast("double") / F.count("*"), 6).alias("avg_sentences"),
        F.max("n_sent").alias("max_sentences"),
    )


@query(
    "llmops_source_token_entropy",
    oracle=r"""
    WITH tok AS (
      SELECT source, lower(tk.tok) AS tok
      FROM documents,
           UNNEST(list_filter(string_split_regex(trim(text), '\s+'),
                              s -> length(s) > 0)) AS tk(tok)
    ), cnt AS (
      SELECT source, tok, count(*) AS c FROM tok GROUP BY 1, 2
    ), tot AS (
      SELECT source, sum(c) AS n, count(*) AS vocab FROM cnt GROUP BY 1
    )
    SELECT c.source,
           CAST(t.n AS BIGINT) AS n_tokens,
           CAST(t.vocab AS BIGINT) AS vocab,
           round(-sum((CAST(c.c AS DOUBLE) / t.n) * ln(CAST(c.c AS DOUBLE) / t.n)), 6)
             AS entropy
    FROM cnt c JOIN tot t USING (source)
    GROUP BY c.source, t.n, t.vocab
    """,
)
def llmops_source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the per-source token distribution — the
    diversity signal behind domain-mixing weights.

    Spark-first: explode → two hash aggregations sharing the source key;
    the token explosion is the only large intermediate and it partial-
    aggregates map-side. Entropy sums double terms of similar magnitude
    so round-6 is far above the accumulation-order noise floor."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(F.transform(tokens(F.col("text")), F.lower)).alias("tok")
    )
    cnt = tok.groupBy("source", "tok").agg(F.count("*").alias("c"))
    tot = cnt.groupBy("source").agg(
        F.sum("c").alias("n"), F.count("*").alias("vocab")
    )
    p = F.col("c").cast("double") / F.col("n")
    return (
        cnt.join(tot, "source")
        .groupBy("source", "n", "vocab")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("entropy"))
        .select(
            "source",
            F.col("n").alias("n_tokens"),
            "vocab",
            "entropy",
        )
    )


# ---------------------------------------------------------------------------
# Embeddings + multimodal
# ---------------------------------------------------------------------------


@query(
    "llmops_embedding_quantize",
    oracle="""
    WITH s AS (
      SELECT vec_id, embedding,
             greatest(list_max(list_transform(embedding,
                                              x -> abs(CAST(x AS DOUBLE)))), 1e-9) AS sc
      FROM embeddings
    ), q AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(floor(CAST(x AS DOUBLE) / sc * 127) AS INT)) AS qv
      FROM s
    )
    SELECT vec_id,
           md5(array_to_string(qv, ',')) AS q_sig,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_min(qv) AS INT) AS q_min,
           CAST(list_max(qv) AS INT) AS q_max
    FROM q
    """,
)
def llmops_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8-style quantization: per-vector max-abs scale, floor
    to [-127, 127]. ``floor`` (not ``round``) keeps the result bit-exact
    across engines; float32→double widening is exact so both engines see
    identical doubles. Shuffle-free map stage — the quantized corpus is
    what ships to the ANN index at 100 TB (4× smaller than float32)."""
    e = t(spark, sf_dir, "embeddings")
    dbl = lambda x: x.cast("double")  # noqa: E731
    with_scale = e.withColumn(
        "_sc",
        F.greatest(
            F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(dbl(x)))),
            F.lit(1e-9),
        ),
    )
    q = F.transform(
        F.col("embedding"), lambda x: F.floor(dbl(x) / F.col("_sc") * 127).cast("int")
    )
    # Scalars + an md5 over the joined values pin the full array content
    # without emitting an array column (engine result-type drift).
    qd = with_scale.select("vec_id", q.alias("qv"))
    return qd.select(
        "vec_id",
        F.md5(
            F.array_join(F.transform(F.col("qv"), lambda v: v.cast("string")), ",")
        ).alias("q_sig"),
        F.aggregate(F.col("qv"), F.lit(0).cast("bigint"), lambda a, x: a + x).alias("q_sum"),
        F.array_min("qv").alias("q_min"),
        F.array_max("qv").alias("q_max"),
    )


@query(
    "llmops_multimodal_resize",
    oracle="""
    SELECT doc_id, 32 AS width, 32 AS height, CAST(1024 AS BIGINT) AS n_resized
    FROM documents
    """,
)
def llmops_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing over binary payloads (operators.multimodal.
    resize_image, codec stubbed per brief): every blob resizes to an
    exactly width×height-byte payload via Arrow-batched mapInPandas. The
    oracle pins the row mapping and the byte-budget invariant; payload
    content is covered by unit tests (test_llmops)."""
    from batch_public_spark.operators.multimodal import resize_image, synthesize_blobs

    d = t(spark, sf_dir, "documents")
    r = resize_image(synthesize_blobs(d), blob_col="blob", id_col="doc_id")
    return r.select(
        "doc_id", "width", "height", F.octet_length("resized").alias("n_resized")
    )


# ---------------------------------------------------------------------------
# SQL-surface fill-ins
# ---------------------------------------------------------------------------


@query(
    "window_cume_dist_orders",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           round(cume_dist() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice), 6) AS cd
    FROM orders
    WHERE o_orderdate >= DATE '1995-03-01' AND o_orderdate < DATE '1995-04-01'
    """,
)
def window_cume_dist_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist window function (ties share a value, so it is
    deterministic without a tie-break — unlike row_number). The month
    filter prunes at the scan before the window shuffle."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-03-01") & (F.col("o_orderdate") < "1995-04-01")
    )
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "agg_regr_price_qty",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_regr_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (slope/intercept/R² of price on
    quantity per return flag) — single-pass partial-aggregable moments,
    so they scale like any hash aggregate. Round-6 sits far above the
    double-accumulation noise of the internal moment sums."""
    li = t(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("n"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
    )


@query(
    "join_null_safe_eq",
    oracle="""
    WITH c AS (
      SELECT nullif(c_nationkey % 5, 4) AS k, count(*) AS cn
      FROM customer GROUP BY 1
    ), s AS (
      SELECT nullif(s_nationkey % 5, 4) AS k, count(*) AS sn
      FROM supplier GROUP BY 1
    )
    SELECT coalesce(CAST(c.k AS VARCHAR), 'NULL') AS k,
           CAST(c.cn * s.sn AS BIGINT) AS n_pairs
    FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.k
    """,
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): NULL
    keys match each other instead of vanishing.

    Spark-first: both sides pre-aggregate to per-key counts BEFORE the
    join, so the many-to-many pair explosion is never materialized —
    n_pairs is a product of two tiny aggregates. At 100 TB the naive
    row-level null-safe join is a hot-key disaster; this shape is the
    scale answer."""
    c = (
        t(spark, sf_dir, "customer")
        .groupBy(F.expr("nullif(c_nationkey % 5, 4)").alias("k"))
        .agg(F.count("*").alias("cn"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.expr("nullif(s_nationkey % 5, 4)").alias("k"))
        .agg(F.count("*").alias("sn"))
    )
    joined = c.join(s, c["k"].eqNullSafe(s["k"]))
    # The NULL bucket is emitted as the string 'NULL': a nullable numeric
    # output column round-trips through pandas as float+NaN on the oracle
    # side, which would never hash-match.
    return joined.select(
        F.coalesce(c["k"].cast("string"), F.lit("NULL")).alias("k"),
        (F.col("cn") * F.col("sn")).alias("n_pairs"),
    )


@query(
    "string_funcs_extended",
    oracle="""
    SELECT p_partkey,
           split_part(p_type, ' ', 2) AS type_mid,
           translate(p_name, 'aeiou', 'AEIOU') AS shouted,
           reverse(p_brand) AS brand_rev,
           repeat(left(p_name, 3), 2) AS echo,
           right(p_type, 4) AS type_tail
    FROM part WHERE p_partkey % 7 = 0
    """,
)
def string_funcs_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function battery #2: split_part / translate / reverse /
    repeat / left / right — all JVM-side, all pushdown-friendly (the
    modulo filter reaches the scan)."""
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") % 7 == 0)
    return p.select(
        "p_partkey",
        F.expr("split_part(p_type, ' ', 2)").alias("type_mid"),
        F.translate("p_name", "aeiou", "AEIOU").alias("shouted"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.expr("left(p_name, 3)"), 2).alias("echo"),
        F.expr("right(p_type, 4)").alias("type_tail"),
    )


@query(
    "date_trunc_weekday_matrix",
    oracle="""
    SELECT strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS quarter,
           CAST(isodow(o_orderdate) - 1 AS INT) AS weekday,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY 1, 2
    """,
)
def date_trunc_weekday_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc + ISO-weekday matrix over orders (quarter × weekday
    order counts). Weekday is Monday=0 in both engines (Spark ``weekday``
    ≡ DuckDB ``isodow - 1``); quarters format to strings per the registry
    timestamp discipline."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_format(F.date_trunc("quarter", "o_orderdate"), "yyyy-MM-dd").alias("quarter"),
        F.weekday("o_orderdate").alias("weekday"),
    ).agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# Iterative algorithms + sequence analytics
# ---------------------------------------------------------------------------


@query(
    "llmops_kmeans_lloyd",
    oracle="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
    c0 AS (
      SELECT vec_id AS cluster_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 8
    ),
    a1 AS (
      SELECT vec_id, vv, cluster_id FROM (
        SELECT v.vec_id, v.vv, c.cluster_id,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
                 round(list_sum(list_transform(list_zip(v.vv, c.cv),
                                               s -> (s[1]-s[2])^2)), 6),
                 c.cluster_id) AS r
        FROM v CROSS JOIN c0 c) WHERE r = 1
    ),
    dims AS (
      -- dim derived from the vector itself (zipped unnest; DuckDB 1.0 can't
      -- lateral-ref len(vv) inside a generate_series table function, but a
      -- SELECT-list unnest can), so a fixture dim change cannot desync this
      -- oracle from the Spark side
      SELECT cluster_id, pos, round(avg(x), 6) AS m FROM (
        SELECT cluster_id, unnest(generate_series(1, len(vv))) AS pos,
               unnest(vv) AS x
        FROM a1
      ) GROUP BY cluster_id, pos
    ),
    c1 AS (SELECT cluster_id, array_agg(m ORDER BY pos) AS cv FROM dims GROUP BY cluster_id),
    a2 AS (
      SELECT vec_id, cluster_id, d2 FROM (
        SELECT v.vec_id, c.cluster_id,
               round(list_sum(list_transform(list_zip(v.vv, c.cv),
                                             s -> (s[1]-s[2])^2)), 6) AS d2,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
                 round(list_sum(list_transform(list_zip(v.vv, c.cv),
                                               s -> (s[1]-s[2])^2)), 6),
                 c.cluster_id) AS r
        FROM v CROSS JOIN c1 c) WHERE r = 1
    )
    SELECT cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(round(sum(CAST(d2 AS DECIMAL(18,6))), 4) AS DOUBLE) AS inertia
    FROM a2 GROUP BY cluster_id
    """,
)
def llmops_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means, one Lloyd iteration + final stats (k=8) — the
    iterative-algorithm shape on DataFrames, fully oracle-checked because
    every per-iteration quantity (distance, mean) is rounded to a fixed
    precision. See operators.semantic.kmeans_lloyd for the 100 TB plan
    notes (broadcast assignment, one dim-exploded shuffle per recompute)."""
    from batch_public_spark.operators.semantic import kmeans_lloyd

    return kmeans_lloyd(t(spark, sf_dir, "embeddings"), k=8, iters=1)


@query(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ), pairs AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ), tot AS (
      SELECT prev_type, sum(n) AS t FROM pairs GROUP BY 1
    )
    SELECT p.prev_type, p.next_type,
           CAST(p.n AS BIGINT) AS n,
           round(CAST(p.n AS DOUBLE) / t.t, 6) AS prob
    FROM pairs p JOIN tot t USING (prev_type)
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences
    (which event follows which, with conditional probabilities).

    Spark-first: lag window on the (user_id) shuffle, then two tiny
    aggregates — |types|² output regardless of input size, the classic
    clickstream summarization at 100 TB."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    pairs = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n")
    )
    tot = pairs.groupBy("prev_type").agg(F.sum("n").alias("t"))
    return pairs.join(tot, "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("t"), 6).alias("prob"),
    )


@query(
    "agg_hll_union_region",
    oracle=None,  # Datasketches HLL binaries are engine-specific: rows-only
)
def agg_hll_union_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch aggregation: per-nation HyperLogLog sketches of
    customer keys, UNIONED up to region level and estimated — the
    canonical two-level distinct-count at 100 TB (sketches shuffle as a
    few KB per group instead of re-shuffling raw keys for each rollup
    level; re-aggregation is free once sketches exist).

    Rows-only check by nature (Datasketches binaries differ across
    engines); the estimate-vs-exact tolerance is asserted in
    tests/test_llmops.py."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    per_nation = c.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sk")
    )
    with_region = per_nation.join(
        F.broadcast(n.select("n_nationkey", "n_regionkey")),
        per_nation["c_nationkey"] == F.col("n_nationkey"),
    )
    return (
        with_region.groupBy("n_regionkey")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_customers"))
        .select(F.col("n_regionkey").alias("region_key"), "approx_customers")
    )


@query(
    "scalar_try_cast_battery",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER)) AS BIGINT)
             AS n_prio_int,
           CAST(count(TRY_CAST(o_orderstatus AS INTEGER)) AS BIGINT) AS n_status_int,
           CAST(count(TRY_CAST(CAST(o_orderdate AS VARCHAR) AS DATE)) AS BIGINT)
             AS n_date_roundtrip,
           CAST(sum(COALESCE(TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER), 0))
             AS BIGINT) AS prio_sum
    FROM orders
    """,
)
def scalar_try_cast_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe casting (try_cast): malformed values become NULL instead
    of failing the job — the ingestion posture for dirty data at scale
    (the reference's parse-or-quarantine stance, S3, as an expression).
    Numeric priority prefix parses; alphabetic status does not; dates
    round-trip through strings."""
    o = t(spark, sf_dir, "orders")
    prio = F.expr("try_cast(substr(o_orderpriority, 1, 1) AS INT)")
    return o.agg(
        F.count("*").alias("n"),
        F.count(prio).alias("n_prio_int"),
        F.count(F.expr("try_cast(o_orderstatus AS INT)")).alias("n_status_int"),
        F.count(
            F.expr("try_cast(cast(o_orderdate AS STRING) AS DATE)")
        ).alias("n_date_roundtrip"),
        F.sum(F.coalesce(prio, F.lit(0))).alias("prio_sum"),
    )


@query(
    "llmops_train_val_test_split",
    oracle="""
    WITH tagged AS (
      SELECT source, n_chars,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd')
                    THEN 'val'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e', 'f')
                    THEN 'test'
                  ELSE 'train' END AS split
      FROM documents
    )
    SELECT source, split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM tagged GROUP BY source, split
    """,
)
def llmops_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 75/12.5/12.5 train/val/test split: the assignment is
    a pure function of the stable document id (md5 first hex digit), so
    it is reproducible across runs, engines, partitionings — and
    immovable: a document can never migrate between splits as the corpus
    grows (the property that prevents eval contamination). Shuffle-free
    tag + one aggregation."""
    d = t(spark, sf_dir, "documents")
    h1 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(h1.isin("c", "d"), "val")
        .when(h1.isin("e", "f"), "test")
        .otherwise("train")
    )
    return d.select("source", "n_chars", split.alias("split")).groupBy(
        "source", "split"
    ).agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))


# ---------------------------------------------------------------------------
# Corpus LM scoring + vocabulary induction + hard negatives
# ---------------------------------------------------------------------------


@query(
    "llmops_bigram_logprob_score",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_transform(list_filter(string_split_regex(trim(text), '\s+'),
                                        s -> length(s) > 0), s -> lower(s)) AS tk
      FROM documents
    ), big AS (
      SELECT doc_id,
             list_transform(
               list_zip(tk[1:len(tk)-1], tk[2:len(tk)]),
               s -> s[1] || ' ' || s[2]) AS bgs
      FROM toks WHERE len(tk) >= 2
    ), doc_bigrams AS (
      SELECT doc_id, b.bg FROM big, UNNEST(bgs) AS b(bg)
    ), c2 AS (SELECT bg, count(*) AS n2 FROM doc_bigrams GROUP BY bg),
    c1 AS (
      SELECT split_part(bg, ' ', 1) AS w1, sum(n2) AS n1 FROM c2 GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln(CAST(c2.n2 AS DOUBLE) / c1.n1)), 6) AS avg_logprob
    FROM doc_bigrams d
    JOIN c2 USING (bg)
    JOIN c1 ON c1.w1 = split_part(d.bg, ' ', 1)
    GROUP BY d.doc_id
    """,
)
def llmops_bigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality signal: score every document by the average
    bigram log-probability under a language model estimated from the
    corpus itself (MLE, no smoothing needed — scoring the training
    corpus, every bigram is seen).

    Spark-first: bigrams come from ``zip_with`` over the token array (no
    per-doc window), the LM is two hash aggregations, and scoring joins
    the exploded bigrams back to the LM. At 100 TB the LM side is pruned
    to top-K bigrams and BROADCAST (docstring contract: the join below is
    the exact-oracle shape; the broadcast variant is the same plan with a
    pruned build side)."""
    # spread(): tokenize + bigram zip/explode is per-row text compute
    # over the 1-task fixture scan (guide §2.5); no-op at scale.
    d = spread(t(spark, sf_dir, "documents").select("doc_id", "text"))
    tk = F.transform(tokens(F.col("text")), F.lower)
    toks = d.select("doc_id", tk.alias("tk")).filter(F.size("tk") >= 2)
    n = F.size("tk")
    bgs = F.zip_with(
        F.slice(F.col("tk"), 1, n - 1),
        F.slice(F.col("tk"), 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    doc_bigrams = toks.select("doc_id", F.explode(bgs).alias("bg"))
    c2 = doc_bigrams.groupBy("bg").agg(F.count("*").alias("n2"))
    # n1 (unigram-prefix total) as a window over the bigram counts: the LM
    # becomes ONE table with the per-bigram logprob precomputed, so scoring
    # is a single join instead of two.
    lm = c2.withColumn(
        "lp",
        F.log(
            F.col("n2").cast("double")
            / F.sum("n2").over(W.partitionBy(F.expr("split_part(bg, ' ', 1)")))
        ),
    ).select("bg", "lp")
    return (
        doc_bigrams.join(lm, "bg")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("lp"), 6).alias("avg_logprob"),
        )
    )


@query(
    "llmops_bpe_first_merges",
    oracle=r"""
    WITH toks AS (
      SELECT lower(tk.tok) AS tok
      FROM documents,
           UNNEST(list_filter(string_split_regex(trim(text), '\s+'),
                              s -> length(s) > 0)) AS tk(tok)
    ), pairs AS (
      SELECT substr(tok, i, 2) AS pair
      FROM toks CROSS JOIN generate_series(1, 30) g(i)
      WHERE length(tok) >= 2 AND i <= length(tok) - 1 AND i <= 30
    )
    SELECT pair, CAST(n AS BIGINT) AS n, CAST(rank AS BIGINT) AS rank FROM (
      SELECT pair, count(*) AS n,
             ROW_NUMBER() OVER (ORDER BY count(*) DESC, pair) AS rank
      FROM pairs GROUP BY pair) WHERE rank <= 20
    """,
)
def llmops_bpe_first_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary induction, step one: the 20 most frequent adjacent
    character pairs inside tokens — the first merge candidates a BPE
    trainer would pick. (A full trainer iterates this exact count with
    the winning pair collapsed; each round is this same plan.)

    Scale shape: character-pair explosion partial-aggregates map-side;
    the global top-20 is TakeOrdered, never a full sort. Positions are
    capped at 30 per token in BOTH engines (DuckDB cannot lateral-ref
    token length in generate_series; tokens this long are noise for
    merge statistics anyway)."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(F.transform(tokens(F.col("text")), F.lower)).alias("tok")
    ).filter(F.length("tok") >= 2)
    pairs = tok.select(
        F.explode(
            F.sequence(F.lit(1), F.least(F.length("tok") - 1, F.lit(30)))
        ).alias("i"),
        "tok",
    ).select(F.expr("substr(tok, i, 2)").alias("pair"))
    counted = pairs.groupBy("pair").agg(F.count("*").alias("n"))
    # Global top-k via orderBy+limit (TakeOrdered — per-partition heaps,
    # never a single-partition full sort); the rank window then runs over
    # the <=20 survivors only.
    top = counted.orderBy(F.desc("n"), "pair").limit(20)
    # Single deliberate partition over the <=20 survivors; see
    # _const_partition for why neither lit(0) nor pair*0 works here.
    w = W.partitionBy(_const_partition("pair")).orderBy(F.desc("n"), "pair")
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("pair", "n", F.col("rank").cast("bigint").alias("rank"))
    )


@query(
    "llmops_hard_negatives",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, label AS qlabel,
                      CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 5),
    s AS (SELECT q.query_id, v.vec_id AS neighbor_id, v.label AS nlabel,
                 ROUND(list_cosine_similarity(q.qv, CAST(v.embedding AS DOUBLE[])), 6)
                   AS sim
          FROM embeddings v CROSS JOIN q
          WHERE v.vec_id != q.query_id AND v.label != q.qlabel)
    SELECT query_id, neighbor_id, CAST(nlabel AS INT) AS neg_label, sim,
           CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS rank
      FROM s) WHERE rank <= 3
    """,
)
def llmops_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the top-3
    most similar vectors with a DIFFERENT label — maximally confusing
    negatives. Same broadcast-query / corpus-stays-put shape as
    ann_bruteforce with the label anti-filter pushed below the ranking."""
    from batch_public_spark.operators.semantic import fused_cosine, row_norm

    e = t(spark, sf_dir, "embeddings")
    # norms once per row (row_norm/fused_cosine — bit-identical to the
    # unfused cosine; the pair stream pays only the dot fold)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qv"),
        row_norm(F.col("embedding")).alias("qn"),
    )
    v = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("nlabel"),
        F.col("embedding").alias("vv"),
        row_norm(F.col("embedding")).alias("vn"),
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(
            (F.col("neighbor_id") != F.col("query_id"))
            & (F.col("nlabel") != F.col("qlabel"))
        )
        .select(
            "query_id",
            "neighbor_id",
            F.col("nlabel").cast("int").alias("neg_label"),
            F.round(
                fused_cosine(F.col("qv"), F.col("vv"), F.col("qn"), F.col("vn")), 6
            ).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "neg_label", "sim", F.col("rank").cast("bigint").alias("rank"))
    )


@query(
    "llmops_term_pagerank",
    oracle=r"""
    WITH dt AS (
      SELECT DISTINCT doc_id, lower(tk.tok) AS term
      FROM documents,
           UNNEST(list_filter(string_split_regex(trim(text), '\s+'),
                              s -> length(s) > 0)) AS tk(tok)
    ), vocab AS (
      SELECT term FROM (
        SELECT term, ROW_NUMBER() OVER (ORDER BY count(*) DESC, term) AS r
        FROM dt GROUP BY term) WHERE r <= 30
    ), dv AS (SELECT dt.doc_id, dt.term FROM dt JOIN vocab USING (term)),
    pairs AS (
      SELECT a.term AS u, b.term AS v, count(*) AS w
      FROM dv a JOIN dv b ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY 1, 2
    ), e AS (SELECT u, v, w FROM pairs UNION ALL SELECT v, u, w FROM pairs),
    verts AS (SELECT DISTINCT u AS vertex FROM e),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
    wdeg AS (SELECT u, sum(w) AS wdeg FROM e GROUP BY u),
    pr0 AS (SELECT vertex, round(1.0 / nn.n, 8) AS pr FROM verts, nn),
    it1 AS (
      SELECT vv.vertex,
             round((1.0 - 0.85) / nn.n
                   + 0.85 * coalesce(m.in_mass, 0.0), 8) AS pr
      FROM verts vv CROSS JOIN nn
      LEFT JOIN (
        SELECT e.v AS vertex, sum(p.pr * e.w / d.wdeg) AS in_mass
        FROM e JOIN pr0 p ON e.u = p.vertex JOIN wdeg d ON e.u = d.u
        GROUP BY e.v) m USING (vertex)
    ), it2 AS (
      SELECT vv.vertex,
             round((1.0 - 0.85) / nn.n
                   + 0.85 * coalesce(m.in_mass, 0.0), 8) AS pr
      FROM verts vv CROSS JOIN nn
      LEFT JOIN (
        SELECT e.v AS vertex, sum(p.pr * e.w / d.wdeg) AS in_mass
        FROM e JOIN it1 p ON e.u = p.vertex JOIN wdeg d ON e.u = d.u
        GROUP BY e.v) m USING (vertex)
    )
    SELECT vertex AS term, round(pr, 6) AS pagerank, CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY pr DESC, vertex) AS rank FROM it2)
    WHERE rank <= 20
    """,
)
def llmops_term_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the term co-occurrence graph (top-30-df vocabulary,
    doc-level co-occurrence edges, 2 damped iterations) — the second
    fully-oracle-checked iterative algorithm (with semantic.kmeans_lloyd):
    per-iteration rounding makes the fixpoint math bit-reproducible.

    Spark-first: vocabulary and edges are two aggregations; each PageRank
    round is one edge⋈rank join + one aggregation, both shuffled on the
    vertex key (operators.graph.pagerank_weighted — localCheckpoint per
    round bounds lineage). At 100 TB the rank vector is ~|vocab| rows and
    broadcasts; the edge list is the only large operand."""
    from batch_public_spark.operators.graph import pagerank_weighted

    d = t(spark, sf_dir, "documents")
    dt = (
        d.select(
            "doc_id",
            F.explode(F.transform(tokens(F.col("text")), F.lower)).alias("term"),
        )
        .distinct()
        # two consumers (vocabulary pass + the vocab-filtered projection):
        # cut the corpus explode+distinct once, lazily
        .localCheckpoint(eager=False)
    )
    # Top-30 vocabulary by document frequency via TakeOrdered — at 100 TB
    # the term vocabulary is tens of millions of rows; orderBy+limit keeps
    # the selection a per-partition heap instead of a one-partition window.
    vocab = (
        dt.groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), "term")
        .limit(30)
        .select("term")
    )
    dv = dt.join(F.broadcast(vocab), "term").select("doc_id", "term")
    a, b = dv.alias("a"), dv.alias("b")
    pairs = (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.term") < F.col("b.term")))
        .groupBy(F.col("a.term").alias("u"), F.col("b.term").alias("v"))
        .agg(F.count("*").alias("w"))
    )
    sym = pairs.unionByName(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    )
    pr = pagerank_weighted(sym, src="u", dst="v", weight="w", iters=2)
    # TakeOrdered top-20, then rank the 20 survivors (window input <= 20 rows).
    top = pr.orderBy(F.desc("pr"), "vertex").limit(20)
    # Constant-valued non-foldable partition key (see llmops_bpe_first_merges).
    wr = W.partitionBy(F.col("pr") * 0).orderBy(F.desc("pr"), "vertex")
    return (
        top.withColumn("rank", F.row_number().over(wr))
        .select(
            F.col("vertex").alias("term"),
            F.round("pr", 6).alias("pagerank"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


@query(
    "join_orders_within_week",
    oracle="""
    SELECT a.o_custkey AS custkey, CAST(count(*) AS BIGINT) AS n_pairs
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND abs(date_diff('day', a.o_orderdate, b.o_orderdate)) <= 7
    GROUP BY a.o_custkey
    """,
)
def join_orders_within_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded interval self-join: per customer, order pairs placed within
    7 days of each other (repeat-purchase burst detection).

    Spark-first: equi-join on o_custkey carries the whole shuffle; the
    date band is a post-join filter inside the sort-merge — never a
    cross join. At 100 TB the refinement is bucketing both sides by
    custkey (sources.bucketing elides the exchange) or week-bucketing the
    date to pre-prune pairs; the per-customer key keeps band explosion
    bounded by per-customer order counts."""
    o = t(spark, sf_dir, "orders")
    a = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("k_a"),
        F.col("o_orderdate").alias("d_a"),
    )
    b = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("k_b"),
        F.col("o_orderdate").alias("d_b"),
    )
    pairs = a.join(b, "custkey").filter(
        (F.col("k_a") < F.col("k_b"))
        & (F.abs(F.datediff("d_a", "d_b")) <= 7)
    )
    return pairs.groupBy("custkey").agg(F.count("*").alias("n_pairs"))


@query(
    "dq_orders_constraints",
    oracle="""
    SELECT 'not_null(o_orderdate)' AS rule,
           CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations
    FROM orders
    UNION ALL
    SELECT 'accepted_values(o_orderstatus)',
           CAST(sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'range(o_totalprice)',
           CAST(sum(CASE WHEN o_totalprice <= 0 OR o_totalprice > 1000000
                           OR o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'unique(o_orderkey)',
           CAST(coalesce(sum(n - 1), 0) AS BIGINT)
    FROM (SELECT o_orderkey, count(*) AS n FROM orders GROUP BY 1 HAVING count(*) > 1)
    UNION ALL
    SELECT 'references(o_custkey)',
           CAST(count(*) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    """,
)
def dq_orders_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate over orders (operators.quality.validate): three
    row-level rules in ONE aggregation pass, key uniqueness as a keyed
    pre-aggregate, referential integrity as an anti-join against the
    customer dim's distinct keys (un-hinted — customer is SF-scaled, so
    the O(|dim|) key frame is AQE-decided, not force-broadcast) — the
    dbt-tests/Deequ surface a lake gates every ingest on, at its
    scale-correct plan shape."""
    from batch_public_spark.operators.quality import (
        RowRule,
        accepted_values,
        not_null,
        validate,
    )

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    # quality.in_range violates on `< min` (exclusive); the oracle's
    # boundary is `<= 0`, so the price rule is written explicitly.

    price_rule = RowRule(
        "range(o_totalprice)",
        (F.col("o_totalprice") <= 0)
        | (F.col("o_totalprice") > 1_000_000)
        | F.col("o_totalprice").isNull(),
    )
    return validate(
        o,
        [
            not_null("o_orderdate"),
            accepted_values("o_orderstatus", ("F", "O", "P")),
            price_rule,
        ],
        unique=["o_orderkey"],
        references=[("o_custkey", c, "c_custkey")],
    )


# ---------------------------------------------------------------------------
# Round-4 additions: sketch accuracy, grouped-map applyInPandas, CSV source
# ---------------------------------------------------------------------------


@query(
    "agg_approx_distinct_accuracy",
    oracle="""
    WITH b AS (
      SELECT round(quantile_cont(o_totalprice, 0.25), 6) AS b1,
             round(quantile_cont(o_totalprice, 0.50), 6) AS b2,
             round(quantile_cont(o_totalprice, 0.75), 6) AS b3
      FROM orders),
    bucketed AS (
      SELECT CASE WHEN o_totalprice <= b1 THEN 'q1'
                  WHEN o_totalprice <= b2 THEN 'q2'
                  WHEN o_totalprice <= b3 THEN 'q3'
                  ELSE 'q4' END AS bucket,
             o_custkey
      FROM orders CROSS JOIN b)
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custkeys,
           TRUE AS within_5pct
    FROM bucketed GROUP BY bucket
    """,
)
def agg_approx_distinct_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ accuracy gate, percentile-bucketed: orders fall into
    price quartiles (exact interpolated quantile boundaries — Spark
    ``percentile`` and DuckDB ``quantile_cont`` agree bit-for-bit on
    doubles), and per bucket the sketch estimate (rsd=0.02) must land
    within 5% of the exact distinct-customer count. The oracle pins the
    exact counts AND the within-tolerance verdict, so a sketch regression
    hash-fails rather than drifting silently.

    Scale shape: the sketch is the 100 TB path (fixed ~KB state per
    bucket, map-side mergeable, no distinct shuffle of the key set); the
    exact count here exists to certify it. Quartile boundaries are one
    tiny agg broadcast onto the scan."""
    o = t(spark, sf_dir, "orders")
    # ONE percentile buffer for all three boundaries (array form): three
    # separate percentile() aggregates each build their own 150k-entry
    # value-count map over the same column — measured 1.5 s vs 0.7 s for
    # the fused form on the single-row-group scan (guide §1.2 step 2).
    # Interpolation arithmetic is identical, so the values are bit-equal.
    b = o.agg(
        F.expr("percentile(o_totalprice, array(0.25, 0.50, 0.75))").alias("bs")
    ).select(
        F.round(F.element_at("bs", 1), 6).alias("b1"),
        F.round(F.element_at("bs", 2), 6).alias("b2"),
        F.round(F.element_at("bs", 3), 6).alias("b3"),
    )
    bucketed = o.crossJoin(F.broadcast(b)).select(
        F.when(F.col("o_totalprice") <= F.col("b1"), "q1")
        .when(F.col("o_totalprice") <= F.col("b2"), "q2")
        .when(F.col("o_totalprice") <= F.col("b3"), "q3")
        .otherwise("q4")
        .alias("bucket"),
        "o_custkey",
    )
    # Expand-free distinct: count(DISTINCT) mixed with a non-distinct
    # aggregate (the HLL sketch) plans through RewriteDistinctAggregates'
    # Expand — every row duplicated per aggregate group, with no partial
    # aggregation on the distinct leg (measured 2.2 s vs 1.0 s at sf0.1).
    # Pre-aggregating to the distinct (bucket, custkey) pairs keeps both
    # legs partially aggregable and feeds the HLL the identical value SET
    # (duplicate inserts never change a sketch), so n_orders, the exact
    # count, and the estimate are all unchanged — verified row-identical.
    pre = bucketed.groupBy("bucket", "o_custkey").agg(F.count("*").alias("c"))
    # count over the key column (not count(*)) so a NULL-custkey group in
    # the pre-aggregate stays excluded, exactly as countDistinct excluded
    # NULLs — equivalence holds for ANY input, not just NOT NULL o_custkey.
    exact = F.count(F.col("o_custkey"))
    approx = F.approx_count_distinct("o_custkey", 0.02)
    return pre.groupBy("bucket").agg(
        F.sum("c").alias("n_orders"),
        exact.alias("exact_custkeys"),
        ((F.abs(approx - exact) / exact) <= F.lit(0.05)).alias("within_5pct"),
    )


@query(
    "llmops_groupwise_zscore",
    oracle="""
    WITH s AS (
      SELECT source,
             count(*) AS n,
             sum(n_chars) AS s1,
             sum(n_chars * n_chars) AS s2
      FROM documents GROUP BY source)
    SELECT d.doc_id, d.source,
           CASE WHEN s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n) <= 0 THEN 0.0
                ELSE round((d.n_chars - s.s1 / s.n)
                           / sqrt(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n)), 6)
           END AS z
    FROM documents d JOIN s USING (source)
    """,
)
def llmops_groupwise_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas``: per-source z-score of document
    length — the registered-query face of the grouped-map Pandas path
    (previously exercised only inside operators.semantic). Each group
    arrives as one Arrow-backed pandas frame; the kernel derives mean and
    population variance from EXACT integer sums (s1, s2) so the float
    pipeline (s1/n, s2/n - mu*mu, IEEE sqrt/divide) is bit-identical to
    the oracle's; rounding happens JVM-side after the UDF (pandas round is
    half-even, Spark/DuckDB round is half-up).

    Scale shape: one shuffle on the group key; group state is O(1) beyond
    the rows themselves. Skewed sources are the caveat at 100 TB — a
    single giant group lands on one worker, so the production variant
    computes (n, s1, s2) via plain aggregation + broadcast join (the
    oracle's own plan) and keeps applyInPandas for kernels that genuinely
    need the whole group in memory."""
    import math

    import pandas as pd  # noqa: F401 (worker-side)

    def zscore(pdf):
        import numpy as np
        import pandas as pd

        x = pdf["n_chars"].to_numpy(dtype="int64")
        n = len(x)
        s1 = int(x.sum())
        s2 = int((x * x).sum())
        mu = s1 / n
        var = s2 / n - mu * mu
        if var <= 0:
            z = np.zeros(n, dtype="float64")
        else:
            z = (x - mu) / math.sqrt(var)
        return pd.DataFrame({"doc_id": pdf["doc_id"], "source": pdf["source"], "z": z})

    d = t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    out = d.groupBy("source").applyInPandas(zscore, "doc_id long, source string, z double")
    return out.select("doc_id", "source", F.round("z", 6).alias("z"))


@query(
    "source_csv_roundtrip",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(count(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(15,4))), 2) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink → CSV source round-trip: write orders out as
    schema-explicit CSV, read it back, aggregate — proving the text
    interchange path preserves keys, decimals, and grouping semantics
    (the oracle aggregates the ORIGINAL parquet, so any CSV encode/decode
    drift hash-fails).

    Scale notes built in: the read declares an explicit schema — never
    ``inferSchema``, which costs a full extra pass over 100 TB; prices
    travel as decimal strings (no float round-trip); the write is
    per-partition parallel and the directory reads back with the same
    parallelism. CSV remains the slowest lake format (no pushdown, no
    column pruning, full-row parse) — this query is the migration/export
    path, not the storage recommendation."""
    out_dir = _scratch_dir(spark, sf_dir, "csv_roundtrip")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(15,4)").alias("o_totalprice"),
    )
    o.write.mode("overwrite").option("header", True).csv(out_dir)
    back = (
        spark.read.option("header", True)
        .schema("o_orderkey long, o_orderstatus string, o_totalprice decimal(15,4)")
        .csv(out_dir)
    )
    return back.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).cast("double").alias("sum_price"),
    )


@query(
    "source_orc_roundtrip",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(15,4))), 2) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink → ORC source round-trip (the second columnar lake format
    Spark ships natively): write orders as ORC, read back
    self-described, aggregate — oracle'd against the ORIGINAL parquet, so
    type fidelity across the format boundary is what's being hashed.

    ORC at scale behaves like parquet (columnar, predicate pushdown,
    column pruning, splittable stripes); this query certifies the format
    path so a lake migrating between the two keeps bit-identical
    aggregates. Decimals travel as real DECIMAL(15,4) — no float
    round-trip."""
    out_dir = _scratch_dir(spark, sf_dir, "orc_roundtrip")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(15,4)").alias("o_totalprice"),
    )
    o.write.mode("overwrite").orc(out_dir)
    back = spark.read.orc(out_dir)
    return back.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).cast("double").alias("sum_price"),
    )


@query(
    "agg_approx_percentile_accuracy",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n,
           round(quantile_cont(o_totalprice, 0.5), 6) AS exact_median,
           TRUE AS within_rank_band
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_approx_percentile_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile accuracy gate, the quantile-sketch companion to
    agg_approx_distinct_accuracy: per priority class, the sketch median
    (accuracy=10000) must land inside the exact [p45, p55] band. The
    oracle pins the exact medians and the band verdict.

    The contract checked is RANK error, not value error — what the GK
    sketch actually guarantees (rank within ±n/accuracy). A value
    tolerance is the wrong gate: the sketch returns a real element, not
    an interpolation, so for small groups the gap between adjacent order
    statistics can exceed any fixed percentage of the median while the
    rank is still exact (observed: sf0.001 2-HIGH, gap > 1%).

    Scale shape: exact percentiles need the full sorted key set per
    group (memory-unbounded at 100 TB); the sketch is fixed-size,
    map-side mergeable state — the only viable plan at scale, certified
    here against the exact answer while the data still fits."""
    o = t(spark, sf_dir, "orders")
    # One percentile buffer for all three exact quantiles (array form):
    # three separate percentile() aggregates each build their own
    # per-group value-count map over the same column; the fused form
    # inserts each row once. Interpolation arithmetic is identical.
    pcts = F.expr("percentile(o_totalprice, array(0.45, 0.5, 0.55))")
    approx = F.expr("approx_percentile(o_totalprice, 0.5, 10000)")
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n"),
            pcts.alias("exs"),
            approx.alias("apx"),
        )
        .select(
            "priority",
            "n",
            F.round(F.element_at("exs", 2), 6).alias("exact_median"),
            (
                (F.col("apx") >= F.element_at("exs", 1))
                & (F.col("apx") <= F.element_at("exs", 3))
            ).alias("within_rank_band"),
        )
    )


@query(
    "llmops_bm25_topk",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, lower(tk.tok) AS term
      FROM documents,
           UNNEST(list_filter(string_split_regex(trim(text), '\s+'),
                              s -> length(s) > 0)) AS tk(tok)
    ), tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok GROUP BY 1, 2),
    dlen AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM tok GROUP BY 1),
    stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                     sum(dl) / count(*) AS avgdl
              FROM dlen),
    dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
    q AS (SELECT term, df FROM dfreq ORDER BY df DESC, term LIMIT 3),
    scored AS (
      SELECT tf.doc_id,
             sum(ln((stats.n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0)
                 * (tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dlen.dl / stats.avgdl))) AS s
      FROM tf JOIN q USING (term)
      JOIN dlen USING (doc_id) CROSS JOIN stats
      GROUP BY tf.doc_id)
    SELECT doc_id, round(s, 6) AS bm25, CAST(rank AS BIGINT) AS rank FROM (
      SELECT doc_id, s,
             ROW_NUMBER() OVER (ORDER BY round(s, 6) DESC, doc_id) AS rank
      FROM scored) WHERE rank <= 10
    """,
)
def llmops_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval (k1=1.2, b=0.75): score every document against the
    corpus's three highest-df terms, return the top-10. The full classic
    formula — idf = ln((N − df + ½)/(df + ½) + 1), tf saturation, length
    normalization — with Spark and the oracle evaluating structurally
    identical float expressions (round-6 hash discipline as in
    llmops_bigram_logprob_score). Ranking orders by the ROUNDED score so
    sub-1e-6 ties break identically in both engines.

    Scale shape: tf/df/dlen are three hash aggregations off one exploded
    scan; the query side (3 terms) and corpus stats (1 row) broadcast;
    scoring touches only postings of query terms (the equi-join IS the
    inverted-index probe); top-10 is TakeOrdered, never a global sort."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.transform(tokens(F.col("text")), F.lower)).alias("term")
    )
    # The tf postings feed two differently-keyed consumers (df count by
    # term, scoring join by doc) which exchange reuse cannot dedupe, and
    # doc length is exactly the per-doc SUM of tf (same token count) —
    # so ONE aggregated postings frame, cut once, subsumes what used to
    # be three tokenize+explode passes. Counts are exact either way;
    # row-identical, warm ~1.1 -> ~1.0 s at sf0.1 (cold 4.1 -> 1.5).
    tf = (
        tok.groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dlen = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dlen.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    q = dfreq.orderBy(F.desc("df"), "term").limit(3)
    contrib = (
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        * (F.col("tf") * 2.2)
        / (F.col("tf") + 1.2 * (F.lit(1.0) - F.lit(0.75) + F.lit(0.75) * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(q), "term")
        .join(dlen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", contrib.alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("s"))
        .withColumn("bm25", F.round("s", 6))
    )
    top = scored.orderBy(F.desc("bm25"), "doc_id").limit(10)
    # Constant-valued non-foldable partition key (see llmops_bpe_first_merges).
    w = W.partitionBy(F.col("doc_id") * 0).orderBy(F.desc("bm25"), "doc_id")
    return top.withColumn("rank", F.row_number().over(w).cast("bigint")).select(
        "doc_id", "bm25", "rank"
    )


@query(
    "llmops_ql_dirichlet_topk",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, lower(tk.tok) AS term
      FROM documents,
           UNNEST(list_filter(string_split_regex(trim(text), '\s+'),
                              s -> length(s) > 0)) AS tk(tok)
    ), tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
              FROM tok GROUP BY 1, 2),
    dlen AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM tok GROUP BY 1),
    coll AS (SELECT term, CAST(count(*) AS DOUBLE) AS cf FROM tok GROUP BY 1),
    ctot AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM tok),
    dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
    q AS (SELECT term FROM dfreq ORDER BY df DESC, term LIMIT 3),
    qcf AS (SELECT q.term, coll.cf FROM q JOIN coll USING (term)),
    m AS (
      SELECT tf.doc_id,
             sum(ln(1.0 + tf.tf * ctot.c / (2000.0 * qcf.cf))) AS sm
      FROM tf JOIN qcf USING (term) CROSS JOIN ctot
      GROUP BY tf.doc_id
    ), scored AS (
      SELECT dlen.doc_id,
             coalesce(m.sm, 0.0) + 3.0 * ln(2000.0 / (dlen.dl + 2000.0)) AS s
      FROM dlen LEFT JOIN m ON m.doc_id = dlen.doc_id
    )
    SELECT doc_id, round(s, 6) AS ql_score, CAST(rank AS BIGINT) AS rank FROM (
      SELECT doc_id, s,
             ROW_NUMBER() OVER (ORDER BY round(s, 6) DESC, doc_id) AS rank
      FROM scored) t WHERE rank <= 10
    """,
)
def llmops_ql_dirichlet_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUERY-LIKELIHOOD retrieval with DIRICHLET smoothing (Zhai &
    Lafferty 2001) — the language-modeling ranker beside llmops_bm25_topk
    (same 3-highest-df query fixture, same top-10 contract), and the
    third member of the lexical-retrieval family with TF-IDF: score(q,d)
    = sum_w ln P(w|d) under the Dirichlet-smoothed document LM
    P(w|d) = (tf + mu*cf_w/|C|)/(dl + mu), mu = 2000 (the standard
    prior mass). Computed in the Zhai-Lafferty DECOMPOSITION
    score = sum_{w in q, tf>0} ln(1 + tf*|C|/(mu*cf_w))
          + |q| * ln(mu/(dl + mu)),
    which is what makes it BM25-shaped at scale: the first sum touches
    only POSTINGS of query terms (the inverted-index probe join), the
    second is a per-document closed form — yet every document is ranked,
    including zero-match documents (pure length prior), which BM25's
    postings-only sum cannot express. That length-prior term is the
    practical difference: QL-Dirichlet penalizes long documents through
    the smoothing denominator rather than BM25's explicit b-normalization.

    Parity discipline (BM25's, verbatim): tf/cf/dl/|C| are exact counts
    cast double, each score is a sum of <= 3 posting ln-terms + one
    per-doc ln on identical IEEE operands; ranking orders by the ROUND-6
    score with doc_id tie-break so sub-1e-6 drift cannot reorder.

    Scale shape: three hash aggregations off one exploded scan (tf,
    dlen, coll — coll reuses the same shuffle key as dfreq), the 3-term
    query side and 1-row |C| broadcast; the left join attaching the
    match sum to dlen is doc_id-keyed (co-partitioned with dlen's
    aggregation); top-10 is TakeOrdered, never a global sort."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.transform(tokens(F.col("text")), F.lower)).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").cast("double").alias("tf"))
    dlen = tok.groupBy("doc_id").agg(F.count("*").cast("double").alias("dl"))
    coll = tok.groupBy("term").agg(F.count("*").cast("double").alias("cf"))
    ctot = tok.agg(F.count("*").cast("double").alias("c"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    q = dfreq.orderBy(F.desc("df"), "term").limit(3).select("term")
    qcf = q.join(coll, "term")
    m = (
        tf.join(F.broadcast(qcf), "term")
        .crossJoin(F.broadcast(ctot))
        .select(
            "doc_id",
            F.log(
                F.lit(1.0)
                + F.col("tf") * F.col("c") / (F.lit(2000.0) * F.col("cf"))
            ).alias("t"),
        )
        .groupBy("doc_id")
        .agg(F.sum("t").alias("sm"))
    )
    scored = (
        dlen.join(m, "doc_id", "left")
        .select(
            "doc_id",
            (
                F.coalesce(F.col("sm"), F.lit(0.0))
                + F.lit(3.0) * F.log(F.lit(2000.0) / (F.col("dl") + F.lit(2000.0)))
            ).alias("s"),
        )
        .withColumn("ql_score", F.round("s", 6))
    )
    top = scored.orderBy(F.desc("ql_score"), "doc_id").limit(10)
    w = W.partitionBy(F.col("doc_id") * 0).orderBy(F.desc("ql_score"), "doc_id")
    return top.withColumn("rank", F.row_number().over(w).cast("bigint")).select(
        "doc_id", "ql_score", "rank"
    )


@query(
    "llmops_temperature_mix",
    oracle="""
    WITH s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
    tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM s),
    w AS (SELECT lang, n, pow(n / tot.total, 0.7) AS pw FROM s CROSS JOIN tot),
    z AS (SELECT sum(pw) AS zsum FROM w)
    SELECT lang, n,
           round(pw / z.zsum, 6) AS mix_weight,
           round(pw / z.zsum * 100000 / n, 6) AS dup_factor
    FROM w CROSS JOIN z
    """,
)
def llmops_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain mixing (the multilingual/multi-domain
    sampling scheme of XLM-R / LLaMA data recipes): per-LANGUAGE sampling
    weight p_i^α / Σ p_j^α at α = 0.7, plus the duplication factor each
    language needs to fill a 100k-example budget — upweights the tail
    without letting the head dominate. Keyed on lang, the one skewed
    grouping in the fixture (en dominates ~3×): the per-source variant
    produced identical weights for 20 equal-sized sources, so the α
    exponent verified nothing (r7 vacuous-fixture audit).

    Scale shape: two scalar aggregates over a per-language count table
    (|langs| rows — trivially broadcast); the heavy join this feeds at
    100 TB is the weighted sampler (llmops_weighted_sample), which
    consumes these weights as a broadcast map."""
    d = t(spark, sf_dir, "documents")
    s = d.groupBy("lang").agg(F.count("*").alias("n"))
    tot = s.agg(F.sum("n").cast("double").alias("total"))
    w = s.crossJoin(F.broadcast(tot)).withColumn(
        "pw", F.pow(F.col("n") / F.col("total"), 0.7)
    )
    z = w.agg(F.sum("pw").alias("zsum"))
    return (
        w.crossJoin(F.broadcast(z))
        .select(
            "lang",
            "n",
            F.round(F.col("pw") / F.col("zsum"), 6).alias("mix_weight"),
            F.round(F.col("pw") / F.col("zsum") * 100000 / F.col("n"), 6).alias("dup_factor"),
        )
    )


@query(
    "graph_triangle_count",
    oracle=r"""
    WITH dt AS (
      SELECT DISTINCT doc_id, lower(tk.tok) AS term
      FROM documents,
           UNNEST(list_filter(string_split_regex(trim(text), '\s+'),
                              s -> length(s) > 0)) AS tk(tok)
    ), vocab AS (
      SELECT term FROM (
        SELECT term, ROW_NUMBER() OVER (ORDER BY count(*) DESC, term) AS r
        FROM dt GROUP BY term) WHERE r <= 30
    ), dv AS (SELECT dt.doc_id, dt.term FROM dt JOIN vocab USING (term)),
    edges AS (
      SELECT DISTINCT a.term AS u, b.term AS v
      FROM dv a JOIN dv b ON a.doc_id = b.doc_id AND a.term < b.term
    ), tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM edges e1
      JOIN edges e2 ON e1.v = e2.u
      JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ), pv AS (
      SELECT a AS term FROM tri UNION ALL
      SELECT b FROM tri UNION ALL
      SELECT c FROM tri
    )
    SELECT term, CAST(count(*) AS BIGINT) AS n_triangles
    FROM pv GROUP BY term
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle counting on the term co-occurrence graph (same
    top-30-df vocabulary + doc-level edges as llmops_term_pagerank) — the
    classic clustering-coefficient numerator and the third graph operator
    alongside connected components and PageRank.

    Spark-first: edges are oriented by the vertex total order (u < v), so
    each triangle {a,b,c} is enumerated exactly once as the wedge
    (a,b)+(b,c) closed by (a,c) — two shuffled equi-joins on the edge
    list, no DISTINCT-after-explosion. At general scale the standard
    refinement is degree orientation (point each edge at the
    higher-degree endpoint) so wedge counts are bounded by arboricity;
    with a bounded vocabulary the term-order orientation is already
    bounded. Per-vertex counts are one union + hash aggregate."""
    d = t(spark, sf_dir, "documents")
    dt = (
        d.select(
            "doc_id",
            F.explode(F.transform(tokens(F.col("text")), F.lower)).alias("term"),
        )
        .distinct()
        # two consumers (vocabulary pass + the vocab-filtered projection):
        # cut the corpus explode+distinct once, lazily
        .localCheckpoint(eager=False)
    )
    vocab = (
        dt.groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), "term")
        .limit(30)
        .select("term")
    )
    dv = dt.join(F.broadcast(vocab), "term").select("doc_id", "term")
    a, b = dv.alias("a"), dv.alias("b")
    edges = (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.term") < F.col("b.term")))
        .select(F.col("a.term").alias("u"), F.col("b.term").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)  # three join roles below
    )
    e1 = edges.alias("e1")
    e2 = edges.select(F.col("u").alias("u2"), F.col("v").alias("v2")).alias("e2")
    e3 = edges.select(F.col("u").alias("u3"), F.col("v").alias("v3")).alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u2"))
        .join(e3, (F.col("e3.u3") == F.col("e1.u")) & (F.col("e3.v3") == F.col("e2.v2")))
        .select(F.col("e1.u").alias("a"), F.col("e1.v").alias("b"), F.col("e2.v2").alias("c"))
    )
    pv = (
        tri.select(F.col("a").alias("term"))
        .unionAll(tri.select(F.col("b").alias("term")))
        .unionAll(tri.select(F.col("c").alias("term")))
    )
    return pv.groupBy("term").agg(F.count("*").cast("bigint").alias("n_triangles"))


@query(
    "llmops_pmi_collocations",
    oracle=r"""
    WITH tk AS (
      SELECT list_transform(list_filter(string_split_regex(trim(text), '\s+'),
                                        s -> length(s) > 0),
                            s -> lower(s)) AS toks
      FROM documents
    ), uni AS (
      SELECT w, CAST(count(*) AS DOUBLE) AS c
      FROM (SELECT unnest(toks) AS w FROM tk) GROUP BY w
    ), ntok AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM uni),
    pr AS (
      SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c_ab FROM (
        SELECT unnest(toks[1:length(toks)-1]) AS w1,
               unnest(toks[2:length(toks)]) AS w2
        FROM tk WHERE length(toks) >= 2) GROUP BY 1, 2
    ), npair AS (SELECT CAST(sum(c_ab) AS DOUBLE) AS n FROM pr),
    scored AS (
      SELECT w1, w2, CAST(c_ab AS BIGINT) AS n_pair,
             round(ln(c_ab * ntok.n * ntok.n / (npair.n * a.c * b.c)), 6) AS pmi
      FROM pr JOIN uni a ON pr.w1 = a.w JOIN uni b ON pr.w2 = b.w
      CROSS JOIN ntok CROSS JOIN npair
      WHERE c_ab >= 5
    )
    SELECT w1, w2, n_pair, pmi, CAST(rank AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, w1, w2) AS rank FROM scored)
    WHERE rank <= 20
    """,
)
def llmops_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining via pointwise mutual information over adjacent
    token pairs: PMI = ln(P(w1,w2) / (P(w1)P(w2))), support >= 5, top-20
    — the classic phrase-detection signal (word2vec's phrase pass,
    n-gram-LM feature selection) a corpus pipeline runs before tokenizer
    training.

    Spark-first: adjacent pairs come from ``zip_with`` over two array
    slices INSIDE the row — no posexplode self-join, so the heavy path is
    explode + two hash aggregations (pair counts, unigram counts). The
    unigram side joins back on the word key (shuffle join; at 100 TB the
    unigram table is Zipf-headed, and AQE skew-split handles the hot
    keys). Scalars (N_tok, N_pair) broadcast; ranking orders by the
    ROUNDED score with (w1, w2) tie-breaks; top-20 is TakeOrdered."""
    d = t(spark, sf_dir, "documents")
    tk = d.select(F.transform(tokens(F.col("text")), F.lower).alias("toks"))
    uni = (
        tk.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("double").alias("c"))
    )
    ntok = uni.agg(F.sum("c").alias("n_tok"))
    pairs = (
        tk.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(toks, 1, size(toks) - 1),"
                    "         slice(toks, 2, size(toks) - 1),"
                    "         (x, y) -> struct(x AS w1, y AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    pc = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").cast("double").alias("c_ab"))
        .filter(F.col("c_ab") >= 5)
    )
    npair = pairs.groupBy().agg(F.count("*").cast("double").alias("n_pair"))
    ua = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    scored = (
        pc.join(ua, "w1")
        .join(ub, "w2")
        .crossJoin(F.broadcast(ntok))
        .crossJoin(F.broadcast(npair))
        .select(
            "w1",
            "w2",
            F.col("c_ab").cast("bigint").alias("n_pair"),
            F.round(
                F.log(
                    F.col("c_ab") * F.col("n_tok") * F.col("n_tok")
                    / (F.col("n_pair") * F.col("c_a") * F.col("c_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    top = scored.orderBy(F.desc("pmi"), "w1", "w2").limit(20)
    # Constant-valued non-foldable partition key (see llmops_bpe_first_merges).
    w = W.partitionBy(F.col("pmi") * 0).orderBy(F.desc("pmi"), "w1", "w2")
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))


@query(
    "source_kvscan_segmented",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value,
           CAST(min(epoch_us(ts)) AS BIGINT) AS min_ts_us,
           CAST(max(epoch_us(ts)) AS BIGINT) AS max_ts_us
    FROM events
    WHERE epoch_us(ts) >= 1704844800000000
    GROUP BY event_type
    """,
)
def source_kvscan_segmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python Data Source round-trip (sources/kvscan.py): snapshot
    the events table as JSONL through the source's two-phase-commit
    writer, read it back as ``format("kvsnapshot")`` with byte-range
    segmented partitions and the look-back cutoff PUSHED INTO the source
    (reference dynamo_fetcher.py:282-291 re-expressed: parallel segments
    instead of a sequential page loop, source-side pushdown instead of the
    client-side temporal filter), then aggregate — the oracle aggregates
    the ORIGINAL parquet, so writer encode, segmented read, pushdown
    semantics, and double/long JSON round-trip fidelity are all hashed.

    Scale shape: the snapshot scan parallelism is |segments| (option), the
    filter never materializes pre-cutoff rows into Spark, and the
    aggregate is one map-side-partial shuffle on event_type."""
    from batch_public_spark.sources.kvscan import register_kv_source

    register_kv_source(spark)
    out_dir = _scratch_dir(spark, sf_dir, "kvscan")
    e = t(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "event_type", "value"
    )
    # The fixture parquet is one split, which would serialize the snapshot
    # write into a single JSON-encoding task; spread it so writer tasks
    # scale with cores (each task commits its own part file — the
    # two-phase protocol is per-task by design).
    e.repartition(8).write.format("kvsnapshot").mode("overwrite").option(
        "path", out_dir
    ).save()
    back = (
        spark.read.format("kvsnapshot")
        .option("path", out_dir)
        .option("segments", 8)
        .load()
    )
    cutoff = 1704844800000000  # 2024-01-10T00:00:00Z — mid-fixture look-back
    return (
        back.filter(F.col("ts_us") >= cutoff)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_value"),
            F.min("ts_us").cast("bigint").alias("min_ts_us"),
            F.max("ts_us").cast("bigint").alias("max_ts_us"),
        )
    )


@query(
    "source_partitioned_pruning",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type
    """,
)
def source_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned lake layout round-trip: write events partitioned
    by event_type (`partitionBy` → one directory per value), read the
    dataset back with a partition-key predicate, aggregate. The oracle
    aggregates the ORIGINAL parquet, so partition-column recovery from
    directory names and data fidelity under the layout change are hashed.

    This is THE 100 TB scan pattern: the predicate prunes entire
    directories at planning time (PartitionFilters in the scan node, see
    tests/test_plan_shapes.py::test_partitioned_roundtrip_prunes) — a
    two-of-five-types query reads ~40% of the bytes with zero row-level
    filtering. Partition keys must be low-cardinality (types, dates,
    tenants); high-cardinality keys produce the small-file problem that
    sources.maintenance.compact_parquet exists to fix."""
    out_dir = _scratch_dir(spark, sf_dir, "part_prune")
    e = t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    e.write.mode("overwrite").partitionBy("event_type").parquet(out_dir)
    # explicit schema: empty-input safety (F7) — with zero rows the
    # layout has no files to infer from; on real data the schema is
    # identical to the inferred one (partition column included)
    back = spark.read.schema(e.schema).parquet(out_dir).filter(
        F.col("event_type").isin("click", "purchase")
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("sum_value"),
        F.count_distinct(F.col("user_id")).cast("bigint").alias("n_users"),
    )


@query(
    "sample_deterministic_per_group",
    oracle="""
    SELECT source, doc_id, CAST(rnk AS BIGINT) AS sample_rank FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(concat('seed42:', CAST(doc_id AS VARCHAR))), doc_id) AS rnk
      FROM documents) WHERE rnk <= 5
    """,
)
def sample_deterministic_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sampling: take each source's 5 documents
    that rank lowest under a salted cryptographic hash of the key — a
    reproducible "random" sample (same seed → same rows, on any engine,
    any partitioning) without rand(), which is neither cross-engine
    comparable nor stable under retries/speculative execution.

    Spark-first: one row_number window partitioned by the group key (one
    shuffle, per-group sort bounded by group size) — never a global sort.
    At 100 TB with heavy groups, the refinement is a pre-filter on the
    hash prefix (keep rows whose hash < adaptive threshold ~ k/|group|)
    before the window, which turns the sort input into ~k rows per group;
    the window form here is the exact-semantics anchor."""
    d = t(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("seed42:"), F.col("doc_id").cast("string")))
    w = W.partitionBy("source").orderBy(key.asc(), F.col("doc_id").asc())
    return (
        d.select("source", "doc_id")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("source", "doc_id", F.col("rnk").cast("bigint").alias("sample_rank"))
    )


@query(
    "scalar_variant_props_battery",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(min(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
           CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k,
           CAST(sum(CASE WHEN props->>'$.missing' IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_missing
    FROM events GROUP BY event_type
    """,
)
def scalar_variant_props_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via Spark 4's VariantType: ``parse_json``
    the events ``props`` payload once into a binary variant, then
    ``try_variant_get`` typed paths out of it — the open-schema column
    pattern (one variant column instead of N sparse typed columns) that
    replaced string-JSON + get_json_object for lakehouse event payloads.

    At 100 TB variant beats raw JSON strings because parsing happens once
    per row into a binary form whose fields decode without re-tokenizing
    the document, and shredded-variant readers can prune paths at scan
    time. Missing paths return NULL via try_variant_get (counted here),
    never an error. The oracle reads the same payloads with DuckDB's JSON
    path operators — typed extraction semantics must agree exactly."""
    e = t(spark, sf_dir, "events")
    v = e.select("event_type", F.parse_json(F.col("props")).alias("v"))
    k = F.try_variant_get(F.col("v"), "$.k", "bigint")
    missing = F.try_variant_get(F.col("v"), "$.missing", "string")
    return v.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.min(k).cast("bigint").alias("min_k"),
        F.max(k).cast("bigint").alias("max_k"),
        F.sum(F.when(missing.isNull(), 1).otherwise(0)).cast("bigint").alias("n_missing"),
    )


@query(
    "llmops_embedding_norm_arrow",
    oracle="""
    SELECT vec_id,
           ROUND(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
           len(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE)
                 / sqrt(list_sum(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS first_unit
    FROM embeddings
    """,
)
def llmops_embedding_norm_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``mapInArrow`` twin of llmops_embedding_normalize: identical
    semantics (per-vector L2 norm, dim, first unit component — same
    oracle), but computed in a zero-copy Arrow batch UDF with numpy
    instead of JVM column expressions — certifying the LAST UDF transport
    Spark offers (row Python UDF < pandas UDF < **Arrow UDF**, which
    skips even the pandas Series materialization).

    Float discipline: squares are summed per-row with
    ``np.add.reduceat`` over the flattened values — a strictly
    sequential left-to-right fold (numpy's pairwise summation does not
    apply to reduceat), bit-identical to the oracle's list_sum fold and
    to the JVM ``aggregate`` twin. Rounding happens JVM-side after the
    UDF (np.round is banker's; SQL round is half-away-from-zero).
    Scale: pure map-side, no shuffle, batch-vectorized."""
    import pyarrow as pa

    def norms(batches):
        import numpy as np
        import pyarrow.compute as pc

        for batch in batches:
            if batch.num_rows == 0:
                continue
            vec_id = batch.column("vec_id")
            emb = batch.column("embedding")
            flat = emb.flatten()
            vl = emb.value_lengths()
            # np.add.reduceat misbehaves on empty segments (returns the
            # NEXT segment's first element, or IndexErrors at the tail) —
            # refuse loudly instead of returning silently wrong norms.
            if vl.null_count or pc.min(vl).as_py() <= 0:
                raise ValueError(
                    "empty or NULL embedding encountered; filter upstream "
                    "(size(embedding) > 0) before norm computation"
                )
            lengths = np.asarray(vl, dtype=np.int64)
            starts = np.zeros(len(lengths), dtype=np.int64)
            np.cumsum(lengths[:-1], out=starts[1:])
            vals = flat.to_numpy(zero_copy_only=False).astype(np.float64)
            sq_sums = np.add.reduceat(vals * vals, starts)
            first = vals[starts]
            norm = np.sqrt(sq_sums)
            yield pa.record_batch(
                {
                    "vec_id": vec_id,
                    "l2_norm": pa.array(norm, type=pa.float64()),
                    "dim": pa.array(lengths, type=pa.int64()),
                    "first_unit": pa.array(first / norm, type=pa.float64()),
                }
            )

    from batch_public_spark.operators.semantic import valid_vectors

    # honor the worker's documented contract (it refuses empty/NULL
    # vectors loudly): drop malformed rows at ingest (valid_vectors),
    # exactly like every numpy-batched ANN path
    e = valid_vectors(t(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    out = e.mapInArrow(
        norms, "vec_id long, l2_norm double, dim long, first_unit double"
    )
    return out.select(
        "vec_id",
        F.round("l2_norm", 6).alias("l2_norm"),
        "dim",
        F.round("first_unit", 6).alias("first_unit"),
    )


@query(
    "llmops_span_corruption_stats",
    oracle="""
    WITH lens AS (
      SELECT doc_id,
             length(list_filter(string_split_regex(trim(text), '\\s+'),
                                s -> length(s) > 0)) AS n_tokens
      FROM documents
    ), pos AS (
      SELECT doc_id, n_tokens, unnest(generate_series(1, n_tokens)) AS p
      FROM lens WHERE n_tokens > 0
    ), m AS (
      SELECT doc_id, n_tokens, p,
             CASE WHEN (doc_id * 2654435761 + p * 40503) % 97 < 20
                  THEN 1 ELSE 0 END AS masked
      FROM pos
    ), runs AS (
      SELECT doc_id, n_tokens, masked,
             CASE WHEN masked = 1 AND
                       coalesce(lag(masked) OVER (PARTITION BY doc_id ORDER BY p), 0) = 0
                  THEN 1 ELSE 0 END AS span_start
      FROM m
    )
    SELECT doc_id,
           CAST(max(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(masked) AS BIGINT) AS n_masked,
           CAST(sum(span_start) AS BIGINT) AS n_spans,
           round(CAST(sum(masked) AS DOUBLE) / max(n_tokens), 6) AS corruption_ratio
    FROM runs GROUP BY doc_id
    """,
)
def llmops_span_corruption_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5/BERT-style span-corruption planning stats: mask ~20% of each
    document's token positions with a deterministic multiplicative hash
    (reproducible across engines, retries, and partitionings — rand()
    is none of those), then report per-doc mask count, SPAN count
    (runs of consecutive masked positions — the denoiser's sentinel
    count), and corruption ratio. Tuning the hash threshold vs span
    count is exactly the mean-span-length knob of the T5 objective.

    Spark-first: positions come from ``sequence(1, n)`` exploded in-row
    (no join against a numbers table); span starts are one lag window
    per doc (single shuffle on doc_id shared with the final rollup). At
    100 TB this runs as one pass over the corpus; the per-position rows
    never leave the doc partition."""
    d = t(spark, sf_dir, "documents")
    lens = d.select("doc_id", token_count_ws(F.col("text")).alias("n_tokens")).filter(
        F.col("n_tokens") > 0
    )
    pos = lens.select(
        "doc_id", "n_tokens", F.explode(F.sequence(F.lit(1), F.col("n_tokens"))).alias("p")
    )
    masked = F.when(
        (F.col("doc_id") * 2654435761 + F.col("p") * 40503) % 97 < 20, 1
    ).otherwise(0)
    m = pos.select("doc_id", "n_tokens", "p", masked.alias("masked"))
    w = W.partitionBy("doc_id").orderBy("p")
    runs = m.select(
        "doc_id",
        "n_tokens",
        "masked",
        F.when(
            (F.col("masked") == 1)
            & (F.coalesce(F.lag("masked").over(w), F.lit(0)) == 0),
            1,
        )
        .otherwise(0)
        .alias("span_start"),
    )
    return runs.groupBy("doc_id").agg(
        F.max("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("masked").cast("bigint").alias("n_masked"),
        F.sum("span_start").cast("bigint").alias("n_spans"),
        F.round(
            F.sum("masked").cast("double") / F.max("n_tokens"), 6
        ).alias("corruption_ratio"),
    )


@query(
    "llmops_oov_rate",
    oracle="""
    WITH tok AS (
      SELECT source, lower(tk.tok) AS term
      FROM documents,
           UNNEST(list_filter(string_split_regex(trim(text), '\\s+'),
                              s -> length(s) > 0)) AS tk(tok)
    ), vocab AS (
      SELECT term FROM (
        SELECT term, ROW_NUMBER() OVER (ORDER BY count(*) DESC, term) AS r
        FROM tok GROUP BY term) WHERE r <= 20
    )
    SELECT tok.source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           round(CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS oov_rate
    FROM tok LEFT JOIN vocab v USING (term)
    GROUP BY tok.source
    """,
)
def llmops_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage audit: with a top-20-frequency
    vocabulary (fixture-calibrated: the corpus vocabulary is ~31 terms,
    so a top-40 vocab covers everything and the OOV rate is identically
    zero — r7 vacuous-fixture audit), the out-of-vocabulary token rate
    per source — the metric
    that decides whether a tokenizer trained on the head domains is
    acceptable for the tail ones (high per-source OOV → fertility blowup
    → wasted context window).

    Spark-first: the vocabulary is a TakeOrdered top-k off the global
    term counts (never a one-partition rank of the full vocabulary) and
    BROADCASTS into a left anti-style membership probe on the exploded
    token stream — one scan, one small-dim join, one aggregation. At
    100 TB the vocab is 32-256k entries: still broadcast territory."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(F.transform(tokens(F.col("text")), F.lower)).alias("term")
    )
    vocab = (
        tok.groupBy("term")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "term")
        .limit(20)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    probed = tok.join(F.broadcast(vocab), "term", "left")
    oov = F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
    return probed.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum(oov).cast("bigint").alias("n_oov"),
        F.round(F.sum(oov).cast("double") / F.count("*"), 6).alias("oov_rate"),
    )


@query(
    "events_cohort_retention_matrix",
    oracle="""
    WITH firstw AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort
      FROM events GROUP BY user_id
    ), act AS (
      SELECT DISTINCT e.user_id, f.cohort,
             CAST((CAST(date_trunc('week', e.ts) AS DATE)
                   - CAST(f.cohort AS DATE)) // 7 AS BIGINT) AS week_offset
      FROM events e JOIN firstw f USING (user_id)
    )
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
           week_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM act GROUP BY 1, 2
    """,
)
def events_cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users bucketed by first-activity
    week; each cell (cohort, week_offset) counts users from that cohort
    active offset weeks later — the full matrix behind every retention
    curve (events_daily_retention is its day-1 diagonal).

    Spark-first: the cohort table is one min-aggregation; activity joins
    it back on user_id (same hash partitioning both sides — one exchange
    each, reused), distinct-per-cell BEFORE the matrix aggregation so a
    power user counts once per cell. ISO Monday week truncation in both
    engines. At 100 TB the matrix is |weeks|² cells — tiny output from
    one big equi-join."""
    e = t(spark, sf_dir, "events")
    firstw = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    act = (
        e.join(firstw, "user_id")
        .select(
            "user_id",
            "cohort",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort").cast("date"),
                )
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    return act.groupBy(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"), "week_offset"
    ).agg(F.count("*").cast("bigint").alias("n_active"))


@query(
    "llmops_rouge_overlap_pairs",
    oracle="""
    WITH tokc AS (
      SELECT doc_id, source, lower(tk.tok) AS term, CAST(count(*) AS BIGINT) AS c
      FROM documents,
           UNNEST(list_filter(string_split_regex(trim(text), '\\s+'),
                              s -> length(s) > 0)) AS tk(tok)
      GROUP BY 1, 2, 3
    ), lens AS (
      SELECT doc_id, source, CAST(sum(c) AS BIGINT) AS n FROM tokc GROUP BY 1, 2
    ), pairs AS (
      SELECT doc_id AS a_id, lead(doc_id) OVER w AS b_id
      FROM lens WINDOW w AS (PARTITION BY source ORDER BY doc_id)
    ), ov AS (
      SELECT p.a_id, p.b_id, sum(least(ta.c, tb.c)) AS overlap
      FROM pairs p
      JOIN tokc ta ON ta.doc_id = p.a_id
      JOIN tokc tb ON tb.doc_id = p.b_id AND tb.term = ta.term
      WHERE p.b_id IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT ov.a_id, ov.b_id,
           CAST(ov.overlap AS BIGINT) AS overlap,
           round(CAST(ov.overlap AS DOUBLE) / la.n, 6) AS rouge_recall,
           round(CAST(ov.overlap AS DOUBLE) / lb.n, 6) AS rouge_precision
    FROM ov JOIN lens la ON la.doc_id = ov.a_id
            JOIN lens lb ON lb.doc_id = ov.b_id
    """,
)
def llmops_rouge_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1 overlap (clipped unigram counts — the summarization-eval
    metric) between each document and its successor within the same
    source: overlap = Σ min(count_a, count_b), recall = overlap/|a|,
    precision = overlap/|b|. At corpus scale this is the
    reference-vs-candidate scoring loop of eval pipelines, expressed
    relationally.

    Spark-first: per-doc term counts are ONE exploded aggregation; the
    pair list comes from a lead window per source (no cross join); the
    clipped intersection is an equi-join on (doc, term) postings — cost
    proportional to shared vocabulary, never |a| x |b|. Pairs with zero
    shared terms drop out of the inner join (exactly ROUGE = 0; omitted
    rather than emitted, matching the oracle)."""
    # spread(): tokenize + explode is per-row text compute over the
    # 1-task fixture scan (guide §2.5); no-op at scale.
    d = spread(t(spark, sf_dir, "documents").select("doc_id", "source", "text"))
    tokc = (
        d.select(
            "doc_id",
            "source",
            F.explode(F.transform(tokens(F.col("text")), F.lower)).alias("term"),
        )
        .groupBy("doc_id", "source", "term")
        .agg(F.count("*").alias("c"))
        # THREE consumers (lens, both posting sides): cut so the
        # tokenize+explode+count runs once, not once per consumer
        # (measured with ckpt on lens too: warm ~2.0 -> ~1.25 s at
        # sf0.1, fresh-plan-per-rep; values row-identical).
        .localCheckpoint(eager=False)
    )
    # Three consumers (pair window, both length sides): same cut.
    lens = (
        tokc.groupBy("doc_id", "source")
        .agg(F.sum("c").alias("n"))
        .localCheckpoint(eager=False)
    )
    w = W.partitionBy("source").orderBy("doc_id")
    pairs = lens.select(
        F.col("doc_id").alias("a_id"), F.lead("doc_id").over(w).alias("b_id")
    ).filter(F.col("b_id").isNotNull())
    ta = tokc.select(F.col("doc_id").alias("a_id"), "term", F.col("c").alias("ca"))
    tb = tokc.select(F.col("doc_id").alias("b_id"), "term", F.col("c").alias("cb"))
    ov = (
        pairs.join(ta, "a_id")
        .join(tb, ["b_id", "term"])
        .groupBy("a_id", "b_id")
        .agg(F.sum(F.least("ca", "cb")).alias("overlap"))
    )
    la = lens.select(F.col("doc_id").alias("a_id"), F.col("n").alias("na"))
    lb = lens.select(F.col("doc_id").alias("b_id"), F.col("n").alias("nb"))
    return (
        ov.join(la, "a_id")
        .join(lb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.col("overlap").cast("bigint").alias("overlap"),
            F.round(F.col("overlap").cast("double") / F.col("na"), 6).alias("rouge_recall"),
            F.round(F.col("overlap").cast("double") / F.col("nb"), 6).alias("rouge_precision"),
        )
    )


@query(
    "llmops_dataset_card",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, source, md5(text) AS h,
             length(list_filter(string_split_regex(trim(text), '\\s+'),
                                s -> length(s) > 0)) AS n_tok
      FROM documents
    ), top_src AS (
      SELECT CAST(count(*) AS DOUBLE) AS top_n FROM documents
      GROUP BY source ORDER BY count(*) DESC, source LIMIT 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           round(CAST(sum(n_tok) AS DOUBLE) / count(*), 6) AS mean_tokens,
           round(1.0 - CAST(count(DISTINCT h) AS DOUBLE) / count(*), 6) AS exact_dup_rate,
           round(top_src.top_n / count(*), 6) AS top_source_share
    FROM tok CROSS JOIN top_src GROUP BY top_src.top_n
    """,
)
def llmops_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset card: the headline numbers every corpus release
    publishes — document/source/language counts, token total and mean,
    exact-duplicate rate (1 − distinct md5 / n), and head-source share
    (concentration warning for mixing).

    Spark-first: a single aggregation pass computes every scalar
    (count-distincts expand to partial sketch...exact two-phase aggs, all
    sharing the one scan); the top-source share joins a TakeOrdered
    1-row side in by broadcast. This is the daily health check in front
    of every training-data refresh."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "lang",
        "source",
        F.md5("text").alias("h"),
        token_count_ws(F.col("text")).alias("n_tok"),
    )
    top_src = (
        d.groupBy("source")
        .agg(F.count("*").cast("double").alias("top_n"))
        .orderBy(F.desc("top_n"), "source")
        .limit(1)
        .select("top_n")
    )
    return (
        tok.crossJoin(F.broadcast(top_src))
        .groupBy("top_n")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count_distinct(F.col("source")).cast("bigint").alias("n_sources"),
            F.count_distinct(F.col("lang")).cast("bigint").alias("n_langs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.round(F.sum("n_tok").cast("double") / F.count("*"), 6).alias("mean_tokens"),
            F.round(
                F.lit(1.0) - F.count_distinct(F.col("h")).cast("double") / F.count("*"), 6
            ).alias("exact_dup_rate"),
            F.round(F.max("top_n") / F.count("*"), 6).alias("top_source_share"),
        )
        .drop("top_n")
    )


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT o.o_orderstatus AS status,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The co-located fact-to-fact join, REGISTERED: orders and lineitem
    written as bucketed+sorted tables on the join key (sources/
    bucketing.py), then joined through the catalog — the persisted
    bucketing replaces both runtime Exchanges, the daily 100 TB win this
    layout exists for (tests/test_plan_shapes.py::
    test_bucketed_registered_join_has_no_exchange asserts the plan).
    The oracle computes the identical join over the raw parquet, so
    bucketed-write fidelity is hashed too."""
    import os

    from batch_public_spark.sources.bucketing import read_bucketed, write_bucketed

    root = _scratch_dir(spark, sf_dir, "bucketed")
    # table names must be session-unique too (shared in-memory catalog is
    # per-session, but the external paths under root must pair with them)
    tag = os.path.basename(root).replace(".", "_")
    ot, lt = f"bps_orders_b_{tag}", f"bps_lineitem_b_{tag}"
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    l = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    for name in (ot, lt):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    write_bucketed(o, ot, key="o_orderkey", buckets=8, path=os.path.join(root, "o"))
    write_bucketed(l, lt, key="l_orderkey", buckets=8, path=os.path.join(root, "l"))
    ob, lb = read_bucketed(spark, ot), read_bucketed(spark, lt)
    joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
    return joined.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,4)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
            ),
            2,
        )
        .cast("double")
        .alias("revenue"),
    )


# DuckDB fragment: distinct word-3-gram shingles of normalized text —
# mirrors operators.semantic.word_shingles(text, 3) (whole-text single
# shingle under 3 words). Kept in lockstep with llmops_queries._GRAMS4.
_NORM3 = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS3 = (
    f"list_filter(string_split_regex({_NORM3}, '\\s+'), x -> length(x) > 0)"
)
_GRAMS3 = (
    f"list_distinct(list_transform("
    f"range(1, greatest(len({_TOKS3}) - 2, 1) + 1), "
    f"i -> array_to_string(({_TOKS3})[i:i+2], ' ')))"
)

_MINHASH_K = 8
_SIG_MATCHES_SQL = " +\n             ".join(
    f"(CASE WHEN list_min(list_transform(sha, s -> md5(concat('{i}:', s))))"
    f" = list_min(list_transform(shb, s -> md5(concat('{i}:', s))))"
    f" THEN 1 ELSE 0 END)"
    for i in range(_MINHASH_K)
)


@query(
    "llmops_minhash_estimator_accuracy",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, source, {_GRAMS3} AS s FROM documents
    ), pairs AS (
      SELECT doc_id AS a_id, s AS sha,
             lead(doc_id) OVER w AS b_id, lead(s) OVER w AS shb
      FROM sh WINDOW w AS (PARTITION BY source ORDER BY doc_id)
    )
    SELECT a_id, b_id,
           round(CAST({_SIG_MATCHES_SQL} AS DOUBLE) / {_MINHASH_K}, 6) AS est_jaccard,
           round(CAST(length(list_intersect(sha, shb)) AS DOUBLE)
                 / length(list_distinct(list_concat(sha, shb))), 6) AS exact_jaccard
    FROM pairs WHERE b_id IS NOT NULL
    """,
)
def llmops_minhash_estimator_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash ESTIMATOR itself, fully oracle-hashed: an 8-permutation
    signature built from md5 (engine-portable, unlike the xxhash64 the
    production operators use for speed — which is why the
    llmops_minhash_* family is rows-only-checked), compared against exact
    shingle Jaccard for each successive same-source document pair. The
    match fraction IS the unbiased Jaccard estimate (P[min-hash collision]
    = J); hashing est vs exact per pair certifies signature construction,
    min-selection, and the collision arithmetic cross-engine.

    Scale shape: signatures are per-row array expressions (zero shuffle —
    exactly how semantic.minhash_signatures computes them); the pair list
    is a lead window per source. Production path: band the signatures and
    equi-join buckets (llmops_minhash_candidates); this query pins the
    estimator math that path depends on."""
    from batch_public_spark.operators.semantic import word_shingles

    d = t(spark, sf_dir, "documents")
    sh = d.select("doc_id", "source", word_shingles(F.col("text"), 3).alias("s"))
    w = W.partitionBy("source").orderBy("doc_id")
    pairs = sh.select(
        F.col("doc_id").alias("a_id"),
        F.col("s").alias("sha"),
        F.lead("doc_id").over(w).alias("b_id"),
        F.lead("s").over(w).alias("shb"),
    ).filter(F.col("b_id").isNotNull())

    def sig(col_name: str, i: int):
        return F.array_min(
            F.transform(F.col(col_name), lambda s: F.md5(F.concat(F.lit(f"{i}:"), s)))
        )

    matches = None
    for i in range(_MINHASH_K):
        term = F.when(sig("sha", i) == sig("shb", i), 1).otherwise(0)
        matches = term if matches is None else matches + term
    inter = F.size(F.array_intersect("sha", "shb"))
    union = F.size(F.array_union("sha", "shb"))
    return pairs.select(
        "a_id",
        "b_id",
        F.round(matches.cast("double") / _MINHASH_K, 6).alias("est_jaccard"),
        F.round(inter.cast("double") / union, 6).alias("exact_jaccard"),
    )


@query(
    "llmops_tokenizer_fertility",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(list_filter(string_split_regex(trim(text), '\\s+'),
                                       x -> length(x) > 0))) AS BIGINT) AS ws_tokens,
           CAST(sum(length(regexp_extract_all(text, '[0-9A-Za-z_]{1,4}|[^0-9A-Za-z_\\s]')))
                AS BIGINT) AS bpe_tokens,
           round(CAST(sum(length(regexp_extract_all(text, '[0-9A-Za-z_]{1,4}|[^0-9A-Za-z_\\s]')))
                      AS DOUBLE)
                 / sum(length(list_filter(string_split_regex(trim(text), '\\s+'),
                                          x -> length(x) > 0))), 6) AS fertility
    FROM documents GROUP BY lang
    """,
)
def llmops_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish tokens (4-char subword
    chunks) per whitespace word — the multilingual-tokenizer health metric
    (fertility ≫ 1 for a language means its text costs disproportionate
    context window, the standard argument for vocabulary rebalancing).
    The chunked form keeps the ratio discriminating on punctuation-free
    corpora, where whole-word BPE-ish counting collapses to 1.0 everywhere
    (r7 vacuous-fixture audit).

    Pure column expressions over one scan (regexp_count vs split-size),
    one tiny aggregation on lang. The \\w-class is spelled as an explicit
    ASCII class in BOTH engines (textops.PUNCT_CLASS discipline: Java and
    RE2 disagree about Unicode word characters)."""
    d = t(spark, sf_dir, "documents")
    ws = token_count_ws(F.col("text"))
    bpe = F.regexp_count(
        F.col("text"), F.lit(r"[0-9A-Za-z_]{1,4}|[^0-9A-Za-z_\s]")
    ).cast("bigint")
    return d.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(ws).cast("bigint").alias("ws_tokens"),
        F.sum(bpe).cast("bigint").alias("bpe_tokens"),
        F.round(F.sum(bpe).cast("double") / F.sum(ws), 6).alias("fertility"),
    )


@query(
    "events_rolling_distinct_users",
    oracle="""
    WITH contrib AS (
      SELECT DISTINCT e.user_id,
             CAST(date_trunc('day', e.ts) AS DATE) + CAST(t.i AS INTEGER) AS wday
      FROM events e, range(7) t(i)
    ), days AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d FROM events
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(count(DISTINCT c.user_id) AS BIGINT) AS rolling_7d_users
    FROM days JOIN contrib c ON c.wday = days.d
    GROUP BY d
    """,
)
def events_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per day — the windowed COUNT
    DISTINCT that window frames cannot express (DISTINCT aggregates are
    not frame-able in either engine) and the naive day×history
    range-join makes quadratic.

    Spark-first trick: INVERT the window — each (user, active-day)
    contributes itself to the 7 window-days it falls inside
    (``explode(sequence(0,6))``), then one distinct aggregation per
    window-day. A range join becomes map-side explode + exchange on the
    day key; at 100 TB the explode factor is the window length (7), flat
    and shuffle-friendly, vs a range-join's |days| probe amplification.
    Days with no activity in their trailing week simply don't appear
    (inner semantics, matched by the oracle)."""
    e = t(spark, sf_dir, "events")
    active = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).distinct()
    contrib = active.select(
        "user_id",
        F.explode(
            F.transform(F.sequence(F.lit(0), F.lit(6)), lambda i: F.date_add("d", i))
        ).alias("wday"),
    ).distinct()
    days = e.select(F.date_trunc("day", F.col("ts")).cast("date").alias("d")).distinct()
    return (
        contrib.join(days, contrib.wday == days.d)
        .groupBy(F.date_format("d", "yyyy-MM-dd").alias("day"))
        .agg(F.count_distinct("user_id").cast("bigint").alias("rolling_7d_users"))
    )


@query(
    "agg_mode_orders",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    ), ranked AS (
      SELECT o_orderpriority, o_orderstatus, n,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY n DESC, o_orderstatus) AS r
      FROM c
    )
    SELECT o_orderpriority, o_orderstatus AS modal_status, n AS modal_count
    FROM ranked WHERE r = 1
    """,
)
def agg_mode_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE per group: the most frequent order status per
    priority, ties broken by status value — expressed as
    ``max_by``-over-counts instead of the builtin ``mode()``, whose
    tie-breaking is engine-/partitioning-dependent (exactly the
    nondeterminism the registry's determinism discipline bans).

    Spark-first: count per (group, value), then one max_by on the
    (count, reversed-value) struct — two map-side-combined aggregations,
    no window over the raw rows. The struct-ordering trick makes 'highest
    count, then lowest value' a single total order."""
    o = t(spark, sf_dir, "orders")
    c = o.groupBy("o_orderpriority", "o_orderstatus").agg(F.count("*").alias("n"))
    # max over (n, reversed status) == highest n, ties -> lexicographically
    # smallest status. Reverse via unbase-able trick: order by struct(n,
    # negated-rank of status) is not expressible generically, so use
    # min_by over (negated n, status) instead: smallest (-n, status).
    picked = c.groupBy("o_orderpriority").agg(
        F.min_by(
            F.struct(
                F.col("o_orderstatus").alias("modal_status"),
                F.col("n").alias("modal_count"),
            ),
            F.struct((-F.col("n")).alias("neg"), F.col("o_orderstatus").alias("s")),
        ).alias("m")
    )
    return picked.select(
        "o_orderpriority",
        F.col("m.modal_status").alias("modal_status"),
        F.col("m.modal_count").cast("bigint").alias("modal_count"),
    )


@query(
    "events_rate_spike_detect",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, n, prev_n,
           round(CAST(n AS DOUBLE) / prev_n, 6) AS ratio,
           CAST(n AS DOUBLE) / prev_n > 1.5 AS is_spike
    FROM (
      SELECT event_type, strftime(d, '%Y-%m-%d') AS day, n,
             lag(n) OVER (PARTITION BY event_type ORDER BY d) AS prev_n
      FROM daily
    ) WHERE prev_n IS NOT NULL
    """,
)
def events_rate_spike_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day rate-spike detection per event type: daily counts,
    the previous day's count via lag, and a >1.5x ratio flag — the
    pipeline-health alarm every ingest monitors (a spike in `error`
    events is an incident; a spike in `purchase` is a promo).

    One aggregation to daily grain (map-side combined), one lag window
    partitioned by type over the tiny daily table. Each type's first day
    has no baseline and is dropped (NULL-free output by construction). At
    100 TB the windowed table is |types| x |days| rows — the scan does
    the work, the window is free."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).agg(F.count("*").alias("n"))
    w = W.partitionBy("event_type").orderBy("d")
    prev = F.lag("n").over(w)
    ratio = F.col("n").cast("double") / F.col("prev_n")
    return (
        daily.select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("n").cast("bigint").alias("n"),
            prev.cast("bigint").alias("prev_n"),
        )
        .filter(F.col("prev_n").isNotNull())
        .select(
            "event_type",
            "day",
            "n",
            "prev_n",
            F.round(ratio, 6).alias("ratio"),
            (ratio > 1.5).alias("is_spike"),
        )
    )


@query(
    "llmops_prefix_dedup_groups",
    oracle="""
    WITH pref AS (
      SELECT doc_id,
             array_to_string((list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                          x -> length(x) > 0))[1:8], ' ') AS prefix
      FROM documents
    )
    SELECT prefix,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS canonical_doc,
           CAST(count(*) - 1 AS BIGINT) AS n_removable
    FROM pref GROUP BY prefix HAVING count(*) > 1
    """,
)
def llmops_prefix_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-group dedup: documents sharing an identical first-8-token
    prefix (lowercased) — the cheap boilerplate detector that catches
    templated pages, mirrored headers, and scraper artifacts BEFORE the
    expensive MinHash pass (a prefix group is a guaranteed-candidate
    cluster; first-wins keeps min doc_id as canonical, the same policy as
    operators.dedup).

    One map-side prefix projection + one hash aggregation; HAVING > 1
    keeps only actionable groups. At 100 TB this is the first wave of the
    dedup cascade: exact-hash → prefix-group → MinHash band → verify,
    each wave shrinking the next wave's input."""
    d = t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
        lambda x: F.length(x) > 0,
    )
    prefix = F.array_join(F.slice(toks, 1, 8), " ")
    return (
        d.select("doc_id", prefix.alias("prefix"))
        .groupBy("prefix")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("canonical_doc"),
            (F.count("*") - 1).cast("bigint").alias("n_removable"),
        )
        .filter(F.col("n_docs") > 1)
    )


@query(
    "window_value_functions_battery",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           first_value(o_orderkey) OVER w AS cheapest_key,
           last_value(o_orderkey) OVER (
             PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS priciest_key,
           nth_value(o_orderkey, 3) OVER (
             PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS third_cheapest_key,
           round(percent_rank() OVER w, 6) AS price_pct_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_value_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window VALUE functions in one pass: first_value / last_value /
    nth_value (full-partition frame — the default running frame makes
    last_value famously 'wrong'; spelling ROWS UNBOUNDED..UNBOUNDED is
    the correct idiom in both engines) + percent_rank, all over one
    (priority; price, key) window — completing the window-function
    surface next to rank/dense_rank/ntile/cume_dist/lag/lead.

    One exchange on o_orderpriority serves all four functions (same
    partitioning and ordering); the ordering carries o_orderkey as a
    total tie-break so value functions pick deterministically."""
    o = t(spark, sf_dir, "orders")
    running = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    full = running.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.first("o_orderkey").over(full).alias("cheapest_key"),
        F.last("o_orderkey").over(full).alias("priciest_key"),
        F.nth_value("o_orderkey", 3).over(full).alias("third_cheapest_key"),
        F.round(F.percent_rank().over(running), 6).alias("price_pct_rank"),
    )


@query(
    "llmops_embedding_pca_power",
    oracle="""
    WITH x AS (
      SELECT vec_id,
             unnest(range(len(embedding))) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings
    ), dims AS (SELECT DISTINCT dim FROM x),
    d AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM dims),
    v0 AS (SELECT dim, round(1.0 / sqrt(d.n), 8) AS v FROM dims CROSS JOIN d),
    s1 AS (
      SELECT x.vec_id, round(sum(x.val * v0.v), 8) AS s
      FROM x JOIN v0 USING (dim) GROUP BY x.vec_id
    ), y1 AS (
      SELECT x.dim, round(sum(x.val * s1.s), 6) AS y
      FROM x JOIN s1 USING (vec_id) GROUP BY x.dim
    ), n1 AS (SELECT round(sqrt(sum(y * y)), 8) AS nrm FROM y1),
    v1 AS (SELECT dim, round(y / n1.nrm, 8) AS v FROM y1 CROSS JOIN n1),
    s2 AS (
      SELECT x.vec_id, round(sum(x.val * v1.v), 8) AS s
      FROM x JOIN v1 USING (dim) GROUP BY x.vec_id
    ), y2 AS (
      SELECT x.dim, round(sum(x.val * s2.s), 6) AS y
      FROM x JOIN s2 USING (vec_id) GROUP BY x.dim
    ), n2 AS (SELECT round(sqrt(sum(y * y)), 8) AS nrm FROM y2),
    v2 AS (SELECT dim, round(y / n2.nrm, 8) AS v FROM y2 CROSS JOIN n2)
    SELECT CAST(dim AS BIGINT) AS dim, round(v, 6) AS component FROM v2
    """,
)
def llmops_embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed power iteration for the corpus's top principal
    direction (uncentered PCA / leading right-singular vector of the
    embedding matrix): v ← normalize(Xᵀ(X v)), two matrix-free rounds
    from the uniform start — the third fully-oracle-checked ITERATIVE
    algorithm beside kmeans_lloyd and term_pagerank, with the same
    fixed-precision discipline (round-8 after every aggregate, so the
    fixpoint arithmetic is reproducible across engines and partition
    orders; sign is pinned by the all-positive start).

    Spark-first: X lives exploded as (vec_id, dim, val); the direction v
    is |dims| rows and BROADCASTS into the X⋈v score join; each round is
    two map-side-combined aggregations (scores by vec_id, loadings by
    dim) — never a materialized Gram matrix, which is dim² and dense. At
    100 TB this is exactly how you'd get the top component for embedding
    whitening/dedup preconditioning."""
    e = t(spark, sf_dir, "embeddings")
    x = (
        e.select("vec_id", F.posexplode(F.col("embedding")))
        .select("vec_id", F.col("pos").alias("dim"), F.col("col").cast("double").alias("val"))
        # FIVE consumers re-derive X (dims probe + two aggregations per
        # round): cut once so the scan+explode materializes once instead
        # of once per broadcast sub-job (measured 1.18 -> 0.87 s at
        # sf0.1; values row-identical). spread() was A/B'd and LOST
        # (explode feeding hash aggregations is exchange-bound — the
        # batch-4/7 boundary).
        .localCheckpoint(eager=False)
    )
    dims = x.select("dim").distinct()
    d = dims.agg(F.count("*").cast("double").alias("n"))
    v = dims.crossJoin(F.broadcast(d)).select(
        "dim", F.round(F.lit(1.0) / F.sqrt(F.col("n")), 8).alias("v")
    )
    for _ in range(2):
        s = (
            x.join(F.broadcast(v), "dim")
            .groupBy("vec_id")
            .agg(F.round(F.sum(F.col("val") * F.col("v")), 8).alias("s"))
        )
        y = (
            x.join(s, "vec_id")
            .groupBy("dim")
            .agg(F.round(F.sum(F.col("val") * F.col("s")), 6).alias("y"))
        )
        nrm = y.agg(F.round(F.sqrt(F.sum(F.col("y") * F.col("y"))), 8).alias("nrm"))
        v = y.crossJoin(F.broadcast(nrm)).select(
            "dim", F.round(F.col("y") / F.col("nrm"), 8).alias("v")
        )
    return v.select(
        F.col("dim").cast("bigint").alias("dim"), F.round("v", 6).alias("component")
    )


@query(
    "llmops_url_canonicalize",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             concat('HTTPS://', upper(source), '.Example.COM/art/', doc_id,
                    '?utm_source=feed&utm_campaign=x&id=', doc_id, '#frag') AS url
      FROM documents
    ), canon AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 concat(lower(regexp_extract(url, '^([A-Za-z]+://[^/?#]+)', 1)),
                        regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1)),
                 '/$', ''),
               '^https://', '') AS canonical
      FROM u
    )
    SELECT regexp_extract(canonical, '^([^/]+)', 1) AS host,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT canonical) AS BIGINT) AS n_canonical,
           min(canonical) AS sample_canonical
    FROM canon GROUP BY 1
    """,
)
def llmops_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization — the first normalization every web-corpus
    dedup applies (scheme/host case-folding, query-string + fragment
    stripping, trailing-slash removal) so that tracking-parameter
    variants of one page collapse to one key. URLs are synthesized
    deterministically from the documents table (host from source, path
    from doc_id, noisy utm_* + fragment) so the transform — not the
    fixture — is what's hashed.

    Pure regexp column expressions (identical patterns spelled in both
    engines — no parse_url, which DuckDB lacks and whose component
    semantics differ subtly); one aggregation on the canonical host. At
    100 TB this runs map-side ahead of the exact-dedup hash
    (semantic.dedup_exact) with the canonical URL as the dedup key."""
    d = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://"),
        F.upper("source"),
        F.lit(".Example.COM/art/"),
        F.col("doc_id").cast("string"),
        F.lit("?utm_source=feed&utm_campaign=x&id="),
        F.col("doc_id").cast("string"),
        F.lit("#frag"),
    )
    scheme_host = F.lower(F.regexp_extract(url, r"^([A-Za-z]+://[^/?#]+)", 1))
    path = F.regexp_extract(url, r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    canonical = F.regexp_replace(
        F.regexp_replace(F.concat(scheme_host, path), r"/$", ""),
        r"^https://",
        "",
    )
    canon = d.select("doc_id", canonical.alias("canonical"))
    return canon.groupBy(
        F.regexp_extract("canonical", r"^([^/]+)", 1).alias("host")
    ).agg(
        F.count("*").cast("bigint").alias("n_urls"),
        F.count_distinct(F.col("canonical")).cast("bigint").alias("n_canonical"),
        F.min("canonical").alias("sample_canonical"),
    )


@query(
    "agg_conditional_battery",
    oracle="""
    SELECT o_orderpriority,
           CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_big,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_orderstatus = 'F') AS any_finished,
           CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_open,
           round(CAST(count_if(o_totalprice > 150000) AS DOUBLE) / count(*), 6)
             AS big_share
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_conditional_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregate battery: count_if, every/bool_and,
    some/bool_or, conditional COUNT, and a conditional share — the
    filtered-aggregation idioms that replace self-joins and CASE
    pyramids in reporting queries (one pass, map-side combined).

    Spark's every/some are DuckDB's bool_and/bool_or; count_if is spelled
    identically in both. All six measures share one aggregation over one
    scan."""
    o = t(spark, sf_dir, "orders")
    big = F.col("o_totalprice") > 150000
    return o.groupBy("o_orderpriority").agg(
        F.count_if(big).cast("bigint").alias("n_big"),
        F.every(F.col("o_totalprice") > 0).alias("all_positive"),
        F.some(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).cast("bigint").alias("n_open"),
        F.round(F.count_if(big).cast("double") / F.count("*"), 6).alias("big_share"),
    )


@query(
    "llmops_label_encode",
    oracle="""
    WITH vocab AS (
      SELECT lang, ROW_NUMBER() OVER (ORDER BY lang) - 1 AS label_id
      FROM (SELECT DISTINCT lang FROM documents)
    ), n AS (SELECT CAST(count(*) AS BIGINT) AS k FROM vocab)
    SELECT d.doc_id, d.lang, v.label_id,
           md5(array_to_string(
             list_transform(range(n.k),
                            i -> CASE WHEN i = v.label_id THEN 1 ELSE 0 END),
             ',')) AS one_hot_md5
    FROM documents d JOIN vocab v USING (lang) CROSS JOIN n
    """,
)
def llmops_label_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical label encoding for training prep: a deterministic
    label id per language (alphabetical — NOT hash- or arrival-order,
    which would differ between runs and engines) plus the one-hot vector,
    built relationally so the SAME vocabulary maps train and eval splits.

    Spark-first: the vocabulary is a distinct + row_number over |langs|
    rows and BROADCASTS back onto the corpus; the one-hot is an in-row
    ``transform(sequence(...))`` — no UDF, no pivot. At 100 TB the
    pattern holds for any bounded-cardinality feature (language, source,
    license class); unbounded keys go through hashing-trick buckets
    instead (llmops_quality_classifier's feature path)."""
    d = t(spark, sf_dir, "documents")
    langs = d.select("lang").distinct()
    # <=|langs| rows: rank window over the broadcastable vocab only.
    w = W.partitionBy(_const_partition("lang")).orderBy("lang")
    vocab = langs.select("lang", (F.row_number().over(w) - 1).alias("label_id"))
    n = vocab.agg(F.count("*").alias("k"))
    one_hot = F.transform(
        F.sequence(F.lit(0), F.col("k") - 1),
        lambda i: F.when(i == F.col("label_id"), 1).otherwise(0),
    )
    # Array content pinned via md5 of the joined string — the registry's
    # array-output discipline (see llmops_embedding_quantize): the driver
    # hash compares scalars, so arrays travel as content digests.
    return (
        d.select("doc_id", "lang")
        .join(F.broadcast(vocab), "lang")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "lang",
            "label_id",
            F.md5(F.array_join(one_hot, ",")).alias("one_hot_md5"),
        )
    )


@query(
    "events_idle_gap_stats",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
      FROM events
    )
    SELECT event_type,
           CAST(count(gap_us) AS BIGINT) AS n_gaps,
           CAST(min(gap_us) AS BIGINT) AS min_gap_us,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us,
           round(CAST(quantile_cont(gap_us, 0.5) AS DOUBLE), 6) AS median_gap_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def events_idle_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event idle-gap distribution: per event type, the min / max /
    median microsecond gap since the same user's previous event — the
    empirical basis for choosing the sessionization gap threshold
    (events_sessionize_gap hardcodes 10 min; this query is how you'd
    justify it from data).

    One lag window on (user_id; ts, event_id) — the same exchange every
    session query uses — then a tiny per-type aggregate with an exact
    interpolated median (at 100 TB: approx_percentile, same plan). Each
    user's first event has no gap and is excluded in both engines."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    gaps = e.select("event_type", gap.alias("gap_us")).filter(
        F.col("gap_us").isNotNull()
    )
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").cast("bigint").alias("n_gaps"),
        F.min("gap_us").cast("bigint").alias("min_gap_us"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
        F.round(F.percentile(F.col("gap_us"), F.lit(0.5)), 6).alias("median_gap_us"),
    )


@query(
    "events_ab_uplift",
    oracle="""
    WITH assigned AS (
      SELECT event_type, user_id, value,
             CASE WHEN substr(md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 1)
                       BETWEEN '0' AND '7'
                  THEN 'A' ELSE 'B' END AS arm
      FROM events
    )
    SELECT event_type,
           CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           CAST(count(DISTINCT CASE WHEN arm = 'A' THEN user_id END) AS BIGINT) AS users_a,
           CAST(count(DISTINCT CASE WHEN arm = 'B' THEN user_id END) AS BIGINT) AS users_b,
           CASE WHEN sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) > 0
                THEN round(CAST(sum(CASE WHEN arm = 'A' THEN CAST(value AS DECIMAL(18,6))
                                        ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                           / sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END), 6)
           END AS mean_a,
           CASE WHEN sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) > 0
                THEN round(CAST(sum(CASE WHEN arm = 'B' THEN CAST(value AS DECIMAL(18,6))
                                        ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                           / sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END), 6)
           END AS mean_b,
           CASE WHEN sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) > 0
                 AND sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) > 0
                THEN round(CAST(sum(CASE WHEN arm = 'B' THEN CAST(value AS DECIMAL(18,6))
                                        ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                           / sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)
                         - CAST(sum(CASE WHEN arm = 'A' THEN CAST(value AS DECIMAL(18,6))
                                        ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                           / sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END), 6)
           END AS uplift
    FROM assigned GROUP BY event_type
    """,
)
def events_ab_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B experiment readout: users are assigned to arms
    by the first hex digit of a salted md5 of their id (0–7 → A, 8–f →
    B: an exact 50/50 hash split that is stable across engines, retries,
    and reprocessing — rand() is none of those), then per-event-type arm
    means and the B−A uplift in ONE conditional-aggregation pass.

    Spark-first: assignment is an in-row expression (no experiment-
    assignment table to join at read time — the hash IS the table);
    event/user counts and decimal-exact value sums for both arms come
    out of a single grouped aggregation (map-side combined), never one
    pass per arm. Uplift is reported as an absolute difference of
    round-6 means — a ratio would divide by a near-zero control mean
    for value-less event types."""
    e = t(spark, sf_dir, "events")
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.lit("exp1:"), F.col("user_id").cast("string"))), 1, 1
        ).between("0", "7"),
        "A",
    ).otherwise("B")
    assigned = e.select("event_type", "user_id", "value", arm.alias("arm"))
    dec = F.col("value").cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    is_a, is_b = F.col("arm") == "A", F.col("arm") == "B"
    cnt_a = F.sum(F.when(is_a, 1).otherwise(0))
    cnt_b = F.sum(F.when(is_b, 1).otherwise(0))
    mean_a = F.sum(F.when(is_a, dec).otherwise(zero)).cast("double") / cnt_a
    mean_b = F.sum(F.when(is_b, dec).otherwise(zero)).cast("double") / cnt_b
    # Empty-arm guard: DuckDB's x/0 is NULL but Spark's ANSI divide throws,
    # so a type with all traffic in one arm must short-circuit to NULL.
    return assigned.groupBy("event_type").agg(
        cnt_a.cast("bigint").alias("n_a"),
        cnt_b.cast("bigint").alias("n_b"),
        F.count_distinct(F.when(is_a, F.col("user_id"))).cast("bigint").alias("users_a"),
        F.count_distinct(F.when(is_b, F.col("user_id"))).cast("bigint").alias("users_b"),
        F.when(cnt_a > 0, F.round(mean_a, 6)).alias("mean_a"),
        F.when(cnt_b > 0, F.round(mean_b, 6)).alias("mean_b"),
        F.when((cnt_a > 0) & (cnt_b > 0), F.round(mean_b - mean_a, 6)).alias("uplift"),
    )


@query(
    "join_salted_hotkey",
    oracle="""
    SELECT s.s_nationkey,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY s.s_nationkey
    """,
)
def join_salted_hotkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join: the dimension side is replicated 8× (one copy
    per salt value) and every fact row picks a deterministic salt, so a
    hot supplier key's rows spread across 8 tasks instead of stalling
    one straggler — the classic manual skew-join remedy (AQE's
    skew-split is the automatic variant; salting is the portable one
    that also works for aggregations). The ORACLE is the PLAIN join:
    what is hashed is the claim that salting never changes results.

    Spark-first: the 8× replication applies to the SMALL side only
    (|supplier|·8 rows), via an in-row explode of a literal salt array;
    the fact side computes its salt with pure integer arithmetic (no
    rand() — deterministic under retries). The join is a plain equi-join
    on (key, salt) that Catalyst plans like any other — and carries NO
    broadcast hint: supplier is SF-scaled, so the salted frame is too;
    AQE broadcasts it when it fits, and when it doesn't the (key, salt)
    shuffle is exactly what the salting bought (8-way hot-key spread)."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n_salt = 8
    s_salted = s.select(
        "s_suppkey",
        "s_nationkey",
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("salt"),
    )
    li_salted = li.select(
        "l_suppkey",
        F.col("l_extendedprice").cast("decimal(18,4)").alias("price"),
        (F.col("l_orderkey") % n_salt).cast("int").alias("salt"),
    )
    joined = li_salted.join(
        s_salted,
        (li_salted.l_suppkey == s_salted.s_suppkey)
        & (li_salted.salt == s_salted.salt),
    )
    return joined.groupBy("s_nationkey").agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.round(F.sum("price"), 2).cast("double").alias("revenue"),
    )


_SIMHASH_BITS = 16
# Engine-portable bit extraction: hex chars with the nibble's high bit set
# are exactly {8,9,a,b,c,d,e,f} = lexicographically >= '8' (md5 emits
# lowercase hex in both engines) — no hex->integer conversion anywhere.
# Tokens are hashed ONCE into `hs`; all 16 bit votes read that array
# (separate per-bit lambdas are not common-subexpression-eliminated, so
# hashing inside each vote would cost 16x).
_SIMHASH_SIG_SQL = "|| ".join(
    f"""CASE WHEN list_sum(list_transform(hs,
          h -> CASE WHEN substr(h, {i + 1}, 1) >= '8' THEN 1 ELSE -1 END)) > 0
        THEN '1' ELSE '0' END """
    for i in range(_SIMHASH_BITS)
)
_SIMHASH_HAMMING_SQL = "+ ".join(
    f"CASE WHEN substr(sa, {i + 1}, 1) <> substr(sb, {i + 1}, 1) THEN 1 ELSE 0 END "
    for i in range(_SIMHASH_BITS)
)


@query(
    "llmops_simhash_estimator_accuracy",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, source,
             list_distinct(list_filter(
               string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')) AS tk
      FROM documents
    ), hashed AS (
      SELECT doc_id, source, tk, list_transform(tk, t -> md5(t)) AS hs FROM tk
    ), sigs AS (
      SELECT doc_id, source, tk, {_SIMHASH_SIG_SQL} AS sig FROM hashed
    ), pairs AS (
      SELECT doc_id AS a_id, sig AS sa, tk AS ta,
             lead(doc_id) OVER w AS b_id, lead(sig) OVER w AS sb,
             lead(tk) OVER w AS tb
      FROM sigs WINDOW w AS (PARTITION BY source ORDER BY doc_id)
    )
    SELECT a_id, b_id,
           CAST({_SIMHASH_HAMMING_SQL} AS BIGINT) AS hamming,
           CASE WHEN length(list_distinct(list_concat(ta, tb))) > 0
                THEN round(CAST(length(list_intersect(ta, tb)) AS DOUBLE)
                           / length(list_distinct(list_concat(ta, tb))), 6)
           END AS exact_jaccard
    FROM pairs WHERE b_id IS NOT NULL
    """,
)
def llmops_simhash_estimator_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SimHash ESTIMATOR itself, fully oracle-hashed: a 16-bit
    majority-vote signature built from md5 nibble high-bits
    (engine-portable, unlike the xxhash64 64-bit signatures the
    production operator uses for speed — which is why
    llmops_simhash_neardup is rows-only-checked), with the Hamming
    distance between successive same-source documents next to their
    exact token-set Jaccard. Hashing signature construction, the
    majority vote, tie policy (sum 0 → bit 0), and the bit-difference
    count cross-engine gives the rows-only SimHash family its
    hash-checked anchor — the same role llmops_minhash_estimator_
    accuracy plays for MinHash.

    Scale shape: signatures are pure in-row higher-order-function
    expressions over the distinct-token array (zero shuffle — exactly
    how operators.semantic computes the production signatures); the pair
    list is a lead window per source. Production path: band the bits
    and equi-join buckets (pigeonhole blocking); this query pins the
    estimator math that path depends on."""
    d = t(spark, sf_dir, "documents")
    tk = d.select(
        "doc_id",
        "source",
        F.array_distinct(tokens(F.lower(F.col("text")))).alias("tk"),
    )
    # Hash every token ONCE; the 16 bit votes read the hash array.
    hashed = tk.withColumn("hs", F.transform("tk", lambda tok: F.md5(tok)))

    def bit(i: int):
        vote = F.aggregate(
            F.col("hs"),
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.substring(h, i + 1, 1) >= "8", 1).otherwise(-1),
        )
        return F.when(vote > 0, F.lit("1")).otherwise(F.lit("0"))

    sigs = hashed.select(
        "doc_id", "source", "tk", F.concat(*[bit(i) for i in range(_SIMHASH_BITS)]).alias("sig")
    )
    w = W.partitionBy("source").orderBy("doc_id")
    pairs = sigs.select(
        F.col("doc_id").alias("a_id"),
        F.col("sig").alias("sa"),
        F.col("tk").alias("ta"),
        F.lead("doc_id").over(w).alias("b_id"),
        F.lead("sig").over(w).alias("sb"),
        F.lead("tk").over(w).alias("tb"),
    ).filter(F.col("b_id").isNotNull())
    hamming = None
    for i in range(_SIMHASH_BITS):
        term = F.when(
            F.substring("sa", i + 1, 1) != F.substring("sb", i + 1, 1), 1
        ).otherwise(0)
        hamming = term if hamming is None else hamming + term
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.size(F.array_union("ta", "tb"))
    # Empty-union guard (two all-whitespace docs): DuckDB 0/0 is NULL,
    # Spark's ANSI divide throws.
    return pairs.select(
        "a_id",
        "b_id",
        hamming.cast("bigint").alias("hamming"),
        F.when(union > 0, F.round(inter.cast("double") / union, 6)).alias(
            "exact_jaccard"
        ),
    )


@query(
    "source_jsonl_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL sink → JSONL source round-trip: serialize events the same
    way the reference's K1 request sink does (``to_json(struct(...))``
    one compact object per line), read the lines back with an EXPLICIT
    schema, and aggregate — the oracle aggregates the ORIGINAL parquet,
    so any encode/decode drift (decimal precision, unicode, null
    handling) hash-fails. JSONL is the reference engine's native
    interchange format (requests out, LLM results in), which makes this
    the round-trip that matters most for pipeline parity.

    Scale notes: explicit read schema (never ``inferSchema``/sampling —
    a second full pass at 100 TB); values travel as fixed-scale decimals
    (no float round-trip); write and read are per-partition parallel.
    PERMISSIVE-mode malformed-line tolerance for untrusted inputs is
    covered separately by pipeline_parse_outputs."""
    out_dir = _scratch_dir(spark, sf_dir, "jsonl_roundtrip")
    e = t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("value"),
    )
    e.select(F.to_json(F.struct("event_id", "event_type", "value")).alias("line")).write.mode(
        "overwrite"
    ).text(out_dir)
    back = spark.read.schema("event_id long, event_type string, value decimal(18,6)").json(
        out_dir
    )
    return back.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.sum("value"), 2).cast("double").alias("sum_value"),
    )


@query(
    "date_interval_battery",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(dayofyear(o_orderdate)) AS BIGINT) AS sum_doy,
           CAST(count(DISTINCT week(o_orderdate)) AS BIGINT) AS n_isoweeks,
           CAST(max(quarter(o_orderdate)) AS BIGINT) AS quarter,
           strftime(last_day(CAST(date_trunc('month', o_orderdate) AS DATE)),
                    '%Y-%m-%d') AS month_end,
           strftime(CAST(date_trunc('month', o_orderdate) AS DATE)
                    + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month_start,
           CAST(date_diff('day', CAST(date_trunc('month', o_orderdate) AS DATE),
                          last_day(CAST(date_trunc('month', o_orderdate) AS DATE)))
                + 1 AS BIGINT) AS days_in_month
    FROM orders
    GROUP BY date_trunc('month', o_orderdate)
    """,
)
def date_interval_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval function battery over monthly buckets: day-of-year
    sums, ISO week counts, quarter, last_day, add_months, and
    month-length arithmetic — the calendar-function surface (beyond
    date_trunc/weekday, covered by date_trunc_weekday_matrix) that every
    fiscal-reporting query leans on, pinned cross-engine.

    Portability notes baked in: ISO week only (both engines' ``week``/
    ``weekofyear`` are ISO-8601); ``add_months``/``+ INTERVAL 1 MONTH``
    both clamp to month end; month length is computed as
    ``datediff(last_day, month_start) + 1`` — pure date arithmetic, no
    locale, no timezone. One hash aggregation on the month key."""
    o = t(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate")).cast("date")
    return (
        o.select(
            month.alias("m"),
            F.dayofyear("o_orderdate").alias("doy"),
            F.weekofyear("o_orderdate").alias("wk"),
            F.quarter("o_orderdate").alias("q"),
        )
        .groupBy("m")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("doy").cast("bigint").alias("sum_doy"),
            F.count_distinct("wk").cast("bigint").alias("n_isoweeks"),
            F.max("q").cast("bigint").alias("quarter"),
        )
        .select(
            F.date_format("m", "yyyy-MM-dd").alias("month_start"),
            "n",
            "sum_doy",
            "n_isoweeks",
            "quarter",
            F.date_format(F.last_day(F.col("m")), "yyyy-MM-dd").alias("month_end"),
            F.date_format(F.add_months(F.col("m"), 1), "yyyy-MM-dd").alias(
                "next_month_start"
            ),
            (F.datediff(F.last_day(F.col("m")), F.col("m")) + 1)
            .cast("bigint")
            .alias("days_in_month"),
        )
    )


@query(
    "window_order_streaks",
    oracle="""
    WITH months AS (
      SELECT DISTINCT o_custkey,
             CAST(strftime(o_orderdate, '%Y') AS BIGINT) * 12
             + CAST(strftime(o_orderdate, '%m') AS BIGINT) AS mn
      FROM orders
    ), islands AS (
      SELECT o_custkey,
             mn - row_number() OVER (PARTITION BY o_custkey ORDER BY mn) AS island
      FROM months
    ), streaks AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS streak
      FROM islands GROUP BY o_custkey, island
    )
    SELECT o_custkey,
           CAST(sum(streak) AS BIGINT) AS n_active_months,
           CAST(max(streak) AS BIGINT) AS max_streak
    FROM streaks GROUP BY o_custkey
    HAVING max(streak) >= 3
    """,
)
def window_order_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest run of CONSECUTIVE active months per
    customer via the classic rank-difference trick — consecutive month
    numbers minus their row_number collapse to a constant island key, so
    streak length is a plain GROUP BY — the idiom behind every "current
    streak" / "consecutive days active" metric, done without self-joins
    or iterative logic.

    Spark-first: distinct (customer, month) first (shrinks orders to at
    most |customers|×|months| rows), ONE row_number window partitioned
    by customer, then two hash aggregations — a single shuffle on
    o_custkey shared by the window and both groupings. Month numbers are
    exact integer arithmetic (year*12+month); HAVING ≥3 keeps the
    output to genuinely streaky customers."""
    o = t(spark, sf_dir, "orders")
    mn = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("bigint")
    months = o.select("o_custkey", mn.alias("mn")).distinct()
    w = W.partitionBy("o_custkey").orderBy("mn")
    islands = months.select(
        "o_custkey", (F.col("mn") - F.row_number().over(w)).alias("island")
    )
    streaks = islands.groupBy("o_custkey", "island").agg(
        F.count("*").cast("bigint").alias("streak")
    )
    return (
        streaks.groupBy("o_custkey")
        .agg(
            F.sum("streak").cast("bigint").alias("n_active_months"),
            F.max("streak").cast("bigint").alias("max_streak"),
        )
        .filter(F.col("max_streak") >= 3)
    )


@query(
    "graph_kcore_peel",
    oracle="""
    WITH pres0 AS (
      SELECT DISTINCT user_id AS u, CAST(floor(epoch(ts) / 60) AS BIGINT) AS b
      FROM events
    ), pres AS (
      SELECT u, b FROM (
        SELECT u, b, row_number() OVER (PARTITION BY b ORDER BY u) AS rn
        FROM pres0
      ) WHERE rn <= 256
    ), edges0 AS (
      SELECT a.u AS x, b.u AS y
      FROM pres a JOIN pres b ON a.b = b.b AND a.u < b.u
      GROUP BY 1, 2
    ),
    d1 AS (
      SELECT u, CAST(count(*) AS BIGINT) AS deg FROM (
        SELECT x AS u FROM edges0 UNION ALL SELECT y FROM edges0) GROUP BY u
    ), k1 AS (SELECT u FROM d1 WHERE deg >= 12),
    e1 AS (
      SELECT x, y FROM edges0
      WHERE x IN (SELECT u FROM k1) AND y IN (SELECT u FROM k1)
    ),
    d2 AS (
      SELECT u, CAST(count(*) AS BIGINT) AS deg FROM (
        SELECT x AS u FROM e1 UNION ALL SELECT y FROM e1) GROUP BY u
    ), k2 AS (SELECT u FROM d2 WHERE deg >= 12),
    e2 AS (
      SELECT x, y FROM e1
      WHERE x IN (SELECT u FROM k2) AND y IN (SELECT u FROM k2)
    ),
    d3 AS (
      SELECT u, CAST(count(*) AS BIGINT) AS deg FROM (
        SELECT x AS u FROM e2 UNION ALL SELECT y FROM e2) GROUP BY u
    ), k3 AS (SELECT u FROM d3 WHERE deg >= 12),
    e3 AS (
      SELECT x, y FROM e2
      WHERE x IN (SELECT u FROM k3) AND y IN (SELECT u FROM k3)
    )
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS round,
             (SELECT CAST(count(*) AS BIGINT) FROM k1) AS n_nodes,
             (SELECT CAST(count(*) AS BIGINT) FROM e1) AS n_edges
      UNION ALL
      SELECT 2, (SELECT count(*) FROM k2), (SELECT count(*) FROM e2)
      UNION ALL
      SELECT 3, (SELECT count(*) FROM k3), (SELECT count(*) FROM e3)
    )
    """,
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core decomposition (k = 12, three synchronized peel
    rounds) on the user co-presence graph — users active in the same
    minute bucket are linked; the dense core that survives peeling is the
    "always-on" population whose behavior dominates co-occurrence
    statistics, and peeling is the standard prefilter before community
    detection or fraud-ring mining. The fourth graph operator alongside
    connected components, PageRank, and triangle counting: CC/PageRank
    propagate along edges, k-core is the degree-constraint fixpoint.
    Three rounds are declared, not convergence (fixture-calibrated: at
    sf0.01 the cascade is 112 → 69 → 20 nodes, genuinely multi-round);
    a production run loops until the round is a no-op, same plan per
    round.

    Spark-first: the co-presence edge list reduces (DISTINCT on the
    bounded (user, minute) grid, then a per-bucket participant cap —
    row_number ≤ PRESENCE_BUCKET_CAP, mirrored in the oracle — then one
    grouped self-equi-join on the bucket: never user×user, and no single
    hot minute can emit more than CAP²/2 pairs); each peel round is one
    degree aggregation
    plus two semi-joins, and every round's edge set is lazily
    checkpointed before fanning into the next round's three consumers
    (degree count, both semi-join probes) so round N+1 never recomputes
    round N — the iterative-graph discipline from operators/graph.py
    (verdict-r6: single lazy-checkpointed edge materialization)."""
    ev = t(spark, sf_dir, "events")
    pres = _capped_presence(
        ev.select(
            F.col("user_id").alias("u"),
            F.floor(F.unix_timestamp("ts") / 60).cast("bigint").alias("b"),
        ).distinct(),
        "b",
    )
    a = pres.select(F.col("u").alias("x"), "b")
    b_ = pres.select(F.col("u").alias("y"), "b")
    edges = (
        a.join(b_, "b")
        .filter(F.col("x") < F.col("y"))
        .select("x", "y")
        .distinct()
        .localCheckpoint(eager=False)
    )
    rows = []
    cur = edges
    for rnd in (1, 2, 3):
        deg = (
            cur.select(F.col("x").alias("u"))
            .unionAll(cur.select(F.col("y").alias("u")))
            .groupBy("u")
            .agg(F.count("*").cast("bigint").alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= 12).select("u")
        cur = (
            cur.join(keep.select(F.col("u").alias("x")), "x", "left_semi")
            .join(keep.select(F.col("u").alias("y")), "y", "left_semi")
            .select("x", "y")
            .localCheckpoint(eager=False)
        )
        stats = keep.agg(F.count("*").cast("bigint").alias("n_nodes")).crossJoin(
            cur.agg(F.count("*").cast("bigint").alias("n_edges"))
        )
        rows.append(stats.select(F.lit(rnd).cast("bigint").alias("round"), "n_nodes", "n_edges"))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


@query(
    "graph_bfs_distance",
    oracle="""
    WITH pres0 AS (
      SELECT DISTINCT user_id AS u, CAST(floor(epoch(ts) / 60) AS BIGINT) AS b,
             event_type AS et
      FROM events
    ), pres AS (
      SELECT u, b, et FROM (
        SELECT u, b, et, row_number() OVER (PARTITION BY b, et ORDER BY u) AS rn
        FROM pres0
      ) WHERE rn <= 256
    ), edges0 AS (
      SELECT a.u AS x, b.u AS y
      FROM pres a JOIN pres b ON a.b = b.b AND a.et = b.et AND a.u < b.u
      GROUP BY 1, 2
    ), edges AS (
      SELECT x, y FROM edges0 UNION ALL SELECT y, x FROM edges0
    ),
    f0 AS (SELECT min(x) AS u FROM edges0 HAVING count(*) > 0),
    f1 AS (
      SELECT DISTINCT e.y AS u FROM edges e JOIN f0 ON e.x = f0.u
      WHERE e.y NOT IN (SELECT u FROM f0)
    ),
    f2 AS (
      SELECT DISTINCT e.y AS u FROM edges e JOIN f1 ON e.x = f1.u
      WHERE e.y NOT IN (SELECT u FROM f0) AND e.y NOT IN (SELECT u FROM f1)
    ),
    f3 AS (
      SELECT DISTINCT e.y AS u FROM edges e JOIN f2 ON e.x = f2.u
      WHERE e.y NOT IN (SELECT u FROM f0) AND e.y NOT IN (SELECT u FROM f1)
        AND e.y NOT IN (SELECT u FROM f2)
    ),
    nodes AS (SELECT DISTINCT x AS u FROM edges)
    SELECT * FROM (
      SELECT CAST(0 AS BIGINT) AS dist, CAST(count(*) AS BIGINT) AS n_users FROM f0
      UNION ALL SELECT 1, count(*) FROM f1
      UNION ALL SELECT 2, count(*) FROM f2
      UNION ALL SELECT 3, count(*) FROM f3
      UNION ALL
      SELECT -1, (SELECT count(*) FROM nodes)
                 - (SELECT count(*) FROM f0) - (SELECT count(*) FROM f1)
                 - (SELECT count(*) FROM f2) - (SELECT count(*) FROM f3)
    )
    """,
)
def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded breadth-first search (3 synchronized frontier expansions)
    from a deterministic landmark on the TYPED co-presence graph — users
    active in the same minute bucket AND the same event type are linked
    (the typed constraint sparsifies the graph to avg degree ~3 at
    sf0.01, so distances are genuinely multi-hop: 1/6/12/35 reached at
    depths 0-3, 87 unreached, dist = -1). Landmark-BFS is the distance
    primitive under friend-of-friend features, influence radius, and
    landmark-based shortest-path sketches (Das Sarma et al.); three
    rounds are declared, not convergence — a production run loops the
    same per-round plan until the frontier empties.

    Spark-first: edge construction caps each (minute, event_type) bucket
    at PRESENCE_BUCKET_CAP deterministic participants (mirrored in the
    oracle; non-binding at fixture SF — see _capped_presence), so no hot
    bucket can emit a quadratic pair blowup. Each round is one equi-join
    of the directed edge list
    against the (tiny, broadcast) frontier, a DISTINCT, and a broadcast
    anti-join against the visited set; frontier and visited are lazily
    checkpointed so round N+1 never replays round N's lineage (the
    iterative-graph discipline of graph.py / graph_kcore_peel). The edge
    list shuffles ONCE to build; rounds shuffle only frontier-sized
    sets. The fifth graph operator: CC and PageRank propagate values,
    k-core iterates a degree constraint, BFS iterates set expansion."""
    ev = t(spark, sf_dir, "events")
    pres = _capped_presence(
        ev.select(
            F.col("user_id").alias("u"),
            F.floor(F.unix_timestamp("ts") / 60).cast("bigint").alias("b"),
            F.col("event_type").alias("et"),
        ).distinct(),
        "b",
        "et",
    )
    a = pres.select(F.col("u").alias("x"), "b", "et")
    b_ = pres.select(F.col("u").alias("y"), "b", "et")
    e0 = (
        a.join(b_, ["b", "et"])
        .filter(F.col("x") < F.col("y"))
        .select("x", "y")
        .distinct()
        .localCheckpoint(eager=False)
    )
    edges = e0.unionAll(e0.select(F.col("y").alias("x"), F.col("x").alias("y"))).localCheckpoint(
        eager=False
    )
    # 1-row landmark, no collect; the isNotNull filter drops the row (and
    # the whole BFS degenerates to zero counts) when the graph is empty —
    # the sf0.001 smoke fixture has no typed co-presence edges at all.
    frontier = e0.agg(F.min("x").alias("u")).filter(F.col("u").isNotNull())
    visited = frontier.localCheckpoint(eager=False)
    rows = [
        frontier.agg(F.count("*").cast("bigint").alias("n_users")).select(
            F.lit(0).cast("bigint").alias("dist"), "n_users"
        )
    ]
    for d in (1, 2, 3):
        # frontier broadcast is bounded (3-hop frontier of one landmark);
        # visited is cumulative — node-population-scale at 100 TB, so NO
        # broadcast hint: the anti-join shuffles (or AQE broadcasts it
        # when it is actually small), never the driver (r9-verdict fix).
        nxt = (
            edges.join(F.broadcast(frontier.select(F.col("u").alias("x"))), "x")
            .select(F.col("y").alias("u"))
            .distinct()
            .join(visited, "u", "left_anti")
            .localCheckpoint(eager=False)
        )
        visited = visited.unionAll(nxt).localCheckpoint(eager=False)
        frontier = nxt
        rows.append(
            nxt.agg(F.count("*").cast("bigint").alias("n_users")).select(
                F.lit(d).cast("bigint").alias("dist"), "n_users"
            )
        )
    nodes = edges.select(F.col("x").alias("u")).distinct()
    unreached = (
        nodes.join(visited, "u", "left_anti")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .select(F.lit(-1).cast("bigint").alias("dist"), "n_users")
    )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.unionAll(unreached)


@query(
    "graph_label_propagation",
    oracle="""
    WITH pres0 AS (
      SELECT DISTINCT user_id AS u, CAST(floor(epoch(ts) / 60) AS BIGINT) AS b,
             event_type AS et
      FROM events
    ), pres AS (
      SELECT u, b, et FROM (
        SELECT u, b, et, row_number() OVER (PARTITION BY b, et ORDER BY u) AS rn
        FROM pres0
      ) WHERE rn <= 256
    ), edges0 AS (
      SELECT a.u AS x, b.u AS y
      FROM pres a JOIN pres b ON a.b = b.b AND a.et = b.et AND a.u < b.u
      GROUP BY 1, 2
    ), edges AS (
      SELECT x, y FROM edges0 UNION ALL SELECT y, x FROM edges0
    ),
    l0 AS (SELECT DISTINCT x AS u, x AS lab FROM edges),
    n1 AS (
      SELECT e.x AS u, l.lab, CAST(count(*) AS BIGINT) AS c
      FROM edges e JOIN l0 l ON e.y = l.u GROUP BY 1, 2
    ),
    l1 AS (
      SELECT u, min((100000 - c) * 1000000000 + lab) % 1000000000 AS lab
      FROM n1 GROUP BY u
    ),
    n2 AS (
      SELECT e.x AS u, l.lab, CAST(count(*) AS BIGINT) AS c
      FROM edges e JOIN l1 l ON e.y = l.u GROUP BY 1, 2
    ),
    l2 AS (
      SELECT u, min((100000 - c) * 1000000000 + lab) % 1000000000 AS lab
      FROM n2 GROUP BY u
    )
    SELECT CAST(sz AS BIGINT) AS community_size,
           CAST(count(*) AS BIGINT) AS n_communities
    FROM (SELECT lab, count(*) AS sz FROM l2 GROUP BY lab)
    GROUP BY sz
    """,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation community detection (2 synchronized rounds,
    deterministic tie-break) on the typed co-presence graph: every node
    starts in its own community, then repeatedly adopts the most frequent
    label among its neighbors — the classic near-linear community
    algorithm (Raghavan et al. 2007). Vanilla LPA is nondeterministic
    (random visit order, random tie-break); this variant is synchronous
    and breaks count-ties toward the SMALLEST label via the
    packed-integer argmin idiom ((100000 - c) * 1e9 + lab, minimized —
    the dedup-survivorship discipline: no engine-specific max_by tie
    behavior), so both engines compute the identical fixpoint prefix.
    Fixture-calibrated: 141 nodes → 78 communities after round 1 → 52
    after round 2, with a genuine size spread (19×1 ... 1×12). Output is
    the community-size histogram — the chart that says whether the graph
    has real cluster structure before anyone pays for Louvain.

    Spark-first: edge construction caps each (minute, event_type) bucket
    at PRESENCE_BUCKET_CAP deterministic participants (mirrored in the
    oracle; non-binding at fixture SF — see _capped_presence). Each round
    is one edge⋈label equi-join (labels shuffle
    on u, the same key the groupBy immediately reuses) + one grouped
    min; label tables are lazily checkpointed per round so lineage never
    replays (graph.py discipline). Packing bounds: c < 1e5 neighbors,
    lab < 1e9 user ids — the packed key fits BIGINT with 4 orders of
    margin."""
    ev = t(spark, sf_dir, "events")
    pres = _capped_presence(
        ev.select(
            F.col("user_id").alias("u"),
            F.floor(F.unix_timestamp("ts") / 60).cast("bigint").alias("b"),
            F.col("event_type").alias("et"),
        ).distinct(),
        "b",
        "et",
    )
    a = pres.select(F.col("u").alias("x"), "b", "et")
    b_ = pres.select(F.col("u").alias("y"), "b", "et")
    e0 = (
        a.join(b_, ["b", "et"])
        .filter(F.col("x") < F.col("y"))
        .select("x", "y")
        .distinct()
        .localCheckpoint(eager=False)
    )
    edges = e0.unionAll(e0.select(F.col("y").alias("x"), F.col("x").alias("y"))).localCheckpoint(
        eager=False
    )
    labels = edges.select(F.col("x").alias("u")).distinct().select("u", F.col("u").alias("lab"))
    for _ in range(2):
        n = (
            edges.join(labels.select(F.col("u").alias("y"), "lab"), "y")
            .groupBy(F.col("x").alias("u"), "lab")
            .agg(F.count("*").cast("bigint").alias("c"))
        )
        labels = (
            n.groupBy("u")
            .agg(
                (
                    F.min((F.lit(100000) - F.col("c")) * F.lit(1000000000) + F.col("lab"))
                    % F.lit(1000000000)
                ).alias("lab")
            )
            .localCheckpoint(eager=False)
        )
    sizes = labels.groupBy("lab").agg(F.count("*").cast("bigint").alias("sz"))
    return sizes.groupBy(F.col("sz").alias("community_size")).agg(
        F.count("*").cast("bigint").alias("n_communities")
    )


@query(
    "events_survival_curve",
    oracle="""
    WITH span AS (
      SELECT user_id, event_type,
             date_trunc('day', min(ts)) AS f, date_trunc('day', max(ts)) AS l
      FROM events GROUP BY 1, 2
    ),
    days AS (
      SELECT unnest(generate_series((SELECT min(f) FROM span),
                                    (SELECT max(l) FROM span),
                                    INTERVAL 1 DAY)) AS d
    ),
    base AS (
      SELECT d,
             (SELECT CAST(count(*) AS BIGINT) FROM span
               WHERE f <= d AND l >= d) AS at_risk,
             (SELECT CAST(count(*) AS BIGINT) FROM span WHERE l = d) AS churned
      FROM days
    ),
    terms AS (
      SELECT d, at_risk, churned,
             CASE WHEN churned < at_risk
                  THEN ROUND(ln((at_risk - churned) * 1.0 / at_risk), 10)
             END AS lt
      FROM base
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, at_risk, churned,
           ROUND(churned * 1.0 / at_risk, 6) AS hazard,
           CASE WHEN churned = at_risk THEN -999999.0
                ELSE ROUND(coalesce(sum(lt) OVER (ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0), 6)
           END AS log_survival
    FROM terms
    """,
)
def events_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier-style survival/churn curve over per-(user, event_type)
    activity streams: a stream is "at risk" on every day of its observed
    [first, last] span and "churns" on its last-activity day; hazard(d) =
    churned/at_risk and the survival estimate accumulates as
    Σ ln(1 − hazard) — reported as log-survival, with the ln terms
    rounded to 10 decimals before the decimal-safe cumulative sum (the
    KL/entropy discipline: never exponentiate back, exp()'s last ulp is
    engine-specific). A day that churns its entire risk set terminates
    the curve (−999999 sentinel — survival is exactly 0 and the log
    diverges); by the span construction that is the grid's last day.
    Per-(user, type) streams rather than users make the fixture curve
    non-vacuous: 14 of 30 days carry churn, hazard spans 0.002 → 1.0.

    Spark-first: the at-risk count is NOT a per-day correlated count —
    it is an interval sweep: +1 at span start, −1 the day after span
    end, grouped per day and cumulated over the bounded calendar grid
    (the events_max_concurrency discipline), so the heavy table is
    touched once and every window runs on the ≤|days| grid under
    bounded_window_key."""
    ev = t(spark, sf_dir, "events")
    span = ev.groupBy("user_id", "event_type").agg(
        F.date_trunc("day", F.min("ts")).alias("f"),
        F.date_trunc("day", F.max("ts")).alias("l"),
    )
    bounds = span.agg(
        F.min("f").alias("lo"), F.max("l").alias("hi")
    )
    days = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    deltas = (
        span.select(F.col("f").alias("d"), F.lit(1).alias("delta"))
        .unionAll(
            span.select(
                (F.col("l") + F.expr("INTERVAL 1 DAY")).alias("d"),
                F.lit(-1).alias("delta"),
            )
        )
        .groupBy("d")
        .agg(F.sum("delta").alias("net"))
    )
    churns = span.groupBy(F.col("l").alias("d")).agg(
        F.count("*").cast("bigint").alias("churned")
    )
    wd = (
        W.partitionBy(bounded_window_key(F.unix_timestamp("d").cast("bigint")))
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    base = (
        days.join(deltas, "d", "left")
        .join(churns, "d", "left")
        .select(
            "d",
            F.sum(F.coalesce(F.col("net"), F.lit(0))).over(wd).cast("bigint").alias("at_risk"),
            F.coalesce(F.col("churned"), F.lit(0)).cast("bigint").alias("churned"),
        )
    )
    terms = base.withColumn(
        "lt",
        F.when(
            F.col("churned") < F.col("at_risk"),
            F.round(
                F.log(F.try_divide((F.col("at_risk") - F.col("churned")) * F.lit(1.0), F.col("at_risk"))),
                10,
            ),
        ),
    )
    return terms.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "at_risk",
        "churned",
        F.round(F.try_divide(F.col("churned") * F.lit(1.0), F.col("at_risk")), 6).alias("hazard"),
        F.when(F.col("churned") == F.col("at_risk"), F.lit(-999999.0))
        .otherwise(F.round(F.coalesce(F.sum("lt").over(wd), F.lit(0.0)), 6))
        .alias("log_survival"),
    )


@query(
    "events_nelson_aalen",
    oracle="""
    WITH span AS (
      SELECT user_id, event_type,
             date_trunc('day', min(ts)) AS f, date_trunc('day', max(ts)) AS l
      FROM events GROUP BY 1, 2
    ),
    days AS (
      SELECT unnest(generate_series((SELECT min(f) FROM span),
                                    (SELECT max(l) FROM span),
                                    INTERVAL 1 DAY)) AS d
    ),
    base AS (
      SELECT d,
             (SELECT CAST(count(*) AS BIGINT) FROM span
               WHERE f <= d AND l >= d) AS at_risk,
             (SELECT CAST(count(*) AS BIGINT) FROM span WHERE l = d) AS churned
      FROM days
    ),
    terms AS (
      SELECT d, at_risk, churned,
             CAST(round(coalesce(churned * 1.0 / nullif(at_risk, 0), 0.0), 10)
                  AS DECIMAL(28,10)) AS h,
             CAST(round(coalesce(churned * 1.0
                                 / nullif(at_risk * at_risk, 0), 0.0), 10)
                  AS DECIMAL(28,10)) AS v
      FROM base
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, at_risk, churned,
           round(CAST(sum(h) OVER w AS DOUBLE), 6) AS cum_hazard,
           round(sqrt(CAST(sum(v) OVER w AS DOUBLE)), 6) AS se
    FROM terms
    WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def events_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NELSON-AALEN cumulative-hazard estimator (Nelson 1972; Aalen
    1978) — the third estimator of the survival family, over the exact
    span grid events_survival_curve (Kaplan-Meier) uses: H(t) =
    sum_{d<=t} churned_d/at_risk_d with the Poisson-type variance
    sum d_j/n_j^2 (se = its sqrt). KM and NA answer the same question
    through different algebra — KM multiplies survival factors, NA adds
    hazard increments — and the textbook ordering -ln(S_KM) >= H_NA
    (per-term: -ln(1-x) >= x) is pinned day-by-day against the KM
    query's log_survival in tests/test_r14_invariants.py. NA is what a
    reliability/retention team plots when hazards, not survival
    probabilities, are the decision quantity (additive over causes,
    defined through ties and zero-churn days without special cases).

    Parity discipline (the KM query's, verbatim): at-risk/churn counts
    are exact integers from the interval sweep; each day's h and v
    terms are one double division quantized round-10 into
    DECIMAL(28,10), so the cumulative sums are exact decimal and only
    the final round-6 emission (and IEEE sqrt) run in doubles.

    Spark-first: identical plan shape to events_survival_curve — one
    span rollup touches the heavy table, +1/-1 interval sweep, every
    window on the bounded calendar grid under bounded_window_key."""
    ev = t(spark, sf_dir, "events")
    span = ev.groupBy("user_id", "event_type").agg(
        F.date_trunc("day", F.min("ts")).alias("f"),
        F.date_trunc("day", F.max("ts")).alias("l"),
    )
    bounds = span.agg(F.min("f").alias("lo"), F.max("l").alias("hi"))
    days = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    deltas = (
        span.select(F.col("f").alias("d"), F.lit(1).alias("delta"))
        .unionAll(
            span.select(
                (F.col("l") + F.expr("INTERVAL 1 DAY")).alias("d"),
                F.lit(-1).alias("delta"),
            )
        )
        .groupBy("d")
        .agg(F.sum("delta").alias("net"))
    )
    churns = span.groupBy(F.col("l").alias("d")).agg(
        F.count("*").cast("bigint").alias("churned")
    )
    wd = (
        W.partitionBy(bounded_window_key(F.unix_timestamp("d").cast("bigint")))
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    base = (
        days.join(deltas, "d", "left")
        .join(churns, "d", "left")
        .select(
            "d",
            F.sum(F.coalesce(F.col("net"), F.lit(0)))
            .over(wd)
            .cast("bigint")
            .alias("at_risk"),
            F.coalesce(F.col("churned"), F.lit(0)).cast("bigint").alias("churned"),
        )
    )
    h = F.round(
        F.coalesce(
            F.try_divide(F.col("churned") * F.lit(1.0), F.nullif(F.col("at_risk"), F.lit(0))),
            F.lit(0.0),
        ),
        10,
    ).cast("decimal(28,10)")
    v = F.round(
        F.coalesce(
            F.try_divide(
                F.col("churned") * F.lit(1.0),
                F.nullif(F.col("at_risk") * F.col("at_risk"), F.lit(0)),
            ),
            F.lit(0.0),
        ),
        10,
    ).cast("decimal(28,10)")
    terms = base.select("d", "at_risk", "churned", h.alias("h"), v.alias("v"))
    return terms.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "at_risk",
        "churned",
        F.round(F.sum("h").over(wd).cast("double"), 6).alias("cum_hazard"),
        F.round(F.sqrt(F.sum("v").over(wd).cast("double")), 6).alias("se"),
    )


@query(
    "events_session_window_builtin",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 21600000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
      FROM o
    )
    SELECT user_id,
           CAST(epoch_us(min(ts)) AS BIGINT) AS session_start_us,
           CAST(epoch_us(max(ts)) + 21600000000 AS BIGINT) AS session_end_us,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def events_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's BUILT-IN ``session_window`` in a BATCH aggregation (6 h
    inactivity gap) — the API-surface twin of events_sessionize_gap,
    which hand-rolls the same semantics from lag + running-sum windows.
    The oracle replays the built-in's exact merge rule: a session's
    window is [first event, last event + gap) with the end EXCLUSIVE, so
    an event arriving exactly gap after its predecessor starts a NEW
    session (the island break is ``diff >= gap``, not ``>``, which is
    the off-by-one this parity pin exists to catch), and the emitted end
    is last-event + gap. Timestamps return as integer epoch-µs — never
    raw timestamps (registry discipline).

    Spark-first: one shuffle on the (session_window, user_id) grouping;
    at scale this is the same single-exchange plan as the hand-rolled
    variant, but the merge happens inside the aggregation operator
    instead of two stacked windows. 5725 sessions over 10 k events at
    sf0.01 — genuinely multi-event sessions."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "6 hours").alias("w"), "user_id")
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).cast("bigint").alias("session_start_us"),
            F.unix_micros(F.col("w.end")).cast("bigint").alias("session_end_us"),
            "n_events",
        )
    )


@query(
    "graph_link_prediction",
    oracle="""
    WITH pres0 AS (
      SELECT DISTINCT user_id AS u, CAST(floor(epoch(ts) / 60) AS BIGINT) AS b
      FROM events
    ), pres AS (
      SELECT u, b FROM (
        SELECT u, b, row_number() OVER (PARTITION BY b ORDER BY u) AS rn
        FROM pres0
      ) WHERE rn <= 256
    ), edges0 AS (
      SELECT a.u AS x, b.u AS y
      FROM pres a JOIN pres b ON a.b = b.b AND a.u < b.u
      GROUP BY 1, 2
    ), adj AS (
      SELECT x AS w, y AS v FROM edges0 UNION ALL SELECT y, x FROM edges0
    ), deg AS (
      SELECT w AS u, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY 1
    ), adjw AS (
      SELECT a.w, a.v FROM adj a JOIN deg d ON d.u = a.w WHERE d.d <= 1000
    ), wedge AS (
      SELECT a.v AS x, b.v AS y, a.w
      FROM adjw a JOIN adjw b ON a.w = b.w AND a.v < b.v
    ), cand AS (
      SELECT w.x, w.y,
             CAST(count(*) AS BIGINT) AS common_neighbors,
             CAST(sum(CAST(round(1.0 / ln(d.d), 10) AS DECIMAL(28, 10)))
                  AS DECIMAL(28, 10)) AS aa_dec
      FROM wedge w JOIN deg d ON d.u = w.w
      WHERE NOT EXISTS (
        SELECT 1 FROM edges0 e WHERE e.x = w.x AND e.y = w.y)
      GROUP BY w.x, w.y
    ), scored AS (
      SELECT c.x, c.y, c.common_neighbors,
             round(c.common_neighbors * 1.0
                   / (dx.d + dy.d - c.common_neighbors), 6) AS jaccard,
             round(CAST(c.aa_dec AS DOUBLE), 6) AS adamic_adar
      FROM cand c
      JOIN deg dx ON dx.u = c.x
      JOIN deg dy ON dy.u = c.y
    )
    SELECT * FROM scored
    ORDER BY adamic_adar DESC, x, y
    LIMIT 25
    """,
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the (untyped) user co-presence graph — users
    active in the same minute bucket are linked (the kcore family's graph;
    the TYPED variant is all closed cliques at smoke SF, leaving zero open
    wedges to score): score every NON-adjacent
    pair that shares at least one neighbor by the three classical
    neighborhood indices — common-neighbor count, Jaccard
    |N(x)∩N(y)| / |N(x)∪N(y)|, and Adamic-Adar Σ_w 1/ln(deg(w)), which
    down-weights hub witnesses — and return the top-25 predicted links.
    The seventh graph operator: CC/PageRank/LPA propagate, k-core peels,
    triangle/clustering count closed wedges; link prediction ranks the
    OPEN wedges those leave behind. A common neighbor has degree ≥ 2 by
    construction, so ln(deg) ≥ ln 2 and the Adamic-Adar divisor needs no
    guard (the derived-divisor sweep still applies to the Jaccard divisor:
    |union| ≥ common ≥ 1 > 0).

    Parity discipline: each 1/ln(deg) term is rounded to 10 decimals and
    summed as DECIMAL(28,10) — exact, order-independent accumulation (the
    KL/entropy discipline) — then cast back and rounded to 6; the top-25
    cut is made deterministic by the (adamic_adar DESC, x, y) total order.

    Spark-first: edge construction caps each minute bucket at
    PRESENCE_BUCKET_CAP deterministic participants (mirrored in the
    oracle — no hot minute can emit more than CAP²/2 pairs), and wedge
    enumeration — the one quadratic step, Σ deg² pairs (16.4 M at sf0.1,
    max degree 222) — shuffles on the witness w (never user×user) AND
    drops super-hub witnesses (deg(w) > 10³, mirrored in the oracle's
    adjw CTE), which Adamic-Adar already discounts to < 1/ln(10³) ≈ 0.14
    signal each — the same hot-key cap discipline as the MinHash bucket
    gather, now in the plan rather than the comments. Neither cap binds
    at fixture SF (max bucket 12, max degree 222); the binding case is
    pinned in tests/test_r9_invariants.py. The existing-edge exclusion
    is one anti-join on the pair key."""
    ev = t(spark, sf_dir, "events")
    pres = _capped_presence(
        ev.select(
            F.col("user_id").alias("u"),
            F.floor(F.unix_timestamp("ts") / 60).cast("bigint").alias("b"),
        ).distinct(),
        "b",
    )
    a = pres.select(F.col("u").alias("x"), "b")
    b_ = pres.select(F.col("u").alias("y"), "b")
    edges0 = (
        a.join(b_, "b")
        .filter(F.col("x") < F.col("y"))
        .select("x", "y")
        .distinct()
        .localCheckpoint(eager=False)
    )
    # The wedge stage's output is deg²-amplified (16.4 M rows from 220 k
    # inputs at sf0.1): AQE sizes exchanges by join INPUT bytes, and an
    # optimizer-inserted (ENSURE_REQUIREMENTS) exchange on `w` gets
    # coalesced to ~2 tasks, serializing the blowup. Pinning the
    # partitioning HERE — below the degree join, as an explicit
    # repartition(n, "w") (REPARTITION_BY_NUM, exempt from AQE
    # coalescing) — makes it the exchange that satisfies BOTH the degree
    # join and the wedge self-join, so no prunable/coalescible optimizer
    # exchange ever exists on this key. (With the r10 broadcast hints the
    # pin used to sit above the degree join; once the hints were dropped,
    # EnsureRequirements pruned it as redundant against its own exchange,
    # which AQE then coalesced — a 2× regression at sf0.1, caught by the
    # r11 A/B and pinned in tests/test_r11_invariants.py.)
    nshuf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = (
        edges0.select(F.col("x").alias("w"), F.col("y").alias("v"))
        .unionAll(edges0.select(F.col("y").alias("w"), F.col("x").alias("v")))
        .repartition(nshuf, "w")
    )
    deg = (
        adj.groupBy(F.col("w").alias("u"))
        .agg(F.count("*").cast("bigint").alias("d"))
        .localCheckpoint(eager=False)
    )
    # Attach the witness degree (hence its Adamic-Adar term) to the
    # adjacency BEFORE the quadratic self-join, so the 16M-row wedge
    # stream is reduced to candidate pairs by the groupBy before the
    # anti-join prunes closed pairs. The degree table is one row per
    # distinct node — O(|V|), population-scale — so it carries NO
    # broadcast hint (r10 verdict #1: at 10⁸–10⁹ users a forced |V|-row
    # broadcast is a driver OOM); AQE broadcasts it at any SF where it
    # actually fits, and otherwise this join shuffles on `w`, the same
    # key the wedge stage repartitions on below.
    adjd = (
        adj.join(deg.select(F.col("u").alias("w"), "d"), "w")
        # Super-hub witness cap (mirrored in the oracle's adjw CTE): a
        # witness with degree d emits d²/2 wedges, so one 10⁶-degree hub
        # is a 10¹²-pair task. Adamic-Adar discounts such witnesses to
        # < 1/ln(10³) ≈ 0.14 signal each anyway — dropping them bounds the
        # wedge stage at 10⁶ pairs per witness and barely moves the score.
        # Jaccard/common_neighbors denominators keep the TRUE degree.
        .filter(F.col("d") <= 1000)
        .select(
            "w",
            "v",
            # d = 1 nodes can't witness a wedge (they have one neighbor), but
            # the term is evaluated on every adjacency row, so guard ln(1)=0.
            F.when(
                F.col("d") > 1,
                F.round(F.lit(1.0) / F.log(F.col("d")), 10).cast("decimal(28,10)"),
            ).alias("term"),
        )
    )
    # Both self-join sides inherit the pinned REPARTITION_BY_NUM
    # partitioning on `w` from `adj` above (filter/project preserve it),
    # so the wedge join streams at full parallelism with no new exchange.
    wa = adjd.select("w", F.col("v").alias("x"), "term")
    wb = adjd.select("w", F.col("v").alias("y"))
    wedge = wa.join(wb, "w").filter(F.col("x") < F.col("y"))
    cand = (
        wedge.groupBy("x", "y")
        .agg(
            F.count("*").cast("bigint").alias("common_neighbors"),
            F.sum("term").alias("aa_dec"),
        )
        .join(edges0, ["x", "y"], "left_anti")
    )
    # Same O(|V|) frame: un-hinted (AQE-decided) on both endpoint joins.
    scored = (
        cand.join(deg.select(F.col("u").alias("x"), F.col("d").alias("dx")), "x")
        .join(deg.select(F.col("u").alias("y"), F.col("d").alias("dy")), "y")
        .select(
            "x",
            "y",
            "common_neighbors",
            F.round(
                F.col("common_neighbors")
                * F.lit(1.0)
                / (F.col("dx") + F.col("dy") - F.col("common_neighbors")),
                6,
            ).alias("jaccard"),
            F.round(F.col("aa_dec").cast("double"), 6).alias("adamic_adar"),
        )
    )
    return scored.orderBy(F.desc("adamic_adar"), "x", "y").limit(25)


@query(
    "events_holt_linear",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ), idx AS (
      SELECT day, y,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
      FROM daily
    ), hw(i, day, y, l, b) AS (
      SELECT i, day, y, y * 1.0e0, 0.0e0 FROM idx WHERE i = 1
      UNION ALL
      SELECT d.i, d.day, d.y,
             0.3e0 * d.y + 0.7e0 * (h.l + h.b),
             0.2e0 * ((0.3e0 * d.y + 0.7e0 * (h.l + h.b)) - h.l) + 0.8e0 * h.b
      FROM hw h JOIN idx d ON d.i = h.i + 1
    )
    SELECT day, y, round(l, 6) AS level, round(b, 6) AS trend,
           round(l + b, 6) AS forecast_next
    FROM hw
    """,
)
def events_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing over the daily
    event-count series — the trend-aware member of the smoothing family
    (events_ewma_daily is the level-only single-exponential):
    l_t = α·y_t + (1−α)(l_{t−1}+b_{t−1}), b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}
    with α=0.3, β=0.2, l_1=y_1, b_1=0, emitting level, trend, and the
    one-step forecast l+b per day. Unlike the EWMA query's closed-form
    weight expansion, the trend recursion has no such form — it is a
    genuine ordered FOLD, which Spark runs as a higher-order ``aggregate``
    over the date-sorted array and DuckDB as a recursive CTE stepping
    i → i+1: the same sequence of IEEE double operations in both engines
    (constants spelled as identical literals, never pow()), so the rounded
    outputs are bit-equal with no decimal crutch. Literal trap, BOTH
    engines: a bare ``0.3`` inside SQL text parses as DECIMAL — DuckDB's
    recursive CTE silently ran in one-decimal decimal arithmetic, and
    Spark's F.expr fold mixed decimal-exact first terms into the double
    state (caught by the bit-equality hypothesis property, not the
    round-6 hash). The oracle spells constants ``0.3e0`` and the Spark
    fold ``0.3D`` so both engines run pure binary doubles — pinned
    bit-exact against a pure-Python reference in
    tests/test_r8_properties.py.

    Spark-first: one shuffle builds the |days|-bounded daily grid; the
    fold then runs in-row on a single array (the calendar is bounded —
    the MinHash-signature fold discipline). The per-step state is
    appended to an array accumulator so every day's (level, trend) is
    emitted, then posexploded back to rows. At 100 TB the daily grid is
    still tiny; the heavy table is touched exactly once."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").cast("bigint").alias("y"))
    series = daily.agg(
        F.array_sort(F.collect_list(F.struct("day", "y"))).alias("s")
    )
    # Fold: acc is array<struct<l,b>>; first element seeds (y, 0.0), later
    # steps read the previous state with element_at(acc, -1). The new level
    # expression is repeated inside the trend update (same IEEE ops as the
    # oracle's textual recomputation).
    folded = series.select(
        "s",
        F.expr(
            """
            aggregate(
              s,
              cast(array() as array<struct<l: double, b: double>>),
              (acc, e) -> CASE WHEN size(acc) = 0
                THEN array(struct(e.y * 1.0D AS l, 0.0D AS b))
                ELSE array_append(acc, struct(
                  0.3D * e.y + 0.7D * (element_at(acc, -1).l + element_at(acc, -1).b) AS l,
                  0.2D * ((0.3D * e.y + 0.7D * (element_at(acc, -1).l + element_at(acc, -1).b))
                         - element_at(acc, -1).l)
                    + 0.8D * element_at(acc, -1).b AS b))
              END)
            """
        ).alias("hw"),
    )
    ex = folded.select(
        F.posexplode(F.arrays_zip("s", "hw")).alias("i", "z")
    )
    return ex.select(
        F.col("z.s.day").alias("day"),
        F.col("z.s.y").alias("y"),
        F.round(F.col("z.hw.l"), 6).alias("level"),
        F.round(F.col("z.hw.b"), 6).alias("trend"),
        F.round(F.col("z.hw.l") + F.col("z.hw.b"), 6).alias("forecast_next"),
    )


@query(
    "events_burstiness",
    oracle="""
    WITH o AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT)
               - lag(CAST(floor(epoch(ts)) AS BIGINT))
                 OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap_s
      FROM events
    ), s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(gap_s) AS BIGINT) AS sg,
             CAST(sum(gap_s * gap_s) AS BIGINT) AS qg
      FROM o WHERE gap_s IS NOT NULL GROUP BY event_type
    ), m AS (
      SELECT event_type, n,
             sg * 1.0 / n AS mu,
             CASE WHEN n > 1 THEN (qg - sg * 1.0 * sg / n) / (n - 1) END AS var
      FROM s
    )
    SELECT event_type, n AS n_gaps,
           round(mu, 6) AS mean_gap_s,
           CASE WHEN var > 0 AND mu > 0
                THEN round(sqrt(var) / mu, 6) END AS cv,
           CASE WHEN var > 0 AND sqrt(var) + mu > 0
                THEN round((sqrt(var) - mu) / (sqrt(var) + mu), 6) END AS burstiness
    FROM m
    """,
)
def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness profile of each event type's arrival process: from the
    inter-arrival gaps (seconds, per-type ordered by ts with event_id
    tie-break), emit the coefficient of variation σ/μ and the
    Goh-Barabási burstiness B = (σ−μ)/(σ+μ) ∈ (−1, 1) — B≈0 is
    Poisson, B→1 is bursty, B→−1 a metronome. The single-number
    complement to events_interarrival_histogram (the full distribution)
    and dq_autocorr_lag (memory): burstiness reads the marginal's shape.

    Parity discipline: gaps are exact integer seconds (floored epoch),
    their sum and sum-of-squares exact BIGINTs, and μ/σ the identical
    double expression tree in both engines; the σ>0, μ>0 and σ+μ>0
    guards follow the derived-divisor sweep (an event type with one
    event, or all gaps equal, yields NULL not an ANSI error).

    Spark-first: one shuffle on event_type for the lag window, then a
    map-side aggregation to five rows — the window partitions by the
    grouping key, so no global sort exists anywhere. At 100 TB the
    per-type ordering is the same single exchange; skew in one hot type
    is the known cost and the histogram query's per-day sharding note
    applies."""
    ev = t(spark, sf_dir, "events")
    sec = F.floor(F.unix_timestamp("ts")).cast("bigint")
    wlag = W.partitionBy("event_type").orderBy("ts", "event_id")
    o = ev.select(
        "event_type", (sec - F.lag(sec).over(wlag)).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    s = o.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("gap_s").cast("bigint").alias("sg"),
        F.sum(F.col("gap_s") * F.col("gap_s")).cast("bigint").alias("qg"),
    )
    m = s.select(
        "event_type",
        "n",
        (F.col("sg") * F.lit(1.0) / F.col("n")).alias("mu"),
        F.when(
            F.col("n") > 1,
            (F.col("qg") - F.col("sg") * F.lit(1.0) * F.col("sg") / F.col("n"))
            / (F.col("n") - 1),
        ).alias("var"),
    )
    sd = F.sqrt("var")
    return m.select(
        "event_type",
        F.col("n").alias("n_gaps"),
        F.round("mu", 6).alias("mean_gap_s"),
        F.when((F.col("var") > 0) & (F.col("mu") > 0), F.round(sd / F.col("mu"), 6)).alias(
            "cv"
        ),
        F.when(
            (F.col("var") > 0) & (sd + F.col("mu") > 0),
            F.round((sd - F.col("mu")) / (sd + F.col("mu")), 6),
        ).alias("burstiness"),
    )


@query(
    "source_binaryfile_ingest",
    oracle="""
    SELECT source,
           CAST(1 AS BIGINT) AS n_files,
           CAST(sum(length(text) + 1) AS BIGINT) AS n_bytes,
           md5(string_agg(text, chr(10) ORDER BY doc_id) || chr(10))
             AS content_md5
    FROM documents GROUP BY source
    """,
)
def source_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``binaryFile`` datasource pin — the opaque-bytes ingest path every
    multimodal pipeline starts from (images/audio arrive as files, not
    rows): documents are exported one text file per source (the writer
    side: repartition by the partition column + sortWithinPartitions so
    each partition directory gets exactly ONE deterministically-ordered
    file), then re-ingested with ``spark.read.format("binaryFile")``,
    which yields (path, modificationTime, length, content BINARY) plus
    the discovered ``source`` partition column. Emitted facts — file
    count, byte count, md5 of raw bytes per source — are recomputed by
    the oracle from the rows that were exported (each line is text+'\\n',
    ASCII fixture, so bytes = chars+1 and the file digest equals the md5
    of the newline-joined doc_id-ordered text) — the hash attests both
    the writer's layout determinism and the binary reader's fidelity.

    Spark-first: the export is one shuffle (repartition on the partition
    key); the binaryFile scan parallelizes per file and prunes on the
    partition column like any file source. 100 TB note: binaryFile keeps
    whole files as single row values — the real multimodal reader feeds
    content into mapInPandas decoders (operators/multimodal.py) and caps
    file size (spark.sql.sources.binaryFile.maxLength guards the 2 GiB
    row limit)."""
    out_dir = _scratch_dir(spark, sf_dir, "binaryfile_ingest")
    d = t(spark, sf_dir, "documents").select("source", "doc_id", "text")
    (
        d.repartition("source")
        .sortWithinPartitions("source", "doc_id")
        .select("source", "text")
        .write.mode("overwrite")
        .partitionBy("source")
        .text(out_dir)
    )
    back = spark.read.format("binaryFile").load(out_dir)
    if "source" not in back.columns:  # empty-input safety (F7): zero rows
        back = back.withColumn("source", F.lit(None).cast("string"))
    return back.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.sum("length").cast("bigint").alias("n_bytes"),
        # one file per source by construction: max == the only digest
        F.max(F.md5("content")).alias("content_md5"),
    )


@query(
    "dq_fk_orphan_audit",
    oracle="""
    WITH ev AS (
      SELECT CASE WHEN event_id % 97 = 0 THEN user_id + 1000000
                  ELSE user_id END AS user_id
      FROM events
    ), ord AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 101 = 0 THEN o_custkey + 1000000
                  ELSE o_custkey END AS o_custkey
      FROM orders
    ),
    r1 AS (
      SELECT 'events.user_id -> customer.c_custkey' AS rule,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_orphan_rows,
             CAST(count(DISTINCT CASE WHEN c.c_custkey IS NULL
                                      THEN e.user_id END) AS BIGINT)
               AS n_orphan_keys
      FROM ev e LEFT JOIN customer c ON c.c_custkey = e.user_id
    ),
    r2 AS (
      SELECT 'orders.o_custkey -> customer.c_custkey',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
             CAST(count(DISTINCT CASE WHEN c.c_custkey IS NULL
                                      THEN o.o_custkey END) AS BIGINT)
      FROM ord o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    r3 AS (
      SELECT 'lineitem.l_orderkey -> orders.o_orderkey',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
             CAST(count(DISTINCT CASE WHEN o.o_orderkey IS NULL
                                      THEN l.l_orderkey END) AS BIGINT)
      FROM lineitem l LEFT JOIN ord o ON o.o_orderkey = l.l_orderkey
    ),
    u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3)
    SELECT rule, n_rows, n_orphan_rows, n_orphan_keys,
           round(n_orphan_rows * 1.0 / n_rows, 6) AS orphan_rate
    FROM u
    """,
)
def dq_fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential-integrity audit — the multi-table member of
    the DQ gate family (dq_orders_constraints checks single-table rules):
    for each declared FK relationship, count child rows whose key has no
    parent, the distinct orphan keys, and the orphan rate. The clean
    fixture has zero orphans everywhere, so the audit corrupts two child
    keys IN-QUERY with deterministic modular rules (every 97th event,
    every 101st order → +1 000 000) — the mojibake-detector pattern:
    ground truth is built in and the hash attests the anti-join logic,
    not three zeros. The third rule (lineitem → orders, with orders'
    INJECTED key view as parent) stays genuinely clean, pinning the
    no-false-positive side.

    Spark-first: each rule is one left join + conditional aggregation
    over the child table (the orphan count and orphan-key count come
    from the same pass — no separate anti-join scan); parent key sides
    are dimension-sized and broadcast under AQE. At 100 TB each audit is
    one shuffle-or-broadcast join, and rules run independently —
    embarrassingly parallel across relationship declarations."""
    ev = t(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 97 == 0, F.col("user_id") + 1000000)
        .otherwise(F.col("user_id"))
        .alias("user_id")
    )
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 101 == 0, F.col("o_custkey") + 1000000)
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey")

    def rule(child, key, parent, pkey, label):
        joined = child.join(parent, child[key] == parent[pkey], "left")
        orphan = parent[pkey].isNull()
        return joined.agg(
            F.lit(label).alias("rule"),
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.when(orphan, 1).otherwise(0)).cast("bigint").alias("n_orphan_rows"),
            F.count_distinct(F.when(orphan, child[key])).cast("bigint").alias(
                "n_orphan_keys"
            ),
        )

    u = (
        rule(ev, "user_id", cust, "c_custkey", "events.user_id -> customer.c_custkey")
        .unionAll(
            rule(
                orders,
                "o_custkey",
                cust,
                "c_custkey",
                "orders.o_custkey -> customer.c_custkey",
            )
        )
        .unionAll(
            rule(
                li,
                "l_orderkey",
                orders.select("o_orderkey"),
                "o_orderkey",
                "lineitem.l_orderkey -> orders.o_orderkey",
            )
        )
    )
    return u.select(
        "rule",
        "n_rows",
        "n_orphan_rows",
        "n_orphan_keys",
        F.round(F.col("n_orphan_rows") * F.lit(1.0) / F.col("n_rows"), 6).alias(
            "orphan_rate"
        ),
    )


@query(
    "llmops_hybrid_rrf_fusion",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, lower(tk.tok) AS term
      FROM documents,
           UNNEST(list_filter(string_split_regex(trim(text), '\s+'),
                              s -> length(s) > 0)) AS tk(tok)
    ), tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok GROUP BY 1, 2),
    dlen AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM tok GROUP BY 1),
    stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                     sum(dl) / count(*) AS avgdl,
                     CAST(sum(dl) AS DOUBLE) AS total_toks
              FROM dlen),
    dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df,
                     CAST(sum(tf) AS DOUBLE) AS cf
              FROM tf GROUP BY term),
    q AS (SELECT term, df, cf FROM dfreq ORDER BY df DESC, term LIMIT 3),
    bm25 AS (
      SELECT tf.doc_id,
             round(sum(ln((stats.n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0)
                 * (tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dlen.dl / stats.avgdl))), 6)
               AS s
      FROM tf JOIN q USING (term)
      JOIN dlen USING (doc_id) CROSS JOIN stats
      GROUP BY tf.doc_id),
    ql AS (
      SELECT d.doc_id,
             round(sum(ln((COALESCE(tf.tf, 0.0) + 100.0 * (q.cf / stats.total_toks))
                          / (d.dl + 100.0))), 6) AS s
      FROM dlen d CROSS JOIN q
      LEFT JOIN tf ON tf.doc_id = d.doc_id AND tf.term = q.term
      CROSS JOIN stats
      GROUP BY d.doc_id),
    ra AS (SELECT doc_id, s,
                  ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r
           FROM bm25 QUALIFY r <= 20),
    rb AS (SELECT doc_id, s,
                  ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r
           FROM ql QUALIFY r <= 20),
    fused AS (
      SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
             CAST(COALESCE(ra.r, -1) AS BIGINT) AS rank_bm25,
             CAST(COALESCE(rb.r, -1) AS BIGINT) AS rank_ql,
             round(COALESCE(1.0 / (60 + ra.r), 0.0)
                   + COALESCE(1.0 / (60 + rb.r), 0.0), 6) AS rrf
      FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
    )
    SELECT doc_id, rank_bm25, rank_ql, rrf
    FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
    """,
)
def llmops_hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by Reciprocal Rank Fusion: run TWO lexical rankers
    over the same 3-term query — BM25 (k1=1.2, b=0.75) and a
    Dirichlet-smoothed query-likelihood language model (μ=100, the
    textbook second ranker whose length normalization disagrees with
    BM25's, so the fusion is non-degenerate) — take each ranker's top-20,
    and fuse with RRF(d) = Σ_r 1/(60 + rank_r(d)), the score-free fusion
    used to combine lexical and vector legs in production RAG stacks
    (rank-based, so incomparable score scales can't dominate). Docs on
    one list only keep their single term; missing ranks emit the −1
    sentinel per registry discipline.

    Parity discipline: ranks are assigned over ROUNDED scores with doc_id
    tie-breaks (the bm25_topk rule), and the RRF constants are integer /
    double literals — 1/(60+r) is exact-input division in both engines.

    Spark-first: both rankers share ONE tokenized scan's tf/dlen/stats
    subtrees (localCheckpoint pins the reuse); the query side is 3 rows
    and the corpus stats 1 row, both broadcast; each top-20 is
    TakeOrdered; the fusion is a 20×20 full outer join. At 100 TB the
    only heavy ops are the postings probes — the QL leg's LEFT join keeps
    absent (doc, term) pairs at tf=0 without densifying the matrix (the
    smoothing term is per-query-term, added via the 3-row broadcast)."""
    # spread(): the tokenize + explode feeding BOTH checkpointed rankers
    # otherwise runs on the 1-task fixture scan — and the lazy checkpoints
    # materialize it at build time under AQE (guide §2.5); no-op at scale.
    d = spread(t(spark, sf_dir, "documents").select("doc_id", "text"))
    tok = d.select(
        "doc_id", F.explode(F.transform(tokens(F.col("text")), F.lower)).alias("term")
    )
    tf = (
        tok.groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dlen = (
        tok.groupBy("doc_id")
        .agg(F.count("*").cast("double").alias("dl"))
        .localCheckpoint(eager=False)
    )
    stats = dlen.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
        F.sum("dl").cast("double").alias("total_toks"),
    )
    dfreq = tf.groupBy("term").agg(
        F.count("*").cast("double").alias("df"),
        F.sum("tf").cast("double").alias("cf"),
    )
    q = dfreq.orderBy(F.desc("df"), "term").limit(3)
    bm25_contrib = (
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        * (F.col("tf") * 2.2)
        / (
            F.col("tf")
            + 1.2 * (F.lit(1.0) - F.lit(0.75) + F.lit(0.75) * F.col("dl") / F.col("avgdl"))
        )
    )
    bm25 = (
        tf.join(F.broadcast(q), "term")
        .join(dlen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", bm25_contrib.alias("c"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("c"), 6).alias("s"))
    )
    ql_contrib = F.log(
        (F.coalesce(F.col("tf"), F.lit(0.0)) + F.lit(100.0) * (F.col("cf") / F.col("total_toks")))
        / (F.col("dl") + F.lit(100.0))
    )
    ql = (
        dlen.crossJoin(F.broadcast(q))
        .join(tf, ["doc_id", "term"], "left")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", ql_contrib.alias("c"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("c"), 6).alias("s"))
    )
    wconst = W.partitionBy(F.col("doc_id") * 0)

    def topr(df):
        top = df.orderBy(F.desc("s"), "doc_id").limit(20)
        return top.withColumn(
            "r",
            F.row_number().over(wconst.orderBy(F.desc("s"), "doc_id")).cast("bigint"),
        )

    ra = topr(bm25).select(F.col("doc_id").alias("da"), F.col("r").alias("rank_a"))
    rb = topr(ql).select(F.col("doc_id").alias("db"), F.col("r").alias("rank_b"))
    fused = ra.join(rb, ra.da == rb.db, "full_outer").select(
        F.coalesce(ra.da, rb.db).alias("doc_id"),
        F.coalesce(F.col("rank_a"), F.lit(-1)).cast("bigint").alias("rank_bm25"),
        F.coalesce(F.col("rank_b"), F.lit(-1)).cast("bigint").alias("rank_ql"),
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("rank_a")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("rank_b")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), "doc_id").limit(10)


@query(
    "events_top_paths",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type AS a,
             lead(event_type, 1) OVER w AS b,
             lead(event_type, 2) OVER w AS c
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT a || '>' || b || '>' || c AS path,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM o WHERE b IS NOT NULL AND c IS NOT NULL
    GROUP BY 1
    ORDER BY n_occurrences DESC, path
    LIMIT 10
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: the ten most frequent 3-step event paths
    (overlapping trigrams of each user's time-ordered stream), with both
    occurrence and distinct-user support. The n-gram generalization of
    events_transition_matrix (1-step Markov) — path mining reads the
    SEQUENCE structure a first-order transition matrix provably cannot
    (it factorizes; trigram counts don't), and is the standard feed for
    Sankey funnels and next-step models.

    Spark-first: one shuffle on user_id drives both lead() windows (same
    spec, one exchange + sort), the trigram cut rides the projection, and
    the path rollup reuses nothing heavier than a hash aggregate on the
    |event_types|³-bounded key space; top-10 is TakeOrdered. At 100 TB
    the per-user ordering is the one real cost and it's the same
    exchange every sessionization query already pays."""
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        F.col("event_type").alias("a"),
        F.lead("event_type", 1).over(w).alias("b"),
        F.lead("event_type", 2).over(w).alias("c"),
    ).filter(F.col("b").isNotNull() & F.col("c").isNotNull())
    return (
        o.groupBy(
            F.concat_ws(">", "a", "b", "c").alias("path")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_occurrences"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy(F.desc("n_occurrences"), "path")
        .limit(10)
    )


@query(
    "events_forecast_backtest",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ), idx AS (
      SELECT day, y,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
      FROM daily
    ), hw(i, y, l, b) AS (
      SELECT i, y, y * 1.0e0, 0.0e0 FROM idx WHERE i = 1
      UNION ALL
      SELECT d.i, d.y,
             0.3e0 * d.y + 0.7e0 * (h.l + h.b),
             0.2e0 * ((0.3e0 * d.y + 0.7e0 * (h.l + h.b)) - h.l) + 0.8e0 * h.b
      FROM hw h JOIN idx d ON d.i = h.i + 1
    ), pred AS (
      SELECT h.i, n.y AS actual, h.l + h.b AS fc
      FROM hw h JOIN idx n ON n.i = h.i + 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_forecasts,
           round(sum(CAST(round(abs(actual - fc), 10) AS DECIMAL(28, 10)))
                 * 1.0e0 / count(*), 6) AS mae,
           round(sum(CAST(round(abs(actual - fc) / actual, 10)
                          AS DECIMAL(28, 10))) * 100.0e0 / count(*), 6)
             AS mape_pct,
           round(sqrt(sum(CAST(round((actual - fc) * (actual - fc), 10)
                               AS DECIMAL(28, 10))) * 1.0e0 / count(*)), 6)
             AS rmse
    FROM pred
    """,
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead backtest of the Holt linear-trend forecaster
    (events_holt_linear): for every day d, compare the forecast issued at
    d (level+trend) against day d+1's ACTUAL count, and roll up MAE,
    MAPE, and RMSE — the evaluation loop that turns a smoother into a
    forecasting model you can compare against seasonal-naive or EWMA
    before trusting its capacity plans. Day counts are never zero on the
    fixture grid, so MAPE's division is guarded by construction (the day
    exists because it had events).

    Parity discipline: the recursion is the identical IEEE fold pinned by
    events_holt_linear (e0 literals in the oracle); each per-day error
    term is rounded to 10 decimals and accumulated as DECIMAL(28,10) —
    exact, order-independent — before the single rounded emission (the
    KL/entropy discipline), because unlike the fold itself the SUM of
    errors has no defined order.

    Spark-first: same single-shuffle daily grid; the backtest join is
    arrays_zip against the grid shifted by one — in-row, no second
    exchange."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").cast("bigint").alias("y"))
    series = daily.agg(
        F.array_sort(F.collect_list(F.struct("day", "y"))).alias("s")
    )
    folded = series.select(
        "s",
        F.expr(
            """
            aggregate(
              s,
              cast(array() as array<struct<l: double, b: double>>),
              (acc, e) -> CASE WHEN size(acc) = 0
                THEN array(struct(e.y * 1.0D AS l, 0.0D AS b))
                ELSE array_append(acc, struct(
                  0.3D * e.y + 0.7D * (element_at(acc, -1).l + element_at(acc, -1).b) AS l,
                  0.2D * ((0.3D * e.y + 0.7D * (element_at(acc, -1).l + element_at(acc, -1).b))
                         - element_at(acc, -1).l)
                    + 0.8D * element_at(acc, -1).b AS b))
              END)
            """
        ).alias("hw"),
    )
    # forecast at index i (1-based) predicts actual at i+1. The
    # size >= 2 filter is empty-input safety (F7): sequence(1, size-1)
    # DESCENDS when size(s) < 2 and element_at would probe an empty
    # array; on real data the grid always has >= 2 days.
    pred = folded.filter(F.size("s") >= 2).select(
        F.explode(
            F.expr(
                """
                transform(sequence(1, size(s) - 1), i -> struct(
                  CAST(element_at(s, CAST(i AS INT) + 1).y AS DOUBLE) AS actual,
                  element_at(hw, CAST(i AS INT)).l
                    + element_at(hw, CAST(i AS INT)).b AS fc))
                """
            )
        ).alias("p")
    ).select(F.col("p.actual").alias("actual"), F.col("p.fc").alias("fc"))
    abs_err = F.abs(F.col("actual") - F.col("fc"))
    # try_divide on every rollup: empty-input safety (F7) — n_forecasts
    # >= 1 whenever the daily grid has >= 2 days, so values are unchanged
    # at every fixture SF
    return pred.agg(
        F.count("*").cast("bigint").alias("n_forecasts"),
        F.round(
            F.try_divide(
                F.sum(F.round(abs_err, 10).cast("decimal(28,10)")) * F.lit(1.0),
                F.count("*"),
            ),
            6,
        ).alias("mae"),
        F.round(
            F.try_divide(
                # try_divide: a zero-valued actual (flat day) would zero
                # the MAPE denominator; NULL terms drop from the sum on
                # both engines (DuckDB x/0 -> NULL)
                F.sum(F.round(F.try_divide(abs_err, F.col("actual")), 10).cast("decimal(28,10)"))
                * F.lit(100.0),
                F.count("*"),
            ),
            6,
        ).alias("mape_pct"),
        F.round(
            F.sqrt(
                F.try_divide(
                    F.sum(
                        F.round(
                            (F.col("actual") - F.col("fc"))
                            * (F.col("actual") - F.col("fc")),
                            10,
                        ).cast("decimal(28,10)")
                    )
                    * F.lit(1.0),
                    F.count("*"),
                )
            ),
            6,
        ).alias("rmse"),
    )


@query(
    "events_cohort_ltv_matrix",
    oracle="""
    WITH firstw AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort
      FROM events GROUP BY user_id
    ), cell AS (
      SELECT f.cohort,
             CAST((CAST(date_trunc('week', e.ts) AS DATE)
                   - CAST(f.cohort AS DATE)) // 7 AS BIGINT) AS week_offset,
             CAST(sum(CAST(round(e."value" * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events e JOIN firstw f USING (user_id)
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2
    ), sized AS (
      SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_users
      FROM firstw GROUP BY 1
    )
    SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_week,
           c.week_offset,
           c.cents AS revenue_cents,
           CAST(sum(c.cents) OVER (PARTITION BY c.cohort ORDER BY c.week_offset
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_revenue_cents,
           round(sum(c.cents) OVER (PARTITION BY c.cohort ORDER BY c.week_offset
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 * 1.0e0 / s.cohort_users, 6) AS cum_ltv_cents_per_user
    FROM cell c JOIN sized s USING (cohort)
    """,
)
def events_cohort_ltv_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort LTV triangle — the revenue-weighted twin of
    events_cohort_retention_matrix: per (first-activity cohort, week
    offset) cell, purchase revenue, its running total down the cohort
    row, and cumulative LTV per cohort user — the curve growth teams
    integrate against acquisition cost. Retention says WHO came back;
    this says what coming back was WORTH.

    Parity discipline: revenue goes through rounded cents (BIGINT) at
    the row level, cumulates exactly (integer window sum over the
    bounded |weeks|² matrix), and divides once by the exact cohort-user
    count (e0-spelled in the oracle); ISO Monday week truncation both
    engines.

    Spark-first: same two-exchange shape as the retention matrix (cohort
    min-agg, activity equi-join reusing the user_id partitioning), then
    windows over the tiny matrix under bounded_window_key. At 100 TB the
    only heavy op is the user_id join every cohort query already pays."""
    e = t(spark, sf_dir, "events")
    firstw = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    cell = (
        e.filter(F.col("event_type") == "purchase")
        .join(firstw, "user_id")
        .groupBy(
            "cohort",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort").cast("date"),
                )
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("revenue_cents")
        )
    )
    sized = firstw.groupBy("cohort").agg(
        F.count("*").cast("bigint").alias("cohort_users")
    )
    wrun = (
        W.partitionBy("cohort")
        .orderBy("week_offset")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = cell.join(F.broadcast(sized), "cohort").select(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        "revenue_cents",
        F.sum("revenue_cents").over(wrun).cast("bigint").alias("cum_revenue_cents"),
        F.round(
            F.sum("revenue_cents").over(wrun) * F.lit(1.0) / F.col("cohort_users"), 6
        ).alias("cum_ltv_cents_per_user"),
    )
    return out


@query(
    "source_schema_evolution_merge",
    oracle="""
    WITH unioned AS (
      SELECT o_orderkey, o_orderstatus, NULL AS o_clerk_shift
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey, o_orderstatus,
             CAST(o_orderkey % 3 AS BIGINT) AS o_clerk_shift
      FROM orders WHERE o_orderkey % 2 = 1
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(o_clerk_shift) AS BIGINT) AS n_with_new_col,
           CAST(coalesce(sum(o_clerk_shift), 0) AS BIGINT) AS shift_sum
    FROM unioned GROUP BY o_orderstatus
    """,
)
def source_schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema-evolution pin (``mergeSchema``): an old batch is
    written with (key, status) and a newer batch with an ADDED column
    (key, status, clerk_shift) into the same dataset directory; reading
    with ``mergeSchema=true`` must union the footers into the superset
    schema and surface the old batch's missing column as NULLs — the
    exact situation every long-lived lake table hits the day a producer
    adds a field. The aggregate pins all three behaviors: row count
    (neither batch lost), non-null count of the evolved column (exactly
    the new batch), and its checksum (values decode, not just nulls).

    Spark-first: the two writes are ordinary parquet appends into
    subdirectories; schema merge is a footer-only operation at planning
    time (with ``mergeSchema`` costing one extra footer pass — the
    scale note: on 100 TB datasets set the merged schema on the TABLE
    definition instead, which is why this stays an explicit per-read
    opt-in). The read itself stays fully parallel with pushdown intact."""
    out_dir = _scratch_dir(spark, sf_dir, "schema_evolution")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    old = o.filter(F.col("o_orderkey") % 2 == 0)
    new = o.filter(F.col("o_orderkey") % 2 == 1).withColumn(
        "o_clerk_shift", (F.col("o_orderkey") % 3).cast("bigint")
    )
    old.write.mode("overwrite").parquet(out_dir + "/batch=old")
    new.write.mode("overwrite").parquet(out_dir + "/batch=new")
    back = spark.read.option("mergeSchema", True).parquet(out_dir)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.count("o_clerk_shift").cast("bigint").alias("n_with_new_col"),
        F.coalesce(F.sum("o_clerk_shift"), F.lit(0)).cast("bigint").alias("shift_sum"),
    )


@query(
    "join_dynamic_partition_pruning",
    oracle="""
    WITH dim AS (
      SELECT * FROM (VALUES ('1-URGENT', 10), ('2-HIGH', 5)) d(prio, weight)
      WHERE weight > 0
    )
    SELECT f.o_orderpriority AS prio,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(f.o_totalprice * 100, 0) AS BIGINT) * d.weight)
                AS BIGINT) AS weighted_cents
    FROM orders f JOIN dim d ON d.prio = f.o_orderpriority
    GROUP BY f.o_orderpriority
    """,
)
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning pin: the fact table is (re)written
    PARTITIONED BY the join key, the dimension side is a 2-row inline
    relation carrying a runtime filter the optimizer cannot see
    statically through the join — so Catalyst must inject a dynamic
    pruning subquery that reuses the dimension's broadcast to skip 3 of
    the 5 priority partitions AT RUNTIME. The oracle computes the same
    weighted aggregate relationally; the PLAN property (a
    ``dynamicpruning`` expression on the scan) is asserted separately in
    tests/test_plan_shapes.py, because the hash can only attest the
    numbers, and DPP is precisely an optimization the numbers can't see.

    Spark-first/100 TB: DPP is THE mechanism that makes star-schema
    joins over partitioned lakes affordable — without it this scan reads
    every partition of the fact table. The companion
    source_partitioned_pruning pins STATIC pruning (literal predicates);
    this pins the runtime variant."""
    out_dir = _scratch_dir(spark, sf_dir, "dpp_fact")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out_dir)
    # explicit schema: empty-input safety (F7) — zero rows leave no files
    # to infer from; identical to the inferred schema on real data
    fact = spark.read.schema(o.schema).parquet(out_dir)
    # DPP requires a FILTER on the pruning side (the planner inserts the
    # pruning subquery only under a selective dim predicate); weight > 0
    # is semantically a no-op but syntactically load-bearing.
    dim = inline_rows(
        spark, "prio string, weight bigint", [("1-URGENT", 10), ("2-HIGH", 5)]
    ).filter(F.col("weight") > 0)
    j = fact.join(F.broadcast(dim), fact.o_orderpriority == dim.prio)
    return j.groupBy(F.col("o_orderpriority").alias("prio")).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint") * F.col("weight"))
        .cast("bigint")
        .alias("weighted_cents"),
    )


@query(
    "llmops_bpe_apply_merges",
    oracle=r"""
    WITH toks AS (
      SELECT source, lower(tk.tok) AS tok
      FROM documents,
           UNNEST(list_filter(string_split_regex(trim(text), '\s+'),
                              s -> length(s) > 0)) AS tk(tok)
    ), pairs AS (
      SELECT substr(tok, i, 2) AS pair
      FROM toks CROSS JOIN generate_series(1, 30) g(i)
      WHERE length(tok) >= 2 AND i <= length(tok) - 1 AND i <= 30
    ), merges AS (
      SELECT max(CASE WHEN rank = 1 THEN pair END) AS m1,
             max(CASE WHEN rank = 2 THEN pair END) AS m2,
             max(CASE WHEN rank = 3 THEN pair END) AS m3
      FROM (
        SELECT pair, ROW_NUMBER() OVER (ORDER BY count(*) DESC, pair) AS rank
        FROM pairs GROUP BY pair) WHERE rank <= 3
    ), applied AS (
      SELECT t.source, t.tok,
             trim(replace(replace(replace(
               ' ' || trim(regexp_replace(t.tok, '(.)', '\1 ', 'g')) || ' ',
               ' ' || substr(m.m1, 1, 1) || ' ' || substr(m.m1, 2, 1) || ' ',
               ' ' || m.m1 || ' '),
               ' ' || substr(m.m2, 1, 1) || ' ' || substr(m.m2, 2, 1) || ' ',
               ' ' || m.m2 || ' '),
               ' ' || substr(m.m3, 1, 1) || ' ' || substr(m.m3, 2, 1) || ' ',
               ' ' || m.m3 || ' ')) AS sym
      FROM toks t CROSS JOIN merges m
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(length(tok)) AS BIGINT) AS symbols_before,
           CAST(sum(length(sym) - length(replace(sym, ' ', '')) + 1)
                AS BIGINT) AS symbols_after,
           round(sum(length(sym) - length(replace(sym, ' ', '')) + 1)
                 * 1.0e0 / sum(length(tok)), 6) AS compression
    FROM applied GROUP BY source
    """,
)
def llmops_bpe_apply_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE step two — APPLY the learned merges: take the corpus's top-3
    character-pair merges (the exact ranking llmops_bpe_first_merges
    learns), rewrite every token's spaced-symbol sequence with each merge
    in rank order, and report per-source symbol compression — the
    encode-side half of BPE that turns merge tables into token counts
    (a real trainer loops learn→apply; each loop is these two plans).
    Boundary safety is the load-bearing detail: symbols are
    space-delimited and each merge pattern matches WITH its surrounding
    spaces, so a pattern can never match across a previously-merged
    unit's boundary ('b c' cannot fire inside 'ab c'), and both engines'
    left-to-right non-overlapping replace() reproduces BPE's greedy
    single-pass convention ('a a a' → 'aa a', not 'a aa').

    Parity discipline: the merge table pivots to one broadcast row under
    the rounded-count/pair total order; symbol counts are exact integer
    space arithmetic; one e0-spelled division at emission.

    Spark-first: learning is the bpe_first_merges plan (map-side pair
    counts, TakeOrdered 3); application is a scalar rewrite riding the
    token explosion with the 1-row merge table cross-joined as a
    broadcast model — the IVF-centroid shape again. At 100 TB a real
    vocab is ~50k merges applied in a Pandas UDF with a trie; the
    3-merge unroll pins the semantics that UDF must reproduce."""
    # spread(): tokenize + per-char pair explode is per-row text compute
    # over the 1-task fixture scan (guide §2.5); no-op at scale.
    d = spread(t(spark, sf_dir, "documents").select("source", "text"))
    toks = d.select(
        "source", F.explode(F.transform(tokens(F.col("text")), F.lower)).alias("tok")
    )
    pairs = (
        toks.filter(F.length("tok") >= 2)
        .select(
            F.explode(
                F.sequence(F.lit(1), F.least(F.length("tok") - 1, F.lit(30)))
            ).alias("i"),
            "tok",
        )
        .select(F.expr("substr(tok, i, 2)").alias("pair"))
    )
    top3 = (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(3)
    )
    w = W.partitionBy(_const_partition("pair")).orderBy(F.desc("n"), "pair")
    merges = (
        top3.withColumn("rank", F.row_number().over(w))
        .groupBy()
        .agg(
            F.max(F.when(F.col("rank") == 1, F.col("pair"))).alias("m1"),
            F.max(F.when(F.col("rank") == 2, F.col("pair"))).alias("m2"),
            F.max(F.when(F.col("rank") == 3, F.col("pair"))).alias("m3"),
        )
    )

    def apply_merge(col, m):
        pat = F.concat(
            F.lit(" "), F.substring(m, 1, 1), F.lit(" "), F.substring(m, 2, 1), F.lit(" ")
        )
        rep = F.concat(F.lit(" "), m, F.lit(" "))
        return F.replace(col, pat, rep)

    spaced = F.concat(
        F.lit(" "),
        F.trim(F.regexp_replace(F.col("tok"), "(.)", "$1 ")),
        F.lit(" "),
    )
    applied = toks.crossJoin(F.broadcast(merges)).select(
        "source",
        "tok",
        F.trim(
            apply_merge(
                apply_merge(apply_merge(spaced, F.col("m1")), F.col("m2")),
                F.col("m3"),
            )
        ).alias("sym"),
    )
    n_sym = F.length("sym") - F.length(F.replace(F.col("sym"), F.lit(" "), F.lit(""))) + 1
    return applied.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum(F.length("tok")).cast("bigint").alias("symbols_before"),
        F.sum(n_sym).cast("bigint").alias("symbols_after"),
        F.round(
            F.sum(n_sym) * F.lit(1.0) / F.sum(F.length("tok")), 6
        ).alias("compression"),
    )


_BPE_TRAIN_K = 5


def _bpe_train_oracle(k: int) -> str:
    """Programmatically unrolled k-iteration BPE trainer oracle (DuckDB):
    each iteration is one weighted pair-count aggregation over the token
    TYPE table + a replace() rewrite with the winning pair — the same
    lazy chain the Spark plan composes."""
    parts = [
        r"""
    WITH d AS (
      SELECT lower(tk.tok) AS tok
      FROM documents,
           UNNEST(list_filter(string_split_regex(trim(text), '\s+'),
                              s -> length(s) > 0)) AS tk(tok)
      WHERE doc_id < 400
    ), ty AS MATERIALIZED (
      SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM d GROUP BY tok
    ), s0 AS (
      SELECT ' ' || trim(regexp_replace(tok, '(.)', '\1 ', 'g')) || ' ' AS sym,
             freq
      FROM ty
    )"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f""", p{i} AS (
      SELECT t.l[g.i] || ' ' || t.l[g.i + 1] AS pair, t.freq
      FROM (SELECT string_split(trim(sym), ' ') AS l, freq FROM s{i - 1}) t,
           UNNEST(generate_series(1, len(t.l) - 1)) AS g(i)
    ), w{i} AS (
      SELECT pair, CAST(sum(freq) AS BIGINT) AS n
      FROM p{i} GROUP BY pair ORDER BY n DESC, pair LIMIT 1
    ), s{i} AS (
      SELECT replace(sym, ' ' || w.pair || ' ',
                     ' ' || replace(w.pair, ' ', '') || ' ') AS sym, freq
      FROM s{i - 1} CROSS JOIN w{i} w
    )"""
        )
    wins = "\n      UNION ALL\n      ".join(
        f"SELECT {i} AS iter, pair, n FROM w{i}" for i in range(1, k + 1)
    )
    parts.append(
        f""", v AS (
      SELECT md5(array_to_string(list_sort(list(s)), '|')) AS vocab_hash,
             CAST(count(*) AS BIGINT) AS vocab_size
      FROM (SELECT DISTINCT unnest(string_split(trim(sym), ' ')) AS s
            FROM s{k}) u
      WHERE length(s) >= 1
    ), wins AS (
      {wins}
    )
    SELECT CAST(iter AS BIGINT) AS iter, pair,
           replace(pair, ' ', '') AS merged, n, v.vocab_hash, v.vocab_size
    FROM wins CROSS JOIN v"""
    )
    return "".join(parts)


@query("llmops_bpe_train_merges", oracle=_bpe_train_oracle(_BPE_TRAIN_K))
def llmops_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge TRAINING — the learning loop the first_merges/apply pair
    bracketed (verdict-r12 item #4): K = 5 iterations of pick the
    highest-weighted adjacent SYMBOL pair, merge it, recount — true BPE,
    where from iteration 2 on the candidate pairs include previously
    merged symbols (first_merges ranks raw character pairs only). Output:
    one row per iteration (chosen pair, merged symbol, weighted count)
    plus the final surviving-symbol vocabulary hash/size — the artifact a
    tokenizer team version-controls. Third iterative algorithm family
    beside pca_power and markov_stationary, same lazy-composition shape.

    Spark-first, the textbook trainer decomposition: the CORPUS is
    scanned once into the token TYPE table (distinct token, frequency) —
    the iterative loop then runs entirely over types, which is orders of
    magnitude smaller than the corpus at any scale (Sennrich et al.
    2016's word-frequency dict). The type table localCheckpoints
    (eager=False) so K iterations re-read a materialized frame, not the
    parquet scan; each iteration is ONE map-side-combinable weighted
    pair-count aggregation (pairs fold in-row via zip_with over the
    symbol array — no join), a TakeOrdered-1 winner, and a broadcast
    1-row rewrite — the pca_power v-broadcast shape. Trained on a
    literal-bounded sample (doc_id < 400) because that is what trainers
    do at corpus scale (a capped reservoir sample), and it keeps the
    K-deep lazy plan fixture-priced. At 100 TB: same plan over a sampled
    type table, with a per-iteration driver-collected winner replacing
    the lazy chain past K≈50 (one 1-row collect per iteration is
    control-plane, the Lloyd-centroid convention).

    Merge application inherits llmops_bpe_apply_merges' pinned
    convention: space-delimited symbols, each merge rewrites with its
    surrounding spaces via single-pass non-overlapping replace() —
    boundary-safe, engine-identical ('a a a' → 'aa a'). Counts are
    exact integers; the vocab hash is md5 over the '|'-joined
    binary-sorted symbol set (collation-free in both engines).
    tests/test_r13_invariants.py pins that re-applying the learned merge
    list in rank order reproduces the trainer's final segmentation."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    toks = d.select(
        F.explode(F.transform(tokens(F.col("text")), F.lower)).alias("tok")
    )
    types = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .select(
            F.concat(
                F.lit(" "),
                F.trim(F.regexp_replace("tok", "(.)", "$1 ")),
                F.lit(" "),
            ).alias("sym"),
            "freq",
        )
        .localCheckpoint(eager=False)  # K iterations re-read this frame
    )
    sym_df = types
    winners = []
    for i in range(1, _BPE_TRAIN_K + 1):
        syms = F.split(F.trim(F.col("sym")), " ")
        n_sym = F.size(syms)
        prs = F.zip_with(
            F.slice(syms, 1, n_sym - 1),
            F.slice(syms, 2, n_sym - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        )
        pc = (
            sym_df.filter(F.size(F.split(F.trim(F.col("sym")), " ")) >= 2)
            .select(F.explode(prs).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").cast("bigint").alias("n"))
        )
        win = pc.orderBy(F.desc("n"), "pair").limit(1)
        winners.append(
            win.select(
                F.lit(i).cast("bigint").alias("iter"),
                "pair",
                F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias("merged"),
                "n",
            )
        )
        pat = F.concat(F.lit(" "), F.col("pair"), F.lit(" "))
        rep = F.concat(
            F.lit(" "), F.replace(F.col("pair"), F.lit(" "), F.lit("")), F.lit(" ")
        )
        # Checkpoint between iterations (the wordpiece trainer's fix,
        # applied here too): iteration i's winner subtree otherwise
        # re-derives inside every later iteration's pair count.
        sym_df = (
            sym_df.crossJoin(F.broadcast(win.select("pair")))
            .select(F.replace(F.col("sym"), pat, rep).alias("sym"), "freq")
            .localCheckpoint(eager=False)
        )
    vocab = (
        sym_df.select(F.explode(F.split(F.trim("sym"), " ")).alias("s"))
        .filter(F.length("s") >= 1)
        .distinct()
        .agg(
            F.md5(F.concat_ws("|", F.array_sort(F.collect_list("s")))).alias(
                "vocab_hash"
            ),
            F.count("*").cast("bigint").alias("vocab_size"),
        )
    )
    out = winners[0]
    for w_df in winners[1:]:
        out = out.unionAll(w_df)
    return out.crossJoin(F.broadcast(vocab))


_WP_TRAIN_K = 4


def _wordpiece_train_oracle(k: int) -> str:
    """Unrolled k-iteration WordPiece trainer oracle: per iteration one
    weighted pair count + one weighted unigram count over the symbol
    stream, the winner maximizing count(ab)/(count(a)·count(b))."""
    parts = [
        r"""
    WITH d AS (
      SELECT lower(tk.tok) AS tok
      FROM documents,
           UNNEST(list_filter(string_split_regex(trim(text), '\s+'),
                              s -> length(s) > 0)) AS tk(tok)
      WHERE doc_id < 400
    ), ty AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM d GROUP BY tok
    ), s0 AS (
      SELECT ' ' || trim(regexp_replace(tok, '(.)', '\1 ', 'g')) || ' ' AS sym,
             freq
      FROM ty
    )"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f""", p{i} AS (
      SELECT t.l[g.i] || ' ' || t.l[g.i + 1] AS pair, t.freq
      FROM (SELECT string_split(trim(sym), ' ') AS l, freq FROM s{i - 1}) t,
           UNNEST(generate_series(1, len(t.l) - 1)) AS g(i)
    ), pc{i} AS (
      SELECT pair, CAST(sum(freq) AS BIGINT) AS n_pair
      FROM p{i} GROUP BY pair
    ), u{i} AS (
      SELECT s, CAST(sum(freq) AS BIGINT) AS n FROM
        (SELECT unnest(string_split(trim(sym), ' ')) AS s, freq FROM s{i - 1})
      GROUP BY s
    ), w{i} AS (
      SELECT pc.pair, pc.n_pair, ua.n AS na, ub.n AS nb
      FROM pc{i} pc
      JOIN u{i} ua ON ua.s = split_part(pc.pair, ' ', 1)
      JOIN u{i} ub ON ub.s = split_part(pc.pair, ' ', 2)
      ORDER BY CAST(pc.n_pair AS DOUBLE)
               / (CAST(ua.n AS DOUBLE) * CAST(ub.n AS DOUBLE)) DESC, pc.pair
      LIMIT 1
    ), s{i} AS (
      SELECT replace(sym, ' ' || w.pair || ' ',
                     ' ' || replace(w.pair, ' ', '') || ' ') AS sym, freq
      FROM s{i - 1} CROSS JOIN w{i} w
    )"""
        )
    wins = "\n      UNION ALL\n      ".join(
        f"SELECT {i} AS iter, pair, n_pair, na, nb FROM w{i}"
        for i in range(1, k + 1)
    )
    parts.append(
        f""", v AS (
      SELECT md5(array_to_string(list_sort(list(s)), '|')) AS vocab_hash,
             CAST(count(*) AS BIGINT) AS vocab_size
      FROM (SELECT DISTINCT unnest(string_split(trim(sym), ' ')) AS s
            FROM s{k}) u
      WHERE length(s) >= 1
    ), wins AS (
      {wins}
    )
    SELECT CAST(iter AS BIGINT) AS iter, pair,
           replace(pair, ' ', '') AS merged, n_pair, na, nb,
           round(ln(CAST(n_pair AS DOUBLE)) - ln(CAST(na AS DOUBLE))
                 - ln(CAST(nb AS DOUBLE)), 6) AS log_score,
           v.vocab_hash, v.vocab_size
    FROM wins CROSS JOIN v"""
    )
    return "".join(parts)


@query("llmops_wordpiece_train_merges", oracle=_wordpiece_train_oracle(_WP_TRAIN_K))
def llmops_wordpiece_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WORDPIECE merge training (Schuster & Nakajima 2012; BERT's
    tokenizer) — the second learned-tokenizer rule beside
    llmops_bpe_train_merges, same harness, different objective: each
    iteration merges the pair maximizing the LIKELIHOOD GAIN
    count(ab) / (count(a)·count(b)) instead of the raw pair count. The
    difference is real and visible on this corpus: WordPiece's first
    merge is 'q u' (q is nearly always followed by u — the canonical
    WordPiece example) while BPE's is the much more frequent but less
    predictive 'e r'; tests/test_r13_invariants.py pins the divergence.
    Output: per-iteration winner with its pair/unigram counts and
    log-score, plus the final surviving-vocabulary hash/size.

    Spark-first, same decomposition as the BPE trainer (one corpus scan
    → localCheckpointed token-TYPE table; iterations run over types):
    per iteration one weighted pair-count aggregation + one weighted
    unigram aggregation (both map-side combinable over the small type
    table), two broadcast joins to attach count(a)/count(b), a
    TakeOrdered-1 winner, and the broadcast 1-row rewrite. The argmax
    ORDERS BY the score as one double division of exact bigints —
    identical IEEE operands in both engines (the round-6 emission is
    display only); counts stay exact integers; same boundary-safe
    spaced-replace convention and vocab-hash recipe as the BPE trainer.
    At 100 TB: identical to the BPE trainer's scale note (sampled type
    table, driver-collected winner past K≈50), with the score computed
    in doubles because count products overflow int64 at corpus scale."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    toks = d.select(
        F.explode(F.transform(tokens(F.col("text")), F.lower)).alias("tok")
    )
    types = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .select(
            F.concat(
                F.lit(" "),
                F.trim(F.regexp_replace("tok", "(.)", "$1 ")),
                F.lit(" "),
            ).alias("sym"),
            "freq",
        )
        .localCheckpoint(eager=False)
    )
    sym_df = types
    winners = []
    for i in range(1, _WP_TRAIN_K + 1):
        syms = F.split(F.trim(F.col("sym")), " ")
        n_sym = F.size(syms)
        prs = F.zip_with(
            F.slice(syms, 1, n_sym - 1),
            F.slice(syms, 2, n_sym - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        )
        pc = (
            sym_df.filter(F.size(F.split(F.trim(F.col("sym")), " ")) >= 2)
            .select(F.explode(prs).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").cast("bigint").alias("n_pair"))
        )
        ug = (
            sym_df.select(
                F.explode(F.split(F.trim(F.col("sym")), " ")).alias("s"), "freq"
            )
            .groupBy("s")
            .agg(F.sum("freq").cast("bigint").alias("n"))
            .localCheckpoint(eager=False)  # joined twice (count(a), count(b))
        )
        ua = ug.select(F.col("s").alias("_a"), F.col("n").alias("na"))
        ub = ug.select(F.col("s").alias("_b"), F.col("n").alias("nb"))
        scored = (
            pc.join(ua, F.expr("split_part(pair, ' ', 1)") == F.col("_a"))
            .join(ub, F.expr("split_part(pair, ' ', 2)") == F.col("_b"))
            .select(
                "pair",
                "n_pair",
                "na",
                "nb",
                (
                    F.col("n_pair").cast("double")
                    / (F.col("na").cast("double") * F.col("nb").cast("double"))
                ).alias("score"),
            )
        )
        win = scored.orderBy(F.desc("score"), "pair").limit(1)
        winners.append(
            win.select(
                F.lit(i).cast("bigint").alias("iter"),
                "pair",
                F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias("merged"),
                "n_pair",
                "na",
                "nb",
                F.round(
                    F.log(F.col("n_pair").cast("double"))
                    - F.log(F.col("na").cast("double"))
                    - F.log(F.col("nb").cast("double")),
                    6,
                ).alias("log_score"),
            )
        )
        pat = F.concat(F.lit(" "), F.col("pair"), F.lit(" "))
        rep = F.concat(
            F.lit(" "), F.replace(F.col("pair"), F.lit(" "), F.lit("")), F.lit(" ")
        )
        # Checkpoint each iteration's rewritten stream: its subtree (the
        # winner's pair/unigram joins) would otherwise re-derive inside
        # EVERY later iteration's three aggregations — the lazy chain's
        # recompute grows quadratically with K where the BPE trainer's
        # (one agg per iteration) stays tolerable. This is also the
        # production shape: a trainer materializes the stream between
        # iterations.
        sym_df = (
            sym_df.crossJoin(F.broadcast(win.select("pair")))
            .select(F.replace(F.col("sym"), pat, rep).alias("sym"), "freq")
            .localCheckpoint(eager=False)
        )
    vocab = (
        sym_df.select(F.explode(F.split(F.trim("sym"), " ")).alias("s"))
        .filter(F.length("s") >= 1)
        .distinct()
        .agg(
            F.md5(F.concat_ws("|", F.array_sort(F.collect_list("s")))).alias(
                "vocab_hash"
            ),
            F.count("*").cast("bigint").alias("vocab_size"),
        )
    )
    out = winners[0]
    for w_df in winners[1:]:
        out = out.unionAll(w_df)
    return out.crossJoin(F.broadcast(vocab))


# Unigram-LM trainer constants: token-length training cap, max piece
# length, seeded multi-char candidates, retained multi-char pieces per
# m-step, EM rounds. Calibrated so selection AND pruning are non-vacuous
# on the fixture (31 token types / 204 multi-char substrings at every SF
# under the doc_id < 400 sample): 204 -> seed 40 -> keep 24.
_ULM_LMAX = 10
_ULM_PLEN = 4
_ULM_SEED = 40
_ULM_KEEP = 24
_ULM_ROUNDS = 2


def _unigram_lm_oracle(rounds: int) -> str:
    """Generated DuckDB oracle for the unigram-LM trainer: the Viterbi
    e-step runs as SET-WISE recursive CTEs (the events_rate_limit_sim
    discipline — one recursion advances every token's DP one position;
    a second walks every token's backtrace), because DuckDB 1.0's
    list_reduce has no initial-accumulator form to mirror Spark's
    in-row aggregate() fold. Each EM round is one dp/backtrace
    recursion pair + one grouped count + the prune/renormalize CTEs."""
    parts = [
        rf"""
    WITH RECURSIVE d AS MATERIALIZED (
      SELECT lower(tk.tok) AS tok
      FROM documents,
           UNNEST(list_filter(string_split_regex(trim(text), '\s+'),
                              s -> length(s) > 0)) AS tk(tok)
      WHERE doc_id < 400
    ), ty AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM d
      WHERE length(tok) <= {_ULM_LMAX}
      GROUP BY tok
    ), subs AS MATERIALIZED (
      SELECT substr(ty.tok, g.j - l.l + 1, l.l) AS piece,
             CAST(sum(ty.freq) AS BIGINT) AS cnt
      FROM ty,
           unnest(generate_series(1, length(ty.tok))) AS g(j),
           unnest(generate_series(1, {_ULM_PLEN})) AS l(l)
      WHERE l.l <= g.j
      GROUP BY 1
    ), v0 AS MATERIALIZED (
      SELECT piece, cnt FROM subs WHERE length(piece) = 1
      UNION ALL
      SELECT piece, cnt FROM (
        SELECT piece, cnt,
               row_number() OVER (ORDER BY cnt DESC, piece) AS r
        FROM subs WHERE length(piece) >= 2) q
      WHERE r <= {_ULM_SEED}
    ), v0n AS MATERIALIZED (
      SELECT piece,
             CAST(round(-ln(cnt * 1.0 / (SELECT sum(cnt) FROM v0)), 6)
                  AS DECIMAL(18,6)) AS lp
      FROM v0
    )"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f""", m{r} AS MATERIALIZED (
      SELECT map(list(piece), list(lp)) AS mp FROM v{p}n
    ), cand{r} AS MATERIALIZED (
      SELECT ty.tok, g.j,
             map_extract(mm.mp, substr(ty.tok, g.j, 1))[1] AS lp1,
             CASE WHEN g.j >= 2
                  THEN map_extract(mm.mp, substr(ty.tok, g.j - 1, 2))[1]
             END AS lp2,
             CASE WHEN g.j >= 3
                  THEN map_extract(mm.mp, substr(ty.tok, g.j - 2, 3))[1]
             END AS lp3,
             CASE WHEN g.j >= 4
                  THEN map_extract(mm.mp, substr(ty.tok, g.j - 3, 4))[1]
             END AS lp4
      FROM ty, m{r} mm,
           unnest(generate_series(1, length(ty.tok))) AS g(j)
    ), dp{r}(tok, n, j, s0, s1, s2, s3, bls) AS (
      SELECT tok, length(tok), 0,
             CAST(0 AS DECIMAL(28,6)), CAST(NULL AS DECIMAL(28,6)),
             CAST(NULL AS DECIMAL(28,6)), CAST(NULL AS DECIMAL(28,6)),
             CAST([] AS TINYINT[])
      FROM ty
      UNION ALL
      SELECT q.tok, q.n, q.j + 1,
             CAST(CASE q.bl WHEN 1 THEN q.c1 WHEN 2 THEN q.c2
                            WHEN 3 THEN q.c3 ELSE q.c4
                  END AS DECIMAL(28,6)),
             q.s0, q.s1, q.s2, list_append(q.bls, q.bl)
      FROM (
        SELECT p.*,
               CAST(CASE WHEN p.c1 IS NOT NULL
                           AND (p.c2 IS NULL OR p.c1 <= p.c2)
                           AND (p.c3 IS NULL OR p.c1 <= p.c3)
                           AND (p.c4 IS NULL OR p.c1 <= p.c4) THEN 1
                         WHEN p.c2 IS NOT NULL
                           AND (p.c3 IS NULL OR p.c2 <= p.c3)
                           AND (p.c4 IS NULL OR p.c2 <= p.c4) THEN 2
                         WHEN p.c3 IS NOT NULL
                           AND (p.c4 IS NULL OR p.c3 <= p.c4) THEN 3
                         ELSE 4 END AS TINYINT) AS bl
        FROM (
          SELECT s.tok, s.n, s.j, s.s0, s.s1, s.s2, s.bls,
                 s.s0 + c.lp1 AS c1, s.s1 + c.lp2 AS c2,
                 s.s2 + c.lp3 AS c3, s.s3 + c.lp4 AS c4
          FROM dp{r} s JOIN cand{r} c ON c.tok = s.tok AND c.j = s.j + 1
        ) p
      ) q
    ), fin{r} AS MATERIALIZED (
      SELECT tok, n, bls FROM dp{r} WHERE j = n
    ), bt{r}(tok, pos, pieces) AS (
      SELECT tok, n, CAST([] AS VARCHAR[]) FROM fin{r}
      UNION ALL
      SELECT b.tok, b.pos - f.bls[b.pos],
             list_append(b.pieces,
                         substr(b.tok, b.pos - f.bls[b.pos] + 1,
                                f.bls[b.pos]))
      FROM bt{r} b JOIN fin{r} f ON f.tok = b.tok
      WHERE b.pos > 0
    ), cnt{r} AS MATERIALIZED (
      SELECT pp.piece, CAST(sum(ty.freq) AS BIGINT) AS cnt
      FROM bt{r} b, ty, unnest(b.pieces) AS pp(piece)
      WHERE b.pos = 0 AND ty.tok = b.tok
      GROUP BY 1
    ), v{r} AS MATERIALIZED (
      SELECT piece, cnt FROM (
        SELECT piece, cnt,
               row_number() OVER (ORDER BY cnt DESC, piece) AS r
        FROM cnt{r} WHERE length(piece) >= 2) q
      WHERE r <= {_ULM_KEEP}
      UNION ALL
      SELECT c.piece, greatest(coalesce(n.cnt, 0), 1) AS cnt
      FROM (SELECT piece FROM v{p}n WHERE length(piece) = 1) c
      LEFT JOIN cnt{r} n ON n.piece = c.piece
    ), v{r}n AS MATERIALIZED (
      SELECT piece,
             CAST(round(-ln(cnt * 1.0 / (SELECT sum(cnt) FROM v{r})), 6)
                  AS DECIMAL(18,6)) AS lp
      FROM v{r}
    )"""
        )
    parts.append(
        f"""
    SELECT v.piece, length(v.piece) = 1 AS is_char,
           v.cnt AS n, n.lp AS nll
    FROM v{rounds} v JOIN v{rounds}n n USING (piece)"""
    )
    return "".join(parts)


# In-row Viterbi forward pass: dp[j] = min over piece lengths l of
# dp[j-l] + nll(substr ending at j), ties to the SHORTEST piece (the
# lexicographic struct-min convention both engines share). acc carries
# the dp array itself (index i = dp[i-1]); chars are always in-vocab, so
# every position is reachable and the filter never empties.
_ULM_DP = f"""
  aggregate(
    sequence(1, length(tok)),
    array(struct(cast(0.0 as decimal(28,6)) as s, cast(0 as int) as bl)),
    (acc, j) -> concat(acc, array(
      array_min(
        filter(
          transform(sequence(1, least({_ULM_PLEN}, j)),
                    l -> struct(cast(element_at(acc, j - l + 1).s
                                     + element_at(mp, substring(tok, j - l + 1, l))
                                     as decimal(28,6)) as s,
                                cast(l as int) as bl)),
          x -> x.s is not null)))))
"""

# Backtrace: walk pos from length(tok) to 0 through the stored best
# lengths; at most length(tok) steps, no-op once pos hits 0. Piece order
# in the list is right-to-left — only the multiset feeds the m-step.
_ULM_BT = """
  aggregate(
    sequence(1, length(tok)),
    struct(length(tok) as pos, cast(array() as array<string>) as ps),
    (acc, i) -> if(acc.pos > 0,
      struct(acc.pos - element_at(dp, acc.pos + 1).bl as pos,
             concat(acc.ps, array(substring(tok,
                 acc.pos - element_at(dp, acc.pos + 1).bl + 1,
                 element_at(dp, acc.pos + 1).bl))) as ps),
      acc)).ps
"""


@query("llmops_unigram_lm_train", oracle=_unigram_lm_oracle(_ULM_ROUNDS))
def llmops_unigram_lm_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNIGRAM-LM tokenizer training (Kudo 2018; SentencePiece's default
    model) — completes the learned-tokenizer trio beside the BPE and
    WordPiece trainers (verdict-r13 item #5), and it is the opposite
    learning direction: BPE/WordPiece GROW a vocabulary bottom-up by
    merging; unigram-LM starts from an over-complete candidate set and
    PRUNES top-down under a probabilistic model. Seed vocabulary = every
    single character (coverage floor, never pruned — SentencePiece's
    character_coverage guarantee, counts floored at 1 so a char crowded
    out of every Viterbi path keeps a finite log-prob) plus the 40
    highest-frequency multi-char substrings (length <= 4) of the token-type table; then two hard-EM
    rounds: e-step = per-token-type Viterbi segmentation under current
    piece NLLs (bounded DP IN-ROW — an aggregate() fold over character
    positions whose accumulator is the dp array, piece lookups against
    the broadcast vocab map; ties break to the shortest piece in both
    engines); m-step = ONE grouped frequency-weighted piece count,
    prune to the 24 highest-count multi-char pieces,
    renormalize NLL = -ln(cnt/total) over the retained set. Output: the
    final vocabulary with exact counts and round-6 decimal NLLs — the
    artifact a tokenizer team version-controls, directly comparable to
    the BPE/WordPiece merge tables. tests/test_r14_invariants.py
    re-runs the whole trainer in pure Python as a third, independent
    implementation and matches counts exactly.

    Parity discipline: training is on the literal-bounded doc_id < 400
    type sample (the BPE/WordPiece convention — a capped reservoir is
    what trainers see at corpus scale), token types cap at 10 chars; NLLs are one double division of exact bigints, ln'd once per
    piece TYPE, quantized round-6 into DECIMAL(18,6), so every DP score
    is an EXACT decimal sum and the argmin compares identical decimals
    in both engines — the oracle's set-wise recursive-CTE Viterbi
    (DuckDB 1.0 has no seeded fold) must agree bit-for-bit, which is
    exactly what the hash attests.

    Spark-first / 100 TB: one corpus scan builds the localCheckpointed
    token-TYPE table; every EM round is ONE in-row projection over
    types (the DP rides inside whole-stage codegen — no join, no
    shuffle, no Python) + one map-side-combinable grouped count + two
    TakeOrdered prunes of a <= 40-row frame + broadcast map
    rebuild, with localCheckpoint cuts between rounds (the WordPiece
    trainer's quadratic-recompute fix). Type count, not corpus size,
    prices the loop; the corpus is touched exactly once."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    ty = (
        d.select(F.explode(F.transform(tokens(F.col("text")), F.lower)).alias("tok"))
        .filter(F.length("tok") <= _ULM_LMAX)
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("freq"))
        .localCheckpoint(eager=False)
    )
    subs = (
        ty.select(
            F.explode(
                F.expr(
                    f"flatten(transform(sequence(1, length(tok)), j -> "
                    f"transform(sequence(1, least({_ULM_PLEN}, j)), "
                    f"l -> substring(tok, j - l + 1, l))))"
                )
            ).alias("piece"),
            "freq",
        )
        .groupBy("piece")
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
    )
    v = (
        subs.filter(F.length("piece") == 1)
        .unionByName(
            subs.filter(F.length("piece") >= 2)
            .orderBy(F.desc("cnt"), "piece")
            .limit(_ULM_SEED)
        )
        .localCheckpoint(eager=False)
    )

    def _norm(vdf: DataFrame) -> DataFrame:
        tot = vdf.agg(F.sum("cnt").alias("tot"))
        return vdf.crossJoin(F.broadcast(tot)).select(
            "piece",
            F.round(-F.log(F.col("cnt") * F.lit(1.0) / F.col("tot")), 6)
            .cast("decimal(18,6)")
            .alias("lp"),
        )

    vn = _norm(v).localCheckpoint(eager=False)
    for _ in range(_ULM_ROUNDS):
        vm = vn.agg(
            F.map_from_entries(F.collect_list(F.struct("piece", "lp"))).alias("mp")
        )
        seg = (
            ty.crossJoin(F.broadcast(vm))
            .select("tok", "freq", F.expr(_ULM_DP).alias("dp"))
            .select("tok", "freq", F.expr(_ULM_BT).alias("pieces"))
        )
        cnt = (
            seg.select(F.explode("pieces").alias("piece"), "freq")
            .groupBy("piece")
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
        )
        chars = (
            vn.filter(F.length("piece") == 1)
            .select("piece")
            .join(cnt, "piece", "left")
            .select(
                "piece",
                F.greatest(F.coalesce(F.col("cnt"), F.lit(0)), F.lit(1))
                .cast("bigint")
                .alias("cnt"),
            )
        )
        multi = (
            cnt.filter(F.length("piece") >= 2)
            .orderBy(F.desc("cnt"), "piece")
            .limit(_ULM_KEEP)
        )
        v = multi.unionByName(chars).localCheckpoint(eager=False)
        vn = _norm(v).localCheckpoint(eager=False)
    return v.join(vn, "piece").select(
        "piece",
        (F.length("piece") == 1).alias("is_char"),
        F.col("cnt").alias("n"),
        F.col("lp").alias("nll"),
    )


@query(
    "events_rate_limit_sim",
    oracle="""
    WITH RECURSIVE ev0 AS (
      SELECT user_id,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS BIGINT) AS i,
             CAST(floor(epoch(ts)) AS BIGINT)
               - lag(CAST(floor(epoch(ts)) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
      FROM events
    ), ev AS (
      SELECT * FROM ev0 WHERE i <= 100000
    ), sim(user_id, i, tokens, rejected) AS (
      SELECT user_id, i, 2.0e0 - 1.0e0, CAST(0 AS BIGINT)
      FROM ev WHERE i = 1
      UNION ALL
      SELECT e.user_id, e.i,
             CASE WHEN least(2.0e0, s.tokens + e.gap_s / 7200.0e0) >= 1.0e0
                  THEN least(2.0e0, s.tokens + e.gap_s / 7200.0e0) - 1.0e0
                  ELSE least(2.0e0, s.tokens + e.gap_s / 7200.0e0) END,
             s.rejected
               + CASE WHEN least(2.0e0, s.tokens + e.gap_s / 7200.0e0) >= 1.0e0
                      THEN 0 ELSE 1 END
      FROM sim s JOIN ev e ON e.user_id = s.user_id AND e.i = s.i + 1
    ), final AS (
      SELECT user_id, max_by(rejected, i) AS n_rejected,
             CAST(max(i) AS BIGINT) AS n_events
      FROM sim GROUP BY user_id
    )
    SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST(sum(n_rejected) AS BIGINT) AS n_rejected,
           round(sum(n_rejected) * 1.0e0 / sum(n_events), 6) AS reject_rate
    FROM final GROUP BY 1
    """,
)
def events_rate_limit_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bucket rate-limiter replay: simulate a 2-token bucket
    refilling at 1 token / 2 h against every user's actual event
    stream and count the requests the limiter would have rejected —
    the capacity-planning question ("what would this limit have done to
    LAST month's traffic?") answered offline before any limiter ships.
    Admission is stateful and order-dependent, so this is a genuine
    ordered fold per user: tokens' = min(cap, tokens + gap/refill),
    admit iff tokens' ≥ 1 (cap 2, refill 7200 s — fixture-calibrated so
    bursty users genuinely collide at BOTH smoke SFs). Results roll up to user-id-mod-10 buckets
    (per-user rows would be |users|-sized; the deciles carry the SLA
    answer). Bucket reject rates span 0.9-1.9% at sf0.01 (0-3.2% at sf0.001),
    so the hash attests real contention, not an all-zeros limiter.

    Parity discipline: gaps are exact integer seconds; the bucket state
    advances through identical e0/D-spelled double arithmetic in
    Spark's per-user array fold and DuckDB's SET-WISE recursive CTE
    (each recursion step advances every user's stream one event — the
    per-user join keys make one CTE drive all streams); counts are
    BIGINT throughout.

    Spark-first: one shuffle on user_id builds the ordered gap arrays;
    the fold rides in-row (the Holt discipline, per-user); the decile
    rollup is map-side. At 100 TB this is the same one-exchange shape
    as every sessionization query. Unlike the Holt folds (whose array is
    the CALENDAR-bounded daily grid), the per-user array here is bounded
    only by that user's traffic, so the plan caps each key at its first
    100 000 events — row_number in the SAME window the lag already pays
    for (no extra exchange), mirrored in the oracle's ev CTE — so one
    pathological user_id (a bot hammering the API) holds at most ~800 KB
    in its task's row instead of its entire history. Non-binding at
    fixture SF (max 99 events/user at sf0.1); the binding case is pinned
    by tests/test_r9_invariants.py with a synthetic hot key."""
    ev = t(spark, sf_dir, "events")
    sec = F.floor(F.unix_timestamp("ts")).cast("bigint")
    wlag = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id", "ts", "event_id", (sec - F.lag(sec).over(wlag)).alias("gap_s")
    ).withColumn("rn", F.row_number().over(wlag)).filter(F.col("rn") <= 100_000).drop("rn")
    per_user = gaps.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        # gap list in stream order: first element is NULL (no predecessor),
        # replaced by 0 — the seed consumes the first token unconditionally.
        F.expr(
            """
            aggregate(
              transform(array_sort(collect_list(struct(ts, event_id,
                                                       coalesce(gap_s, -1L) as g))),
                        s -> s.g),
              named_struct('tokens', cast(-1.0 as double),
                           'rejected', cast(0 as bigint),
                           'started', false),
              (acc, g) -> CASE
                WHEN NOT acc.started THEN
                  named_struct('tokens', 2.0D - 1.0D,
                               'rejected', cast(0 as bigint), 'started', true)
                ELSE named_struct(
                  'tokens',
                  CASE WHEN least(2.0D, acc.tokens + g / 7200.0D) >= 1.0D
                       THEN least(2.0D, acc.tokens + g / 7200.0D) - 1.0D
                       ELSE least(2.0D, acc.tokens + g / 7200.0D) END,
                  'rejected',
                  acc.rejected + CASE WHEN least(2.0D, acc.tokens + g / 7200.0D) >= 1.0D
                                      THEN 0L ELSE 1L END,
                  'started', true)
              END).rejected
            """
        ).alias("n_rejected"),
    )
    return per_user.groupBy(
        (F.col("user_id") % 10).cast("bigint").alias("user_bucket")
    ).agg(
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.sum("n_rejected").cast("bigint").alias("n_rejected"),
        F.round(
            F.sum("n_rejected") * F.lit(1.0) / F.sum("n_events"), 6
        ).alias("reject_rate"),
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ), trans AS (
      SELECT prev, cur, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE prev IS NOT NULL GROUP BY prev, cur
    ), grid AS (
      SELECT a.event_type AS prev, b.event_type AS cur
      FROM (SELECT DISTINCT event_type FROM events) a,
           (SELECT DISTINCT event_type FROM events) b
    ), tot AS (
      SELECT prev, CAST(sum(n) AS BIGINT) AS row_n FROM trans GROUP BY prev
    )
    SELECT g.prev, g.cur,
           coalesce(t.n, 0) AS n_trans,
           round((coalesce(t.n, 0) + 1) * 1.0e0
                 / (coalesce(o.row_n, 0)
                    + (SELECT count(DISTINCT event_type) FROM events)),
                 6) AS p_smoothed
    FROM grid g
    LEFT JOIN trans t ON t.prev = g.prev AND t.cur = g.cur
    LEFT JOIN tot o ON o.prev = g.prev
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences with add-one (Laplace) smoothing — the behavioral model
    under next-action prediction, session-anomaly scoring (bot flows
    transition differently than humans), and funnel leak analysis. The
    full |types|² grid is emitted (including never-seen transitions at
    their smoothed floor) so downstream log-likelihood scoring never hits
    a missing cell. Complements events_markov_stationary (which consumes
    the raw matrix internally and emits only its fixed point) and
    events_top_paths (raw trigram mining): this emits the smoothed MODEL
    itself — the artifact a scorer loads.

    Parity discipline: transition counts are exact BIGINTs; the smoothed
    probability divides exact integers ((n+1)/(row_total+|types|)) as
    doubles, rounded to 6 — no accumulated float state anywhere.

    Spark-first: ONE shuffle on user_id orders each user's stream for the
    lag; the count is a hash aggregate on (prev, cur) — 25 cells at any
    scale; the smoothing grid is a broadcast cross of the 5-row distinct
    type lists. At 100 TB this is sessionization-shaped: the heavy
    exchange is the per-user ordering the window already needs."""
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"), F.lag("event_type").over(w).alias("prev")
    )
    trans = (
        seq.filter(F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    types = ev.select(F.col("event_type").alias("t")).distinct()
    grid = types.select(F.col("t").alias("prev")).crossJoin(
        F.broadcast(types.select(F.col("t").alias("cur")))
    )
    tot = trans.groupBy("prev").agg(F.sum("n").cast("bigint").alias("row_n"))
    # Laplace denominator |types| DERIVED from the data (r9 ADVICE fix):
    # a hardcoded literal silently stops rows summing to 1 if the
    # fixture's type cardinality ever changes while the hash stays green.
    # count_distinct (not distinct().count()) so a NULL event_type is
    # excluded exactly as the oracle's COUNT(DISTINCT …) excludes it.
    ntypes = ev.agg(F.count_distinct("event_type").cast("bigint").alias("_k"))
    return (
        grid.join(F.broadcast(trans), ["prev", "cur"], "left")
        .join(F.broadcast(tot), ["prev"], "left")
        .join(F.broadcast(ntypes))
        .select(
            "prev",
            "cur",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_trans"),
            F.round(
                (F.coalesce("n", F.lit(0)) + 1)
                * F.lit(1.0)
                / (F.coalesce("row_n", F.lit(0)) + F.col("_k")),
                6,
            ).alias("p_smoothed"),
        )
    )


@query(
    "events_seasonal_mase",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ), lagged AS (
      SELECT event_type, d, x,
             lag(x, 1) OVER (PARTITION BY event_type ORDER BY d) AS x1,
             lag(x, 7) OVER (PARTITION BY event_type ORDER BY d) AS x7
      FROM daily
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(sum(abs(x - x1)) FILTER (WHERE x1 IS NOT NULL) * 1.0e0
                 / count(*) FILTER (WHERE x1 IS NOT NULL), 6) AS mae_naive,
           round(sum(abs(x - x7)) FILTER (WHERE x7 IS NOT NULL) * 1.0e0
                 / count(*) FILTER (WHERE x7 IS NOT NULL), 6) AS mae_snaive,
           round((sum(abs(x - x7)) FILTER (WHERE x7 IS NOT NULL) * 1.0e0
                  / count(*) FILTER (WHERE x7 IS NOT NULL))
                 / (sum(abs(x - x1)) FILTER (WHERE x1 IS NOT NULL) * 1.0e0
                    / count(*) FILTER (WHERE x1 IS NOT NULL)), 6) AS mase_ratio
    FROM lagged GROUP BY event_type
    """,
)
def events_seasonal_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast skill per event type: MAE of the weekly
    seasonal-naive forecast (x̂_t = x_{t−7}) against MAE of the plain
    naive walk (x̂_t = x_{t−1}) — their ratio is the in-sample MASE
    denominator test (Hyndman & Koehler 2006): below 1 means weekly
    seasonality carries real signal and a seasonal model is worth its
    complexity; at/above 1 the series is better treated as a random walk.
    This is the model-selection gate run BEFORE fitting anything — the
    events_holt/forecast_backtest family decides HOW to smooth, this
    decides WHETHER the seasonal term earns its keep.

    Parity discipline: daily counts and absolute differences are exact
    integers; each MAE divides exact integer sums once, rounded to 6; the
    ratio divides the two already-exact component fractions (1-2 ulp).
    Filters (x1/x7 IS NOT NULL) make the denominators explicit — no
    silent null-dropping asymmetry between engines.

    Spark-first: the daily grid is map-side combinable; both lags share
    ONE window exchange on event_type; the final rollup is 5 rows."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.date_trunc("day", "ts").alias("d")).agg(
        F.count("*").cast("bigint").alias("x")
    )
    w = W.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type",
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 7).over(w).alias("x7"),
    )
    mae1 = F.sum(F.abs(F.col("x") - F.col("x1"))) * F.lit(1.0) / F.count("x1")
    mae7 = F.sum(F.abs(F.col("x") - F.col("x7"))) * F.lit(1.0) / F.count("x7")
    return lagged.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.round(mae1, 6).alias("mae_naive"),
        F.round(mae7, 6).alias("mae_snaive"),
        F.round(mae7 / mae1, 6).alias("mase_ratio"),
    )


@query(
    "source_csv_malformed_permissive",
    oracle="""
    WITH g AS (
      SELECT o_orderstatus AS status,
             CAST(o_totalprice AS DECIMAL(15, 4)) AS price
      FROM orders WHERE o_orderkey % 97 != 0
    )
    SELECT status, CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(price), 2) AS DOUBLE) AS sum_price
    FROM g GROUP BY status
    UNION ALL
    SELECT '_corrupt' AS status,
           CAST((SELECT count(*) FROM orders WHERE o_orderkey % 97 = 0)
                AS BIGINT) AS n,
           CAST(0 AS DOUBLE) AS sum_price
    """,
)
def source_csv_malformed_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-tolerant CSV source (the JSONL permissive contract,
    S3/pipeline/parser.py:35's tolerance, extended to the second
    row-oriented lake format): deterministically corrupt every 97th
    order's price field to a non-numeric token, write the lines as raw
    text, read them back with an explicit schema in PERMISSIVE mode with
    ``columnNameOfCorruptRecord``, and prove the quarantine split is
    EXACT — good rows aggregate to the oracle's (clean-subset) numbers,
    corrupt rows are counted, nothing is silently dropped or double
    counted. This is the semantics a 100 TB CSV ingest must guarantee
    before anyone trusts its row counts.

    Parity discipline: prices round-trip as DECIMAL(15,4) strings (no
    float re-parse drift); the corrupt marker row carries exact integers.

    Scale notes: explicit schema (inferSchema costs a full extra pass),
    mode=PERMISSIVE isolates bad FIELDS per row instead of killing the
    task (DROPMALFORMED would silently shrink counts — the audit row
    here is the difference between tolerant and lossy); text write/read
    is per-partition parallel."""
    out_dir = _scratch_dir(spark, sf_dir, "csv_malformed")
    o = t(spark, sf_dir, "orders")
    lines = o.select(
        F.concat_ws(
            ",",
            F.col("o_orderkey").cast("string"),
            F.col("o_orderstatus"),
            F.when(F.col("o_orderkey") % 97 == 0, F.lit("N/A")).otherwise(
                F.col("o_totalprice").cast("decimal(15,4)").cast("string")
            ),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(out_dir)
    back = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .schema(
            "o_orderkey long, o_orderstatus string, "
            "o_totalprice decimal(15,4), _bad string"
        )
        .csv(out_dir)
    )
    # Lazy checkpoint: (a) the split below consumes the parse twice — cut
    # the scan once; (b) Spark refuses plans whose referenced columns are
    # ONLY the internal corrupt-record column (the `bad` branch), and a
    # checkpoint is the documented way to materialize the parsed rows
    # before filtering on _bad alone.
    back = back.localCheckpoint(eager=False)
    good = back.filter(F.col("_bad").isNull()).groupBy(
        F.col("o_orderstatus").alias("status")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.sum("o_totalprice"), 2).cast("double").alias("sum_price"),
    )
    bad = back.filter(F.col("_bad").isNotNull()).agg(
        F.count("*").cast("bigint").alias("n")
    ).select(
        F.lit("_corrupt").alias("status"), "n", F.lit(0.0).alias("sum_price")
    )
    return good.unionAll(bad)


@query(
    "graph_modularity_score",
    oracle="""
    WITH pres0 AS (
      SELECT DISTINCT user_id AS u, CAST(floor(epoch(ts) / 60) AS BIGINT) AS b,
             event_type AS et
      FROM events
    ), pres AS (
      SELECT u, b, et FROM (
        SELECT u, b, et, row_number() OVER (PARTITION BY b, et ORDER BY u) AS rn
        FROM pres0
      ) WHERE rn <= 256
    ), edges0 AS (
      SELECT a.u AS x, b.u AS y
      FROM pres a JOIN pres b ON a.b = b.b AND a.et = b.et AND a.u < b.u
      GROUP BY 1, 2
    ), edges AS (
      SELECT x, y FROM edges0 UNION ALL SELECT y, x FROM edges0
    ),
    l0 AS (SELECT DISTINCT x AS u, x AS lab FROM edges),
    n1 AS (
      SELECT e.x AS u, l.lab, CAST(count(*) AS BIGINT) AS c
      FROM edges e JOIN l0 l ON e.y = l.u GROUP BY 1, 2
    ),
    l1 AS (
      SELECT u, min((100000 - c) * 1000000000 + lab) % 1000000000 AS lab
      FROM n1 GROUP BY u
    ),
    n2 AS (
      SELECT e.x AS u, l.lab, CAST(count(*) AS BIGINT) AS c
      FROM edges e JOIN l1 l ON e.y = l.u GROUP BY 1, 2
    ),
    l2 AS (
      SELECT u, min((100000 - c) * 1000000000 + lab) % 1000000000 AS lab
      FROM n2 GROUP BY u
    ),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM edges0),
    intra AS (
      SELECT lx.lab, CAST(count(*) AS BIGINT) AS lc
      FROM edges0 e
      JOIN l2 lx ON lx.u = e.x
      JOIN l2 ly ON ly.u = e.y
      WHERE lx.lab = ly.lab
      GROUP BY lx.lab
    ),
    deg AS (
      SELECT x AS u, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1
    ),
    dc AS (
      SELECT l.lab, CAST(sum(d.d) AS BIGINT) AS dc
      FROM l2 l JOIN deg d ON d.u = l.u GROUP BY l.lab
    ),
    terms AS (
      SELECT CAST(round(
               coalesce(i.lc, 0) * 1.0e0 / m.m
               - (c.dc * 1.0e0 / (2 * m.m)) * (c.dc * 1.0e0 / (2 * m.m)),
               10) AS DECIMAL(28, 10)) AS term
      FROM dc c LEFT JOIN intra i ON i.lab = c.lab, m
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM dc) AS n_communities,
           (SELECT m FROM m) AS n_edges,
           round(CAST(coalesce((SELECT sum(term) FROM terms),
                               CAST(0 AS DECIMAL(28, 10))) AS DOUBLE), 6)
             AS modularity
    """,
)
def graph_modularity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the label-propagation communities on the typed
    co-presence graph: Q = Σ_c [L_c/m − (d_c/2m)²] — the standard "is this
    partition better than chance" score (Newman & Girvan 2004), the
    number that decides whether graph_label_propagation's output is worth
    acting on (Q ≈ 0: the partition is no better than chance; Q ≳ 0.3:
    real structure). The fixture VERDICT is the interesting part: the
    2-round synchronous min-tie-break LPA prefix scores Q ≈ −0.016 at
    sf0.01 — synchronous LPA OSCILLATES on the near-clique typed
    co-presence graph (each clique's members keep adopting each other's
    minima), so its round-2 labels are genuinely not assortative yet, and
    the gate says exactly that: do NOT act on this partition, run more
    rounds or switch tie-breaking. A quality gate that can fail its own
    detector is the whole reason to compute one. Eighth graph operator:
    detection (LPA) and its quality gate both run engine-checked.

    Construction is the LPA query verbatim (capped presence per
    _capped_presence, 2 synchronized rounds, packed-integer argmin
    tie-break) so the score grades exactly the partition the detector
    emits. Parity discipline: L_c, d_c, m are exact BIGINTs; each
    community's term is one float expression on exact inputs rounded to
    10 and summed as DECIMAL (order-free — the KL/entropy discipline);
    one rounded emission.

    Spark-first: labels broadcast back onto the edge list (|nodes| rows
    vs |edges|); intra-edge counting and degree mass are hash aggregates
    on the community key; everything after the (shared, lazily
    checkpointed) edge build is bounded by |nodes|."""
    ev = t(spark, sf_dir, "events")
    pres = _capped_presence(
        ev.select(
            F.col("user_id").alias("u"),
            F.floor(F.unix_timestamp("ts") / 60).cast("bigint").alias("b"),
            F.col("event_type").alias("et"),
        ).distinct(),
        "b",
        "et",
    )
    a = pres.select(F.col("u").alias("x"), "b", "et")
    b_ = pres.select(F.col("u").alias("y"), "b", "et")
    e0 = (
        a.join(b_, ["b", "et"])
        .filter(F.col("x") < F.col("y"))
        .select("x", "y")
        .distinct()
        .localCheckpoint(eager=False)
    )
    edges = e0.unionAll(e0.select(F.col("y").alias("x"), F.col("x").alias("y"))).localCheckpoint(
        eager=False
    )
    labels = edges.select(F.col("x").alias("u")).distinct().select("u", F.col("u").alias("lab"))
    for _ in range(2):
        n = (
            edges.join(labels.select(F.col("u").alias("y"), "lab"), "y")
            .groupBy(F.col("x").alias("u"), "lab")
            .agg(F.count("*").cast("bigint").alias("c"))
        )
        labels = (
            n.groupBy("u")
            .agg(
                (
                    F.min((F.lit(100000) - F.col("c")) * F.lit(1000000000) + F.col("lab"))
                    % F.lit(1000000000)
                ).alias("lab")
            )
            .localCheckpoint(eager=False)
        )
    m = e0.agg(F.count("*").cast("bigint").alias("m"))
    lx = labels.select(F.col("u").alias("x"), F.col("lab").alias("labx"))
    ly = labels.select(F.col("u").alias("y"), F.col("lab").alias("laby"))
    # Label maps are node-population-scale (O(|V|)) — NO broadcast hint:
    # the LPA rounds above already do the scale-safe shuffle join for the
    # same frames; AQE broadcasts them when they are actually small
    # (r9-verdict fix: an explicit hint here is a >8 GB-broadcast /
    # driver-OOM at 10^8+ distinct users).
    intra = (
        e0.join(lx, "x")
        .join(ly, "y")
        .filter(F.col("labx") == F.col("laby"))
        .groupBy(F.col("labx").alias("lab"))
        .agg(F.count("*").cast("bigint").alias("lc"))
    )
    deg = edges.groupBy(F.col("x").alias("u")).agg(
        F.count("*").cast("bigint").alias("d")
    )
    dc = (
        labels.join(deg, "u")
        .groupBy("lab")
        .agg(F.sum("d").cast("bigint").alias("dc"))
    )
    half = F.col("dc") * F.lit(1.0) / (F.lit(2) * F.col("m"))
    terms = (
        # intra is community-keyed — also O(|V|) worst case (singleton
        # communities), so no hint here either; m is 1 row, hint kept.
        dc.join(intra, "lab", "left")
        .crossJoin(F.broadcast(m))
        .select(
            F.round(
                F.coalesce("lc", F.lit(0)) * F.lit(1.0) / F.col("m") - half * half,
                10,
            )
            .cast("decimal(28,10)")
            .alias("term")
        )
    )
    return (
        dc.agg(F.count("*").cast("bigint").alias("n_communities"))
        .crossJoin(m.select(F.col("m").alias("n_edges")))
        .crossJoin(
            terms.agg(
                F.round(
                    F.coalesce(F.sum("term"), F.lit(0).cast("decimal(28,10)"))
                    .cast("double"),
                    6,
                ).alias("modularity")
            )
        )
    )


@query(
    "events_user_lifecycle_states",
    oracle="""
    WITH wk AS (
      SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '2024-01-01',
                            CAST(date_trunc('day', ts) AS DATE))
                  AS BIGINT) AS w
      FROM events
    ), spine AS (
      SELECT unnest(generate_series(mn, mx)) AS w
      FROM (SELECT min(w) AS mn, max(w) AS mx FROM wk)
    ), seq AS (
      SELECT user_id, w,
             lag(w) OVER (PARTITION BY user_id ORDER BY w) AS prev_w,
             lead(w) OVER (PARTITION BY user_id ORDER BY w) AS next_w
      FROM wk
    ), states AS (
      SELECT w,
             CAST(count(*) FILTER (WHERE prev_w IS NULL) AS BIGINT) AS n_new,
             CAST(count(*) FILTER (WHERE prev_w = w - 1) AS BIGINT) AS n_retained,
             CAST(count(*) FILTER (WHERE prev_w IS NOT NULL AND prev_w < w - 1)
                  AS BIGINT) AS n_resurrected
      FROM seq GROUP BY w
    ), churn AS (
      SELECT w + 1 AS w, CAST(count(*) AS BIGINT) AS n_churned
      FROM seq, (SELECT max(w) AS mx FROM wk) m
      WHERE (next_w IS NULL AND w < m.mx) OR next_w > w + 1
      GROUP BY w + 1
    )
    SELECT s.w AS day_index,
           strftime(DATE '2024-01-01' + to_days(CAST(s.w AS INTEGER)),
                    '%Y-%m-%d') AS day,
           coalesce(t.n_new, 0) AS n_new,
           coalesce(t.n_retained, 0) AS n_retained,
           coalesce(t.n_resurrected, 0) AS n_resurrected,
           coalesce(c.n_churned, 0) AS n_churned,
           coalesce(t.n_new, 0) + coalesce(t.n_retained, 0)
             + coalesce(t.n_resurrected, 0) AS n_active
    FROM spine s
    LEFT JOIN states t ON t.w = s.w
    LEFT JOIN churn c ON c.w = s.w
    """,
)
def events_user_lifecycle_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting (the new/retained/resurrected/churned
    ledger every growth team runs): classify each user's active day by
    its predecessor — first-ever day ⇒ NEW, consecutive ⇒ RETAINED, gap
    ⇒ RESURRECTED — and charge a CHURN to the day after an activity gap
    opens (right-censored honestly: users whose last active day is the
    corpus's final day are not yet churnable). The identity
    active = new + retained + resurrected holds by construction and is
    emitted so downstream dashboards can assert it. Completes the
    retention family: cohort_ltv_matrix prices cohorts, this states the
    daily flow balance. Grain is DAILY because it is the grain at which
    the fixture genuinely churns (weekly, all 150 users are always-on —
    vacuous): at sf0.01 a mid-window day runs ~110-130 retained, 10-20
    resurrected, 15-20 churned, with new users exhausting after the
    opening days — every state column varies.

    Parity discipline: days are exact integers anchored at 2024-01-01;
    every output is an exact BIGINT count on the full day spine (zero
    rows coalesced, so silent missing days can't fake health).

    Spark-first: one distinct on the bounded (user, day) grid, ONE
    shuffle on user_id for both lag and lead, two hash aggregates on the
    day key, and a broadcast join onto the |days|-row spine. The
    sessionization exchange shape, at daily grain."""
    ev = t(spark, sf_dir, "events")
    wcol = F.datediff(
        F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01").cast("date")
    ).cast("bigint")
    wk = ev.select("user_id", wcol.alias("w")).distinct().localCheckpoint(eager=False)
    bounds = wk.agg(
        F.min("w").alias("mn"), F.max("w").alias("mx")
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("w")
    )
    uw = W.partitionBy("user_id").orderBy("w")
    seq = wk.select(
        "w",
        F.lag("w").over(uw).alias("prev_w"),
        F.lead("w").over(uw).alias("next_w"),
    ).localCheckpoint(eager=False)
    states = seq.groupBy("w").agg(
        F.sum(F.when(F.col("prev_w").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
        F.sum(F.when(F.col("prev_w") == F.col("w") - 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_retained"),
        F.sum(
            F.when(
                F.col("prev_w").isNotNull() & (F.col("prev_w") < F.col("w") - 1), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_resurrected"),
    )
    churn = (
        seq.crossJoin(F.broadcast(bounds.select(F.col("mx"))))
        .filter(
            (F.col("next_w").isNull() & (F.col("w") < F.col("mx")))
            | (F.col("next_w") > F.col("w") + 1)
        )
        .groupBy((F.col("w") + 1).alias("w"))
        .agg(F.count("*").cast("bigint").alias("n_churned"))
    )
    out = (
        spine.join(F.broadcast(states), "w", "left")
        .join(F.broadcast(churn), "w", "left")
        .select(
            F.col("w").alias("day_index"),
            F.date_format(
                F.date_add(F.lit("2024-01-01").cast("date"), F.col("w").cast("int")),
                "yyyy-MM-dd",
            ).alias("day"),
            F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
            F.coalesce("n_retained", F.lit(0)).cast("bigint").alias("n_retained"),
            F.coalesce("n_resurrected", F.lit(0)).cast("bigint").alias("n_resurrected"),
            F.coalesce("n_churned", F.lit(0)).cast("bigint").alias("n_churned"),
        )
        .withColumn(
            "n_active",
            (F.col("n_new") + F.col("n_retained") + F.col("n_resurrected")).cast(
                "bigint"
            ),
        )
    )
    return out


@query(
    "dq_quarantine_bitmap",
    oracle="""
    WITH flagged AS (
      SELECT o_orderkey,
             (CASE WHEN o_totalprice > 400000 THEN 1 ELSE 0 END)
           + (CASE WHEN o_orderpriority = '5-LOW' THEN 2 ELSE 0 END)
           + (CASE WHEN o_orderstatus = 'P' THEN 4 ELSE 0 END)
           + (CASE WHEN dayofweek(o_orderdate) = 0 THEN 8 ELSE 0 END) AS bm
      FROM orders
    ), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM flagged)
    SELECT CAST(bm AS BIGINT) AS rule_bitmap,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(o_orderkey) AS BIGINT) AS sample_orderkey,
           bm <> 0 AS quarantined,
           round(count(*) * 1.0e0 / (SELECT n FROM tot), 6) AS share
    FROM flagged GROUP BY bm
    """,
)
def dq_quarantine_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level QUARANTINE with a rule BITMAP — the ingest-gate shape
    dq_orders_constraints does NOT cover: constraints reports one count
    per rule; a quarantine pipeline must annotate EVERY ROW with the full
    set of rules it failed (price outlier = bit 1, deprioritized = bit 2,
    partial status = bit 4, Sunday-dated = bit 8) so the quarantine table
    is reprocessable per failure combination (a row failing price+status
    routes differently than price alone). Emitted per bitmap value:
    row count, a deterministic sample key (min orderkey — the row an
    on-call engineer opens first), the quarantined flag, and corpus
    share. Fixture-calibrated: all 16 bitmap combinations are populated
    at sf0.001/0.01/0.1, so the hash attests every rule interaction, not
    just the empty one.

    Engine note: Spark's dayofweek() is 1-based Sunday=1, DuckDB's is
    0-based Sunday=0 — the two literals encode the SAME day; the hash
    would catch a drift on either side. Spark-first: the bitmap is
    per-row integer arithmetic riding the scan; one hash aggregate on a
    16-value key; the total broadcasts."""
    o = t(spark, sf_dir, "orders")
    bm = (
        F.when(F.col("o_totalprice") > 400000, 1).otherwise(0)
        + F.when(F.col("o_orderpriority") == "5-LOW", 2).otherwise(0)
        + F.when(F.col("o_orderstatus") == "P", 4).otherwise(0)
        + F.when(F.dayofweek("o_orderdate") == 1, 8).otherwise(0)
    )
    flagged = o.select("o_orderkey", bm.alias("bm"))
    tot = flagged.agg(F.count("*").cast("bigint").alias("n"))
    return (
        flagged.groupBy("bm")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("o_orderkey").cast("bigint").alias("sample_orderkey"),
        )
        .join(F.broadcast(tot))
        .select(
            F.col("bm").cast("bigint").alias("rule_bitmap"),
            "n_rows",
            "sample_orderkey",
            (F.col("bm") != 0).alias("quarantined"),
            F.round(F.col("n_rows") * F.lit(1.0) / F.col("n"), 6).alias("share"),
        )
    )


@query(
    "events_session_anomaly_score",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ), trans AS (
      SELECT prev, cur, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE prev IS NOT NULL GROUP BY prev, cur
    ), tot AS (
      SELECT prev, CAST(sum(n) AS BIGINT) AS row_n FROM trans GROUP BY prev
    ), k AS (SELECT count(DISTINCT event_type) AS k FROM events),
    model AS (
      SELECT t.prev, t.cur,
             CAST(round(-ln((t.n + 1) * 1.0e0 / (o.row_n + (SELECT k FROM k))),
                        10) AS DECIMAL(28,10)) AS nll
      FROM trans t JOIN tot o ON o.prev = t.prev
    ), scored AS (
      SELECT s.user_id, m.nll
      FROM seq s JOIN model m ON m.prev = s.prev AND m.cur = s.cur
      WHERE s.prev IS NOT NULL
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_trans,
           round(CAST(sum(nll) AS DOUBLE) / count(*), 6) AS avg_nll
    FROM scored GROUP BY user_id
    HAVING count(*) >= 5
    ORDER BY avg_nll DESC, user_id
    LIMIT 20
    """,
)
def events_session_anomaly_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session anomaly scoring UNDER the Markov model — the consumer of
    events_markov_transitions' artifact (that query emits the smoothed
    model; this one LOADS it and scores every user's event stream by
    mean negative log-likelihood of their transitions, the standard
    bot/abuse surface: flows that transition unlike the population score
    high). Top-20 most anomalous users with ≥ 5 transitions (stability
    floor), fully tie-broken (score desc, user_id).

    Parity discipline: the model's −ln p terms are computed once per
    (prev, cur) cell from exact integer counts, rounded to 10 and summed
    per user as DECIMAL (order-free — the KL/entropy discipline); one
    double division and round-6 at emission; smoothing denominator
    derived from the data (the markov-query rule).

    Spark-first: the per-user lag is the same single user-keyed exchange
    the model build already pays (one window, reused by both branches);
    the 25-cell model broadcasts onto the transition stream; the top-20
    is a TakeOrdered, never a global sort. At 100 TB: score 10^9 user
    streams for one shuffle plus a 25-row broadcast."""
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("cur"),
        F.lag("event_type").over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    seq = seq.localCheckpoint(eager=False)  # model build + scoring share it
    trans = seq.groupBy("prev", "cur").agg(F.count("*").cast("bigint").alias("n"))
    tot = trans.groupBy("prev").agg(F.sum("n").cast("bigint").alias("row_n"))
    # count_distinct mirrors COUNT(DISTINCT …): a NULL event_type must
    # not inflate the smoothing denominator on one side only.
    k = ev.agg(F.count_distinct("event_type").cast("bigint").alias("_k"))
    model = (
        trans.join(tot, "prev")
        .join(F.broadcast(k))
        .select(
            "prev",
            "cur",
            F.round(
                -F.log((F.col("n") + 1) * F.lit(1.0) / (F.col("row_n") + F.col("_k"))),
                10,
            )
            .cast("decimal(28,10)")
            .alias("nll"),
        )
    )
    return (
        seq.join(F.broadcast(model), ["prev", "cur"])
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_trans"),
            F.round(F.sum("nll").cast("double") / F.count("*"), 6).alias("avg_nll"),
        )
        .filter(F.col("n_trans") >= 5)
        .orderBy(F.desc("avg_nll"), "user_id")
        .limit(20)
    )


@query(
    "agg_bitmap_distinct_rollup",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct_cust
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT 'ALL', CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders
    """,
)
def agg_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE exact distinct counting via the Spark 3.5 bitmap
    aggregate family (bitmap_bucket_number / bitmap_bit_position /
    bitmap_construct_agg / bitmap_or_agg / bitmap_count) — the exact
    counterpart of the HLL-union surface (agg_hll_union_region): per
    (priority, bucket) the distinct custkeys become one RoaringBitmap-ish
    binary, per-priority distincts are bucket-wise popcount sums, and the
    GLOBAL distinct is derived by OR-MERGING the per-priority bitmaps —
    the fact table is scanned ONCE; the rollup row costs popcounts over
    the already-built bitmaps. The oracle computes both grains with plain
    COUNT(DISTINCT): what is hashed is exactness of the whole bitmap
    pipeline including the merge.

    Spark-first/100 TB: this is how a lake maintains exact-distinct
    cubes — partial bitmaps per (group, bucket) are small, mergeable,
    and re-aggregable to ANY coarser grouping without touching the fact
    table again, which COUNT(DISTINCT) fundamentally cannot do (it
    re-shuffles raw keys per grouping). Buckets bound each bitmap at
    32768 bits, so no single aggregation state grows with the key
    domain; the shuffle key (group, bucket) spreads hot groups."""
    o = t(spark, sf_dir, "orders").select("o_orderpriority", "o_custkey")
    per_bucket = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.bitmap_bucket_number(F.col("o_custkey")).alias("bucket"),
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position(F.col("o_custkey"))).alias("bm")
    )
    per_priority = per_bucket.groupBy("priority").agg(
        F.sum(F.bitmap_count("bm")).cast("bigint").alias("n_distinct_cust")
    )
    # The rollup grain NEVER rescans orders: OR-merge the per-priority
    # bitmaps bucket-wise, then popcount.
    global_row = (
        per_bucket.groupBy("bucket")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .agg(F.sum(F.bitmap_count("bm")).cast("bigint").alias("n_distinct_cust"))
        .select(F.lit("ALL").alias("priority"), "n_distinct_cust")
    )
    return per_priority.unionByName(global_row)


# Log-rank two-sided critical value at alpha=0.05 (chi-square_1 3.841459
# == z 1.959964), the same double literal in both engines.
_LOGRANK_ZCRIT = "1.959964"


@query(
    "events_logrank_test",
    oracle=f"""
    WITH span AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS cohort,
             date_trunc('day', min(ts)) AS f, date_trunc('day', max(ts)) AS l
      FROM events GROUP BY user_id % 2, user_id, event_type
    ), cd AS (SELECT DISTINCT l AS d FROM span),
    base AS (
      SELECT d,
        (SELECT CAST(count(*) AS BIGINT) FROM span
          WHERE cohort = 0 AND f <= d AND l >= d) AS n1,
        (SELECT CAST(count(*) AS BIGINT) FROM span
          WHERE cohort = 1 AND f <= d AND l >= d) AS n2,
        (SELECT CAST(count(*) AS BIGINT) FROM span
          WHERE cohort = 0 AND l = d) AS d1,
        (SELECT CAST(count(*) AS BIGINT) FROM span
          WHERE cohort = 1 AND l = d) AS d2
      FROM cd
    ), terms AS (
      SELECT d, n1, n2, d1, d2,
        CAST(round(d1 - ((d1 + d2) * n1) * 1.0 / (n1 + n2), 10)
             AS DECIMAL(28,10)) AS oe,
        CAST(round(CASE WHEN n1 + n2 > 1
                        THEN ((d1 + d2) * n1 * n2 * (n1 + n2 - (d1 + d2))) * 1.0
                             / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))
                        ELSE 0.0 END, 10) AS DECIMAL(28,10)) AS v
      FROM base WHERE d1 + d2 > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_event_days,
           CAST(sum(d1) AS BIGINT) AS o1,
           CAST(sum(d2) AS BIGINT) AS o2,
           round(CAST(sum(d1) AS DOUBLE) - CAST(sum(oe) AS DOUBLE), 6) AS e1,
           round(CAST(sum(oe) AS DOUBLE), 6) AS oe_sum,
           round(CAST(sum(v) AS DOUBLE), 6) AS var_sum,
           round(CAST(sum(oe) AS DOUBLE) / sqrt(CAST(sum(v) AS DOUBLE)), 6)
             AS z_stat,
           abs(CAST(sum(oe) AS DOUBLE) / sqrt(CAST(sum(v) AS DOUBLE)))
             > {_LOGRANK_ZCRIT} AS reject_null
    FROM terms
    """,
)
def events_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOG-RANK TEST (Mantel 1966) between two cohorts' survival curves —
    the significance test that completes events_survival_curve's
    Kaplan-Meier point estimate: split the per-(user, event_type)
    activity streams into cohorts by user_id parity (the deterministic
    stand-in for treatment/control), and at every day with any churn
    compare cohort 1's observed churn d1 against its hypergeometric
    expectation e1 = dt*n1/n under the null that both cohorts share one
    hazard; z = sum(d1-e1)/sqrt(sum v) with the per-day hypergeometric
    variance v = dt*n1*n2*(n-dt)/(n^2*(n-1)). The A/B question a
    retention team actually asks ("did the treatment change churn?"),
    asked of the same spans the survival curve plots.

    Parity discipline: at-risk and churn counts are exact integers, so
    each day's e1 and v are a single double division of exact bigint
    products (identical operands, identical result in both engines);
    per-day terms are quantized round-10 into DECIMAL(28,10) and summed
    exactly (the survival-curve ln-term discipline — accumulation order
    cannot drift); sqrt is IEEE-correctly-rounded and the critical value
    is the same double literal, so `reject_null` compares identical
    doubles.

    Spark-first: the per-day at-risk counts are NOT correlated
    subqueries (that is oracle-clarity form) — they are ONE interval
    sweep: +1 at span start, -1 the day after span end, zero-filled at
    churn days, cumulated per cohort over the bounded calendar grid
    (the events_survival_curve / events_max_concurrency discipline).
    The heavy table is touched once for the span rollup; every later
    stage runs on the <= 2x|days| grid."""
    ev = t(spark, sf_dir, "events")
    span = ev.groupBy(
        (F.col("user_id") % 2).cast("bigint").alias("cohort"),
        "user_id",
        "event_type",
    ).agg(
        F.date_trunc("day", F.min("ts")).alias("f"),
        F.date_trunc("day", F.max("ts")).alias("l"),
    )
    deltas = (
        span.select("cohort", F.col("f").alias("d"), F.lit(1).alias("delta"))
        .unionAll(
            span.select(
                "cohort",
                (F.col("l") + F.expr("INTERVAL 1 DAY")).alias("d"),
                F.lit(-1).alias("delta"),
            )
        )
        .unionAll(
            span.select(F.col("l").alias("d"))
            .distinct()
            .select(F.explode(F.array(F.lit(0), F.lit(1))).alias("co"), "d")
            .select(
                F.col("co").cast("bigint").alias("cohort"),
                "d",
                F.lit(0).alias("delta"),
            )
        )
        .groupBy("cohort", "d")
        .agg(F.sum("delta").alias("net"))
    )
    wc = (
        W.partitionBy("cohort")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    at_risk = deltas.select(
        "cohort", "d", F.sum("net").over(wc).cast("bigint").alias("n_risk")
    )
    churns = span.groupBy("cohort", F.col("l").alias("d")).agg(
        F.count("*").cast("bigint").alias("churned")
    )
    churn_days = span.select(F.col("l").alias("d")).distinct()
    grid = (
        churn_days.join(at_risk, "d")
        .join(churns, ["cohort", "d"], "left")
        .select(
            "d",
            "cohort",
            "n_risk",
            F.coalesce(F.col("churned"), F.lit(0)).cast("bigint").alias("churned"),
        )
    )
    base = grid.groupBy("d").agg(
        F.sum(F.when(F.col("cohort") == 0, F.col("n_risk")).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("cohort") == 1, F.col("n_risk")).otherwise(0))
        .cast("bigint")
        .alias("n2"),
        F.sum(F.when(F.col("cohort") == 0, F.col("churned")).otherwise(0))
        .cast("bigint")
        .alias("d1"),
        F.sum(F.when(F.col("cohort") == 1, F.col("churned")).otherwise(0))
        .cast("bigint")
        .alias("d2"),
    )
    n = F.col("n1") + F.col("n2")
    dt = F.col("d1") + F.col("d2")
    oe = F.round(
        F.col("d1") - (dt * F.col("n1")) * F.lit(1.0) / n, 10
    ).cast("decimal(28,10)")
    v = F.round(
        F.when(
            n > 1,
            (dt * F.col("n1") * F.col("n2") * (n - dt))
            * F.lit(1.0)
            / (n * n * (n - 1)),
        ).otherwise(F.lit(0.0)),
        10,
    ).cast("decimal(28,10)")
    terms = base.filter(dt > 0).select(
        "d", "d1", "d2", oe.alias("oe"), v.alias("v")
    )
    zc = float(_LOGRANK_ZCRIT)
    z_expr = F.sum("oe").cast("double") / F.sqrt(F.sum("v").cast("double"))
    return terms.agg(
        F.count("*").cast("bigint").alias("n_event_days"),
        F.sum("d1").cast("bigint").alias("o1"),
        F.sum("d2").cast("bigint").alias("o2"),
        F.round(
            F.sum("d1").cast("double") - F.sum("oe").cast("double"), 6
        ).alias("e1"),
        F.round(F.sum("oe").cast("double"), 6).alias("oe_sum"),
        F.round(F.sum("v").cast("double"), 6).alias("var_sum"),
        F.round(z_expr, 6).alias("z_stat"),
        (F.abs(z_expr) > zc).alias("reject_null"),
    )


@query(
    "events_cox_hazard",
    oracle=f"""
    WITH span AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS cohort,
             date_trunc('day', min(ts)) AS f, date_trunc('day', max(ts)) AS l
      FROM events GROUP BY user_id % 2, user_id, event_type
    ), cd AS (SELECT DISTINCT l AS d FROM span),
    base AS (
      SELECT d,
        (SELECT CAST(count(*) AS BIGINT) FROM span
          WHERE cohort = 0 AND f <= d AND l >= d) AS n1,
        (SELECT CAST(count(*) AS BIGINT) FROM span
          WHERE cohort = 1 AND f <= d AND l >= d) AS n2,
        (SELECT CAST(count(*) AS BIGINT) FROM span
          WHERE cohort = 0 AND l = d) AS d1,
        (SELECT CAST(count(*) AS BIGINT) FROM span
          WHERE cohort = 1 AND l = d) AS d2
      FROM cd
    ), terms AS (
      SELECT d, d1, d2,
        CAST(round(d2 - ((d1 + d2) * n2) * 1.0 / (n1 + n2), 10)
             AS DECIMAL(28,10)) AS u,
        CAST(round(((d1 + d2) * n1 * n2) * 1.0
                   / ((n1 + n2) * (n1 + n2)), 10)
             AS DECIMAL(28,10)) AS i
      FROM base WHERE d1 + d2 > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_event_days,
           CAST(sum(d1) AS BIGINT) AS events_control,
           CAST(sum(d2) AS BIGINT) AS events_treat,
           round(CAST(sum(u) AS DOUBLE), 6) AS score_u,
           round(CAST(sum(i) AS DOUBLE), 6) AS info_i,
           round(CAST(sum(u) AS DOUBLE)
                 / nullif(CAST(sum(i) AS DOUBLE), 0), 6) AS beta1,
           round(exp(CAST(sum(u) AS DOUBLE)
                     / nullif(CAST(sum(i) AS DOUBLE), 0)), 6)
             AS hazard_ratio,
           round(CAST(sum(u) AS DOUBLE)
                 / nullif(sqrt(CAST(sum(i) AS DOUBLE)), 0), 6) AS z_score,
           abs(CAST(sum(u) AS DOUBLE)
               / nullif(sqrt(CAST(sum(i) AS DOUBLE)), 0))
             > {_LOGRANK_ZCRIT} AS reject_null
    FROM terms
    """,
)
def events_cox_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COX PROPORTIONAL-HAZARDS effect estimate (Cox 1972), one Newton
    step from beta=0 with Breslow tie handling — the EFFECT SIZE the
    log-rank test (events_logrank_test) cannot give: for the treatment
    indicator x = 1{user_id % 2 = 1} over the same per-(user,
    event_type) churn spans, the partial-likelihood score at beta=0 is
    U = sum_j (d2_j - dt_j*n2_j/n_j) and the information is
    I = sum_j dt_j*n1_j*n2_j/n_j^2 (indicator covariate => S1 = n2,
    S2 = S1, so I_j = dt*(n2/n)*(1-n2/n)); the standard first Newton
    iterate beta1 = U/I estimates the log hazard ratio,
    exp(beta1) the hazard ratio, and z = U/sqrt(I) is the score test.
    With an indicator covariate the Cox score is EXACTLY the negated
    log-rank numerator (U = -sum(oe); textbook equivalence — the
    log-rank IS the Cox score test up to the hypergeometric
    (n-dt)/(n-1) variance correction), pinned as an exact decimal
    identity in tests/test_r14_invariants.py.

    Parity discipline (the log-rank's, verbatim): at-risk/churn counts
    are exact integers, each day's u and i are one double division of
    exact bigint products, quantized round-10 into DECIMAL(28,10) and
    summed exactly; beta1/hazard_ratio/z_score derive from the two
    exact decimal sums via identical double ops, nullif-guarded in both
    engines so degenerate slices yield NULL, not DIVIDE_BY_ZERO.

    Spark-first: reuses the log-rank's interval sweep verbatim — +1 at
    span start, -1 the day after span end, per-cohort cumulative sums
    on the bounded churn-day grid; the heavy table is touched once for
    the span rollup, and the Newton step is arithmetic on a one-row
    aggregate. A k-covariate Cox would carry k+k^2 running sums through
    the same sweep and invert the k x k information on the driver."""
    ev = t(spark, sf_dir, "events")
    span = ev.groupBy(
        (F.col("user_id") % 2).cast("bigint").alias("cohort"),
        "user_id",
        "event_type",
    ).agg(
        F.date_trunc("day", F.min("ts")).alias("f"),
        F.date_trunc("day", F.max("ts")).alias("l"),
    )
    deltas = (
        span.select("cohort", F.col("f").alias("d"), F.lit(1).alias("delta"))
        .unionAll(
            span.select(
                "cohort",
                (F.col("l") + F.expr("INTERVAL 1 DAY")).alias("d"),
                F.lit(-1).alias("delta"),
            )
        )
        .unionAll(
            span.select(F.col("l").alias("d"))
            .distinct()
            .select(F.explode(F.array(F.lit(0), F.lit(1))).alias("co"), "d")
            .select(
                F.col("co").cast("bigint").alias("cohort"),
                "d",
                F.lit(0).alias("delta"),
            )
        )
        .groupBy("cohort", "d")
        .agg(F.sum("delta").alias("net"))
    )
    wc = (
        W.partitionBy("cohort")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    at_risk = deltas.select(
        "cohort", "d", F.sum("net").over(wc).cast("bigint").alias("n_risk")
    )
    churns = span.groupBy("cohort", F.col("l").alias("d")).agg(
        F.count("*").cast("bigint").alias("churned")
    )
    churn_days = span.select(F.col("l").alias("d")).distinct()
    grid = (
        churn_days.join(at_risk, "d")
        .join(churns, ["cohort", "d"], "left")
        .select(
            "d",
            "cohort",
            "n_risk",
            F.coalesce(F.col("churned"), F.lit(0)).cast("bigint").alias("churned"),
        )
    )
    base = grid.groupBy("d").agg(
        F.sum(F.when(F.col("cohort") == 0, F.col("n_risk")).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("cohort") == 1, F.col("n_risk")).otherwise(0))
        .cast("bigint")
        .alias("n2"),
        F.sum(F.when(F.col("cohort") == 0, F.col("churned")).otherwise(0))
        .cast("bigint")
        .alias("d1"),
        F.sum(F.when(F.col("cohort") == 1, F.col("churned")).otherwise(0))
        .cast("bigint")
        .alias("d2"),
    )
    n = F.col("n1") + F.col("n2")
    dt = F.col("d1") + F.col("d2")
    u = F.round(
        F.col("d2") - (dt * F.col("n2")) * F.lit(1.0) / n, 10
    ).cast("decimal(28,10)")
    i = F.round(
        (dt * F.col("n1") * F.col("n2")) * F.lit(1.0) / (n * n), 10
    ).cast("decimal(28,10)")
    terms = base.filter(dt > 0).select("d", "d1", "d2", u.alias("u"), i.alias("i"))
    zc = float(_LOGRANK_ZCRIT)
    su = F.sum("u").cast("double")
    si = F.sum("i").cast("double")
    beta = F.try_divide(su, F.nullif(si, F.lit(0.0)))
    z_expr = F.try_divide(su, F.nullif(F.sqrt(si), F.lit(0.0)))
    return terms.agg(
        F.count("*").cast("bigint").alias("n_event_days"),
        F.sum("d1").cast("bigint").alias("events_control"),
        F.sum("d2").cast("bigint").alias("events_treat"),
        F.round(su, 6).alias("score_u"),
        F.round(si, 6).alias("info_i"),
        F.round(beta, 6).alias("beta1"),
        F.round(F.exp(beta), 6).alias("hazard_ratio"),
        F.round(z_expr, 6).alias("z_score"),
        (F.abs(z_expr) > zc).alias("reject_null"),
    )


@query(
    "events_cuped_adjustment",
    oracle="""
    WITH bounds AS (
      SELECT CAST(epoch_us(min(ts)) AS BIGINT) AS lo,
             CAST(epoch_us(max(ts)) AS BIGINT) AS hi
      FROM events
    ), per_user AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS treat,
             CAST(count(*) FILTER (
               WHERE epoch_us(ts) < (lo + hi) // 2) AS BIGINT) AS x,
             CAST(count(*) FILTER (
               WHERE epoch_us(ts) >= (lo + hi) // 2) AS BIGINT) AS y
      FROM events CROSS JOIN bounds
      GROUP BY user_id % 2, user_id
    ), s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(count(*) FILTER (WHERE treat = 1) AS BIGINT) AS n1,
             CAST(sum(x) FILTER (WHERE treat = 1) AS BIGINT) AS sx1,
             CAST(sum(y) FILTER (WHERE treat = 1) AS BIGINT) AS sy1
      FROM per_user
    ), m AS (
      SELECT n, n1, n - n1 AS n0,
             (sxy - sx * 1.0 * sy / n) / n AS cov_xy,
             (sxx - sx * 1.0 * sx / n) / n AS var_x,
             (syy - sy * 1.0 * sy / n) / n AS var_y,
             sx * 1.0 / n AS mx,
             sy1 * 1.0 / n1 AS my1, (sy - sy1) * 1.0 / (n - n1) AS my0,
             sx1 * 1.0 / n1 AS mx1, (sx - sx1) * 1.0 / (n - n1) AS mx0
      FROM s
    ), th AS (
      SELECT m.*, cov_xy / var_x AS theta FROM m
    )
    SELECT n AS n_users, n1 AS n_treat,
           round(theta, 6) AS theta,
           round(my1 - my0, 6) AS gap_raw,
           round((my1 - theta * (mx1 - mx)) - (my0 - theta * (mx0 - mx)), 6)
             AS gap_cuped,
           round((cov_xy * cov_xy) / (var_x * var_y), 6) AS var_reduction,
           round(var_y - 2 * theta * cov_xy + theta * theta * var_x, 6)
             AS var_y_cuped
    FROM th
    """,
)
def events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED — Controlled-experiment Using Pre-Experiment Data (Deng,
    Xu, Kohavi & Walker, WSDM 2013), the industry-standard variance
    reduction every experimentation platform ships: regress the
    experiment metric y (each user's event count in the later half of
    the calendar span) on its pre-period covariate x (the earlier half),
    theta = cov(x,y)/var(x), and compare cohorts on the adjusted metric
    y - theta(x - xbar). Completes the A/B family (events_ab_uplift,
    events_did_estimator, dq_permutation_test, events_logrank_test) with
    the user-parity cohort convention. Reports theta, the raw and
    CUPED-adjusted treatment gaps, the variance-reduction factor
    rho^2 = cov^2/(var_x var_y) (CUPED's Eq. 4: exactly the share of
    metric variance the covariate removes), and the adjusted variance
    var_y - 2 theta cov + theta^2 var_x.

    Parity discipline: the pre/post boundary is integer epoch-micros
    midpoint arithmetic ((lo + hi) div 2 — exact); every per-user count
    and cross-moment sum is an exact BIGINT, so all moments, theta, and
    both gaps are the same double expressions of identical operands in
    both engines, rounded only at emission.

    Spark-first: one 2-value broadcast for the span bounds, ONE grouped
    count per user (the only heavy shuffle), then a single 9-column
    map-side-combinable moment aggregation on the per-user frame —
    adding a covariate to an experiment readout costs one pass, which
    is why CUPED is always on at 100 TB."""
    ev = t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.unix_micros(F.min("ts")).alias("lo"),
        F.unix_micros(F.max("ts")).alias("hi"),
    )
    mid = F.expr("(lo + hi) div 2")
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy(
            (F.col("user_id") % 2).cast("bigint").alias("treat"), "user_id"
        )
        .agg(
            F.sum(F.when(F.unix_micros("ts") < mid, 1).otherwise(0))
            .cast("bigint")
            .alias("x"),
            F.sum(F.when(F.unix_micros("ts") >= mid, 1).otherwise(0))
            .cast("bigint")
            .alias("y"),
        )
    )
    s = per_user.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.when(F.col("treat") == 1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("treat") == 1, F.col("x"))).cast("bigint").alias("sx1"),
        F.sum(F.when(F.col("treat") == 1, F.col("y"))).cast("bigint").alias("sy1"),
    )
    m = s.select(
        "n",
        "n1",
        (F.col("n") - F.col("n1")).alias("n0"),
        ((F.col("sxy") - F.col("sx") * F.lit(1.0) * F.col("sy") / F.col("n")) / F.col("n")).alias("cov_xy"),
        ((F.col("sxx") - F.col("sx") * F.lit(1.0) * F.col("sx") / F.col("n")) / F.col("n")).alias("var_x"),
        ((F.col("syy") - F.col("sy") * F.lit(1.0) * F.col("sy") / F.col("n")) / F.col("n")).alias("var_y"),
        (F.col("sx") * F.lit(1.0) / F.col("n")).alias("mx"),
        (F.col("sy1") * F.lit(1.0) / F.col("n1")).alias("my1"),
        ((F.col("sy") - F.col("sy1")) * F.lit(1.0) / (F.col("n") - F.col("n1"))).alias("my0"),
        (F.col("sx1") * F.lit(1.0) / F.col("n1")).alias("mx1"),
        ((F.col("sx") - F.col("sx1")) * F.lit(1.0) / (F.col("n") - F.col("n1"))).alias("mx0"),
    ).withColumn("theta", F.col("cov_xy") / F.col("var_x"))
    return m.select(
        F.col("n").alias("n_users"),
        F.col("n1").alias("n_treat"),
        F.round("theta", 6).alias("theta"),
        F.round(F.col("my1") - F.col("my0"), 6).alias("gap_raw"),
        F.round(
            (F.col("my1") - F.col("theta") * (F.col("mx1") - F.col("mx")))
            - (F.col("my0") - F.col("theta") * (F.col("mx0") - F.col("mx"))),
            6,
        ).alias("gap_cuped"),
        F.round(
            (F.col("cov_xy") * F.col("cov_xy")) / (F.col("var_x") * F.col("var_y")), 6
        ).alias("var_reduction"),
        F.round(
            F.col("var_y")
            - 2 * F.col("theta") * F.col("cov_xy")
            + F.col("theta") * F.col("theta") * F.col("var_x"),
            6,
        ).alias("var_y_cuped"),
    )


@query(
    "events_hits_bipartite",
    oracle="""
    WITH e AS (
      SELECT user_id AS u, event_type AS v, CAST(count(*) AS BIGINT) AS w
      FROM events GROUP BY 1, 2
    ), a1r AS (
      SELECT v, CAST(sum(w) AS BIGINT) AS raw FROM e GROUP BY v
    ), a1t AS (SELECT CAST(sum(raw) AS BIGINT) AS tot FROM a1r),
    a1 AS (
      SELECT v, CAST(round(raw * 1.0 / tot, 8) AS DECIMAL(18,8)) AS a
      FROM a1r CROSS JOIN a1t
    ), h1r AS (
      SELECT e.u, sum(e.w * a1.a) AS raw
      FROM e JOIN a1 ON a1.v = e.v GROUP BY e.u
    ), h1t AS (SELECT sum(raw) AS tot FROM h1r),
    h1 AS (
      SELECT u, CAST(round(CAST(raw AS DOUBLE) / CAST(tot AS DOUBLE), 8)
                     AS DECIMAL(18,8)) AS h
      FROM h1r CROSS JOIN h1t
    ), a2r AS (
      SELECT e.v, sum(e.w * h1.h) AS raw
      FROM e JOIN h1 ON h1.u = e.u GROUP BY e.v
    ), a2t AS (SELECT sum(raw) AS tot FROM a2r),
    a2 AS (
      SELECT v, round(CAST(raw AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS authority
      FROM a2r CROSS JOIN a2t
    )
    SELECT v AS event_type, authority,
           CAST(ROW_NUMBER() OVER (ORDER BY authority DESC, v) AS BIGINT)
             AS auth_rank
    FROM a2
    """,
)
def events_hits_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) on the bipartite
    user -> event-type graph — the fourth fully-oracle-checked iterative
    power-iteration family (kmeans_lloyd, llmops_term_pagerank,
    llmops_embedding_pca_power), and the classic recommender bootstrap:
    users are hubs, event types authorities; an event type is
    authoritative when engaged users hit it, a user is a good hub when
    they hit authoritative types. Two mutual-reinforcement rounds with
    L1 normalization (the sum-normalized HITS variant — an L2 norm would
    put an engine-specific sqrt inside the iteration), emitting the
    final authority vector with ranks.

    Parity discipline, STRONGER than the PageRank precedent: every
    vector is quantized round-8 into DECIMAL(18,8) after its
    normalization, so each round's mass sums are EXACT decimal
    arithmetic (integer edge weight x decimal score) — accumulation
    order cannot drift even over the 100k-hub side; the only doubles
    are the per-round normalization divisions on identical exact
    operands, and the final round-6 emission.

    Spark-first: one grouped count builds the edge list (the only heavy
    shuffle); the authority side is ~|event types| rows and BROADCASTS
    into every round; the hub round shuffles on the user key once per
    iteration — the same rank-vector-broadcast shape the PageRank
    operator documents, with the small side genuinely tiny here."""
    ev = t(spark, sf_dir, "events")
    e = ev.groupBy(F.col("user_id").alias("u"), F.col("event_type").alias("v")).agg(
        F.count("*").cast("bigint").alias("w")
    )
    a1r = e.groupBy("v").agg(F.sum("w").cast("bigint").alias("raw"))
    a1t = a1r.agg(F.sum("raw").cast("bigint").alias("tot"))
    a1 = a1r.crossJoin(F.broadcast(a1t)).select(
        "v",
        F.round(F.col("raw") * F.lit(1.0) / F.col("tot"), 8)
        .cast("decimal(18,8)")
        .alias("a"),
    )
    h1r = (
        e.join(F.broadcast(a1), "v")
        .groupBy("u")
        .agg(F.sum(F.col("w") * F.col("a")).alias("raw"))
    )
    h1t = h1r.agg(F.sum("raw").alias("tot"))
    h1 = h1r.crossJoin(F.broadcast(h1t)).select(
        "u",
        F.round(F.col("raw").cast("double") / F.col("tot").cast("double"), 8)
        .cast("decimal(18,8)")
        .alias("h"),
    )
    a2r = (
        e.join(h1, "u")
        .groupBy("v")
        .agg(F.sum(F.col("w") * F.col("h")).alias("raw"))
    )
    a2t = a2r.agg(F.sum("raw").alias("tot"))
    a2 = a2r.crossJoin(F.broadcast(a2t)).select(
        "v",
        F.col("raw"),
        F.round(F.col("raw").cast("double") / F.col("tot").cast("double"), 6).alias(
            "authority"
        ),
    )
    # rank window over the <= |event types| authority vector; the key is
    # derived from the (data-dependent) raw mass so it cannot fold
    wr = W.partitionBy(bounded_window_key(F.col("raw").cast("bigint"))).orderBy(
        F.col("authority").desc(), "v"
    )
    return a2.select(
        F.col("v").alias("event_type"),
        "authority",
        F.row_number().over(wr).cast("bigint").alias("auth_rank"),
    )
