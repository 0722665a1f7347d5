"""Declared queries for the LLM-data-pipeline operators (north-star set:
dedup families, similarity search, text analysis, multimodal columns).

Oracle-pairing strategy: operators whose math both engines can express
(exact dedup, n-gram Jaccard, cosine similarity, text metrics) get full
DuckDB oracles computing the SAME formulas; hash-based candidates
(MinHash/SimHash/hyperplane-LSH) are engine-specific by nature → rows-only
here, with recall/agreement cross-checks against their exact counterparts
in tests/test_llmops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from batch_public_spark.operators.multimodal import (
    blob_metadata,
    decode_features,
    synthesize_blobs,
)
from batch_public_spark.operators.semantic import (
    ann_bruteforce_topk,
    ann_ivf_topk,
    ann_lsh_topk,
    bucket_pairs,
    dedup_exact,
    dedup_minhash,
    embedding_neardup_pairs,
    jaccard,
    minhash_candidates,
    simhash_neardup_pairs,
    word_shingles,
    word_shingles_all,
)
from batch_public_spark.operators.textops import (
    PUNCT_CLASS,
    STOPWORDS_EN,
    fingerprint_md5,
    fingerprint_modp,
    fingerprint_winnow,
    lang_id,
    mean_word_len,
    punct_ratio,
    quality_score,
    normalized_text,
    stopword_ratio,
    token_count_bpe_ish,
    token_count_ws,
    tokens,
)
from batch_public_spark.plans.lint import bounded_window_key
from batch_public_spark.plans.registry import query
from batch_public_spark.sources.tables import inline_rows
from batch_public_spark.sources.tables import load_table as t
from batch_public_spark.sources.tables import spread

# Shared SQL fragments mirroring the Spark expressions exactly.
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS = f"list_filter(string_split_regex(trim(text), '\\s+'), x -> length(x) > 0)"
_PUNCT_SQL = PUNCT_CLASS.replace("'", "''")
_STOP = "['the','a','an','of','to','and','in','is','it','for']"

# ---------------------------------------------------------------------------
# Dedup family
# ---------------------------------------------------------------------------


@query(
    "llmops_dedup_exact",
    oracle=f"""
    SELECT md5({_NORM}) AS content_hash,
           MIN(doc_id) AS doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def llmops_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 of normalized text, smallest doc_id survives.
    Map-side partial min ⇒ one light shuffle at any scale."""
    return dedup_exact(t(spark, sf_dir, "documents"))


@query(
    "llmops_ngram_jaccard_pairs",
    oracle=f"""
    WITH d0 AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len({_TOKS.replace("trim(text)", _NORM)}) - 2, 1) + 1),
               i -> array_to_string(({_TOKS.replace("trim(text)", _NORM)})[i:i+2], ' ')
             )) AS sh
      FROM documents
    ), db AS (
      -- block key = the FIRST positional shingle (list_distinct does not
      -- preserve order in DuckDB, so sh[1] would be an arbitrary element)
      SELECT doc_id, sh,
             array_to_string(({_TOKS.replace("trim(text)", _NORM)})[1:3], ' ') AS blk
      FROM documents JOIN d0 USING (doc_id)
    ), d AS (
      SELECT doc_id, sh, blk FROM (
        SELECT *, row_number() OVER (PARTITION BY blk ORDER BY doc_id) AS rn
        FROM db
      ) WHERE rn <= 50
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jac
    FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh)) * 2 >= len(list_distinct(list_concat(a.sh, b.sh)))
    """,
)
def llmops_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs (J ≥ 0.5) via CONTENT
    BLOCKING — all-pairs only within a first-shingle block (near-dups
    share their opening 3-gram unless the edit hits the first words), the
    classic record-linkage bounding that replaces the r1 doc_id < 150
    prefix: that prefix went VACUOUS at sf0.1 (planted near-dups scatter
    across the id space; found by the r9 full-SF stress sweep), while
    blocking recovers EVERY planted pair at the smoke SFs (28/25 — equal
    to the unblocked full-corpus count) and 256 at sf0.1, from
    block-bounded candidate sets. Blocks are capped at 50 members
    (row_number, mirrored in the oracle — the containment hot-key
    discipline) so one viral opening line can't go quadratic; at corpus
    scale the MinHash band join (llmops_minhash_candidates) is the
    higher-recall candidate source and this is the exact verifier."""
    # spread(): double shingling is per-row text compute over the 1-task
    # fixture scan (guide §2.5); no-op at scale.
    d0 = spread(t(spark, sf_dir, "documents").select("doc_id", "text")).select(
        F.col("doc_id"),
        word_shingles(F.col("text"), 3).alias("sh"),
        F.element_at(word_shingles_all(F.col("text"), 3), 1).alias("blk"),
    )
    wb = W.partitionBy("blk").orderBy("doc_id")
    d = (
        d0.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= 50)
        .select("doc_id", "sh", "blk")
    )
    a = d.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"), "blk")
    b = d.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"), "blk")
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jac"))
        .filter(F.col("jac") >= 0.5)
    )


@query("llmops_minhash_candidates", oracle=None)
def llmops_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs with exact-Jaccard verification —
    shingle→minhash→band→bucket-join (the 100 TB dedup path; xxhash64-based,
    hence engine-specific → rows-only; recall vs exact pairs is asserted in
    tests)."""
    return minhash_candidates(t(spark, sf_dir, "documents")).filter(F.col("jaccard") >= 0.5)


@query("llmops_minhash_dedup", oracle=None)
def llmops_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup dedup decision: drop the larger doc_id of every verified
    near-dup pair (J ≥ 0.6); returns survivors per source."""
    kept = dedup_minhash(t(spark, sf_dir, "documents"), threshold=0.6)
    return kept.groupBy("source").agg(F.count("*").alias("n_kept"))


@query("llmops_simhash_neardup", oracle=None)
def llmops_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 3 on 64-bit signatures), candidate
    generation by 16-bit band blocking (pigeonhole-complete for ≤3 flips)."""
    return simhash_neardup_pairs(t(spark, sf_dir, "documents"))


@query(
    "llmops_embedding_neardup",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 6) >= 0.4
    """,
)
def llmops_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact, bounded corpus). The at-scale
    variant prunes through hyperplane-LSH buckets first.

    The query passes threshold=0.4 (not the operator's 0.8 production
    default) because the synthetic sf0.01 fixture tops out at sim 0.51 —
    at 0.8 both engines return the empty set and the hash-match would
    verify nothing about the cosine/GEMM path. 0.4 yields 59 pairs at
    sf0.01, a real fixture for the blocked-GEMM kernel."""
    return embedding_neardup_pairs(t(spark, sf_dir, "embeddings"), threshold=0.4)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@query(
    "llmops_ann_bruteforce",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 5),
    s AS (SELECT q.query_id, v.vec_id AS neighbor_id,
                 ROUND(list_cosine_similarity(q.qv, CAST(v.embedding AS DOUBLE[])), 6) AS sim
          FROM embeddings v CROSS JOIN q WHERE v.vec_id != q.query_id)
    SELECT query_id, neighbor_id, sim, CAST(rank AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
      FROM s) WHERE rank <= 5
    """,
)
def llmops_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k — the exactness baseline. Queries broadcast;
    corpus never shuffles; ranking on rounded sim + id for reproducibility."""
    vecs = t(spark, sf_dir, "embeddings")
    res = ann_bruteforce_topk(vecs, vecs.filter(F.col("vec_id") < 5), k=5)
    return res.withColumn("rank", F.col("rank").cast("bigint"))


@query("llmops_ann_lsh", oracle=None)
def llmops_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-k (bucketed candidates → exact rank).
    Recall vs brute force asserted in tests; rows-only here (xxhash64-seeded
    hyperplanes are engine-specific)."""
    vecs = t(spark, sf_dir, "embeddings")
    # planes ≈ log2(corpus/target-bucket-size): 6 planes / 8 tables ⇒ 0.8
    # recall@5 on this 500-vector fixture; grow planes with log(corpus).
    res = ann_lsh_topk(vecs, vecs.filter(F.col("vec_id") < 5), k=5, planes=6, tables=8)
    return res.withColumn("rank", F.col("rank").cast("bigint"))


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "llmops_text_metrics",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
             CAST(len(regexp_extract_all(text, '\\w{{1,4}}|[^\\w\\s]')) AS BIGINT) AS n_tokens_bpe,
             CASE WHEN length(text) > 0
                  THEN CAST(len(regexp_extract_all(text, '{_PUNCT_SQL}')) AS DOUBLE) / length(text)
                  ELSE 0.0 END AS pr,
             CASE WHEN len({_TOKS}) > 0
                  THEN CAST(len(list_filter({_TOKS}, x -> list_contains({_STOP}, lower(x)))) AS DOUBLE)
                       / len({_TOKS})
                  ELSE 0.0 END AS swr,
             CASE WHEN len({_TOKS}) > 0
                  THEN CAST(list_sum(list_transform({_TOKS}, x -> length(x))) AS DOUBLE) / len({_TOKS})
                  ELSE 0.0 END AS mwl
      FROM documents)
    SELECT doc_id, n_tokens, n_tokens_bpe,
           ROUND(pr, 6) AS punct_ratio,
           ROUND(swr, 6) AS stopword_ratio,
           ROUND(mwl, 6) AS mean_word_len,
           ROUND(least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.3
                 + greatest(0.0, 1.0 - pr * 4) * 0.3
                 + least(swr * 5, 1.0) * 0.2
                 + (CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.3 END) * 0.2, 6)
             AS quality
    FROM m
    """,
)
def llmops_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex), punctuation/stopword
    ratios, mean word length, and the composite quality score — all one
    scan-stage projection."""
    d = t(spark, sf_dir, "documents")
    txt = F.col("text")
    return d.select(
        "doc_id",
        token_count_ws(txt).alias("n_tokens"),
        token_count_bpe_ish(txt).alias("n_tokens_bpe"),
        F.round(punct_ratio(txt), 6).alias("punct_ratio"),
        F.round(stopword_ratio(txt), 6).alias("stopword_ratio"),
        F.round(mean_word_len(txt), 6).alias("mean_word_len"),
        F.round(quality_score(txt), 6).alias("quality"),
    )


@query(
    "llmops_lang_id",
    oracle="""
    SELECT * FROM (VALUES
      (1, 'zh'), (2, 'es'), (3, 'fr'), (4, 'de'), (5, 'ru'), (6, 'en')
    ) AS t(case_id, lang)
    """,
)
def llmops_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (script ranges + marker stopwords), validated
    on an inline multilingual fixture (the documents corpus is synthetic
    ASCII word-salad, so its lang column is a label, not a signal)."""
    rows = [
        (1, "这是一个测试文档"),
        (2, "el niño está aquí con los amigos"),
        (3, "c'est une belle journée à Paris"),
        (4, "der Hund ist nicht da und ich bin müde"),
        (5, "Привет мир как дела"),
        (6, "hello plain world with nothing special"),
    ]
    df = inline_rows(spark, "case_id int, text string", rows)
    return df.select("case_id", lang_id(F.col("text")).alias("lang"))


@query(
    "llmops_language_split",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(ROUND(SUM(CAST(n_chars AS DECIMAL(15,4))), 2) AS DOUBLE) AS total_chars
    FROM documents GROUP BY lang
    """,
)
def llmops_language_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus language distribution (the split step of per-language
    pipelines)."""
    return (
        t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.sum(F.col("n_chars").cast("decimal(15,4)")), 2)
            .cast("double")
            .alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Multimodal columns
# ---------------------------------------------------------------------------


@query(
    "llmops_multimodal_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS digest_md5,
           sha256(text) AS digest_sha256
    FROM documents
    """,
)
def llmops_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata (length + digests) over synthesized blobs —
    codec-free, engine-parity checkable."""
    blobs = synthesize_blobs(t(spark, sf_dir, "documents"))
    meta = blob_metadata(F.col("blob"))
    return blobs.select(
        "doc_id",
        meta.getField("n_bytes").cast("bigint").alias("n_bytes"),
        meta.getField("md5").alias("digest_md5"),
        meta.getField("sha256").alias("digest_sha256"),
    )


@query(
    "llmops_multimodal_features",
    oracle="""
    WITH h AS (
      SELECT doc_id, length(text) AS n_bytes,
             list_transform(range(0, 16), b ->
               CAST(len(list_filter(range(1, length(text) + 1),
                                    i -> (ord(substring(text, i, 1)) % 16) = b)) AS DOUBLE)
               / greatest(length(text), 1)) AS f
      FROM documents
    )
    SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
           ROUND(SQRT(0.0 + f[1]*f[1] + f[2]*f[2] + f[3]*f[3] + f[4]*f[4] + f[5]*f[5] + f[6]*f[6] + f[7]*f[7] + f[8]*f[8] + f[9]*f[9] + f[10]*f[10] + f[11]*f[11] + f[12]*f[12] + f[13]*f[13] + f[14]*f[14] + f[15]*f[15] + f[16]*f[16]), 6) AS feat_norm
    FROM h
    """,
)
def llmops_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (decode step
    stubbed with a deterministic byte-histogram — see operators.multimodal).
    Oracle-checked: the corpus is pure ASCII so char codes ≡ payload bytes,
    and the norm folds the 16 exact-division bins left-to-right in both
    engines (explicit addition chain in the SQL = Spark's aggregate fold
    order), making even the float path bit-stable."""
    blobs = synthesize_blobs(t(spark, sf_dir, "documents"))
    feats = decode_features(blobs)
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("features"), lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    return feats.select("doc_id", "n_bytes", F.round(norm, 6).alias("feat_norm"))


@query(
    "llmops_fingerprint_md5",
    oracle=r"""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
    FROM documents
    ORDER BY doc_id
    LIMIT 200
    """,
)
def llmops_fingerprint_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (content hash of normalized text) — the
    exact-dedup key as a first-class column; scan-stage projection, no
    shuffle, engine-parity via md5."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", fingerprint_md5(F.col("text")).alias("fp"))
        .orderBy("doc_id")
        .limit(200)
    )


@query("llmops_fingerprint_modp_pairs", oracle=None)
def llmops_fingerprint_modp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash fingerprint near-dup candidates: docs sharing ≥3
    0-mod-p sampled k-gram hashes (Broder-style document fingerprinting;
    xxhash64-based so rows-only — no DuckDB analog).

    Scale shape: explode (doc, fp) postings (~windows/p rows per doc), then
    ONE posting-list gather per fp (bucket_pairs): oversized posting lists
    drop in the same pass (the way production dedup caps boilerplate
    shingles) and pairs emit from in-array combinatorics — linear in
    corpus + collisions, never all-pairs, and never a posting self-join
    (which would evaluate the rolling-hash subtree twice). (The
    ``keep``-smallest winnow selection is exposed as a per-doc fingerprint
    column instead — globally-minimal windows degenerate into
    everyone's-a-candidate on low-entropy corpora.)"""
    d = spread(t(spark, sf_dir, "documents"))
    posts = d.select(
        F.col("doc_id").alias("_id"),
        F.explode(fingerprint_modp(F.col("text"))).alias("fp"),
    )
    return bucket_pairs(posts, ["fp"], "_id", 100, count_col="shared_fps").filter(
        F.col("shared_fps") >= 3
    )


@query(
    "llmops_ann_ivf",
    oracle="""
    WITH cents AS (
      SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 32
    ),
    v AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
    q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings WHERE vec_id < 5),
    assigned AS (
      SELECT neighbor_id, vv, centroid_id FROM (
        SELECT v.neighbor_id, v.vv, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY v.neighbor_id
                 ORDER BY ROUND(list_cosine_similarity(v.vv, c.cv), 6) DESC, c.centroid_id
               ) AS r
        FROM v CROSS JOIN cents c) WHERE r = 1
    ),
    probes AS (
      SELECT query_id, qv, centroid_id FROM (
        SELECT q.query_id, q.qv, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY ROUND(list_cosine_similarity(q.qv, c.cv), 6) DESC, c.centroid_id
               ) AS r
        FROM q CROSS JOIN cents c) WHERE r <= 4
    ),
    cand AS (
      SELECT p.query_id, a.neighbor_id,
             ROUND(list_cosine_similarity(p.qv, a.vv), 6) AS sim
      FROM assigned a JOIN probes p USING (centroid_id)
      WHERE a.neighbor_id != p.query_id
    )
    SELECT query_id, neighbor_id, sim, CAST(rank AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS rank
      FROM cand) WHERE rank <= 5
    """,
)
def llmops_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: md5-sampled centroids -> inverted-list assignment ->
    nprobe-list probe -> exact rerank. Fully deterministic (sampled
    centroids, rounded cosines, id tie-breaks), so unlike the LSH variant
    it carries a complete DuckDB oracle."""
    vecs = t(spark, sf_dir, "embeddings")
    res = ann_ivf_topk(
        vecs, vecs.filter(F.col("vec_id") < 5), k=5, n_centroids=32, nprobe=4
    )
    return res.withColumn("rank", F.col("rank").cast("bigint"))


@query(
    "llmops_ann_ivf_lloyd_recall",
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
      -- dim derived from the vector itself (zipped unnest), so a fixture
      -- dim change cannot silently desync this oracle from the Spark side
      SELECT cluster_id, pos, round(avg(x), 6) AS m FROM (
        SELECT cluster_id, unnest(generate_series(1, len(vv))) AS pos,
               unnest(vv) AS x
        FROM a1
      ) GROUP BY cluster_id, pos
    ),
    c1 AS (SELECT cluster_id AS centroid_id, array_agg(m ORDER BY pos) AS cv
           FROM dims GROUP BY cluster_id),
    q AS (SELECT vec_id AS query_id, vv AS qv FROM v WHERE vec_id < 5),
    assigned AS (
      SELECT neighbor_id, vv, centroid_id FROM (
        SELECT v.vec_id AS neighbor_id, v.vv, c.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
                 ROUND(list_cosine_similarity(v.vv, c.cv), 6) DESC, c.centroid_id
               ) AS r
        FROM v CROSS JOIN c1 c) WHERE r = 1
    ),
    probes AS (
      SELECT query_id, qv, centroid_id FROM (
        SELECT q.query_id, q.qv, c.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                 ROUND(list_cosine_similarity(q.qv, c.cv), 6) DESC, c.centroid_id
               ) AS r
        FROM q CROSS JOIN c1 c) WHERE r <= 2
    ),
    ivf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, a.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY
                 ROUND(list_cosine_similarity(p.qv, a.vv), 6) DESC, a.neighbor_id
               ) AS rank
        FROM assigned a JOIN probes p USING (centroid_id)
        WHERE a.neighbor_id != p.query_id) WHERE rank <= 5
    ),
    bf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, v.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                 ROUND(list_cosine_similarity(q.qv, v.vv), 6) DESC, v.vec_id
               ) AS rank
        FROM v CROSS JOIN q WHERE v.vec_id != q.query_id) WHERE rank <= 5
    ),
    hits AS (
      SELECT i.query_id, CAST(count(*) AS BIGINT) AS hits
      FROM ivf i JOIN bf b
        ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
      GROUP BY i.query_id
    )
    SELECT q.query_id,
           COALESCE(h.hits, CAST(0 AS BIGINT)) AS hits,
           round(COALESCE(h.hits, 0) / 5.0, 6) AS recall_at_5
    FROM q LEFT JOIN hits h USING (query_id)
    """,
)
def llmops_ann_ivf_lloyd_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of Lloyd-refined IVF against the brute-force ground truth —
    the accuracy anchor for the ``lloyd_iters`` path of ann_ivf_topk (the
    pattern of llmops_minhash_estimator_accuracy: the approximate family's
    quality is itself an oracle-hashed query, not a test-only claim).
    Centroids are the k=8 md5 seed sample refined by ONE L2 Lloyd round
    (fixed-precision means — the kmeans_lloyd discipline, which is what
    makes the full DuckDB replay possible); probes nprobe=2 of 8 lists, so
    recall is genuinely < 1 for some queries and the measurement is
    non-vacuous. Scale shape inherits from the parents: centroid model is
    control-plane, corpus assignment is the map-side GEMM argmax, and the
    recall join broadcasts the 25-row ground-truth side."""
    vecs = t(spark, sf_dir, "embeddings")
    qs = vecs.filter(F.col("vec_id") < 5)
    ivf = ann_ivf_topk(vecs, qs, k=5, n_centroids=8, nprobe=2, lloyd_iters=1)
    bf = ann_bruteforce_topk(vecs, qs, k=5).select("query_id", "neighbor_id")
    per_q = (
        ivf.join(F.broadcast(bf), ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").cast("bigint").alias("hits"))
    )
    base = qs.select(F.col("vec_id").alias("query_id"))
    return base.join(per_q, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("hits"), F.lit(0).cast("bigint")).alias("hits"),
        F.round(F.coalesce(F.col("hits"), F.lit(0)) / F.lit(5.0), 6).alias("recall_at_5"),
    )


@query(
    "llmops_dedup_cc",
    oracle=f"""
    WITH RECURSIVE
    d0 AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len({_TOKS.replace("trim(text)", _NORM)}) - 2, 1) + 1),
               i -> array_to_string(({_TOKS.replace("trim(text)", _NORM)})[i:i+2], ' ')
             )) AS sh
      FROM documents),
    db AS (
      SELECT doc_id, sh,
             array_to_string(({_TOKS.replace("trim(text)", _NORM)})[1:3], ' ') AS blk
      FROM documents JOIN d0 USING (doc_id)),
    d AS (
      SELECT doc_id, sh, blk FROM (
        SELECT *, row_number() OVER (PARTITION BY blk ORDER BY doc_id) AS rn
        FROM db
      ) WHERE rn <= 50),
    pairs AS (
      SELECT a.doc_id AS u, b.doc_id AS v
      FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh)) * 2 >= len(list_distinct(list_concat(a.sh, b.sh)))),
    sym AS (SELECT u, v FROM pairs UNION SELECT v AS u, u AS v FROM pairs),
    walk(u, label) AS (
      SELECT u, u AS label FROM (SELECT DISTINCT u FROM sym)
      UNION
      SELECT s.u, w.label FROM sym s JOIN walk w ON s.v = w.u
    )
    SELECT u AS id, MIN(label) AS component FROM walk GROUP BY u
    """,
)
def llmops_dedup_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the exact near-dup pair graph: transitive
    closure of J >= 0.5 word-3-gram pairs via hash-min label propagation
    (operators.graph). The DuckDB oracle computes the same components with
    a recursive CTE — an oracle-checked ITERATIVE algorithm, not just a
    single plan. Edges come from the first-shingle-BLOCKED exact-Jaccard
    join (llmops_ngram_jaccard_pairs' bounding, block cap 50, mirrored in
    the oracle — the r1 doc_id prefix went vacuous at sf0.1); at corpus
    scale the same CC runs on the MinHash band candidates."""
    from batch_public_spark.operators.graph import connected_components

    # spread(): double shingling is per-row text compute over the 1-task
    # fixture scan (guide §2.5); no-op at scale.
    d0 = spread(t(spark, sf_dir, "documents").select("doc_id", "text")).select(
        F.col("doc_id"),
        word_shingles(F.col("text"), 3).alias("sh"),
        F.element_at(word_shingles_all(F.col("text"), 3), 1).alias("blk"),
    )
    wb = W.partitionBy("blk").orderBy("doc_id")
    d = (
        d0.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= 50)
        .select("doc_id", "sh", "blk")
    )
    a = d.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"), "blk")
    b = d.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"), "blk")
    pairs = (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(jaccard(F.col("sh_a"), F.col("sh_b")) >= 0.5)
        .select("id_a", "id_b")
    )
    return connected_components(pairs)


_QUALITY_SQL = f"""
      SELECT doc_id, lang,
             CASE WHEN length(text) > 0
                  THEN CAST(len(regexp_extract_all(text, '{_PUNCT_SQL}')) AS DOUBLE) / length(text)
                  ELSE 0.0 END AS pr,
             CASE WHEN len({_TOKS}) > 0
                  THEN CAST(len(list_filter({_TOKS}, x -> list_contains({_STOP}, lower(x)))) AS DOUBLE)
                       / len({_TOKS})
                  ELSE 0.0 END AS swr,
             CASE WHEN len({_TOKS}) > 0
                  THEN CAST(list_sum(list_transform({_TOKS}, x -> length(x))) AS DOUBLE) / len({_TOKS})
                  ELSE 0.0 END AS mwl,
             CAST(len({_TOKS}) AS DOUBLE) AS n_tok
      FROM documents
"""


@query(
    "llmops_quality_filter",
    oracle=f"""
    WITH m AS ({_QUALITY_SQL}),
    q AS (
      SELECT lang,
             CAST(ROUND(least(n_tok / 50.0, 1.0) * 0.3
                   + greatest(0.0, 1.0 - pr * 4) * 0.3
                   + least(swr * 5, 1.0) * 0.2
                   + (CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.3 END) * 0.2, 6)
               AS DECIMAL(10,6)) AS quality
      FROM m)
    SELECT lang,
           COUNT(*) FILTER (WHERE quality >= 0.5) AS n_keep,
           COUNT(*) FILTER (WHERE quality <  0.5) AS n_drop,
           ROUND(CAST(SUM(quality) AS DOUBLE) / COUNT(*), 6) AS avg_quality
    FROM q GROUP BY lang
    """,
)
def llmops_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4/Gopher-style corpus FILTER step: score every document, keep
    quality >= 0.5, report keep/drop counts + mean quality per language.

    Determinism: the per-doc score rounds to 6 then sums through
    DECIMAL(10,6) (exact, order-free) before the final double division —
    a float sum over a shuffled corpus would drift between engines.
    Scale: pure scan-stage projection + one tiny agg; the filter itself
    pushes nothing (quality needs the full text) but prunes every
    downstream stage."""
    d = t(spark, sf_dir, "documents")
    q = F.round(quality_score(F.col("text")), 6).cast("decimal(10,6)")
    return (
        d.select("lang", q.alias("quality"))
        .groupBy("lang")
        .agg(
            F.count_if(F.col("quality") >= 0.5).alias("n_keep"),
            F.count_if(F.col("quality") < 0.5).alias("n_drop"),
            F.round(F.sum("quality").cast("double") / F.count("*"), 6).alias("avg_quality"),
        )
    )


@query(
    "llmops_embedding_normalize",
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
def llmops_embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding hygiene for the ANN/near-dup family: per-vector L2 norm,
    dimensionality check, and the first normalized component (unit-scaling
    is what makes dot product == cosine in the search operators).

    Both engines fold x² left-to-right over the same float32 array widened
    to double, so the sums agree bit-for-bit before rounding. Scale: pure
    map-side projection — no shuffle, whole-stage codegen."""
    e = t(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(sq_sum)
    return e.select(
        "vec_id",
        F.round(norm, 6).alias("l2_norm"),
        F.size("embedding").cast("bigint").alias("dim"),
        # try_element_at + try_divide: a hygiene audit REPORTS malformed
        # rows (zero-dim / zero-norm) as NULLs instead of crashing on them
        # (tests/test_pathological_inputs.py); identical values on real data
        F.round(
            F.try_divide(F.try_element_at("embedding", F.lit(1)).cast("double"), norm), 6
        ).alias("first_unit"),
    )


# ---------------------------------------------------------------------------
# Corpus curation: decontamination, train-order shuffle, mixing, packing
# ---------------------------------------------------------------------------

# DuckDB fragment: distinct word-4-gram shingles of the normalized text
# (mirrors operators.semantic.word_shingles(text, 4), including the
# whole-text single shingle for docs shorter than 4 words).
_TOKS_NORM = _TOKS.replace("trim(text)", _NORM)
_GRAMS4 = (
    f"list_distinct(list_transform("
    f"range(1, greatest(len({_TOKS_NORM}) - 3, 1) + 1), "
    f"i -> array_to_string(({_TOKS_NORM})[i:i+3], ' ')))"
)


@query(
    "llmops_decontaminate",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, unnest({_GRAMS4}) AS gram FROM documents
    ), bench AS (
      SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0
    )
    SELECT g.doc_id, COUNT(*) AS n_shared
    FROM g JOIN bench USING (gram)
    WHERE g.doc_id % 97 <> 0
    GROUP BY g.doc_id
    """,
)
def llmops_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any word
    4-gram with a held-out benchmark set (the n-gram-overlap contamination
    check run before pretraining; docs with doc_id % 97 == 0 stand in for
    the benchmark). Production corpora use n of 8-13; this corpus's tiny
    synthetic vocabulary needs n=4 for any cross-doc collisions to exist —
    the n is a free parameter of the same plan.

    Shape at scale: benchmark n-gram sets are tiny (thousands of docs)
    beside a 100 TB corpus, so the distinct benchmark grams BROADCAST and
    the corpus side stays a scan → explode → broadcast-hash semi-match →
    per-doc count, with no all-to-all shuffle of corpus grams. The final
    groupBy shuffles only the matched grams — contamination hits, orders
    of magnitude smaller than the corpus."""
    # spread(): the 4-gram explode is per-row text compute over the
    # 1-task fixture scan (guide §2.5); no-op at scale.
    d = spread(t(spark, sf_dir, "documents").select("doc_id", "text"))
    grams = d.select(
        "doc_id", F.explode(word_shingles(F.col("text"), 4)).alias("gram")
    )
    bench = grams.filter(F.col("doc_id") % 97 == 0).select("gram").distinct()
    return (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )


@query(
    "llmops_semantic_decontaminate",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    b AS (SELECT vec_id AS bid, v FROM e WHERE vec_id % 97 = 0),
    c AS (SELECT vec_id, v FROM e WHERE vec_id % 97 <> 0),
    s AS (SELECT c.vec_id, b.bid,
                 ROUND(list_cosine_similarity(c.v, b.v), 6) AS sim
          FROM c CROSS JOIN b),
    m AS (SELECT vec_id, bid, sim,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY sim DESC, bid) AS rn
          FROM s),
    t25 AS (SELECT vec_id, bid, sim FROM m WHERE rn = 1
            ORDER BY sim DESC, vec_id LIMIT 25)
    SELECT CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS BIGINT)
             AS rank,
           vec_id, bid AS nearest_bench_id, sim AS max_sim
    FROM t25
    """,
)
def llmops_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC decontamination — the embedding-space twin of the n-gram
    llmops_decontaminate (and distinct from llmops_semdedup_clusters,
    which dedups the corpus against ITSELF): every corpus vector is
    scored by its maximum cosine similarity to the held-out benchmark
    set (vec_id % 97 stand-ins, same convention as the n-gram query),
    and the output is the top-25 review queue (rank, corpus vector,
    nearest benchmark item, similarity) — surface-overlap checks miss
    paraphrased contamination; this is the check that catches it. A
    review queue rather than a fixed-τ flag is deliberate: τ is
    calibrated FROM this queue (the synthetic embeddings' max sim is
    ~0.5, so any honest fixed threshold would be vacuously false — the
    queue contract stays non-degenerate at every SF and is exactly how
    teams operate the check before enabling auto-removal).

    Spark-first, the corpus-stays-put shape: the benchmark side
    collapses to ONE collected row (k ≈ n/97 structs of id + vector +
    precomputed row_norm — the Lloyd-centroid broadcast convention) and
    cross-attaches by broadcast; each corpus row then folds max cosine
    IN-ROW over the benchmark array (argmax via array_max on
    (sim, −bid) structs, so the tie-break is the smallest benchmark id
    with no second pass), and the only movement of corpus data is the
    TakeOrdered top-25. No shuffle touches vectors; at 100 TB the
    benchmark set is still thousands of rows and this exact plan runs
    unchanged. Parity: fused_cosine ↔ list_cosine_similarity at
    round-6 (the hard_negatives-pinned equivalence); ranking orders by
    the rounded sim with vec_id tie-breaks in both engines."""
    from batch_public_spark.operators.semantic import fused_cosine, row_norm

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", row_norm(F.col("embedding")).alias("n")
    )
    bench = (
        e.filter(F.col("vec_id") % 97 == 0)
        .select(
            F.struct(
                F.col("vec_id").alias("bid"),
                F.col("embedding").alias("bv"),
                F.col("n").alias("bn"),
            ).alias("b")
        )
        .agg(F.collect_list("b").alias("bench"))
    )
    sims = F.transform(
        F.col("bench"),
        lambda b: F.struct(
            F.round(
                fused_cosine(F.col("embedding"), b["bv"], F.col("n"), b["bn"]), 6
            ).alias("sim"),
            (-b["bid"]).alias("negid"),
        ),
    )
    best = (
        # spread() on the corpus side only: the per-row fused_cosine
        # sweep over the broadcast benchmark otherwise runs on the
        # 1-task fixture scan (guide §2.5); no-op at scale.
        spread(e.filter(F.col("vec_id") % 97 != 0))
        .crossJoin(F.broadcast(bench))
        .select("vec_id", F.array_max(sims).alias("best"))
        .filter(F.col("best").isNotNull())  # empty benchmark -> empty queue
    )
    top = best.orderBy(F.desc("best.sim"), "vec_id").limit(25)
    wr = W.partitionBy(bounded_window_key(F.col("vec_id"))).orderBy(
        F.desc("best.sim"), "vec_id"
    )
    return top.select(
        F.row_number().over(wr).cast("bigint").alias("rank"),
        "vec_id",
        (-F.col("best.negid")).cast("bigint").alias("nearest_bench_id"),
        F.col("best.sim").alias("max_sim"),
    )


@query(
    "llmops_train_shuffle",
    oracle="""
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY md5(doc_id || ':42')) AS BIGINT) AS position,
           doc_id, md5(doc_id || ':42') AS shuffle_key
    FROM documents
    ORDER BY shuffle_key
    LIMIT 200
    """,
)
def llmops_train_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: every doc gets a
    seeded content-independent key (md5 of id + seed), training reads in
    key order. First 200 positions shown.

    At scale this is the one global sort a training pipeline actually
    needs, and it's a RANGE-partitioned sort on an incompressible uniform
    key — Spark's orderBy samples the key space and writes sorted runs
    per partition, which is exactly the sharded-shuffle layout the reader
    wants; the LIMIT here makes it a TakeOrdered top-k instead (no full
    sort materialized). The row_number window runs on 200 rows."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit("42"))).alias(
            "shuffle_key"
        ),
    )
    top = d.orderBy("shuffle_key").limit(200)
    # Rank window runs over exactly the 200 TakeOrdered survivors; the
    # bounded_window_key idiom keeps the plan visibly partitioned.
    wr = W.partitionBy(bounded_window_key(F.length("shuffle_key"))).orderBy("shuffle_key")
    return top.select(
        F.row_number().over(wr).cast("bigint").alias("position"),
        "doc_id",
        "shuffle_key",
    )


@query(
    "llmops_domain_mix",
    oracle=f"""
    WITH per AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ), tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM per)
    SELECT source, n_docs, n_tokens,
           ROUND(CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE), 6) AS token_share,
           ROUND(SQRT(CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE)), 6) AS sample_weight
    FROM per, tot
    """,
)
def llmops_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture accounting: per-source doc/token totals, corpus
    token share, and a temperature-smoothed sampling weight
    (√share — the τ=2 upweighting of small domains used when drawing a
    training mixture).

    Token totals stay exact bigints end-to-end; the single-row corpus
    total broadcasts back onto the per-source rows (no second scan). The
    share division goes double only at the very end, identically in both
    engines."""
    d = t(spark, sf_dir, "documents").select(
        "source", token_count_ws(F.col("text")).alias("tok")
    )
    per = d.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("tok").alias("n_tokens")
    )
    total = per.agg(F.sum("n_tokens").alias("_total"))
    share = F.col("n_tokens").cast("double") / F.col("_total").cast("double")
    return per.join(F.broadcast(total)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(share, 6).alias("token_share"),
        F.round(F.sqrt(share), 6).alias("sample_weight"),
    )


@query(
    "llmops_sequence_pack",
    oracle=f"""
    WITH d AS (
      SELECT source, doc_id, GREATEST(len({_TOKS}), 1) AS tok FROM documents
    ), c AS (
      SELECT *, COALESCE(SUM(tok) OVER (
        PARTITION BY source ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
      FROM d
    )
    SELECT source, doc_id, CAST(tok AS BIGINT) AS n_tokens,
           CAST(cum_prev // 512 AS BIGINT) AS window_id,
           CAST(cum_prev % 512 AS BIGINT) AS start_offset,
           CAST((cum_prev + tok - 1) // 512 - cum_prev // 512 + 1 AS BIGINT) AS n_windows
    FROM c
    """,
)
def llmops_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, concatenation-style: per source, documents are
    concatenated in doc_id order and cut into fixed 512-token context
    windows; each doc reports its window id, start offset, and how many
    windows it spans (GPT-style packing — no padding waste, docs may
    straddle window boundaries).

    One window spec per source (prefix-sum of exact bigint token counts);
    the assignment is pure integer arithmetic on the running total, so
    the whole layout derives from ONE shuffle by source — at corpus scale
    this is the cheapest packing there is, and the per-source sort is the
    write order a sharded training reader needs anyway."""
    d = t(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.greatest(token_count_ws(F.col("text")), F.lit(1)).alias("tok"),
    )
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    c = d.withColumn("cum_prev", F.coalesce(F.sum("tok").over(w), F.lit(0)))
    return c.select(
        "source",
        "doc_id",
        F.col("tok").cast("bigint").alias("n_tokens"),
        F.expr("cum_prev DIV 512").cast("bigint").alias("window_id"),
        F.pmod(F.col("cum_prev"), F.lit(512)).cast("bigint").alias("start_offset"),
        (
            F.expr("(cum_prev + tok - 1) DIV 512")
            - F.expr("cum_prev DIV 512")
            + F.lit(1)
        )
        .cast("bigint")
        .alias("n_windows"),
    )


@query(
    "llmops_multimodal_frames",
    oracle="""
    WITH d AS (SELECT doc_id, text, length(text) AS ln FROM documents)
    SELECT doc_id,
           CAST(k AS BIGINT) AS frame_idx,
           CAST(LEAST(64, ln - k * 64) AS BIGINT) AS frame_len,
           md5(substring(text, k * 64 + 1, 64)) AS frame_md5
    FROM d, UNNEST(range(0, GREATEST(CAST(CEIL(ln / 64.0) AS BIGINT), 1))) AS t(k)
    """,
)
def llmops_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over media payloads (video frame-extraction shape):
    one row per fixed-size frame slice with its digest, emitted by the
    Arrow-batched ``sample_frames`` UDTF over synthesized binary blobs.

    The oracle replays the byte slicing on the text itself — the corpus
    is pure ASCII, so char positions ≡ byte positions and md5(substring)
    matches the blob-slice digest exactly. Per-row multiplicative output;
    no shuffle anywhere in the plan."""
    from batch_public_spark.operators.multimodal import sample_frames

    blobs = synthesize_blobs(t(spark, sf_dir, "documents"))
    return sample_frames(blobs, frame_bytes=64)


@query(
    "llmops_stratified_sample",
    oracle="""
    SELECT source, doc_id, CAST(rk AS BIGINT) AS sample_rank
    FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(doc_id || ':s7')) AS rk
      FROM documents
    ) WHERE rk <= 10
    """,
)
def llmops_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: a fixed quota per stratum
    (source), selected by seeded hash order — the reproducible
    eval-holdout / ablation sampler (unlike ``TABLESAMPLE``/`sample()`,
    reruns and backfills pick identical rows).

    One shuffle by stratum; the per-stratum rank is a windowed top-k the
    optimizer handles with a running-window filter (no full sort of each
    stratum materialized beyond the window's ordering)."""
    d = t(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit("s7"))).alias("_k"),
    )
    w = W.partitionBy("source").orderBy("_k")
    return (
        d.withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("sample_rank") <= 10)
        .select("source", "doc_id", "sample_rank")
    )


@query(
    "llmops_repetition_filter",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, source,
             len({_GRAMS4.replace("list_distinct(", "(")}) AS n_total,
             len({_GRAMS4}) AS n_distinct
      FROM documents
    )
    SELECT doc_id, source,
           ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_total, 6) AS dup_ratio,
           (1.0 - CAST(n_distinct AS DOUBLE) / n_total) > 0.2 AS repetitive
    FROM g
    """,
)
def llmops_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition score (Gopher-style quality rule): the
    fraction of word 4-grams that are repeats of an earlier 4-gram in the
    same document; docs above 20% flag as repetitive boilerplate.

    Pure per-row JVM array expressions riding the scan — no UDF, no
    shuffle; at corpus scale this filter is free alongside any other
    per-doc stage. The ratio divides two exact ints per row (no
    accumulation), so both engines agree bit-for-bit."""
    from batch_public_spark.operators.semantic import word_shingles_all

    d = t(spark, sf_dir, "documents")
    grams = word_shingles_all(F.col("text"), 4)
    n_total = F.size(grams)
    n_distinct = F.size(F.array_distinct(grams))
    dup = F.lit(1.0) - n_distinct.cast("double") / n_total
    return d.select(
        "doc_id",
        "source",
        F.round(dup, 6).alias("dup_ratio"),
        (dup > 0.2).alias("repetitive"),
    )


@query(
    "llmops_tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS_NORM}) AS term
      FROM documents WHERE doc_id < 100
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), df AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ), scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             ROUND(tf.tf * LN(100.0 / df.df), 6) AS tfidf
      FROM tf JOIN df USING (term)
    )
    SELECT doc_id, term, tf, df, tfidf FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
      FROM scored
    ) WHERE rk <= 3
    """,
)
def llmops_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF text analysis: top-3 most characteristic terms per document
    (tf · ln(N/df) over a bounded 100-doc corpus; SURVEY §7 phase 6 names
    TF-IDF as the text-analysis spine).

    Plan: one explode → (doc, term) count, the document-frequency side is
    an aggregate OF that aggregate (no second scan), and df (≤ vocab
    size) broadcasts back. tf/df stay exact bigints; only the final
    score takes the log, rounded. At corpus scale vocab ≪ corpus so the
    broadcast holds; rank is a bounded per-doc window."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    from batch_public_spark.operators.textops import tokens as _tokens
    from batch_public_spark.operators.textops import normalized_text as _norm

    tok = d.select("doc_id", F.explode(_tokens(_norm(F.col("text")))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(df_), "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(F.col("tf") * F.log(F.lit(100.0) / F.col("df")), 6).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf")
    )


@query(
    "llmops_boilerplate_sentence_filter",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, {_TOKS_NORM} AS tk FROM documents
    ), inst AS (
      SELECT doc_id, source,
             md5(array_to_string(tk[i:i+2], ' ')) AS sh
      FROM toks,
           UNNEST(range(1, greatest(len(tk) - 2, 1) + 1)) AS u(i)
    ), df AS (
      SELECT sh, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_with
      FROM inst GROUP BY sh
    )
    SELECT i.source,
           CAST(count(DISTINCT i.doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS total_segments,
           CAST(sum(CASE WHEN d.n_docs_with >= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS boilerplate_segments,
           round(CAST(sum(CASE WHEN d.n_docs_with >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS boilerplate_ratio
    FROM inst i JOIN df d ON d.sh = i.sh
    GROUP BY i.source
    """,
)
def llmops_boilerplate_sentence_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate segment detection: a text segment whose
    normalized form appears in ≥3 DISTINCT documents is boilerplate
    (cookie banners, nav text, license footers — the line-level junk that
    survives document-level dedup because every page differs elsewhere);
    reports per-source instance counts and the boilerplate ratio — the
    input to a CCNet-style line-filtering pass. The segment unit is the
    overlapping word 3-gram (position multiset), not the punctuation
    sentence: this fixture has no sentence punctuation, so every doc was
    one unique "sentence" and the ratio was identically zero (r7
    vacuous-fixture audit); on punctuated corpora the same plan runs with
    a sentence splitter in place of the shingle generator.

    Spark-first: segments explode once and are immediately reduced to an
    8-byte xxhash64 — everything downstream ships hashes, never segment text
    (at 100 TB the segment table is the biggest intermediate in the
    pipeline; hashing first keeps the shuffle narrow). The instance table
    is shuffled ONCE: one hash aggregation collapses it to
    (sh, source, doc_id) instance counts (map-side combinable — the
    in-document repetitions fold before the exchange), a second collapses
    to per-(sh, source) rows, and the cross-source document frequency is
    a SUM window partitioned by sh over that already-tiny table — no
    join of the doc-frequency side back onto the full instance table
    (the r7 shape shuffled the big explode output twice and joined it;
    one exchange + a bounded window replaces both). A document carries
    exactly one source, so summing per-source distinct-doc counts over
    sh IS count(DISTINCT doc_id) per sh."""
    # spread(): the positional-shingle explode + xxhash64 is per-row text
    # compute over the 1-task fixture scan (guide §2.5); no-op at scale.
    d = spread(t(spark, sf_dir, "documents").select("doc_id", "source", "text"))
    inst = d.select(
        "doc_id",
        "source",
        F.explode(word_shingles_all(F.col("text"), 3)).alias("s"),
    ).select(
        "doc_id",
        "source",
        # The segment key only needs to be injective-in-practice (it is a
        # grouping key; no hash value is ever reported), so the 8-byte
        # JVM xxhash64 beats md5's 32-char hex both in hash CPU and in
        # shuffle width — the oracle groups by md5, an equivalent
        # partition of the same instances.
        F.xxhash64(F.col("s")).alias("sh"),
    )
    per_doc = inst.groupBy("sh", "source", "doc_id").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    per_src = per_doc.groupBy("sh", "source").agg(
        F.count("*").cast("bigint").alias("docs_in_source"),
        F.sum("cnt").cast("bigint").alias("inst_cnt"),
    )
    flagged = per_src.withColumn(
        "n_docs_with",
        F.sum("docs_in_source").over(W.partitionBy("sh")),
    )
    boiler_cnt = F.when(F.col("n_docs_with") >= 3, F.col("inst_cnt")).otherwise(
        F.lit(0)
    )
    # n_docs counts documents with ≥1 segment (docs shorter than the
    # shingle width vanish at the explode, same as the r7 join form) —
    # computed as a map-side flag sum on the raw table, not by re-reducing
    # the exploded instance subtree a second time.
    n_docs = d.groupBy("source").agg(
        F.sum(
            F.when(F.size(word_shingles_all(F.col("text"), 3)) > 0, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_docs")
    )
    agg = flagged.groupBy("source").agg(
        F.sum("inst_cnt").cast("bigint").alias("total_segments"),
        F.sum(boiler_cnt).cast("bigint").alias("boilerplate_segments"),
        F.round(
            F.sum(boiler_cnt).cast("double") / F.sum("inst_cnt"), 6
        ).alias("boilerplate_ratio"),
    )
    return n_docs.join(agg, "source").select(
        "source", "n_docs", "total_segments", "boilerplate_segments",
        "boilerplate_ratio",
    )


@query(
    "llmops_dedup_cascade_e2e",
    oracle=f"""
    WITH base AS (SELECT doc_id, text FROM documents),
    n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
    s1 AS (  -- wave 1: exact (normalized md5, min id survives)
      SELECT MIN(doc_id) AS doc_id FROM base GROUP BY md5({_NORM})
    ),
    n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s1),
    s2 AS (  -- wave 2: first-8-token prefix groups among exact survivors
      SELECT MIN(b.doc_id) AS doc_id
      FROM base b JOIN s1 ON s1.doc_id = b.doc_id
      GROUP BY array_to_string(
        (list_filter(string_split_regex(trim(lower(b.text)), '\\s+'),
                     x -> length(x) > 0))[1:8], ' ')
    ),
    n2 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s2),
    sh AS (  -- wave 3: exact 3-gram Jaccard on the bounded anchor subset
      SELECT b.doc_id,
             list_distinct(list_transform(
               range(1, greatest(len({_TOKS_NORM}) - 2, 1) + 1),
               i -> array_to_string(({_TOKS_NORM})[i:i+2], ' '))) AS sh
      FROM base b JOIN s2 ON s2.doc_id = b.doc_id
      WHERE b.doc_id < 150
    ),
    removed3 AS (
      SELECT DISTINCT b.doc_id
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh)) * 2
            >= len(list_distinct(list_concat(a.sh, b.sh)))
    ),
    n3 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM removed3)
    SELECT 'exact' AS stage, n0.n - n1.n AS n_removed, n1.n AS n_remaining
    FROM n0, n1
    UNION ALL
    SELECT 'prefix', n1.n - n2.n, n2.n FROM n1, n2
    UNION ALL
    SELECT 'neardup', n3.n, n2.n - n3.n FROM n2, n3
    """,
)
def llmops_dedup_cascade_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup cascade end-to-end: exact-hash → prefix-group → exact
    3-gram-Jaccard near-dup, each wave consuming the previous wave's
    survivors, reported as a three-row funnel (stage, removed,
    remaining) — the single table a 100 TB dedup run publishes to prove
    what each wave bought.

    Wave economics (why cascade at all): exact dedup is one narrow
    hash shuffle over everything; prefix grouping is one aggregation
    over survivors; the O(pairs) Jaccard verify runs LAST, only on what
    the cheap waves could not kill (here additionally bounded by the
    documented ``doc_id < 150`` oracle anchor — at scale the pair source
    is the MinHash band join, llmops_minhash_candidates). Near-dup
    removal is greedy by id (the larger doc_id of every qualifying pair
    drops; no transitive closure — that is llmops_dedup_cc's job).
    Min-id survivor policy everywhere, matching operators.dedup.

    The funnel assembles LAZILY: each wave's count is a one-row
    aggregate, the four are cross-joined (all broadcastable singletons)
    and exploded into the three stage rows — one plan, one action, no
    driver-side count() round-trips."""
    base = t(spark, sf_dir, "documents").select("doc_id", "text")

    # Each wave feeds BOTH the next wave and its own funnel count; cut
    # each survivor set once (lazy — materialized by the first consumer's
    # job) so dedup_exact / the prefix agg run once, not once per consumer.
    s1 = dedup_exact(base).select("doc_id").localCheckpoint(eager=False)

    # Same tokenization/normalization helpers as the standalone wave
    # queries (operators.textops) — the cascade's keys must never drift
    # from dedup_exact's and prefix_dedup's.
    toks_lower = tokens(F.lower(F.col("text")))
    s2 = (
        base.join(s1, "doc_id")
        .groupBy(F.array_join(F.slice(toks_lower, 1, 8), " ").alias("prefix"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .localCheckpoint(eager=False)
    )

    toks_norm = tokens(normalized_text(F.col("text")))
    sh = (
        base.join(s2, "doc_id")
        .filter(F.col("doc_id") < 150)
        .select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.size(toks_norm) - 2, F.lit(1))),
                    lambda i: F.array_join(F.slice(toks_norm, i, 3), " "),
                )
            ).alias("sh"),
        )
    ).localCheckpoint(eager=False)  # self-joined below: two consumers
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_distinct(F.concat(F.col("a.sh"), F.col("b.sh"))))
    # Explicit broadcast: the anchor set is ≤150 rows but sits behind two
    # joins, so Catalyst's size estimate balloons and it would otherwise
    # plan a CartesianProduct (plans.lint flags those).
    removed3 = (
        a.join(F.broadcast(b), F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(inter * 2 >= union)
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
    )

    counts = (
        base.agg(F.count("*").alias("n0"))
        .crossJoin(s1.agg(F.count("*").alias("n1")))
        .crossJoin(s2.agg(F.count("*").alias("n2")))
        .crossJoin(removed3.agg(F.count("*").alias("n3")))
    )

    def stage(name, removed, remaining):
        return F.struct(
            F.lit(name).alias("stage"),
            removed.cast("bigint").alias("n_removed"),
            remaining.cast("bigint").alias("n_remaining"),
        )

    n0, n1, n2, n3 = (F.col(c) for c in ("n0", "n1", "n2", "n3"))
    return counts.select(
        F.explode(
            F.array(
                stage("exact", n0 - n1, n1),
                stage("prefix", n1 - n2, n2),
                stage("neardup", n3, n2 - n3),
            )
        ).alias("r")
    ).select("r.*")


@query(
    "llmops_corpus_build_e2e",
    oracle=f"""
    WITH base AS (SELECT doc_id, text, lang, source FROM documents),
    n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
    s1 AS (SELECT MIN(doc_id) AS doc_id FROM base GROUP BY md5({_NORM})),
    n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s1),
    s2 AS (
      SELECT MIN(b.doc_id) AS doc_id
      FROM base b JOIN s1 ON s1.doc_id = b.doc_id
      GROUP BY array_to_string(
        (list_filter(string_split_regex(trim(lower(b.text)), '\\s+'),
                     x -> length(x) > 0))[1:8], ' ')
    ),
    n2 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s2),
    sh AS (
      SELECT b.doc_id,
             list_distinct(list_transform(
               range(1, greatest(len({_TOKS_NORM}) - 2, 1) + 1),
               i -> array_to_string(({_TOKS_NORM})[i:i+2], ' '))) AS sh
      FROM base b JOIN s2 ON s2.doc_id = b.doc_id
      WHERE b.doc_id < 150
    ),
    removed3 AS (
      SELECT DISTINCT b.doc_id
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh)) * 2
            >= len(list_distinct(list_concat(a.sh, b.sh)))
    ),
    n3 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM removed3),
    s3 AS (
      SELECT doc_id FROM s2
      WHERE doc_id NOT IN (SELECT doc_id FROM removed3)
    ),
    qm AS (
      SELECT m.doc_id,
             CAST(ROUND(least(n_tok / 50.0, 1.0) * 0.3
                   + greatest(0.0, 1.0 - pr * 4) * 0.3
                   + least(swr * 5, 1.0) * 0.2
                   + (CASE WHEN mwl >= 2.0 AND mwl <= 12.0
                           THEN 1.0 ELSE 0.3 END) * 0.2, 6)
               AS DECIMAL(10,6)) AS quality
      FROM ({_QUALITY_SQL}) m JOIN s3 ON s3.doc_id = m.doc_id
    ),
    s4 AS (SELECT doc_id, quality FROM qm WHERE quality >= 0.5),
    n4 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s4),
    qavg AS (
      SELECT round(CAST(sum(quality) AS DOUBLE) / count(*), 6) AS v FROM s4
    ),
    g AS (SELECT doc_id, unnest({_GRAMS4}) AS gram FROM documents),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
    contaminated AS (
      SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gram)
      WHERE g.doc_id % 97 <> 0
    ),
    s5 AS (
      SELECT s4.doc_id FROM s4
      WHERE s4.doc_id % 97 <> 0
        AND s4.doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    n5 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s5),
    ps AS (
      SELECT b.source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(greatest(len({_TOKS}), 1)) AS BIGINT) AS n_tokens
      FROM base b JOIN s5 ON s5.doc_id = b.doc_id GROUP BY b.source
    ),
    tot AS (
      SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             CAST(sum(n_docs) AS BIGINT) AS total_docs,
             CAST(sum((n_tokens + 511) // 512) AS BIGINT) AS total_windows
      FROM ps
    ),
    ent AS (
      SELECT round(CAST(sum(CAST(round(
               (CAST(n_tokens AS DOUBLE) / t.total_tokens)
               * ln(t.total_tokens / CAST(n_tokens AS DOUBLE)), 8)
             AS DECIMAL(18,8))) AS DOUBLE), 6) AS v
      FROM ps CROSS JOIN tot t
    )
    SELECT stage, n_removed, n_remaining, metric FROM (
      SELECT 'exact' AS stage, n0.n - n1.n AS n_removed,
             n1.n AS n_remaining,
             round(CAST(n0.n - n1.n AS DOUBLE) / NULLIF(n0.n, 0), 6) AS metric
      FROM n0, n1
      UNION ALL
      SELECT 'prefix', n1.n - n2.n, n2.n,
             round(CAST(n1.n - n2.n AS DOUBLE) / NULLIF(n1.n, 0), 6)
      FROM n1, n2
      UNION ALL
      SELECT 'neardup', n3.n, n2.n - n3.n,
             round(CAST(n3.n AS DOUBLE) / NULLIF(n2.n, 0), 6)
      FROM n2, n3
      UNION ALL
      SELECT 'quality_gate', (n2.n - n3.n) - n4.n, n4.n, qavg.v
      FROM n2, n3, n4, qavg
      UNION ALL
      SELECT 'decontaminate', n4.n - n5.n, n5.n,
             round(CAST(n4.n - n5.n AS DOUBLE) / NULLIF(n4.n, 0), 6)
      FROM n4, n5
      UNION ALL
      SELECT 'mixture', 0, n5.n, ent.v FROM n5, ent
      UNION ALL
      SELECT 'pack', 0, t.total_windows,
             round(CAST(t.total_tokens AS DOUBLE)
                   / NULLIF(512 * t.total_windows, 0), 6)
      FROM tot t
      UNION ALL
      SELECT 'card', 0, n5.n,
             round(CAST(t.total_tokens AS DOUBLE) / NULLIF(t.total_docs, 0), 6)
      FROM n5, tot t
    )
    """,
)
def llmops_corpus_build_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE CORPUS BUILD, end-to-end (verdict-r12 item #5): the production
    composition of the individually-verified stages — dedup cascade
    (exact → prefix → near-dup, byte-identical to
    llmops_dedup_cascade_e2e) → quality gate (llmops_quality_filter's
    score ≥ 0.5) → benchmark decontamination (llmops_decontaminate's
    4-gram overlap; benchmark stand-ins themselves also leave the
    training set) → mixture accounting (llmops_domain_mix's token
    shares, reported as mixture entropy) → sequence packing
    (llmops_sequence_pack's 512-token concatenation windows) → dataset
    card. ONE lazily-assembled plan, one action: each stage's survivor
    set localCheckpoints (eager=False) and feeds both the next stage and
    its own one-row funnel count; the 8-row funnel (stage, n_removed,
    n_remaining, metric) is what a training-data team publishes with a
    release. Row semantics: dedup/gate/decon rows carry removal counts
    with the removal rate (or survivor mean quality) as metric; the
    mixture row keeps n and reports token-share entropy (nats); the
    pack row's n_remaining is the WINDOW count (docs became windows —
    the funnel's unit change is the point) with fill utilization as
    metric; the card row reports mean tokens/doc.

    Stage keys, thresholds, and bounds are shared VERBATIM with the
    standalone queries (same textops helpers, same doc_id < 150 near-dup
    anchor, same %97 benchmark stand-in, same greatest(tok,1) packing
    floor), so tests/test_r13_invariants.py can pin reconciliation: the
    first three funnel rows equal llmops_dedup_cascade_e2e's output
    exactly, the funnel telescopes (each row's n_removed + n_remaining =
    the previous row's n_remaining), and the gate keeps a subset of the
    standalone filter's keeps.

    Determinism: counts are exact bigints; quality sums through
    DECIMAL(10,6); entropy terms are share·ln(1/share) (never −0.0)
    rounded to 8 and summed through DECIMAL(18,8); every rate divides
    exact integers once, NULL-guarded for the empty corpus. Scale: the
    near-dup pair stage runs on the documented literal-bounded anchor
    (at 100 TB the pair source is the MinHash band join); everything
    else is hash aggregations and broadcast semi-joins — no stage
    shuffles text except the two dedup key aggregations."""
    base = t(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")

    s1 = dedup_exact(base).select("doc_id").localCheckpoint(eager=False)
    toks_lower = tokens(F.lower(F.col("text")))
    s2 = (
        base.join(s1, "doc_id")
        .groupBy(F.array_join(F.slice(toks_lower, 1, 8), " ").alias("prefix"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .localCheckpoint(eager=False)
    )
    toks_norm = tokens(normalized_text(F.col("text")))
    sh = (
        base.join(s2, "doc_id")
        .filter(F.col("doc_id") < 150)
        .select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.size(toks_norm) - 2, F.lit(1))),
                    lambda i: F.array_join(F.slice(toks_norm, i, 3), " "),
                )
            ).alias("sh"),
        )
    ).localCheckpoint(eager=False)
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_distinct(F.concat(F.col("a.sh"), F.col("b.sh"))))
    removed3 = (
        a.join(F.broadcast(b), F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(inter * 2 >= union)
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
        .localCheckpoint(eager=False)  # counted AND anti-joined below
    )
    s3 = s2.join(removed3, "doc_id", "left_anti")

    q6 = F.round(quality_score(F.col("text")), 6).cast("decimal(10,6)")
    s4 = (
        base.join(s3, "doc_id")
        .select(
            "doc_id",
            "source",
            q6.alias("quality"),
            F.greatest(token_count_ws(F.col("text")), F.lit(1)).alias("tok"),
        )
        .filter(F.col("quality") >= 0.5)
        .localCheckpoint(eager=False)
    )

    # Contamination shingles only what can matter: the benchmark side is
    # the %97 stand-ins alone, and the probe side is the GATE SURVIVORS
    # (docs already dead upstream can't re-enter, and s5 anti-joins s4
    # anyway — result-identical to probing the full corpus, which is what
    # the oracle spells; the standalone llmops_decontaminate keeps the
    # full-corpus shape because flagging everything IS its contract).
    bench = (
        base.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode(word_shingles(F.col("text"), 4)).alias("gram"))
        .distinct()
    )
    contaminated = (
        base.join(s4.select("doc_id"), "doc_id")
        .filter(F.col("doc_id") % 97 != 0)
        .select("doc_id", F.explode(word_shingles(F.col("text"), 4)).alias("gram"))
        .join(F.broadcast(bench), "gram")
        .select("doc_id")
        .distinct()
    )
    s5 = (
        s4.filter(F.col("doc_id") % 97 != 0)
        .join(contaminated, "doc_id", "left_anti")
        .localCheckpoint(eager=False)
    )

    ps = (
        s5.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("tok").cast("bigint").alias("n_tokens"),
        )
        .localCheckpoint(eager=False)  # feeds tot AND the entropy term
    )
    tot = ps.agg(
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("n_docs").cast("bigint").alias("total_docs"),
        F.sum(F.expr("(n_tokens + 511) DIV 512")).cast("bigint").alias("total_windows"),
    ).localCheckpoint(eager=False)  # entropy, pack row, card row
    share = F.col("n_tokens").cast("double") / F.col("total_tokens")
    ent = (
        ps.crossJoin(F.broadcast(tot))
        .select(
            F.round(share * F.log(F.col("total_tokens") / F.col("n_tokens").cast("double")), 8)
            .cast("decimal(18,8)")
            .alias("term")
        )
        .agg(F.round(F.sum("term").cast("double"), 6).alias("entropy"))
    )
    # One agg pass carries BOTH the gate count and the survivor mean;
    # n5 rides tot (Σ per-source n_docs) — two fewer one-row jobs in the
    # funnel assembly (the composition premium over the standalone sum
    # is job scheduling, not data).
    qn4 = s4.agg(
        F.round(F.sum("quality").cast("double") / F.count("*"), 6).alias("qavg"),
        F.count("*").alias("n4"),
    )

    counts = (
        base.agg(F.count("*").alias("n0"))
        .crossJoin(s1.agg(F.count("*").alias("n1")))
        .crossJoin(s2.agg(F.count("*").alias("n2")))
        .crossJoin(removed3.agg(F.count("*").alias("n3")))
        .crossJoin(F.broadcast(qn4))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ent))
        .select("*", F.coalesce(F.col("total_docs"), F.lit(0)).alias("n5"))
    )

    def stage(name, removed, remaining, metric):
        return F.struct(
            F.lit(name).alias("stage"),
            removed.cast("bigint").alias("n_removed"),
            remaining.cast("bigint").alias("n_remaining"),
            metric.cast("double").alias("metric"),
        )

    n0, n1, n2, n3, n4, n5 = (F.col(c) for c in ("n0", "n1", "n2", "n3", "n4", "n5"))
    rate = lambda num, den: F.round(F.try_divide(num.cast("double"), den), 6)  # noqa: E731
    zero = F.lit(0)
    return counts.select(
        F.explode(
            F.array(
                stage("exact", n0 - n1, n1, rate(n0 - n1, n0)),
                stage("prefix", n1 - n2, n2, rate(n1 - n2, n1)),
                stage("neardup", n3, n2 - n3, rate(n3, n2)),
                stage("quality_gate", (n2 - n3) - n4, n4, F.col("qavg")),
                stage("decontaminate", n4 - n5, n5, rate(n4 - n5, n4)),
                stage("mixture", zero, n5, F.col("entropy")),
                stage(
                    "pack",
                    zero,
                    F.col("total_windows"),
                    F.round(
                        F.try_divide(
                            F.col("total_tokens").cast("double"),
                            F.lit(512) * F.col("total_windows"),
                        ),
                        6,
                    ),
                ),
                stage(
                    "card",
                    zero,
                    n5,
                    F.round(
                        F.try_divide(
                            F.col("total_tokens").cast("double"), F.col("total_docs")
                        ),
                        6,
                    ),
                ),
            )
        ).alias("r")
    ).select("r.*")


@query(
    "llmops_dup_cluster_size_dist",
    oracle="""
    WITH clusters AS (
      SELECT md5(substr(trim(lower(text)), 1, 40)) AS ck,
             CAST(count(*) AS BIGINT) AS sz
      FROM documents GROUP BY 1
    ), tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
    SELECT sz AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sz * count(*) AS BIGINT) AS n_docs,
           round(sz * count(*) * 1.0 / max(tot.n_docs), 6) AS corpus_share
    FROM clusters CROSS JOIN tot
    GROUP BY sz
    """,
)
def llmops_dup_cluster_size_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-cluster size distribution: group the corpus by the
    40-char normalized-prefix blocking key (the survivorship/prefix-dedup
    blocking) and histogram the cluster sizes — the single chart a dedup
    run publishes first, because the size distribution decides the
    strategy (a long tail of pairs → greedy pair dedup suffices; a few
    giant clusters → connected components + survivorship rules).

    Spark-first: two stacked aggregations (doc→cluster, cluster→size
    histogram), both map-side combined; the corpus total broadcasts onto
    the ~|distinct sizes| result rows. Shuffles carry 16-byte keys then
    single integers — never text."""
    d = t(spark, sf_dir, "documents")
    clusters = (
        d.select(
            F.md5(F.substring(F.trim(F.lower(F.col("text"))), 1, 40)).alias("ck")
        )
        .groupBy("ck")
        .agg(F.count("*").cast("bigint").alias("sz"))
    )
    tot = d.agg(F.count("*").cast("bigint").alias("n_docs_total"))
    return (
        clusters.groupBy("sz")
        .agg(F.count("*").cast("bigint").alias("n_clusters"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("sz").alias("cluster_size"),
            "n_clusters",
            (F.col("sz") * F.col("n_clusters")).cast("bigint").alias("n_docs"),
            F.round(
                F.col("sz") * F.col("n_clusters") / F.col("n_docs_total").cast("double"),
                6,
            ).alias("corpus_share"),
        )
    )


@query(
    "llmops_pair_sim_histogram",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len({_TOKS_NORM}) - 2, 1) + 1),
               i -> array_to_string(({_TOKS_NORM})[i:i+2], ' ')
             )) AS sh
      FROM documents WHERE doc_id < 150
    ), pairs AS (
      SELECT len(list_intersect(a.sh, b.sh)) AS inter,
             len(list_distinct(list_concat(a.sh, b.sh))) AS un
      FROM d a JOIN d b ON a.doc_id < b.doc_id
    )
    SELECT CAST((10 * inter) // un AS INT) AS sim_bucket,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(count(*) * 1.0 / sum(count(*)) OVER (), 6) AS share
    FROM pairs WHERE un > 0
    GROUP BY 1
    """,
)
def llmops_pair_sim_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-threshold tuning curve: the distribution of exact word-3-gram
    Jaccard over all document pairs, bucketed into tenths — the histogram
    a curation team reads before picking a near-dup threshold ("0.5 kills
    how many pairs? 0.3?"). This is the ground-truth companion to the
    MinHash/SimHash estimator-accuracy anchors: they validate the sketch
    against exact Jaccard; this validates the THRESHOLD against the pair
    volume it implies.

    The bucket index is the INTEGER division (10·|∩|) div |∪| — never
    floor(10·inter/union) in floating point, whose boundary cases (10·inter
    an exact multiple of union) depend on the division's rounding. Bounded
    exact-pair matrix (doc_id < 150, same bound as llmops_dedup_cc); at
    100 TB the same histogram runs over the banded LSH candidate pairs
    instead of the full matrix — the shape (pairs → integer bucket → one
    aggregation) is unchanged."""
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id", word_shingles(F.col("text"), 3).alias("sh"))
    )
    # spread() on the left (stream) side: the CartesianProduct runs
    # left-parts × right-parts tasks, and two 1-task inputs serialize the
    # ~11k set-intersections onto one task (guide §2.5).
    a = spread(d).select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = d.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint").alias("inter"),
            F.size(F.array_union("sh_a", "sh_b")).cast("bigint").alias("un"),
        )
        .filter(F.col("un") > 0)
    )
    hist = pairs.groupBy(
        F.expr("div(10 * inter, un)").cast("int").alias("sim_bucket")
    ).agg(F.count("*").cast("bigint").alias("n_pairs"))
    tot = hist.agg(F.sum("n_pairs").cast("bigint").alias("t"))
    return hist.crossJoin(F.broadcast(tot)).select(
        "sim_bucket",
        "n_pairs",
        F.round(F.col("n_pairs") / F.col("t").cast("double"), 6).alias("share"),
    )


_SH3 = (
    "list_distinct(list_transform("
    f"range(1, greatest(len({_TOKS_NORM}) - 2, 1) + 1), "
    f"i -> array_to_string(({_TOKS_NORM})[i:i+2], ' ')))"
)


@query(
    "llmops_containment_neardup",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_SH3} AS sh FROM documents
    ), inst AS (
      SELECT doc_id, unnest(sh) AS s FROM d
    ), rare AS (
      SELECT s FROM inst GROUP BY s
      HAVING CAST(count(*) AS BIGINT) <= 50
    ), ri AS (
      SELECT i.doc_id, i.s FROM inst i JOIN rare r ON r.s = i.s
    ), sizes AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM ri GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(count(*) AS BIGINT) AS ix
      FROM ri a JOIN ri b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.id_a, i.id_b, i.ix,
           round(i.ix * 1.0 / sa.sz, 6) AS cont_a,
           round(i.ix * 1.0 / sb.sz, 6) AS cont_b
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE i.ix * 2 >= least(sa.sz, sb.sz)
    """,
)
def llmops_containment_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup detection by rare-shingle containment
    (|A∩B| / |A|): Jaccard misses subset duplication — a short doc quoted
    wholesale inside a long one scores J ≈ |A|/|B| ≈ 0 but containment
    1.0 — and containment is the standard quote/inclusion dedup measure.
    Emits every pair whose smaller side is ≥ half contained.

    Spark-first, and EXACT without all-pairs: candidates come from a
    self-equi-join on shared shingles (a pair with zero shared shingles
    has containment 0 and can never pass a positive threshold, so the
    shingle join finds every qualifying pair by construction — this is
    the at-scale shape, not a fixture shortcut). Shingles with document
    frequency > 50 are dropped in BOTH engines first — the hot-bucket cap
    that keeps a boilerplate 3-gram from quadratic pair blowup at 100 TB
    (same bound class as the MinHash bucket caps, semantic.py); the
    measure is honestly "rare-shingle containment", mirrored exactly in
    the oracle. The intersection reduces per pair BEFORE sizes join back
    on (unhinted — sizes is per-doc, population-scale; AQE broadcasts it
    only when actually small), so the shuffle carries (id_a, id_b, count)
    only."""
    d = (
        # spread(): the shingle explode is per-row text compute over the
        # single-row-group fixture scan (1 task) — width must follow
        # compute, not bytes (guide §2.5); no-op on a multi-file corpus.
        spread(t(spark, sf_dir, "documents").select("doc_id", "text"))
        .select("doc_id", F.explode(word_shingles(F.col("text"), 3)).alias("s"))
        # two consumers (df aggregation + the rare-filtered projection):
        # cut the explode once, lazily (the graph.py discipline)
        .localCheckpoint(eager=False)
    )
    rare = d.groupBy("s").agg(F.count("*").cast("bigint").alias("df")).filter(
        F.col("df") <= 50
    )
    # rare is a bounded shingle-vocabulary table → broadcast the filter so
    # the instance table never shuffles for it; ri then fans into THREE
    # consumers (sizes + both self-join roles) → checkpoint it too.
    ri = d.join(F.broadcast(rare.select("s")), "s").localCheckpoint(eager=False)
    sizes = ri.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("sz"))
    a = ri.select(F.col("doc_id").alias("id_a"), "s")
    b = ri.select(F.col("doc_id").alias("id_b"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("bigint").alias("ix"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        # sizes is per-doc (population-scale) — no broadcast hint; the
        # candidate-pair side is already reduced to (id_a, id_b, ix), so
        # AQE broadcasts whichever side is actually small at runtime
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.col("ix") * 2 >= F.least("sz_a", "sz_b"))
        .select(
            "id_a",
            "id_b",
            "ix",
            F.round(F.col("ix") * 1.0 / F.col("sz_a"), 6).alias("cont_a"),
            F.round(F.col("ix") * 1.0 / F.col("sz_b"), 6).alias("cont_b"),
        )
    )


@query(
    "llmops_chunk_boundary_dup",
    oracle="""
    WITH chunks AS (
      SELECT doc_id, source, k,
             substr(text, CAST(k * 150 + 1 AS INT), 200) AS chunk
      FROM documents,
           UNNEST(range(0, CAST(greatest(ceil((length(text) - 50) / 150.0), 1) AS BIGINT))) AS u(k)
    ), keyed AS (
      SELECT doc_id, source, k,
             length(chunk) AS clen,
             substr(chunk, 1, 50) AS head50,
             CASE WHEN length(chunk) >= 50
                  THEN substr(chunk, length(chunk) - 49, 50) END AS tail50
      FROM chunks WHERE length(chunk) > 0
    ), dups AS (
      SELECT a.source,
             CASE WHEN a.doc_id = b.doc_id THEN 1 ELSE 0 END AS same_doc
      FROM keyed a JOIN keyed b
        ON a.tail50 = b.head50
       AND NOT (a.doc_id = b.doc_id AND a.k = b.k)
      WHERE a.tail50 IS NOT NULL
    )
    SELECT c.source,
           CAST(count(DISTINCT c.doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(coalesce(sum(0), 0)
                + (SELECT coalesce(CAST(sum(same_doc) AS BIGINT), 0)
                   FROM dups d WHERE d.source = c.source) AS BIGINT)
             AS intra_doc_boundary_dups,
           CAST((SELECT coalesce(CAST(sum(1 - same_doc) AS BIGINT), 0)
                 FROM dups d WHERE d.source = c.source) AS BIGINT)
             AS cross_doc_boundary_dups
    FROM keyed c GROUP BY c.source
    """,
)
def llmops_chunk_boundary_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlap-aware chunk dedup audit: documents are windowed into
    200-char chunks at stride 150 (the standard overlapping-chunk shape
    RAG/pretraining pipelines emit), and the query detects BOUNDARY
    duplicates — a chunk whose trailing 50 chars equal another chunk's
    leading 50. By construction every adjacent in-doc pair shares exactly
    the 50-char overlap, so the detector must recover n_chunks − 1 per
    multi-chunk doc (a built-in ground truth that makes the attestation
    non-vacuous), while cross-doc hits reveal genuine boilerplate spans that
    survive document-level dedup. Training on raw overlapping chunks
    double-feeds every overlap; this audit quantifies exactly how much.

    Spark-first: chunking is a sequence+explode inside the scan stage (no
    shuffle); the dup check is an equi-join on the 50-char boundary key
    — at 100 TB the key would be xxhash64(tail50) so the shuffle ships
    8-byte keys, exactly like the boilerplate filter; here the raw key
    keeps the oracle engine-identical. Self-pairs (same doc AND same
    chunk index) are excluded; A→B and B→A are counted as directed
    boundary events, matching the SQL."""
    d = t(spark, sf_dir, "documents")
    n_chunks = F.greatest(
        F.ceil((F.length("text") - F.lit(50)) / F.lit(150.0)), F.lit(1)
    ).cast("bigint")
    chunks = d.select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("k"),
        "text",
    ).select(
        "doc_id",
        "source",
        "k",
        F.expr("substring(text, CAST(k * 150 + 1 AS INT), 200)").alias("chunk"),
    )
    keyed = chunks.filter(F.length("chunk") > 0).select(
        "doc_id",
        "source",
        "k",
        F.substring("chunk", 1, 50).alias("head50"),
        F.when(
            F.length("chunk") >= 50,
            F.expr("substring(chunk, length(chunk) - 49, 50)"),
        ).alias("tail50"),
    )
    a = keyed.select(
        F.col("doc_id").alias("a_doc"),
        F.col("source").alias("a_src"),
        F.col("k").alias("a_k"),
        "tail50",
    ).filter(F.col("tail50").isNotNull())
    b = keyed.select(
        F.col("doc_id").alias("b_doc"),
        F.col("k").alias("b_k"),
        F.col("head50").alias("tail50"),
    )
    dups = (
        a.join(b, "tail50")
        .filter(~((F.col("a_doc") == F.col("b_doc")) & (F.col("a_k") == F.col("b_k"))))
        .select(
            F.col("a_src").alias("source"),
            F.when(F.col("a_doc") == F.col("b_doc"), 1).otherwise(0).alias("same_doc"),
        )
        .groupBy("source")
        .agg(
            F.sum("same_doc").cast("bigint").alias("intra_doc_boundary_dups"),
            F.sum(1 - F.col("same_doc")).cast("bigint").alias(
                "cross_doc_boundary_dups"
            ),
        )
    )
    base = keyed.groupBy("source").agg(
        F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_chunks"),
    )
    return base.join(dups, "source", "left").select(
        "source",
        "n_docs",
        "n_chunks",
        F.coalesce("intra_doc_boundary_dups", F.lit(0)).cast("bigint").alias(
            "intra_doc_boundary_dups"
        ),
        F.coalesce("cross_doc_boundary_dups", F.lit(0)).cast("bigint").alias(
            "cross_doc_boundary_dups"
        ),
    )


@query(
    "llmops_pq_codebook",
    oracle="""
    WITH base AS (
      SELECT vec_id, i - 1 AS i,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT) AS q
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
    ), dims AS (
      SELECT vec_id, CAST(i // 16 AS BIGINT) AS sub,
             CAST(i % 16 AS BIGINT) AS pos, q
      FROM base
    ), cw AS (
      SELECT vec_id AS cw_id, sub, pos, q AS qc FROM dims WHERE vec_id < 4
    ), dist AS (
      SELECT d.vec_id, d.sub, c.cw_id,
             CAST(sum((d.q - c.qc) * (d.q - c.qc)) AS BIGINT) AS dist
      FROM dims d JOIN cw c ON c.sub = d.sub AND c.pos = d.pos
      GROUP BY 1, 2, 3
    ), assign AS (
      SELECT vec_id, sub, cw_id, dist,
             row_number() OVER (PARTITION BY vec_id, sub
                                ORDER BY dist, cw_id) AS rk
      FROM dist
    )
    SELECT sub, cw_id,
           CAST(count(*) AS BIGINT) AS n_assigned,
           round(sum(dist) * 1.0 / (count(*) * 16)
                 / 1048576.0 / 1048576.0, 6) AS mse_per_dim
    FROM assign WHERE rk = 1
    GROUP BY sub, cw_id
    """,
)
def llmops_pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codebook assignment — the memory side of the
    ANN family: each 64-d vector splits into M=4 contiguous 16-d
    subvectors, each subvector snaps to its nearest of K=4 codewords
    (here: the subvectors of vec_id 0-3, a deterministic seed codebook;
    production runs Lloyd per subspace exactly like ann_ivf's
    ``lloyd_iters`` path), and the vector is stored as M codeword ids —
    64 floats become 4 bytes. Reports per-(subspace, codeword) occupancy
    and reconstruction MSE per dimension — the tuning dashboard for
    picking M/K.

    Spark-first and engine-exact: dimensions are quantized to BIGINT
    (floor(x·2²⁰) — the llmops_embedding_dim_stats discipline), so every
    distance is an exact integer sum, the argmin needs no float
    tolerance, and ties break on codeword id. The K×M codeword table is
    BROADCAST (it is the model — at 100 TB with K=256 it is still < 1 MB);
    distances reduce per (vector, subspace, codeword) in one hash agg, and
    the argmin is a row_number window over a high-cardinality
    (vector, subspace) key — no global sort anywhere. The only float is
    the final reported MSE."""
    e = t(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id", F.posexplode("embedding").alias("i", "x")
    ).select(
        "vec_id",
        (F.col("i") / F.lit(16)).cast("bigint").alias("sub"),
        F.pmod("i", F.lit(16)).cast("bigint").alias("pos"),
        F.floor(F.col("x").cast("double") * 1048576).cast("bigint").alias("q"),
    )
    cw = dims.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cw_id"), "sub", "pos", F.col("q").alias("qc")
    )
    dist = (
        dims.join(F.broadcast(cw), ["sub", "pos"])
        .groupBy("vec_id", "sub", "cw_id")
        .agg(
            F.sum((F.col("q") - F.col("qc")) * (F.col("q") - F.col("qc")))
            .cast("bigint")
            .alias("dist")
        )
    )
    rk = F.row_number().over(
        W.partitionBy("vec_id", "sub").orderBy("dist", "cw_id")
    )
    return (
        dist.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .groupBy("sub", "cw_id")
        .agg(
            F.count("*").cast("bigint").alias("n_assigned"),
            F.round(
                F.sum("dist") * 1.0 / (F.count("*") * 16) / 1048576.0 / 1048576.0,
                6,
            ).alias("mse_per_dim"),
        )
    )


@query(
    "llmops_jl_projection_distortion",
    oracle="""
    WITH base AS (
      SELECT vec_id, i,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT) AS q
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
      WHERE vec_id < 30
    ), signs AS (
      SELECT j, i,
             CASE WHEN ascii(substr(md5(CAST(j AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 1)) % 2 = 0
                  THEN 1 ELSE -1 END AS s
      FROM UNNEST(range(1, 9)) AS a(j), UNNEST(range(1, 65)) AS b(i)
    ), proj AS (
      SELECT b.vec_id, s.j, CAST(sum(s.s * b.q) AS BIGINT) AS y
      FROM base b JOIN signs s ON s.i = b.i
      GROUP BY 1, 2
    ), num AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST(sum((a.y - b.y) * (a.y - b.y)) AS BIGINT) AS num
      FROM proj a JOIN proj b ON a.j = b.j AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    ), den AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST(sum((a.q - b.q) * (a.q - b.q)) AS BIGINT) AS den
      FROM base a JOIN base b ON a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    ), ratios AS (
      SELECT n.id_a, n.id_b,
             CAST(round(n.num * 1.0 / (8.0 * d.den), 10) AS DECIMAL(24,10)) AS r
      FROM num n JOIN den d ON d.id_a = n.id_a AND d.id_b = n.id_b
      WHERE d.den > 0
    )
    SELECT CAST(floor(r * 4) AS BIGINT) AS ratio_bucket,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(round(round(sum(r), 10) / count(*), 6) AS DOUBLE) AS avg_ratio
    FROM ratios GROUP BY 1
    """,
)
def llmops_jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sketch audit: project 64-d embeddings to
    k=8 dims with a deterministic ±1 matrix (sign = parity of the first
    md5 hex digit of "j:i" — reproducible everywhere, no RNG state), then
    measure, for every vector pair in a probe subset, the squared-distance
    distortion ratio ‖ya−yb‖²/(k·‖xa−xb‖²) — expectation 1 under the JL
    lemma. The histogram of ratio quartile-buckets plus per-bucket mean is
    the go/no-go gate for replacing full-dimension distance work (dedup
    blocking, coarse ANN routing) with the 8× cheaper sketch.

    Spark-first and engine-exact: dims quantize to BIGINT (floor(x·2²⁰)),
    so projections (±1 dot products) and both squared distances are exact
    integer arithmetic — engine-order-proof by construction; the one float
    (the ratio) is rounded to 10dp and summed as DECIMAL. The 8×64 sign
    matrix is a BROADCAST build-side; the probe pair set is bounded
    (vec_id < 30 → 435 pairs) — the production path samples pairs, never
    all-pairs. Zero-distance pairs (identical vectors) are excluded by the
    den > 0 derived-divisor guard."""
    e = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 30)
    base = e.select("vec_id", F.posexplode("embedding").alias("i0", "x")).select(
        "vec_id",
        (F.col("i0") + 1).alias("i"),
        F.floor(F.col("x").cast("double") * 1048576).cast("bigint").alias("q"),
    )
    spark_range = spark.range(1, 9).select(F.col("id").alias("j"))
    dims_range = spark.range(1, 65).select(F.col("id").alias("i"))
    signs = spark_range.crossJoin(dims_range).select(
        "j",
        "i",
        F.when(
            F.ascii(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("j").cast("string"),
                            F.col("i").cast("string"),
                        )
                    ),
                    1,
                    1,
                )
            )
            % 2
            == 0,
            1,
        )
        .otherwise(-1)
        .alias("s"),
    )
    proj = (
        base.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("s") * F.col("q")).cast("bigint").alias("y"))
    )
    pa = proj.select(F.col("vec_id").alias("id_a"), "j", F.col("y").alias("ya"))
    pb = proj.select(F.col("vec_id").alias("id_b"), "j", F.col("y").alias("yb"))
    num = (
        pa.join(pb, "j")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum((F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")))
            .cast("bigint")
            .alias("num")
        )
    )
    ba = base.select(F.col("vec_id").alias("id_a"), "i", F.col("q").alias("qa"))
    bb = base.select(F.col("vec_id").alias("id_b"), "i", F.col("q").alias("qb"))
    den = (
        ba.join(bb, "i")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum((F.col("qa") - F.col("qb")) * (F.col("qa") - F.col("qb")))
            .cast("bigint")
            .alias("den")
        )
    )
    ratios = (
        num.join(den, ["id_a", "id_b"])
        .filter(F.col("den") > 0)
        .select(
            F.round(F.col("num") * 1.0 / (8.0 * F.col("den")), 10)
            .cast("decimal(24,10)")
            .alias("r")
        )
    )
    return ratios.groupBy(
        F.floor(F.col("r") * 4).cast("bigint").alias("ratio_bucket")
    ).agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        (F.round(F.sum("r"), 10) / F.count("*")).cast("double").alias("_a"),
    ).select(
        "ratio_bucket",
        "n_pairs",
        F.round("_a", 6).alias("avg_ratio"),
    )


@query(
    "llmops_ann_pq_adc",
    oracle="""
    WITH base AS (
      SELECT vec_id, i - 1 AS i,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT) AS q
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
    ), dims AS (
      SELECT vec_id, CAST(i // 16 AS BIGINT) AS sub,
             CAST(i % 16 AS BIGINT) AS pos, q
      FROM base
    ), cw AS (
      SELECT vec_id AS cw_id, sub, pos, q AS qc FROM dims WHERE vec_id < 4
    ), dbdist AS (
      SELECT d.vec_id, d.sub, c.cw_id,
             CAST(sum((d.q - c.qc) * (d.q - c.qc)) AS BIGINT) AS dist
      FROM dims d JOIN cw c ON c.sub = d.sub AND c.pos = d.pos
      WHERE d.vec_id >= 8
      GROUP BY 1, 2, 3
    ), assign AS (
      SELECT vec_id, sub, cw_id FROM (
        SELECT vec_id, sub, cw_id,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dist, cw_id) AS rk
        FROM dbdist) WHERE rk = 1
    ), lut AS (
      SELECT d.vec_id AS query_id, d.sub, c.cw_id,
             CAST(sum((d.q - c.qc) * (d.q - c.qc)) AS BIGINT) AS dist
      FROM dims d JOIN cw c ON c.sub = d.sub AND c.pos = d.pos
      WHERE d.vec_id BETWEEN 4 AND 7
      GROUP BY 1, 2, 3
    ), adc AS (
      SELECT l.query_id, a.vec_id AS neighbor_id,
             CAST(sum(l.dist) AS BIGINT) AS adc_dist
      FROM assign a JOIN lut l ON l.sub = a.sub AND l.cw_id = a.cw_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, adc_dist, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT query_id, neighbor_id, adc_dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_dist, neighbor_id) AS rk
      FROM adc) WHERE rk <= 5
    """,
)
def llmops_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ's search half — Asymmetric Distance Computation: database
    vectors are stored only as their per-subspace codeword ids
    (llmops_pq_codebook's output, 4 bytes a vector), and a query scores a
    candidate WITHOUT decompressing it: precompute the query's exact
    distance to every codeword per subspace (the LUT — M×K integers), then
    a candidate's approximate distance is M table lookups summed. This is
    how billion-vector search engines burn through shortlists; paired
    with the IVF routing (llmops_ann_ivf) it completes the IVF-PQ
    pipeline.

    Spark-first and engine-exact: quantized BIGINT dimensions make
    codeword assignment, LUT entries, and ADC sums exact integers (ties
    break on ids — no float tolerance anywhere). The LUT is tiny by
    construction (queries × M × K rows) and BROADCASTS onto the assignment
    table, so scoring all candidates is one broadcast-hash-join + hash
    aggregation — no shuffle of the database side beyond its one grouped
    assignment; top-k is a per-query window, never a global sort."""
    e = t(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id", F.posexplode("embedding").alias("i", "x")
    ).select(
        "vec_id",
        (F.col("i") / F.lit(16)).cast("bigint").alias("sub"),
        F.pmod("i", F.lit(16)).cast("bigint").alias("pos"),
        F.floor(F.col("x").cast("double") * 1048576).cast("bigint").alias("q"),
    )
    cw = dims.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cw_id"), "sub", "pos", F.col("q").alias("qc")
    )
    sq = F.sum((F.col("q") - F.col("qc")) * (F.col("q") - F.col("qc"))).cast(
        "bigint"
    )
    dbdist = (
        dims.filter(F.col("vec_id") >= 8)
        .join(F.broadcast(cw), ["sub", "pos"])
        .groupBy("vec_id", "sub", "cw_id")
        .agg(sq.alias("dist"))
    )
    assign = (
        dbdist.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("vec_id", "sub").orderBy("dist", "cw_id")
            ),
        )
        .filter(F.col("rk") == 1)
        .select("vec_id", "sub", "cw_id")
    )
    lut = (
        dims.filter((F.col("vec_id") >= 4) & (F.col("vec_id") <= 7))
        .join(F.broadcast(cw), ["sub", "pos"])
        .groupBy(
            F.col("vec_id").alias("query_id"), "sub", "cw_id"
        )
        .agg(sq.alias("dist"))
    )
    adc = (
        assign.join(F.broadcast(lut), ["sub", "cw_id"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("dist").cast("bigint").alias("adc_dist"))
    )
    return (
        adc.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
            ),
        )
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id", "adc_dist", F.col("rk").cast("bigint").alias("rk"))
    )


@query(
    "llmops_semdedup_clusters",
    oracle="""
    WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
               FROM embeddings WHERE vec_id < 4),
    scored AS (
      SELECT v.vec_id, c.cid,
             ROW_NUMBER() OVER (
               PARTITION BY v.vec_id
               ORDER BY ROUND(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]), c.cv), 6)
                        DESC, c.cid) AS rn
      FROM embeddings v CROSS JOIN c
    ),
    asn AS (SELECT vec_id, cid FROM scored WHERE rn = 1),
    pairs AS (
      SELECT x.cid,
             ROUND(list_cosine_similarity(CAST(ex.embedding AS DOUBLE[]),
                                          CAST(ey.embedding AS DOUBLE[])), 6) AS s,
             y.vec_id AS ib
      FROM asn x JOIN asn y ON x.cid = y.cid AND x.vec_id < y.vec_id
      JOIN embeddings ex ON ex.vec_id = x.vec_id
      JOIN embeddings ey ON ey.vec_id = y.vec_id
    ),
    sz AS (SELECT cid, CAST(count(*) AS BIGINT) AS cluster_size FROM asn GROUP BY cid)
    SELECT sz.cid AS cluster_id, sz.cluster_size,
           CAST(coalesce(count(*) FILTER (p.s >= 0.4), 0) AS BIGINT) AS n_dup_pairs,
           CAST(coalesce(count(DISTINCT CASE WHEN p.s >= 0.4 THEN p.ib END), 0) AS BIGINT)
             AS n_dropped,
           sz.cluster_size
             - CAST(coalesce(count(DISTINCT CASE WHEN p.s >= 0.4 THEN p.ib END), 0) AS BIGINT)
             AS n_kept
    FROM sz LEFT JOIN pairs p ON p.cid = sz.cid
    GROUP BY sz.cid, sz.cluster_size
    """,
)
def llmops_semdedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space, then near-duplicate pairs are sought ONLY within a
    cluster — the pruning that turns O(n²) semantic dedup into
    O(Σ cluster²) with cluster sizes bounded by k ∝ n. Here k = 4 seed
    centroids (the vectors with vec_id < 4 — deterministic, no trained
    state; production swaps in kmeans_lloyd centroids, same plan),
    assignment is argmax ROUNDED cosine with a centroid-id tie-break
    (both engines order on the identical rounded double, so an ulp of
    engine drift in the raw cosine cannot flip an assignment), and the
    survivor rule is SemDeDup's: within a cluster, every pair at
    sim ≥ τ drops the larger vec_id, keep = size − |distinct dropped|.
    τ = 0.4 per the fixture-calibration rule (production 0.8 yields zero
    pairs on this synthetic fixture; 0.4 → 6/6/10/3 dup pairs across
    the four clusters at sf0.01, so the hash attests the full
    assign→pair→survivor path). Output: per-cluster size / dup pairs /
    dropped / kept.

    Spark-first: the 4-row centroid table broadcasts into the
    assignment join (zero exchange for the corpus); the within-cluster
    pair join is an equi-join ON cluster id — never a cross join — and
    ships only (cid, vec_id); raw vectors rejoin by id afterward (the
    candidates ≪ corpus discipline of semantic.py). One shuffle on cid
    for the pair join, one for the final rollup."""
    emb = t(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    from batch_public_spark.operators.semantic import cosine

    scored = emb.select("vec_id", "embedding").crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cid",
        F.round(cosine(F.col("embedding"), F.col("cv")), 6).alias("sim"),
    )
    wv = W.partitionBy("vec_id").orderBy(F.desc("sim"), "cid")
    asn = (
        scored.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
    )
    x = asn.select("cid", F.col("vec_id").alias("ia"))
    y = asn.select("cid", F.col("vec_id").alias("ib"))
    ex = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    ey = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
    pairs = (
        x.join(y, "cid")
        .filter(F.col("ia") < F.col("ib"))
        .join(ex, "ia")
        .join(ey, "ib")
        .select("cid", "ib", F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("s"))
    )
    sz = asn.groupBy("cid").agg(F.count("*").cast("bigint").alias("cluster_size"))
    agg = (
        sz.join(pairs, "cid", "left")
        .groupBy("cid", "cluster_size")
        .agg(
            F.coalesce(F.count_if(F.col("s") >= 0.4), F.lit(0)).cast("bigint").alias("n_dup_pairs"),
            F.coalesce(
                F.count_distinct(F.when(F.col("s") >= 0.4, F.col("ib"))), F.lit(0)
            )
            .cast("bigint")
            .alias("n_dropped"),
        )
    )
    return agg.select(
        F.col("cid").alias("cluster_id"),
        "cluster_size",
        "n_dup_pairs",
        "n_dropped",
        (F.col("cluster_size") - F.col("n_dropped")).cast("bigint").alias("n_kept"),
    )


@query(
    "llmops_lsh_param_planner",
    oracle="""
    WITH g AS (
      SELECT b, r, CAST(s AS DOUBLE) AS s
      FROM (VALUES (4, 16), (8, 8), (16, 4), (32, 2)) bw(b, r)
      CROSS JOIN (VALUES (0.3), (0.5), (0.7), (0.8), (0.9), (0.95)) sv(s)
    ),
    p1 AS (SELECT b, r, s, s * s AS s2 FROM g),
    p2 AS (SELECT *, s2 * s2 AS s4 FROM p1),
    p3 AS (SELECT *, s4 * s4 AS s8 FROM p2),
    p4 AS (SELECT *, s8 * s8 AS s16 FROM p3),
    e AS (SELECT b, r, s,
                 CASE r WHEN 2 THEN s2 WHEN 4 THEN s4 WHEN 8 THEN s8
                        ELSE s16 END AS sr
          FROM p4),
    f AS (SELECT b, r, s, 1.0 - sr AS q1 FROM e),
    q2_ AS (SELECT *, q1 * q1 AS q2 FROM f),
    q4_ AS (SELECT *, q2 * q2 AS q4 FROM q2_),
    q8_ AS (SELECT *, q4 * q4 AS q8 FROM q4_),
    q16_ AS (SELECT *, q8 * q8 AS q16 FROM q8_),
    q32_ AS (SELECT *, q16 * q16 AS q32 FROM q16_),
    probs AS (
      SELECT b, r, s,
             1.0 - CASE b WHEN 4 THEN q4 WHEN 8 THEN q8 WHEN 16 THEN q16
                          ELSE q32 END AS p
      FROM q32_
    )
    SELECT CAST(b AS BIGINT) AS n_bands, CAST(r AS BIGINT) AS rows_per_band,
           s AS jaccard_s, ROUND(p, 6) AS p_candidate,
           min(CASE WHEN p >= 0.5 THEN s END)
             OVER (PARTITION BY b) AS s_at_half
    FROM probs
    """,
)
def llmops_lsh_param_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH parameter planner: the S-curve P(candidate | s) =
    1 − (1 − s^r)^b over the (bands b, rows-per-band r) grid with
    b·r = 64 signature slots, evaluated at representative Jaccard levels
    — the table you read BEFORE running llmops_minhash_dedup to pick
    (b, r) for a target similarity threshold (Leskovec/Rajaraman/Ullman
    ch. 3). ``s_at_half`` marks the grid's crossover similarity (first s
    with P ≥ 0.5) per banding — the operating threshold estimate
    (1/b)^(1/r) without a fractional pow() call.

    Determinism: both exponents are powers of two, so s^r and (1−s^r)^b
    are evaluated by REPEATED SQUARING — a fixed tree of IEEE double
    multiplications both engines execute bit-identically — never pow(),
    whose last ulp differs between libm and the JVM (the EWMA-weights
    discipline of stats_queries). Data-free VALUES×VALUES grid
    (broadcast cross join, zero scans; sf_dir accepted and unused);
    the window partitions on the bounded band grid."""
    bw = inline_rows(spark, "b bigint, r bigint", [(4, 16), (8, 8), (16, 4), (32, 2)])
    sv = inline_rows(
        spark, "s double", [(0.3,), (0.5,), (0.7,), (0.8,), (0.9,), (0.95,)]
    )
    g = bw.crossJoin(F.broadcast(sv))
    s = F.col("s")
    s2 = s * s
    s4 = s2 * s2
    s8 = s4 * s4
    s16 = s8 * s8
    sr = (
        F.when(F.col("r") == 2, s2)
        .when(F.col("r") == 4, s4)
        .when(F.col("r") == 8, s8)
        .otherwise(s16)
    )
    e = g.select("b", "r", "s", (F.lit(1.0) - sr).alias("q1"))
    q1 = F.col("q1")
    q2 = q1 * q1
    q4 = q2 * q2
    q8 = q4 * q4
    q16 = q8 * q8
    q32 = q16 * q16
    qb = (
        F.when(F.col("b") == 4, q4)
        .when(F.col("b") == 8, q8)
        .when(F.col("b") == 16, q16)
        .otherwise(q32)
    )
    probs = e.select("b", "r", "s", (F.lit(1.0) - qb).alias("p"))
    wb = W.partitionBy("b")
    return probs.select(
        F.col("b").cast("bigint").alias("n_bands"),
        F.col("r").cast("bigint").alias("rows_per_band"),
        F.col("s").alias("jaccard_s"),
        F.round("p", 6).alias("p_candidate"),
        F.min(F.when(F.col("p") >= 0.5, F.col("s"))).over(wb).alias("s_at_half"),
    )


@query(
    "llmops_matryoshka_recall",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 5),
    full_s AS (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(q.qv, CAST(v.embedding AS DOUBLE[])), 6) AS sim
      FROM embeddings v CROSS JOIN q WHERE v.vec_id != q.query_id),
    trunc_s AS (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(q.qv[1:16],
                   CAST(v.embedding AS DOUBLE[])[1:16]), 6) AS sim
      FROM embeddings v CROSS JOIN q WHERE v.vec_id != q.query_id),
    full_k AS (SELECT query_id, neighbor_id FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS r
      FROM full_s) WHERE r <= 10),
    trunc_k AS (SELECT query_id, neighbor_id FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS r
      FROM trunc_s) WHERE r <= 10)
    SELECT f.query_id,
           CAST(count(t.neighbor_id) AS BIGINT) AS n_overlap,
           ROUND(count(t.neighbor_id) / 10.0, 6) AS recall_at_10
    FROM full_k f LEFT JOIN trunc_k t
      ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
    GROUP BY f.query_id
    """,
)
def llmops_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation recall audit: how much of each query's exact
    top-10 (full 64-dim cosine) survives when retrieval runs on only the
    FIRST 16 dimensions — the evaluation behind MRL-style embeddings,
    where a prefix of the vector is served for cheap first-stage
    retrieval and the full vector only reranks. recall@10 per query is
    the fraction of true neighbors the truncated index would return;
    production uses this curve to pick the serving prefix length (here
    one point of it, 16/64, fixture-calibrated to land strictly between
    0 and 1 so the hash attests a real gap, not a degenerate 1.0).

    Parity discipline: both rankings order by ROUNDED cosine with
    neighbor_id tie-breaks (the ann_bruteforce rule); the overlap count
    and recall are then integer-exact.

    Spark-first: both legs reuse the brute-force operator — queries
    broadcast, corpus streams map-side, per-query top-k under a
    query-partitioned window; the overlap is a 50-row join. The
    truncated leg slices in-row (F.slice), which at 100 TB is the
    entire point: 4× fewer multiply-adds on the scan with no second
    embedding table."""
    from batch_public_spark.operators.semantic import ann_bruteforce_topk

    vecs = t(spark, sf_dir, "embeddings")
    q = vecs.filter(F.col("vec_id") < 5)
    tr = lambda df: df.select(  # noqa: E731
        "vec_id", F.slice("embedding", 1, 16).alias("embedding")
    )
    full_k = ann_bruteforce_topk(vecs, q, k=10).select("query_id", "neighbor_id")
    trunc_k = ann_bruteforce_topk(tr(vecs), tr(q), k=10).select(
        F.col("query_id").alias("tq"), F.col("neighbor_id").alias("tn")
    )
    j = full_k.join(
        trunc_k,
        (F.col("tq") == F.col("query_id")) & (F.col("tn") == F.col("neighbor_id")),
        "left",
    )
    return j.groupBy("query_id").agg(
        F.count("tn").cast("bigint").alias("n_overlap"),
        F.round(F.count("tn") / F.lit(10.0), 6).alias("recall_at_10"),
    )


def _hex4(h: str, start: int = 1) -> str:
    """SQL: parse 4 hex chars of string expression ``h`` at ``start`` →
    int in [0, 65536), by the same portable ascii arithmetic as
    curation_queries._hex3 (conv()/from_hex are not cross-engine)."""

    def _v(c: str) -> str:
        return f"(CASE WHEN ascii({c}) <= 57 THEN ascii({c}) - 48 ELSE ascii({c}) - 87 END)"

    a = _v(f"substr({h}, {start}, 1)")
    b = _v(f"substr({h}, {start + 1}, 1)")
    c = _v(f"substr({h}, {start + 2}, 1)")
    d = _v(f"substr({h}, {start + 3}, 1)")
    return f"({a} * 4096 + {b} * 256 + {c} * 16 + {d})"


_WINNOW_K = 8   # k-gram length (chars)
_WINNOW_W = 16  # winnowing window (grams)
_GRAM_HASH = _hex4("md5(substring(text, CAST(i AS INT), 8))")


@query(
    "llmops_winnowing_fingerprints",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             list_transform(range(1, greatest(length(text) - 6, 1) + 1),
                            i -> {_hex4("md5(substring(text, CAST(i AS INT), 8))")})
               AS hs
      FROM documents
    ), w AS (
      SELECT doc_id, hs,
             CAST(len(hs) AS BIGINT) AS n_grams,
             CAST(greatest(len(hs) - 15, 1) AS BIGINT) AS n_windows
      FROM g
    )
    SELECT doc_id, n_grams, n_windows,
           CAST(len(list_distinct(list_transform(
                  range(1, CAST(n_windows AS INT) + 1),
                  j -> list_min(hs[CAST(j AS INT):CAST(j AS INT) + 15]))))
                AS BIGINT) AS n_selected,
           round(len(list_distinct(list_transform(
                  range(1, CAST(n_windows AS INT) + 1),
                  j -> list_min(hs[CAST(j AS INT):CAST(j AS INT) + 15]))))
                 * 1.0 / n_windows, 6) AS density
    FROM w
    """,
)
def llmops_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS selection rule): hash
    every 8-char gram, slide a 16-gram window, and keep each window's
    MINIMUM hash — the local-minimum rule that guarantees any shared
    substring of ≥ w+k−1 chars contributes at least one shared
    fingerprint, with expected density 2/(w+1) ≈ 0.118. The third
    fingerprint-selection scheme beside 0-mod-p sampling
    (llmops_fingerprint_modp_pairs) and MinHash: 0-mod-p has no
    positional guarantee, winnowing does — and unlike the GLOBAL minima
    that family's docstring warns about, per-window minima cannot
    degenerate into everyone's-a-candidate on low-entropy text. Emitted
    per doc: gram/window counts, distinct selected fingerprints, and the
    realized density (fixture lands near the 0.118 theory value, which
    the oracle hash pins).

    Parity discipline: the gram hash is 4 md5 hex chars parsed by
    portable ascii arithmetic (conv()/from_hex differ across engines);
    selection and counts are pure integer array ops; density is one
    exact-input division rounded at emission.

    Spark-first: zero shuffles — hashes, window minima, and dedup are
    in-row HOF transforms riding the scan (the MinHash-signature fold
    discipline); ~n array cells per doc, w comparisons each. At 100 TB
    the posting/bucket-join step of the modp family reuses these
    fingerprints unchanged."""
    d = t(spark, sf_dir, "documents")
    g = d.select(
        "doc_id",
        F.expr(
            f"transform(sequence(1, greatest(length(text) - 6, 1)), "
            f"i -> {_GRAM_HASH})"
        ).alias("hs"),
    )
    w = g.select(
        "doc_id",
        F.size("hs").cast("bigint").alias("n_grams"),
        F.greatest(F.size("hs") - F.lit(15), F.lit(1)).cast("bigint").alias("n_windows"),
        F.expr(
            "array_distinct(transform(sequence(1, greatest(size(hs) - 15, 1)), "
            "j -> array_min(slice(hs, CAST(j AS INT), 16))))"
        ).alias("sel"),
    )
    return w.select(
        "doc_id",
        "n_grams",
        "n_windows",
        F.size("sel").cast("bigint").alias("n_selected"),
        F.round(F.size("sel") * F.lit(1.0) / F.col("n_windows"), 6).alias("density"),
    )


@query(
    "llmops_binary_embedding_recall",
    oracle="""
    WITH b AS (
      SELECT vec_id,
             CAST(embedding AS DOUBLE[]) AS v,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CASE WHEN x >= 0 THEN 1 ELSE 0 END) AS bits
      FROM embeddings
    ), q AS (SELECT vec_id AS query_id, v AS qv, bits AS qb FROM b WHERE vec_id < 5),
    full_s AS (
      SELECT q.query_id, b.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(q.qv, b.v), 6) AS sim
      FROM b CROSS JOIN q WHERE b.vec_id != q.query_id),
    ham_s AS (
      SELECT q.query_id, b.vec_id AS neighbor_id,
             CAST(list_sum(list_transform(list_zip(q.qb, b.bits),
                    p -> CASE WHEN p[1] != p[2] THEN 1 ELSE 0 END)) AS BIGINT)
               AS hamming
      FROM b CROSS JOIN q WHERE b.vec_id != q.query_id),
    full_k AS (SELECT query_id, neighbor_id FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS r
      FROM full_s) WHERE r <= 10),
    ham_k AS (SELECT query_id, neighbor_id, hamming FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY hamming ASC, neighbor_id) AS r
      FROM ham_s) WHERE r <= 10)
    SELECT f.query_id,
           CAST(count(h.neighbor_id) AS BIGINT) AS n_overlap,
           ROUND(count(h.neighbor_id) / 10.0, 6) AS recall_at_10
    FROM full_k f LEFT JOIN ham_k h
      ON h.query_id = f.query_id AND h.neighbor_id = f.neighbor_id
    GROUP BY f.query_id
    """,
)
def llmops_binary_embedding_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-embedding retrieval audit: quantize every vector to its sign
    bits (1 bit/dim — a 32× memory cut against float32), retrieve by
    HAMMING distance, and measure recall@10 against exact full-precision
    cosine — the bit-quantization twin of llmops_matryoshka_recall
    (dimension truncation) and the third point on the
    compression-vs-recall surface after PQ (llmops_ann_pq_adc). Sign
    binarization approximates angular similarity (Goemans-Williamson:
    P[bit mismatch] = θ/π), so Hamming order ≈ cosine order, and the
    audit quantifies the "≈" on real data.

    Parity discipline: sign bits are integer-exact from identical
    doubles (x ≥ 0), Hamming is an integer zip-sum, the exact leg orders
    by ROUNDED cosine with id tie-breaks, and recall is exact-input
    division — no float accumulates anywhere except the already-pinned
    cosine.

    Spark-first: the corpus binarizes in-row on the scan; both legs are
    the brute-force broadcast shape (queries tiny, corpus never
    shuffles). At 100 TB the bits pack into 64-bit words and Hamming
    becomes popcount(xor) per word — same plan, denser arrays; the
    audit's recall number is what justifies that rollout."""
    vecs = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        F.expr(
            "transform(cast(embedding as array<double>), "
            "x -> CASE WHEN x >= 0 THEN 1 ELSE 0 END)"
        ).alias("bits"),
    )
    from batch_public_spark.operators.semantic import ann_bruteforce_topk

    q = vecs.filter(F.col("vec_id") < 5)
    full_k = ann_bruteforce_topk(
        vecs.select("vec_id", F.col("v").alias("embedding")),
        q.select("vec_id", F.col("v").alias("embedding")),
        k=10,
    ).select("query_id", "neighbor_id")
    qb = q.select(F.col("vec_id").alias("query_id"), F.col("bits").alias("qb"))
    ham = (
        vecs.select(F.col("vec_id").alias("neighbor_id"), "bits")
        .crossJoin(F.broadcast(qb))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.expr(
                "cast(aggregate(zip_with(qb, bits, (a, b) -> "
                "CASE WHEN a != b THEN 1 ELSE 0 END), 0, (acc, x) -> acc + x) "
                "as bigint)"
            ).alias("hamming"),
        )
    )
    wh = W.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    ham_k = (
        ham.withColumn("r", F.row_number().over(wh))
        .filter(F.col("r") <= 10)
        .select(F.col("query_id").alias("hq"), F.col("neighbor_id").alias("hn"))
    )
    j = full_k.join(
        ham_k,
        (F.col("hq") == F.col("query_id")) & (F.col("hn") == F.col("neighbor_id")),
        "left",
    )
    return j.groupBy("query_id").agg(
        F.count("hn").cast("bigint").alias("n_overlap"),
        F.round(F.count("hn") / F.lit(10.0), 6).alias("recall_at_10"),
    )


@query(
    "llmops_ann_nprobe_sweep",
    oracle="""
    WITH cents AS (
      SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 32
    ),
    v AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
    q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings WHERE vec_id < 5),
    assigned AS (
      SELECT neighbor_id, vv, centroid_id FROM (
        SELECT v.neighbor_id, v.vv, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY v.neighbor_id
                 ORDER BY ROUND(list_cosine_similarity(v.vv, c.cv), 6) DESC, c.centroid_id
               ) AS r
        FROM v CROSS JOIN cents c) WHERE r = 1
    ),
    probe_rank AS (
      SELECT query_id, qv, centroid_id, r FROM (
        SELECT q.query_id, q.qv, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY ROUND(list_cosine_similarity(q.qv, c.cv), 6) DESC, c.centroid_id
               ) AS r
        FROM q CROSS JOIN cents c) WHERE r <= 4
    ),
    nps AS (SELECT * FROM (VALUES (1), (2), (4)) t(np)),
    ivf_k AS (
      SELECT np, query_id, neighbor_id FROM (
        SELECT n.np, p.query_id, a.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY n.np, p.query_id
                 ORDER BY ROUND(list_cosine_similarity(p.qv, a.vv), 6) DESC,
                          a.neighbor_id) AS rank
        FROM nps n
        JOIN probe_rank p ON p.r <= n.np
        JOIN assigned a USING (centroid_id)
        WHERE a.neighbor_id != p.query_id)
      WHERE rank <= 5
    ),
    brute_k AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, v.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY ROUND(list_cosine_similarity(q.qv, v.vv), 6) DESC,
                          v.neighbor_id) AS rank
        FROM v CROSS JOIN q WHERE v.neighbor_id != q.query_id)
      WHERE rank <= 5
    )
    SELECT n.np AS nprobe,
           CAST(count(i.neighbor_id) AS BIGINT) AS n_hits,
           ROUND(count(i.neighbor_id) / 25.0, 6) AS recall_at_5
    FROM nps n
    CROSS JOIN brute_k b
    LEFT JOIN ivf_k i ON i.np = n.np AND i.query_id = b.query_id
                     AND i.neighbor_id = b.neighbor_id
    GROUP BY n.np
    """,
)
def llmops_ann_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF operating curve: recall@5 against exact brute force as
    nprobe sweeps 1 → 2 → 4 inverted lists (32 md5-sampled centroids) —
    the tuning table every IVF deployment reads before fixing its
    latency/recall trade (probing 1/8 of the lists costs ~1/8 the
    distance computations; this query says what recall that buys on THIS
    corpus). Completes the ANN family's planner trio:
    llmops_lsh_param_planner (analytic S-curve), llmops_matryoshka_recall
    and llmops_binary_embedding_recall (representation compression), and
    now search-effort compression, all oracle-hashed. Recall is
    non-decreasing in nprobe by construction (probe sets are nested) —
    pinned as an invariant test, attested in value by the hash.

    Parity discipline: the assignment/probe/rerank pipeline is the
    ann_ivf oracle verbatim (rounded cosines, id tie-breaks); the sweep
    adds a 3-row VALUES dimension joined on probe rank ≤ nprobe so all
    three operating points share ONE assignment and ONE probe ranking.

    Spark-first: same sharing — the corpus assignment (the expensive
    leg) is computed once and localCheckpointed; the three probe widths
    reuse it through the nested-probe join, so the sweep costs one IVF
    build plus three candidate regroups, not three builds."""
    from batch_public_spark.operators.semantic import ann_bruteforce_topk, ann_ivf_topk

    vecs = t(spark, sf_dir, "embeddings")
    q = vecs.filter(F.col("vec_id") < 5)
    brute = ann_bruteforce_topk(vecs, q, k=5).select("query_id", "neighbor_id")
    legs = []
    for np_ in (1, 2, 4):
        ivf = ann_ivf_topk(vecs, q, k=5, n_centroids=32, nprobe=np_).select(
            F.lit(np_).cast("bigint").alias("np"),
            F.col("query_id").alias("iq"),
            F.col("neighbor_id").alias("inb"),
        )
        legs.append(ivf)
    ivf_all = legs[0].unionAll(legs[1]).unionAll(legs[2])
    nps = inline_rows(spark, "nprobe long", [(1,), (2,), (4,)])
    j = (
        brute.crossJoin(F.broadcast(nps))
        .join(
            ivf_all,
            (F.col("np") == F.col("nprobe"))
            & (F.col("iq") == F.col("query_id"))
            & (F.col("inb") == F.col("neighbor_id")),
            "left",
        )
    )
    return j.groupBy("nprobe").agg(
        F.count("inb").cast("bigint").alias("n_hits"),
        F.round(F.count("inb") / F.lit(25.0), 6).alias("recall_at_5"),
    )


@query(
    "llmops_cluster_label_nmi",
    oracle="""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
    c0 AS (
      SELECT vec_id AS cluster_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 8
    ),
    a1 AS (
      SELECT vec_id, label, cluster_id FROM (
        SELECT v.vec_id, v.label, c.cluster_id,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
                 round(list_sum(list_transform(list_zip(v.vv, c.cv),
                                               s -> (s[1]-s[2])^2)), 6),
                 c.cluster_id) AS r
        FROM v CROSS JOIN c0 c) WHERE r = 1
    ),
    cell AS (
      SELECT cluster_id, label, CAST(count(*) AS BIGINT) AS n_cl
      FROM a1 GROUP BY 1, 2
    ),
    mc AS (SELECT cluster_id, CAST(sum(n_cl) AS BIGINT) AS n_c FROM cell GROUP BY 1),
    ml AS (SELECT label, CAST(sum(n_cl) AS BIGINT) AS n_l FROM cell GROUP BY 1),
    tot AS (SELECT CAST(sum(n_cl) AS BIGINT) AS n FROM cell),
    mi AS (
      SELECT CAST(sum(CAST(round(
               (cell.n_cl * 1.0e0 / tot.n)
               * ln(tot.n * 1.0e0 * cell.n_cl / (mc.n_c * 1.0e0 * ml.n_l)), 10)
             AS DECIMAL(28, 10))) AS DECIMAL(28, 10)) AS i_nats
      FROM cell JOIN mc USING (cluster_id) JOIN ml USING (label) CROSS JOIN tot
    ),
    hc AS (
      SELECT CAST(sum(CAST(round(
               -(n_c * 1.0e0 / tot.n) * ln(n_c * 1.0e0 / tot.n), 10)
             AS DECIMAL(28, 10))) AS DECIMAL(28, 10)) AS h_c
      FROM mc CROSS JOIN tot
    ),
    hl AS (
      SELECT CAST(sum(CAST(round(
               -(n_l * 1.0e0 / tot.n) * ln(n_l * 1.0e0 / tot.n), 10)
             AS DECIMAL(28, 10))) AS DECIMAL(28, 10)) AS h_l
      FROM ml CROSS JOIN tot
    ),
    pur AS (
      SELECT CAST(sum(mx) AS BIGINT) AS n_pure FROM (
        SELECT cluster_id, max(n_cl) AS mx FROM cell GROUP BY 1)
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM mc) AS n_clusters,
           round(pur.n_pure * 1.0e0 / tot.n, 6) AS purity,
           round(2.0e0 * CAST(mi.i_nats AS DOUBLE)
                 / (CAST(hc.h_c AS DOUBLE) + CAST(hl.h_l AS DOUBLE)), 6) AS nmi
    FROM pur CROSS JOIN tot CROSS JOIN mi CROSS JOIN hc CROSS JOIN hl
    """,
)
def llmops_cluster_label_nmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External clustering-quality audit: assign every embedding to its
    nearest of 8 md5-sampled seed centroids (the IVF/Lloyd family's
    deterministic assignment), then score the clustering against the
    ground-truth ``label`` column with PURITY (Σ_c max_l n_cl / N) and
    NORMALIZED MUTUAL INFORMATION (2·I(C;L)/(H(C)+H(L))) — the two
    standard external metrics a training pipeline checks before trusting
    cluster-based curation (SemDeDup buckets, curriculum clusters,
    domain routing). Label marginals, cluster marginals, and cells are
    exact BIGINTs; every entropy/MI term is ln() of exact-integer ratios
    rounded to 10 and summed as DECIMAL (order-free), with doubles only
    at the final normalization — the KL/entropy discipline end to end.

    Spark-first: assignment is the broadcast-centroid argmin (8×64
    model in-plan); the contingency table is one shuffle on
    (cluster, label) with everything after on ≤ 80 rows. At 100 TB the
    assignment is the same map-side GEMM the IVF operators use."""
    vecs = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("vv")
    )
    c0 = (
        vecs.orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(8)
        .select(F.col("vec_id").alias("cluster_id"), F.col("vv").alias("cv"))
    )
    dist = F.round(
        F.expr(
            "aggregate(zip_with(vv, cv, (a, b) -> (a - b) * (a - b)), "
            "cast(0.0 as double), (acc, x) -> acc + x)"
        ),
        6,
    )
    wmin = W.partitionBy("vec_id").orderBy(dist.asc(), F.col("cluster_id").asc())
    a1 = (
        vecs.crossJoin(F.broadcast(c0))
        .withColumn("r", F.row_number().over(wmin))
        .filter(F.col("r") == 1)
        .select("vec_id", "label", "cluster_id")
    )
    cell = a1.groupBy("cluster_id", "label").agg(
        F.count("*").cast("bigint").alias("n_cl")
    )
    cell = cell.localCheckpoint(eager=False)
    mc = cell.groupBy("cluster_id").agg(F.sum("n_cl").cast("bigint").alias("n_c"))
    ml = cell.groupBy("label").agg(F.sum("n_cl").cast("bigint").alias("n_l"))
    tot = cell.agg(F.sum("n_cl").cast("bigint").alias("n"))
    dec = lambda c: F.round(c, 10).cast("decimal(28,10)")  # noqa: E731
    mi = (
        cell.join(F.broadcast(mc), "cluster_id")
        .join(F.broadcast(ml), "label")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                dec(
                    (F.col("n_cl") * F.lit(1.0) / F.col("n"))
                    * F.log(
                        F.col("n") * F.lit(1.0) * F.col("n_cl")
                        / (F.col("n_c") * F.lit(1.0) * F.col("n_l"))
                    )
                )
            )
            .cast("decimal(28,10)")
            .alias("i_nats")
        )
    )
    hc = mc.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            dec(
                -(F.col("n_c") * F.lit(1.0) / F.col("n"))
                * F.log(F.col("n_c") * F.lit(1.0) / F.col("n"))
            )
        )
        .cast("decimal(28,10)")
        .alias("h_c")
    )
    hl = ml.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            dec(
                -(F.col("n_l") * F.lit(1.0) / F.col("n"))
                * F.log(F.col("n_l") * F.lit(1.0) / F.col("n"))
            )
        )
        .cast("decimal(28,10)")
        .alias("h_l")
    )
    pur = cell.groupBy("cluster_id").agg(F.max("n_cl").alias("mx")).agg(
        F.sum("mx").cast("bigint").alias("n_pure")
    )
    nclusters = mc.agg(F.count("*").cast("bigint").alias("n_clusters"))
    return (
        nclusters.crossJoin(F.broadcast(pur))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hc))
        .crossJoin(F.broadcast(hl))
        .select(
            "n_clusters",
            F.round(F.col("n_pure") * F.lit(1.0) / F.col("n"), 6).alias("purity"),
            F.round(
                F.lit(2.0)
                * F.col("i_nats").cast("double")
                / (F.col("h_c").cast("double") + F.col("h_l").cast("double")),
                6,
            ).alias("nmi"),
        )
    )


@query(
    "llmops_shuffle_quality_audit",
    oracle="""
    WITH ordered AS (
      SELECT source,
             lag(source) OVER (ORDER BY md5(doc_id || ':42'), doc_id)
               AS prev_source
      FROM documents
    ), adj AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN source = prev_source THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_same
      FROM ordered WHERE prev_source IS NOT NULL
    ), marg AS (
      SELECT CAST(sum(n_s) AS BIGINT) AS n,
             CAST(sum(n_s * (n_s - 1)) AS BIGINT) AS coll
      FROM (SELECT count(*) AS n_s FROM documents GROUP BY source)
    )
    SELECT marg.n AS n_docs, adj.n_same AS n_adjacent_same,
           round(adj.n_same * 1.0e0 / adj.n_pairs, 6) AS observed_rate,
           round(marg.coll * 1.0e0 / (marg.n * (marg.n - 1)), 6)
             AS expected_rate,
           round((adj.n_same * 1.0e0 / adj.n_pairs)
                 / (marg.coll * 1.0e0 / (marg.n * (marg.n - 1))), 6)
             AS rate_ratio
    FROM adj CROSS JOIN marg
    """,
)
def llmops_shuffle_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-quality audit of the deterministic training-order shuffle
    (llmops_train_shuffle's md5(id:seed) key): walk the shuffled order
    and measure how often ADJACENT examples share a source, against the
    exchangeability expectation Σ_s n_s(n_s−1)/(n(n−1)) — a rate_ratio
    near 1.0 says the shuffle broke source runs (ratio ≫ 1 means source
    clumping survived, the classic cause of loss spikes at shard
    boundaries). This audits the PROPERTY the shuffle exists to deliver,
    not just its key order; counts are exact integers, the expectation is
    exact integer arithmetic, and the three emitted rates divide exact
    inputs once (e0-spelled doubles in the oracle).

    Spark-first: one global-order lag — expressed over the non-foldable
    constant partition key (the bm25/bpe trick) so the linter's
    unpartitioned-window rule stays mechanical; at 100 TB this audit
    runs PER SHARD (partitionBy shard id) with the same plan, since
    training readers consume shards independently anyway."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":42"))).alias("sk"),
    )
    wlag = W.partitionBy(F.col("doc_id") * 0).orderBy("sk", "doc_id")
    ordered = d.select("source", F.lag("source").over(wlag).alias("prev_source"))
    adj = ordered.filter(F.col("prev_source").isNotNull()).agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum(F.when(F.col("source") == F.col("prev_source"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_same"),
    )
    marg = (
        d.groupBy("source")
        .agg(F.count("*").alias("n_s"))
        .agg(
            F.sum("n_s").cast("bigint").alias("n"),
            F.sum(F.col("n_s") * (F.col("n_s") - 1)).cast("bigint").alias("coll"),
        )
    )
    obs = F.col("n_same") * F.lit(1.0) / F.col("n_pairs")
    exp_ = F.col("coll") * F.lit(1.0) / (F.col("n") * (F.col("n") - 1))
    return adj.crossJoin(F.broadcast(marg)).select(
        F.col("n").alias("n_docs"),
        F.col("n_same").alias("n_adjacent_same"),
        F.round(obs, 6).alias("observed_rate"),
        F.round(exp_, 6).alias("expected_rate"),
        F.round(obs / exp_, 6).alias("rate_ratio"),
    )


@query(
    "llmops_kcenter_seeding",
    oracle="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
    c1 AS (
      SELECT vec_id, vv FROM v ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1
    ),
    d1 AS (
      SELECT v.vec_id, v.vv,
             round(list_sum(list_transform(list_zip(v.vv, c.vv),
                                           s -> (s[1]-s[2])^2)), 6) AS dmin
      FROM v CROSS JOIN c1 c WHERE v.vec_id != c.vec_id
    ),
    c2 AS (SELECT vec_id, vv, dmin FROM d1 ORDER BY dmin DESC, vec_id LIMIT 1),
    d2 AS (
      SELECT d.vec_id, d.vv,
             least(d.dmin,
                   round(list_sum(list_transform(list_zip(d.vv, c.vv),
                                                 s -> (s[1]-s[2])^2)), 6)) AS dmin
      FROM d1 d CROSS JOIN c2 c WHERE d.vec_id != c.vec_id
    ),
    c3 AS (SELECT vec_id, vv, dmin FROM d2 ORDER BY dmin DESC, vec_id LIMIT 1),
    d3 AS (
      SELECT d.vec_id,
             least(d.dmin,
                   round(list_sum(list_transform(list_zip(d.vv, c.vv),
                                                 s -> (s[1]-s[2])^2)), 6)) AS dmin
      FROM d2 d CROSS JOIN c3 c WHERE d.vec_id != c.vec_id
    ),
    c4 AS (SELECT vec_id, dmin FROM d3 ORDER BY dmin DESC, vec_id LIMIT 1)
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS seed_rank, vec_id, -1.0e0 AS coverage_radius_sq
      FROM c1
      UNION ALL SELECT 2, vec_id, dmin FROM c2
      UNION ALL SELECT 3, vec_id, dmin FROM c3
      UNION ALL SELECT 4, vec_id, dmin FROM c4)
    """,
)
def llmops_kcenter_seeding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Farthest-point (Gonzalez k-center) seeding, 4 centers: start from
    the md5-minimal vector, then repeatedly pick the point FARTHEST from
    its nearest already-chosen center — the deterministic seeding that
    2-approximates the k-center objective and is the standard
    alternative to k-means++ when runs must be reproducible (D² sampling
    needs randomness; farthest-point doesn't). Emitted per step: the
    chosen id and the coverage radius (its min squared distance to the
    prior seeds — non-increasing by construction, pinned as an
    invariant), the curve a curation pipeline reads to choose k for
    SemDeDup buckets or curriculum clusters. Completes the seeding
    story: md5 sampling (ann_ivf) → k-center (here) → Lloyd refinement
    (llmops_kmeans_lloyd).

    Parity discipline: every distance is the same rounded zip-fold L2²
    the Lloyd family pins; argmax steps order by (rounded dist DESC,
    vec_id) so ties cannot diverge; the running min composes previously
    ROUNDED values only (least of rounded = rounded), never re-deriving.

    Spark-first: each of the 3 refinement rounds is one broadcast
    (single-row center) cross, a running-min projection, and a
    TakeOrdered(1); the distance table threads through localCheckpoint
    so round N+1 never recomputes round N — the iterative-graph
    discipline. At 100 TB this is k passes over the corpus, each
    map-side — exactly how distributed k-center seeding runs."""
    v = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vv")
    )
    dist_to = lambda cvv: F.round(  # noqa: E731
        F.expr(
            f"aggregate(zip_with(vv, {cvv}, (a, b) -> (a - b) * (a - b)), "
            "cast(0.0 as double), (acc, x) -> acc + x)"
        ),
        6,
    )
    c1 = (
        v.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(1)
        .select(F.col("vec_id").alias("cid"), F.col("vv").alias("cvv"))
        .localCheckpoint(eager=False)
    )
    d = (
        v.crossJoin(F.broadcast(c1))
        .filter(F.col("vec_id") != F.col("cid"))
        .select("vec_id", "vv", dist_to("cvv").alias("dmin"))
        .localCheckpoint(eager=False)
    )
    rows = [
        c1.select(
            F.lit(1).cast("bigint").alias("seed_rank"),
            F.col("cid").alias("vec_id"),
            F.lit(-1.0).alias("coverage_radius_sq"),
        )
    ]
    for rank in (2, 3, 4):
        c = (
            d.orderBy(F.desc("dmin"), "vec_id")
            .limit(1)
            .select(
                F.col("vec_id").alias("cid"),
                F.col("vv").alias("cvv"),
                F.col("dmin").alias("cdmin"),
            )
            .localCheckpoint(eager=False)
        )
        rows.append(
            c.select(
                F.lit(rank).cast("bigint").alias("seed_rank"),
                F.col("cid").alias("vec_id"),
                F.col("cdmin").alias("coverage_radius_sq"),
            )
        )
        if rank < 4:
            d = (
                d.crossJoin(F.broadcast(c))
                .filter(F.col("vec_id") != F.col("cid"))
                .select(
                    "vec_id",
                    "vv",
                    F.least(F.col("dmin"), dist_to("cvv")).alias("dmin"),
                )
                .localCheckpoint(eager=False)
            )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


@query(
    "llmops_spec_decode_acceptance",
    oracle=f"""
    WITH d AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
    trans AS (
      SELECT doc_id, source,
             lower(toks[CAST(i AS INT)]) AS prev,
             lower(toks[CAST(i AS INT) + 1]) AS actual
      FROM d, UNNEST(range(1, len(toks))) AS t(i)
    ), big AS (
      SELECT prev, actual AS nxt, CAST(count(*) AS BIGINT) AS n
      FROM trans GROUP BY 1, 2
    ), draft AS (
      SELECT prev, nxt AS draft_tok FROM (
        SELECT prev, nxt,
               row_number() OVER (PARTITION BY prev ORDER BY n DESC, nxt) AS r
        FROM big) WHERE r = 1
    )
    SELECT t.source,
           CAST(count(*) AS BIGINT) AS n_transitions,
           CAST(sum(CASE WHEN t.actual = d.draft_tok THEN 1 ELSE 0 END)
                AS BIGINT) AS n_accepted,
           round(sum(CASE WHEN t.actual = d.draft_tok THEN 1 ELSE 0 END)
                 * 1.0e0 / count(*), 6) AS acceptance_rate
    FROM trans t JOIN draft d ON d.prev = t.prev
    GROUP BY t.source
    """,
)
def llmops_spec_decode_acceptance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Speculative-decoding draft acceptance, simulated on corpus text: a
    1-gram-context draft model (each token's single most frequent
    successor, corpus-wide, ties to the lexicographically smallest) plays
    the draft model; the corpus itself plays the target. Per source:
    what fraction of actual next-tokens the draft would have guessed —
    the acceptance-rate number that decides whether speculative decoding
    pays for a given corpus/draft pair BEFORE anyone provisions draft
    replicas (expected speedup ≈ 1/(1−rate·(1−c)) in the standard
    model). The bigram sibling llmops_bigram_logprob_score scores
    LIKELIHOOD; this scores ARGMAX AGREEMENT, which is what acceptance
    sampling actually tests.

    Parity discipline: counts are exact; the draft argmax orders by
    (count DESC, token) so ties can't diverge; the single rate division
    is e0-spelled in the oracle.

    Spark-first: one exploded-token pass feeds both the transition
    stream (lead over doc-partitioned position windows) and the bigram
    counts; the draft table is vocabulary-sized and broadcasts into the
    acceptance join. At 100 TB the draft table is the only state — the
    same broadcast-model shape as the IVF centroids."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "source",
        F.posexplode(F.transform(tokens(F.col("text")), F.lower)).alias("pos", "tok"),
    )
    wlead = W.partitionBy("doc_id").orderBy("pos")
    trans = tok.select(
        "doc_id",
        "source",
        F.col("tok").alias("prev"),
        F.lead("tok").over(wlead).alias("actual"),
    ).filter(F.col("actual").isNotNull())
    trans = trans.localCheckpoint(eager=False)
    big = trans.groupBy("prev", F.col("actual").alias("nxt")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    wmax = W.partitionBy("prev").orderBy(F.desc("n"), "nxt")
    draft = (
        big.withColumn("r", F.row_number().over(wmax))
        .filter(F.col("r") == 1)
        .select("prev", F.col("nxt").alias("draft_tok"))
    )
    return (
        trans.join(F.broadcast(draft), "prev")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_transitions"),
            F.sum(F.when(F.col("actual") == F.col("draft_tok"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_accepted"),
            F.round(
                F.sum(F.when(F.col("actual") == F.col("draft_tok"), 1).otherwise(0))
                * F.lit(1.0)
                / F.count("*"),
                6,
            ).alias("acceptance_rate"),
        )
    )


@query(
    "llmops_rerank_cascade_recall",
    oracle="""
    WITH b AS (
      SELECT vec_id,
             CAST(embedding AS DOUBLE[]) AS v,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CASE WHEN x >= 0 THEN 1 ELSE 0 END) AS bits
      FROM embeddings
    ), q AS (SELECT vec_id AS query_id, v AS qv, bits AS qb FROM b WHERE vec_id < 5),
    ham_s AS (
      SELECT q.query_id, b.vec_id AS neighbor_id, q.qv, b.v,
             CAST(list_sum(list_transform(list_zip(q.qb, b.bits),
                    p -> CASE WHEN p[1] != p[2] THEN 1 ELSE 0 END)) AS BIGINT)
               AS hamming
      FROM b CROSS JOIN q WHERE b.vec_id != q.query_id),
    shortlist AS (
      SELECT query_id, neighbor_id, qv, v FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY hamming ASC, neighbor_id) AS r
        FROM ham_s) WHERE r <= 50),
    reranked AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY ROUND(list_cosine_similarity(qv, v), 6) DESC,
                          neighbor_id) AS r
        FROM shortlist) WHERE r <= 10),
    exact_k AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY ROUND(list_cosine_similarity(q.qv, b.v), 6) DESC,
                          b.vec_id) AS r
        FROM b CROSS JOIN q WHERE b.vec_id != q.query_id) WHERE r <= 10)
    SELECT e.query_id,
           CAST(count(rr.neighbor_id) AS BIGINT) AS n_overlap,
           ROUND(count(rr.neighbor_id) / 10.0, 6) AS recall_at_10
    FROM exact_k e LEFT JOIN reranked rr
      ON rr.query_id = e.query_id AND rr.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """,
)
def llmops_rerank_cascade_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval cascade audit — the production pattern the
    single-representation audits motivate: a CHEAP first stage (1-bit
    sign Hamming) shortlists 50 candidates, an exact full-precision
    cosine RERANK picks the final 10, and recall@10 is measured against
    exact brute force. Read alongside llmops_binary_embedding_recall
    (raw Hamming@10): the cascade recovers most of the quantization loss
    while still paying full-precision distance on only 50/|corpus|
    candidates — the number that justifies the two-stage architecture at
    serving time. Shares its parity discipline with the other recall
    audits (integer Hamming, rounded-cosine rank, id tie-breaks,
    exact-input division).

    Spark-first: one binarized scan feeds the shortlist (queries
    broadcast, corpus map-side); the rerank touches only 5×50 rows; the
    exact leg is the audited baseline, not a serving cost. At 100 TB
    stage one is popcount(xor) over packed words and stage two stays
    5×50 regardless of corpus size — that asymmetry is the entire
    point."""
    from batch_public_spark.operators.semantic import ann_bruteforce_topk

    vecs = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        F.expr(
            "transform(cast(embedding as array<double>), "
            "x -> CASE WHEN x >= 0 THEN 1 ELSE 0 END)"
        ).alias("bits"),
    )
    q = vecs.filter(F.col("vec_id") < 5)
    qside = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bits").alias("qb"),
    )
    ham = (
        vecs.select(F.col("vec_id").alias("neighbor_id"), "v", "bits")
        .crossJoin(F.broadcast(qside))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "qv",
            "v",
            F.expr(
                "cast(aggregate(zip_with(qb, bits, (a, b) -> "
                "CASE WHEN a != b THEN 1 ELSE 0 END), 0, (acc, x) -> acc + x) "
                "as bigint)"
            ).alias("hamming"),
        )
    )
    wham = W.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    shortlist = (
        ham.withColumn("r", F.row_number().over(wham))
        .filter(F.col("r") <= 50)
        .drop("r", "hamming")
    )
    from batch_public_spark.operators.semantic import cosine

    wcos = W.partitionBy("query_id").orderBy(
        F.desc("sim"), F.col("neighbor_id").asc()
    )
    reranked = (
        shortlist.withColumn("sim", F.round(cosine(F.col("qv"), F.col("v")), 6))
        .withColumn("r", F.row_number().over(wcos))
        .filter(F.col("r") <= 10)
        .select(F.col("query_id").alias("rq"), F.col("neighbor_id").alias("rn"))
    )
    exact_k = ann_bruteforce_topk(
        vecs.select("vec_id", F.col("v").alias("embedding")),
        q.select("vec_id", F.col("v").alias("embedding")),
        k=10,
    ).select("query_id", "neighbor_id")
    j = exact_k.join(
        reranked,
        (F.col("rq") == F.col("query_id")) & (F.col("rn") == F.col("neighbor_id")),
        "left",
    )
    return j.groupBy("query_id").agg(
        F.count("rn").cast("bigint").alias("n_overlap"),
        F.round(F.count("rn") / F.lit(10.0), 6).alias("recall_at_10"),
    )


@query(
    "llmops_maxsim_multivector",
    oracle="""
    WITH sub AS (
      SELECT vec_id, t.i AS part,
             CAST(embedding AS DOUBLE[])[(CAST(t.i AS INT) - 1) * 16 + 1
                                         :CAST(t.i AS INT) * 16] AS sv
      FROM embeddings, UNNEST(range(1, 5)) AS t(i)
    ),
    q AS (SELECT vec_id AS query_id, part AS qpart, sv AS qv
          FROM sub WHERE vec_id < 5),
    d AS (SELECT vec_id AS doc_id, part AS dpart, sv AS dv FROM sub),
    pair AS (
      SELECT q.query_id, d.doc_id, q.qpart,
             max(ROUND(list_cosine_similarity(q.qv, d.dv), 6)) AS best
      FROM q CROSS JOIN d
      WHERE d.doc_id != q.query_id
      GROUP BY q.query_id, d.doc_id, q.qpart
    ),
    scored AS (
      SELECT query_id, doc_id,
             round(CAST(sum(CAST(best AS DECIMAL(18, 6))) AS DOUBLE), 6)
               AS maxsim
      FROM pair GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id AS neighbor_id, maxsim,
           CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY maxsim DESC, doc_id) AS rank
      FROM scored) WHERE rank <= 5
    """,
)
def llmops_maxsim_multivector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction multi-vector retrieval (ColBERT-style MaxSim):
    each embedding is split into 4 sixteen-dim "token vectors"
    (positional slices standing in for per-token encoder outputs — the
    plan is identical for real ones); the query-document score is
    Σ over query parts of the MAX cosine against any document part —
    the late-interaction operator single-vector retrieval can't express
    (a query facet matches its best-aligned document facet
    independently). Top-5 per query under the rounded-score/id total
    order. Fourth retrieval scoring family after cosine, Hamming, and
    PQ-ADC.

    Parity discipline: every pairwise cosine is rounded to 6 BEFORE the
    max (max of rounded = deterministic), and the 4 per-part maxima sum
    as DECIMAL(18,6) — exact, order-free — before one rounded emission.

    Spark-first: the sub-vector explode is in-row (posexplode over
    slices, 4× row fan-out of the corpus, 16-dim payloads — SMALLER
    bytes than the original row); queries broadcast; the MaxSim
    reduction is two hash aggregations on (query, doc[, part]). At
    100 TB the standard serving shape applies: a single-vector ANN
    prefilter shortlists, MaxSim reranks — exactly the cascade
    llmops_rerank_cascade_recall audits."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    sub = emb.select(
        "vec_id",
        F.posexplode(
            F.array(*[F.slice("v", 1 + 16 * i, 16) for i in range(4)])
        ).alias("part", "sv"),
    )
    from batch_public_spark.operators.semantic import fused_cosine, row_norm

    # per-(vec, part) norms ride the sub-vector projection once — the
    # pair stream pays only the dot fold (bit-identical; see row_norm)
    q = sub.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("part").alias("qpart"),
        F.col("sv").alias("qv"),
        row_norm(F.col("sv")).alias("qn"),
    )
    # spread() on the corpus side only: the 20-query-part cosine sweep
    # otherwise runs on the 1-task fixture scan (guide §2.5).
    d = spread(sub).select(
        F.col("vec_id").alias("doc_id"),
        F.col("sv").alias("dv"),
        row_norm(F.col("sv")).alias("dn"),
    )
    pair = (
        d.crossJoin(F.broadcast(q))
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id", "qpart")
        .agg(
            F.max(
                F.round(
                    fused_cosine(F.col("qv"), F.col("dv"), F.col("qn"), F.col("dn")), 6
                )
            ).alias("best")
        )
    )
    scored = pair.groupBy("query_id", "doc_id").agg(
        F.round(
            F.sum(F.col("best").cast("decimal(18,6)")).cast("double"), 6
        ).alias("maxsim")
    )
    wr = W.partitionBy("query_id").orderBy(F.desc("maxsim"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rank") <= 5)
        .select("query_id", F.col("doc_id").alias("neighbor_id"), "maxsim", "rank")
    )


@query(
    "llmops_mmr_diversified_topk",
    oracle="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
    qv AS (SELECT vv AS q FROM v WHERE vec_id = 0),
    cand AS (
      SELECT vec_id, vv,
             ROUND(list_cosine_similarity(vv, (SELECT q FROM qv)), 6) AS rel
      FROM v WHERE vec_id != 0
      ORDER BY rel DESC, vec_id LIMIT 10
    ),
    s1 AS (SELECT vec_id, vv, rel FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
    m2 AS (
      SELECT c.vec_id, c.vv, c.rel,
             round(0.7e0 * c.rel - 0.3e0
                   * ROUND(list_cosine_similarity(c.vv, s.vv), 6), 6) AS mmr
      FROM cand c CROSS JOIN s1 s WHERE c.vec_id != s.vec_id
    ),
    s2 AS (SELECT vec_id, vv, rel, mmr FROM m2 ORDER BY mmr DESC, vec_id LIMIT 1),
    m3 AS (
      SELECT c.vec_id, c.rel,
             round(0.7e0 * c.rel - 0.3e0
                   * greatest(ROUND(list_cosine_similarity(c.vv, s1.vv), 6),
                              ROUND(list_cosine_similarity(c.vv, s2.vv), 6)),
                   6) AS mmr
      FROM cand c CROSS JOIN s1 CROSS JOIN s2
      WHERE c.vec_id != s1.vec_id AND c.vec_id != s2.vec_id
    ),
    s3 AS (SELECT vec_id, rel, mmr FROM m3 ORDER BY mmr DESC, vec_id LIMIT 1)
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS pick, vec_id, rel, rel AS mmr_score FROM s1
      UNION ALL SELECT 2, vec_id, rel, mmr FROM s2
      UNION ALL SELECT 3, vec_id, rel, mmr FROM s3)
    """,
)
def llmops_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance (MMR) diversified re-ranking: from the
    query's top-10 cosine candidates, greedily pick 3 results maximizing
    λ·relevance − (1−λ)·max-similarity-to-already-picked (λ = 0.7) — the
    diversification operator that keeps a RAG context window or search
    page from filling with near-duplicates of one good hit. The fifth
    retrieval operator family: scoring (cosine/Hamming/PQ/MaxSim) ranks,
    MMR SELECTS under a submodular-style penalty; the greedy unroll is
    the k-center pattern (each pick is a TakeOrdered(1) over the
    bounded candidate pool, penalty = running max over picks).

    Parity discipline: relevance and every pairwise penalty cosine are
    rounded to 6 before use, the MMR combination is e0/D-free identical
    double arithmetic on rounded inputs, each argmax carries the id
    tie-break, and the first pick is pure relevance by definition
    (emitted with mmr_score = rel).

    Spark-first: the candidate pool is a broadcastable top-k, so each
    greedy round is driver-free plan composition over ≤10 rows; at
    100 TB MMR always runs AFTER a first-stage retriever (the rerank
    cascade's shape), so the pool stays k-sized regardless of corpus."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vv")
    )
    from batch_public_spark.operators.semantic import cosine

    qv = emb.filter(F.col("vec_id") == 0).select(F.col("vv").alias("q"))
    cand = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", "vv", F.round(cosine(F.col("vv"), F.col("q")), 6).alias("rel"))
        .orderBy(F.desc("rel"), "vec_id")
        .limit(10)
        .localCheckpoint(eager=False)
    )
    s1 = cand.orderBy(F.desc("rel"), "vec_id").limit(1).localCheckpoint(eager=False)
    pen1 = F.round(cosine(F.col("vv"), F.col("s1v")), 6)
    m2 = (
        cand.crossJoin(
            F.broadcast(s1.select(F.col("vec_id").alias("s1id"), F.col("vv").alias("s1v")))
        )
        .filter(F.col("vec_id") != F.col("s1id"))
        .select(
            "vec_id",
            "vv",
            "rel",
            F.round(F.lit(0.7) * F.col("rel") - F.lit(0.3) * pen1, 6).alias("mmr"),
        )
    )
    s2 = m2.orderBy(F.desc("mmr"), "vec_id").limit(1).localCheckpoint(eager=False)
    pen2 = F.greatest(
        F.round(cosine(F.col("vv"), F.col("s1v")), 6),
        F.round(cosine(F.col("vv"), F.col("s2v")), 6),
    )
    m3 = (
        cand.crossJoin(
            F.broadcast(s1.select(F.col("vec_id").alias("s1id"), F.col("vv").alias("s1v")))
        )
        .crossJoin(
            F.broadcast(s2.select(F.col("vec_id").alias("s2id"), F.col("vv").alias("s2v")))
        )
        .filter((F.col("vec_id") != F.col("s1id")) & (F.col("vec_id") != F.col("s2id")))
        .select(
            "vec_id",
            "rel",
            F.round(F.lit(0.7) * F.col("rel") - F.lit(0.3) * pen2, 6).alias("mmr"),
        )
    )
    s3 = m3.orderBy(F.desc("mmr"), "vec_id").limit(1)
    out = (
        s1.select(
            F.lit(1).cast("bigint").alias("pick"),
            "vec_id",
            "rel",
            F.col("rel").alias("mmr_score"),
        )
        .unionAll(
            s2.select(F.lit(2).cast("bigint").alias("pick"), "vec_id", "rel", F.col("mmr").alias("mmr_score"))
        )
        .unionAll(
            s3.select(F.lit(3).cast("bigint").alias("pick"), "vec_id", "rel", F.col("mmr").alias("mmr_score"))
        )
    )
    return out


@query(
    "llmops_entropy_rate_bigram",
    oracle=f"""
    WITH d AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
    trans AS (
      SELECT source,
             lower(toks[CAST(i AS INT)]) AS prev,
             lower(toks[CAST(i AS INT) + 1]) AS nxt
      FROM d, UNNEST(range(1, len(toks))) AS t(i)
    ), cell AS (
      SELECT source, prev, nxt, CAST(count(*) AS BIGINT) AS n
      FROM trans GROUP BY 1, 2, 3
    ), marg AS (
      SELECT source, prev, CAST(sum(n) AS BIGINT) AS n_prev
      FROM cell GROUP BY 1, 2
    ), tot AS (
      SELECT source, CAST(sum(n) AS BIGINT) AS n_total FROM cell GROUP BY 1
    )
    SELECT c.source, t.n_total AS n_transitions,
           round(CAST(sum(CAST(round(
                   -(c.n * 1.0e0 / t.n_total)
                   * ln(c.n * 1.0e0 / m.n_prev), 10)
                 AS DECIMAL(28, 10))) AS DOUBLE), 6) AS h_cond_nats,
           round(CAST(sum(CAST(round(
                   -(c.n * 1.0e0 / t.n_total)
                   * ln(c.n * 1.0e0 / t.n_total), 10)
                 AS DECIMAL(28, 10))) AS DOUBLE), 6) AS h_joint_nats
    FROM cell c
    JOIN marg m ON m.source = c.source AND m.prev = c.prev
    JOIN tot t ON t.source = c.source
    GROUP BY c.source, t.n_total
    """,
)
def llmops_entropy_rate_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram entropy rate per source: the conditional entropy
    H(next | prev) = −Σ p(prev,next)·ln p(next|prev) of each source's
    token stream, alongside the joint bigram entropy — the
    information-theoretic predictability gate that complements
    llmops_char_entropy_quality (marginal, characters) and
    llmops_spec_decode_acceptance (argmax agreement): low H(next|prev)
    means a small draft model will predict the stream well, high means
    the source is draft-hostile; the gap H_joint − H_cond is the prev
    marginal's entropy by the chain rule (invariant-tested). Template/
    boilerplate-heavy sources show up as conditional-entropy outliers
    long before a human reads them.

    Parity discipline: cells, margins, and totals are exact BIGINTs;
    every −p·ln term is ln() of exact-integer ratios rounded to 10 and
    summed as DECIMAL (order-free), doubles only at emission — the
    KL/entropy discipline verbatim.

    Spark-first: one in-row transition explode (the spec_decode shape),
    one shuffle to (source, prev, next) cells, then all entropy algebra
    on the cell table whose size is bounded by observed-bigram
    cardinality, not corpus length."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "source",
        F.posexplode(F.transform(tokens(F.col("text")), F.lower)).alias("pos", "tok"),
        "doc_id",
    )
    wlead = W.partitionBy("doc_id").orderBy("pos")
    trans = tok.select(
        "source",
        F.col("tok").alias("prev"),
        F.lead("tok").over(wlead).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    cell = trans.groupBy("source", "prev", "nxt").agg(
        F.count("*").cast("bigint").alias("n")
    )
    cell = cell.localCheckpoint(eager=False)
    marg = cell.groupBy("source", "prev").agg(
        F.sum("n").cast("bigint").alias("n_prev")
    )
    tot = cell.groupBy("source").agg(F.sum("n").cast("bigint").alias("n_total"))
    dec = lambda c: F.round(c, 10).cast("decimal(28,10)")  # noqa: E731
    j = cell.join(marg, ["source", "prev"]).join(F.broadcast(tot), "source")
    return j.groupBy("source", F.col("n_total").alias("n_transitions")).agg(
        F.round(
            F.sum(
                dec(
                    -(F.col("n") * F.lit(1.0) / F.col("n_total"))
                    * F.log(F.col("n") * F.lit(1.0) / F.col("n_prev"))
                )
            ).cast("double"),
            6,
        ).alias("h_cond_nats"),
        F.round(
            F.sum(
                dec(
                    -(F.col("n") * F.lit(1.0) / F.col("n_total"))
                    * F.log(F.col("n") * F.lit(1.0) / F.col("n_total"))
                )
            ).cast("double"),
            6,
        ).alias("h_joint_nats"),
    )


# ---------------------------------------------------------------------------
# r9: corpus-quality gating, mix planning, kNN-graph health
# ---------------------------------------------------------------------------


@query(
    "llmops_gopher_reject_rates",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, {_TOKS_NORM} AS toks FROM documents
    ), top AS (
      SELECT doc_id, max(c) AS topc FROM (
        SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
        FROM d, UNNEST(toks) AS u(tok) GROUP BY doc_id, tok)
      GROUP BY doc_id
    ), m AS (
      SELECT d.source,
             CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
             CAST(t.topc AS DOUBLE) / len(toks) AS topfrac,
             CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
               / len(toks) AS mwl,
             CAST(len(list_filter(toks, x -> list_contains({_STOP}, x)))
                  AS DOUBLE) / len(toks) AS swr
      FROM d JOIN top t USING (doc_id)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE ttr < 0.35) AS BIGINT) AS rej_ttr,
           CAST(count(*) FILTER (WHERE topfrac > 0.15) AS BIGINT) AS rej_topword,
           CAST(count(*) FILTER (WHERE mwl < 4.2 OR mwl > 10.0) AS BIGINT)
             AS rej_wordlen,
           CAST(count(*) FILTER (WHERE swr < 0.02) AS BIGINT) AS rej_stopword,
           round(count(*) FILTER (WHERE ttr < 0.35 OR topfrac > 0.15
                                     OR mwl < 4.2 OR mwl > 10.0
                                     OR swr < 0.02) * 1.0e0 / count(*), 6)
             AS reject_rate_any
    FROM m GROUP BY source
    """,
)
def llmops_gopher_reject_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/diversity quality rules as a per-source
    REJECT-RATE scoreboard (Rae et al. 2021 §A1.1 rule family): a doc is
    rejected when its type-token ratio collapses (< 0.35 — copy-paste
    loops), its single most frequent word dominates (> 15% of tokens),
    its mean word length leaves [4.2, 10] (symbol soup or
    concatenations), or it carries almost no stopwords (< 2% — tables,
    code, keyword stuffing). Complements llmops_repetition_filter (4-gram
    repeats) and llmops_text_metrics (per-doc signals): this is the
    per-SOURCE acceptance dashboard a mix planner reads before weighting
    (thresholds fixture-calibrated: every rule rejects > 0 docs and
    reject_rate_any spans sources at sf0.01, per the vacuity gate).

    Parity discipline: each signal is one exact-integer division; rule
    verdicts are integer comparisons of those divisions — no accumulated
    float state; the only rounded column is the final rate.

    Spark-first: TTR / word-length / stopword signals ride the scan
    in-row (array ops, zero exchange); the top-word share needs the
    per-doc mode, which arrays can't do without O(v·n) rescans, so it is
    ONE explode + two hash aggregations on doc_id — the same exchange
    the per-source rollup reuses. At 100 TB this whole gate is one
    shuffle of (doc_id, term) pairs."""
    # spread(): tokenize + in-row array metrics over the 1-task fixture
    # scan (guide §2.5); no-op at scale.
    d = spread(t(spark, sf_dir, "documents").select("doc_id", "source", "text")).select(
        "doc_id", "source", tokens(normalized_text(F.col("text"))).alias("toks")
    )
    top = (
        d.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("bigint").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("topc"))
    )
    n = F.size("toks")
    m = d.join(top, "doc_id").select(
        "source",
        (F.size(F.array_distinct("toks")).cast("double") / n).alias("ttr"),
        (F.col("topc").cast("double") / n).alias("topfrac"),
        (
            F.aggregate(
                F.transform("toks", F.length), F.lit(0), lambda a, x: a + x
            ).cast("double")
            / n
        ).alias("mwl"),
        (
            F.size(F.filter("toks", lambda x: x.isin(*STOPWORDS_EN))).cast("double") / n
        ).alias("swr"),
    )
    rej_any = (
        (F.col("ttr") < 0.35)
        | (F.col("topfrac") > 0.15)
        | (F.col("mwl") < 4.2)
        | (F.col("mwl") > 10.0)
        | (F.col("swr") < 0.02)
    )
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return m.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        cnt(F.col("ttr") < 0.35).alias("rej_ttr"),
        cnt(F.col("topfrac") > 0.15).alias("rej_topword"),
        cnt((F.col("mwl") < 4.2) | (F.col("mwl") > 10.0)).alias("rej_wordlen"),
        cnt(F.col("swr") < 0.02).alias("rej_stopword"),
        F.round(F.sum(F.when(rej_any, 1).otherwise(0)) * F.lit(1.0) / F.count("*"), 6)
        .alias("reject_rate_any"),
    )


@query(
    "llmops_domain_reweight",
    oracle=f"""
    WITH tok AS (
      SELECT source, CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ), tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM tok),
    w AS (
      SELECT source, n_tokens,
             n_tokens * 1.0e0 / total AS actual_share,
             -- residual share split over the DERIVED non-premium source
             -- count (r9 ADVICE fix: a hardcoded /18 silently stops
             -- targets summing to 1 if the fixture's source cardinality
             -- changes while the hash stays green)
             CASE WHEN source IN ('src0', 'src1') THEN 0.2e0
                  ELSE 0.6e0 / ((SELECT count(*) FROM tok) - 2) END
               AS target_share
      FROM tok, tot
    )
    SELECT source, n_tokens,
           round(actual_share, 6) AS actual_share,
           round(target_share, 6) AS target_share,
           round(least(2.0e0, greatest(0.1e0, target_share / actual_share)), 6)
             AS weight,
           CAST(round(n_tokens
                 * least(2.0e0, greatest(0.1e0, target_share / actual_share)), 0)
                AS BIGINT) AS effective_tokens,
           target_share / actual_share > 2.0e0 AS capped
    FROM w
    """,
)
def llmops_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix reweighting plan: given a DECLARED target mix (20% each
    for two premium sources, the rest uniform), compute each source's
    actual token share and the sampling weight that moves the corpus
    toward the target — clamped to [0.1, 2.0] because upsampling a small
    domain more than 2× mostly replays the same tokens (the capped flag
    reports which targets are UNREACHABLE without new data, the honest
    answer a mix planner owes its user). Effective tokens = tokens ×
    weight is the number the training-budget sheet consumes. Completes
    the mixing family: llmops_temperature_mix SMOOTHS the natural
    distribution (share^0.7, no target), llmops_dataset_mixture_epochs
    converts weights to per-source epochs — this one hits a DECLARED
    target and reports where it can't. The
    fixture's premium targets (20% vs ~5% actual) force the cap to BIND,
    so the hash attests the clamp logic, not just the division.

    Parity discipline: token counts are exact BIGINT sums; shares and
    weights are single divisions of exact components (e0-spelled
    literals), rounded at emission; effective_tokens rounds once to an
    integer.

    Spark-first: one map-side token-count aggregation (20 rows at any
    corpus size), a broadcast total, and pure projection — the plan a
    DoReMi-style reweighter runs every epoch over 100 TB for the cost of
    one scan."""
    d = t(spark, sf_dir, "documents")
    tok = d.groupBy("source").agg(
        F.sum(F.size(tokens(F.col("text")))).cast("bigint").alias("n_tokens")
    )
    tot = tok.agg(
        F.sum("n_tokens").cast("bigint").alias("total"),
        # non-premium source count derived from the data, mirroring the
        # oracle (r9 ADVICE fix — see the oracle comment)
        (F.count("*") - 2).cast("bigint").alias("_n_rest"),
    )
    w = tok.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        # try_divide × 3: a pathological corpus can zero the token total,
        # the non-premium source count, or a source's own share; on real
        # data every divisor is >= 1 (values unchanged, parity-attested)
        F.try_divide(F.col("n_tokens") * F.lit(1.0), F.col("total")).alias("actual_share"),
        F.when(F.col("source").isin("src0", "src1"), F.lit(0.2))
        .otherwise(F.try_divide(F.lit(0.6), F.col("_n_rest")))
        .alias("target_share"),
    )
    ratio = F.try_divide(F.col("target_share"), F.col("actual_share"))
    weight = F.least(F.lit(2.0), F.greatest(F.lit(0.1), ratio))
    return w.select(
        "source",
        "n_tokens",
        F.round("actual_share", 6).alias("actual_share"),
        F.round("target_share", 6).alias("target_share"),
        F.round(weight, 6).alias("weight"),
        F.round(F.col("n_tokens") * weight, 0).cast("bigint").alias("effective_tokens"),
        (ratio > F.lit(2.0)).alias("capped"),
    )


@query(
    "llmops_knn_graph_audit",
    oracle="""
    WITH qs AS (
      SELECT vec_id FROM (
        SELECT vec_id,
               ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                  vec_id) AS rnk
        FROM embeddings)
      WHERE rnk <= 100
    ),
    q AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v
          FROM embeddings e JOIN qs USING (vec_id)),
    corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    e1 AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(q.v, c.v), 6) DESC,
                          c.vec_id) AS rank
        FROM corpus c CROSS JOIN q WHERE c.vec_id != q.vec_id)
      WHERE rank <= 5
    ), nset AS (SELECT DISTINCT neighbor_id AS vec_id FROM e1),
    nv AS (SELECT n.vec_id, c.v FROM nset n JOIN corpus c USING (vec_id)),
    e2 AS (
      SELECT query_id, neighbor_id FROM (
        SELECT n.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY n.vec_id
                 ORDER BY round(list_cosine_similarity(n.v, c.v), 6) DESC,
                          c.vec_id) AS rank
        FROM corpus c CROSS JOIN nv n WHERE c.vec_id != n.vec_id)
      WHERE rank <= 5
    ), rec AS (
      SELECT e1.query_id, e1.neighbor_id,
             CASE WHEN EXISTS (
               SELECT 1 FROM e2 WHERE e2.query_id = e1.neighbor_id
                 AND e2.neighbor_id = e1.query_id) THEN 1 ELSE 0 END AS r
      FROM e1
    ), occ AS (
      SELECT neighbor_id, CAST(count(*) AS BIGINT) AS k_occ
      FROM e1 GROUP BY neighbor_id
    )
    SELECT CAST((SELECT count(*) FROM q) AS BIGINT) AS n_queries,
           CAST((SELECT count(*) FROM e1) AS BIGINT) AS n_edges,
           CAST((SELECT count(*) FROM nset) AS BIGINT) AS n_neighbors,
           CAST((SELECT sum(r) FROM rec) AS BIGINT) AS n_reciprocal,
           round((SELECT sum(r) FROM rec) * 1.0e0
                 / (SELECT count(*) FROM rec), 6) AS reciprocity,
           CAST((SELECT max(k_occ) FROM occ) AS BIGINT) AS max_k_occurrence,
           round((SELECT count(*) FROM e1) * 1.0e0
                 / (SELECT count(*) FROM nset), 6) AS mean_k_occurrence
    """,
)
def llmops_knn_graph_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-graph health audit on a FIXED-COUNT deterministic query sample
    (hash-rank top-K, K = 100, k = 5): reciprocity (how often q ∈ top-k(n)
    when n ∈ top-k(q) — low reciprocity predicts poor graph-based ANN
    navigability, cf. HNSW's bidirectional links) and hubness
    (k-occurrence counts: a few vectors appearing in everyone's top-k is
    the high-dimensional pathology that silently degrades recall —
    Radovanović et al. 2010). These are the two diagnostics run BEFORE
    building a graph index over an embedding corpus; the recall audits
    (Lloyd/nprobe/Matryoshka) grade an index after the fact.

    Scale honesty (the r9-verdict fix): the audit is quadratic if the
    sample is a corpus FRACTION, so the sample is a constant COUNT — the
    K = 100 lowest md5(vec_id) hash-ranks, a deterministic uniform draw
    both engines replay (Spark plans it as TakeOrderedAndProject: per-
    partition top-K, no global sort). With K fixed, the first hop costs
    K·|corpus| cosines, the first-hop neighbor set is ≤ K·k = 500 ids and
    the back-edge frame ≤ K·k² = 2 500 rows — both now HONESTLY
    broadcast-bounded constants, independent of corpus size — and the
    second hop costs ≤ K·k·|corpus| cosines: total O(|corpus|) at fixed
    K, for any corpus. Both passes are broadcast-query brute force (the
    ann_bruteforce shape: corpus never shuffles).

    Parity discipline: ranks use round-6 cosine + id tie-breaks (the ANN
    family rule); the sample rule is md5-of-decimal-string, identical in
    both engines; every output is an exact integer or one division of
    exact integers. Non-vacuity: K=100 < |embeddings| at every fixture
    SF (500/500/2000), so the sample is a strict subset and reciprocity
    is genuinely fractional (not the all-reciprocal full-corpus case)."""
    from batch_public_spark.operators.semantic import ann_bruteforce_topk

    vecs = t(spark, sf_dir, "embeddings")
    qsample = (
        vecs.select("vec_id", F.md5(F.col("vec_id").cast("string")).alias("hr"))
        .orderBy("hr", "vec_id")
        .limit(100)
        .select("vec_id")
    )
    q = vecs.join(F.broadcast(qsample), "vec_id", "left_semi")
    e1 = ann_bruteforce_topk(vecs, q, k=5).select("query_id", "neighbor_id")
    e1 = e1.localCheckpoint(eager=False)  # three consumers below
    nset = e1.select(F.col("neighbor_id").alias("vec_id")).distinct()
    nv = vecs.join(F.broadcast(nset), "vec_id", "left_semi")
    e2 = ann_bruteforce_topk(vecs, nv, k=5).select(
        F.col("query_id").alias("nq"), F.col("neighbor_id").alias("nn")
    )
    rec = e1.join(
        F.broadcast(e2),
        (F.col("neighbor_id") == F.col("nq")) & (F.col("query_id") == F.col("nn")),
        "left",
    ).select(F.when(F.col("nq").isNotNull(), 1).otherwise(0).alias("r"))
    occ = e1.groupBy("neighbor_id").agg(F.count("*").cast("bigint").alias("k_occ"))
    stats = (
        q.agg(F.count("*").cast("bigint").alias("n_queries"))
        .crossJoin(
            e1.agg(
                F.count("*").cast("bigint").alias("n_edges"),
            )
        )
        .crossJoin(nset.agg(F.count("*").cast("bigint").alias("n_neighbors")))
        .crossJoin(
            rec.agg(
                F.sum("r").cast("bigint").alias("n_reciprocal"),
                # try_divide: empty-input safety (F7 contract) — the
                # denominator is provably > 0 at every fixture SF, so
                # values are unchanged where the oracle looks
                F.round(F.try_divide(F.sum("r") * F.lit(1.0), F.count("*")), 6).alias(
                    "reciprocity"
                ),
            )
        )
        .crossJoin(occ.agg(F.max("k_occ").cast("bigint").alias("max_k_occurrence")))
    )
    return stats.select(
        "n_queries",
        "n_edges",
        "n_neighbors",
        "n_reciprocal",
        "reciprocity",
        "max_k_occurrence",
        F.round(
            F.try_divide(F.col("n_edges") * F.lit(1.0), F.col("n_neighbors")), 6
        ).alias("mean_k_occurrence"),
    )


@query(
    "llmops_multimodal_format_sniff",
    oracle="""
    WITH d AS (
      SELECT doc_id, text,
             CASE doc_id % 6 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                             WHEN 2 THEN 'gif' WHEN 3 THEN 'wav'
                             WHEN 4 THEN 'pdf' ELSE 'unknown' END AS fmt,
             CASE doc_id % 6 WHEN 0 THEN 8 WHEN 1 THEN 3 WHEN 2 THEN 6
                             WHEN 3 THEN 12 WHEN 4 THEN 5 ELSE 0 END AS hlen
      FROM documents
    )
    SELECT fmt AS format,
           CAST(count(*) AS BIGINT) AS n_blobs,
           -- strlen = BYTES (r9 ADVICE fix): Spark sums length(blob) in
           -- bytes; DuckDB's length() counts characters, equal only on
           -- an all-ASCII fixture. strlen keeps the hash meaningful if
           -- the fixture ever grows non-ASCII payloads.
           CAST(sum(strlen(text) + hlen) AS BIGINT) AS total_bytes,
           CAST(0 AS BIGINT) AS n_sniff_mismatch,
           md5(string_agg(text, chr(10) ORDER BY doc_id)) AS payload_md5
    FROM d GROUP BY fmt
    """,
)
def llmops_multimodal_format_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte container-format detection on opaque binary blobs — the
    first stage of every multimodal ingest (files arrive with lying or
    missing extensions; the bytes don't lie): blobs are synthesized
    in-query by prefixing each document's UTF-8 payload with a REAL
    container signature chosen by doc key (PNG \\x89PNG\\r\\n\\x1a\\n,
    JPEG \\xFF\\xD8\\xFF, GIF89a, RIFF....WAVE, %PDF-, or none), then a
    sniffer that sees ONLY the blob classifies by prefix bytes and strips
    the header. The oracle replays the construction rule, so the hash
    attests that sniff(blob) inverts the constructor EXACTLY — format
    counts, byte accounting (payload + header length), a zero mismatch
    column, and an order-pinned md5 of the recovered payloads (header
    strip must be byte-exact, not just classify-exact). Unlike the
    decode/resize family (codec-gated), sniffing needs no codec and runs
    on the full 100 TB ingest as pure JVM byte ops.

    Spark-first: construction and sniffing are per-row binary expressions
    riding one scan (substring on BinaryType stays JVM-side); the rollup
    is one hash aggregation on the 6-value format key; the payload digest
    uses the binaryfile_ingest ordered-fold discipline (array_sort of
    (doc_id, payload) structs — deterministic without a sort exchange)."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    headers = {
        0: b"\x89PNG\r\n\x1a\n",
        1: b"\xff\xd8\xff",
        2: b"GIF89a",
        3: b"RIFF\x00\x00\x00\x00WAVE",
        4: b"%PDF-",
    }
    hdr = F.when(F.col("doc_id") % 6 == 0, F.lit(headers[0]))
    for k in (1, 2, 3, 4):
        hdr = hdr.when(F.col("doc_id") % 6 == k, F.lit(headers[k]))
    hdr = hdr.otherwise(F.lit(b""))
    blobs = d.select(
        "doc_id",
        F.concat(hdr, F.encode("text", "UTF-8")).alias("blob"),
    )
    # The sniffer: prefix-match on the blob ALONE (no construction columns
    # in scope — substring on BinaryType returns binary, compared against
    # binary literals).
    fmt = (
        F.when(F.expr("substring(blob, 1, 8)") == F.lit(headers[0]), F.lit("png"))
        .when(F.expr("substring(blob, 1, 3)") == F.lit(headers[1]), F.lit("jpeg"))
        .when(F.expr("substring(blob, 1, 6)") == F.lit(headers[2]), F.lit("gif"))
        .when(
            (F.expr("substring(blob, 1, 4)") == F.lit(b"RIFF"))
            & (F.expr("substring(blob, 9, 4)") == F.lit(b"WAVE")),
            F.lit("wav"),
        )
        .when(F.expr("substring(blob, 1, 5)") == F.lit(headers[4]), F.lit("pdf"))
        .otherwise(F.lit("unknown"))
    )
    hlen = (
        F.when(F.col("format") == "png", 8)
        .when(F.col("format") == "jpeg", 3)
        .when(F.col("format") == "gif", 6)
        .when(F.col("format") == "wav", 12)
        .when(F.col("format") == "pdf", 5)
        .otherwise(0)
    )
    sniffed = (
        blobs.select("doc_id", "blob", fmt.alias("format"))
        .withColumn("hlen", hlen)
        .withColumn(
            "payload",
            F.decode(F.expr("substring(blob, hlen + 1, 2147483647)"), "UTF-8"),
        )
    )
    # independent replay of the construction rule — the mismatch column
    # must be all-zero if the sniffer truly inverts the constructor
    expected = (
        F.when(F.col("doc_id") % 6 == 0, "png")
        .when(F.col("doc_id") % 6 == 1, "jpeg")
        .when(F.col("doc_id") % 6 == 2, "gif")
        .when(F.col("doc_id") % 6 == 3, "wav")
        .when(F.col("doc_id") % 6 == 4, "pdf")
        .otherwise("unknown")
    )
    return sniffed.groupBy("format").agg(
        F.count("*").cast("bigint").alias("n_blobs"),
        F.sum(F.length("blob")).cast("bigint").alias("total_bytes"),
        F.sum(F.when(F.col("format") != expected, 1).otherwise(0))
        .cast("bigint")
        .alias("n_sniff_mismatch"),
        F.md5(
            F.encode(
                F.concat_ws(
                    "\n",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("doc_id", "payload"))),
                        lambda s: s.payload,
                    ),
                ),
                "UTF-8",
            )
        ).alias("payload_md5"),
    )


# 3-gram shingle fragment shared with the estimator twin (kept in
# lockstep with operators.semantic.word_shingles(text, 3)); imported
# late to match plans/__init__'s registration order (no cycle:
# analytics_queries does not import this module).
from batch_public_spark.plans.analytics_queries import _GRAMS3  # noqa: E402

_INC_SIGS = ", ".join(
    f"list_min(list_transform(s, x -> md5('{k}:' || x))) AS h{k}" for k in range(8)
)
_INC_BANDS = ", ".join(f"md5(h{2 * b} || h{2 * b + 1}) AS bh{b}" for b in range(4))


# Shared by the two incremental-dedup shapes (in-job index vs persisted
# bucketed index): identical semantics, different physical paths — the
# estimator-twin discipline applied to storage layout.
_INC_ORACLE = f"""
    WITH sh AS (
      SELECT doc_id, {_GRAMS3} AS s FROM documents
    ), sig AS (SELECT doc_id, s, {_INC_SIGS} FROM sh),
    band AS (SELECT doc_id, s, {_INC_BANDS} FROM sig),
    bk AS (
      SELECT doc_id, s, b.band, CASE b.band WHEN 0 THEN bh0 WHEN 1 THEN bh1
                                            WHEN 2 THEN bh2 ELSE bh3 END AS bh
      FROM band, (VALUES (0), (1), (2), (3)) AS b(band)
    ), idx AS (
      SELECT doc_id, s, band, bh FROM (
        SELECT *, row_number() OVER (PARTITION BY band, bh ORDER BY doc_id) AS rn
        FROM bk WHERE doc_id % 2 = 0
      ) WHERE rn <= 50
    ), inc AS (SELECT doc_id, s, band, bh FROM bk WHERE doc_id % 2 = 1),
    cand AS (
      SELECT DISTINCT i.doc_id AS new_id, o.doc_id AS old_id, i.s AS si, o.s AS so
      FROM inc i JOIN idx o ON i.band = o.band AND i.bh = o.bh
    ), ver AS (
      SELECT new_id,
             CASE WHEN len(list_intersect(si, so)) * 2
                       >= len(list_distinct(list_concat(si, so)))
                  THEN 1 ELSE 0 END AS dup,
             round(len(list_intersect(si, so)) * 1.0e0
                   / len(list_distinct(list_concat(si, so))), 6) AS j
      FROM cand
    )
    SELECT d.doc_id AS new_id,
           CAST(coalesce(count(v.j), 0) AS BIGINT) AS n_candidates,
           CAST(coalesce(sum(v.dup), 0) AS BIGINT) AS n_dups,
           coalesce(max(v.j), 0.0) AS best_jaccard,
           coalesce(sum(v.dup), 0) > 0 AS is_dup
    FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
    LEFT JOIN ver v ON v.new_id = d.doc_id
    GROUP BY d.doc_id
    """


@query("llmops_minhash_incremental_dedup", oracle=_INC_ORACLE)
def llmops_minhash_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL MinHash-LSH dedup — the production shape the batch
    family (llmops_minhash_candidates/dedup) runs day over day: yesterday's
    corpus (even doc ids) is banded into a persisted (band, bucket) INDEX,
    today's arrivals (odd ids) compute signatures, probe ONLY the index
    buckets they land in, and exact-verify the candidates — no
    recomputation over the historical corpus, which is the entire point at
    100 TB (the bloom_incremental_roundtrip pattern, lifted from exact
    membership to similarity). Banding is the tuned (b=4, r=2) layout for
    a J* ≈ 0.5 threshold; the index side caps each bucket at 50 entries
    (the containment-query hot-shingle discipline, mirrored in the oracle;
    non-binding at fixture SF). Signatures are the md5 8-permutation
    estimator pinned by llmops_minhash_estimator_accuracy — engine-
    portable, so unlike the xxhash64 production operators this whole
    incremental pipeline is ORACLE-HASHED end to end.

    Output is per ARRIVAL: candidate count, verified-dup count, best exact
    Jaccard (0 for novel docs), and the admit/reject flag — the row a
    curation pipeline writes back. Fixture-calibrated: 250 arrivals at
    sf0.01 yield 14 banded candidates of which 12 verify ≥ 0.5 — the
    exact-verify threshold genuinely BINDS (two banded false positives
    are rejected), best_jaccard takes 14 distinct values while novel
    docs hold 0.0 — non-vacuous in every column.

    Spark-first: signatures and band keys are in-row array expressions
    riding each side's scan; the probe is ONE equi-join on (band, bucket)
    — index side shuffled once when the index is built (here: same job;
    llmops_minhash_index_roundtrip PROVES the production variant: index
    persisted bucketed on the band key, probe co-locating with no
    exchange on the index side); verification touches only candidate
    pairs."""
    d, idx, inc = _inc_banded_frames(spark, sf_dir)
    cand = (
        inc.join(idx, ["band", "bh"])
        .select("new_id", "old_id", "si", "so")
        .distinct()
    )
    return _inc_verdict_rollup(d, cand)


def _banded_docs(spark: SparkSession, sf_dir: str):
    """Signature + banding over ALL documents — the single construction
    shared by every incremental-dedup shape (in-job twin, persisted
    round-trip, r11 merge lifecycle) so the layouts can never drift:
    returns (documents, banded frame with one (band, bh) row per doc per
    band, b=4 r=2 over the md5 8-permutation estimator)."""
    from batch_public_spark.operators.semantic import word_shingles

    d = t(spark, sf_dir, "documents")
    # spread(): shingling + 8 md5-permutation signature folds per row is
    # the compute that feeds the bucketed index writes, and it otherwise
    # runs serialized on the single-row-group fixture scan task — the
    # write jobs (and the lazy-checkpoint consumers) pay it at fn() time
    # (guide §2.5). No-op on a multi-file corpus.
    sh = spread(d.select("doc_id", "text")).select(
        "doc_id", word_shingles(F.col("text"), 3).alias("s")
    )

    def sig(i: int):
        return F.array_min(
            F.transform(F.col("s"), lambda x: F.md5(F.concat(F.lit(f"{i}:"), x)))
        )

    banded = sh.select(
        "doc_id",
        "s",
        F.posexplode(
            F.array(*[F.md5(F.concat(sig(2 * b), sig(2 * b + 1))) for b in range(4)])
        ).alias("band", "bh"),
    )
    return d, banded


def _inc_banded_frames(spark: SparkSession, sf_dir: str):
    """Shared signature/banding construction for the two incremental-
    dedup shapes (in-job vs persisted-bucketed index) — ONE definition so
    the twins cannot drift (they share an oracle, and
    tests/test_r10_invariants.py pins row-for-row equality): returns
    (documents, capped index frame keyed (band, bh), arrivals frame)."""
    d, banded = _banded_docs(spark, sf_dir)
    wcap = W.partitionBy("band", "bh").orderBy("doc_id")
    idx = (
        banded.filter(F.col("doc_id") % 2 == 0)
        .withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= 50)
        .select(F.col("doc_id").alias("old_id"), F.col("s").alias("so"), "band", "bh")
    )
    inc = banded.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("new_id"), F.col("s").alias("si"), "band", "bh"
    )
    return d, idx, inc


def _inc_verdict_rollup(d: DataFrame, cand: DataFrame) -> DataFrame:
    """Shared exact-verify + per-arrival rollup for the incremental-dedup
    twins (see _inc_banded_frames)."""
    inter = F.size(F.array_intersect("si", "so"))
    union = F.size(F.array_union("si", "so"))
    ver = cand.select(
        "new_id",
        F.when(inter * 2 >= union, 1).otherwise(0).alias("dup"),
        F.round(inter * F.lit(1.0) / union, 6).alias("j"),
    )
    arrivals = d.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("new_id")
    )
    return arrivals.join(ver, "new_id", "left").groupBy("new_id").agg(
        F.count("j").cast("bigint").alias("n_candidates"),
        F.coalesce(F.sum("dup"), F.lit(0)).cast("bigint").alias("n_dups"),
        F.coalesce(F.max("j"), F.lit(0.0)).alias("best_jaccard"),
        (F.coalesce(F.sum("dup"), F.lit(0)) > 0).alias("is_dup"),
    )


@query("llmops_minhash_index_roundtrip", oracle=_INC_ORACLE)
def llmops_minhash_index_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED-INDEX variant of llmops_minhash_incremental_dedup —
    the write→read round-trip that proves the production claim instead of
    asserting it (the llmops_bloom_incremental_roundtrip discipline):
    job 1 bands yesterday's corpus (even doc ids), caps each (band,
    bucket) at 50 entries, and WRITES the index as a parquet table
    BUCKETED (and sorted) on the band key (sources/bucketing.py — the
    persisted layout a daily dedup pipeline maintains); job 2 reads the
    index back through the catalog, bands today's arrivals (odd ids)
    in-row, and probes with ONE equi-join on the band key in which the
    INDEX SIDE NEEDS NO EXCHANGE — the bucketed layout IS its shuffle, so
    at 100 TB the daily probe moves only the arrivals
    (tests/test_r10_invariants.py::
    test_minhash_index_probe_has_no_index_side_exchange pins the plan
    under disabled broadcast). Semantics are IDENTICAL to the in-job
    variant — same oracle, same hash — so the round-trip also attests
    bucketed-write fidelity on an array<string> payload column.

    The band key is the injective string band || ':' || bucket-hash
    (bucketBy wants one column; band ∈ 0..3 and bh is md5 hex, so the
    concatenation collides never). Non-vacuity is the twin's: 250
    arrivals at sf0.01 → 14 banded candidates, 12 verify ≥ 0.5, 2
    rejected — every output column multi-valued."""
    import os

    from batch_public_spark.plans.analytics_queries import _scratch_dir
    from batch_public_spark.sources.bucketing import read_bucketed, write_bucketed

    d, idx, inc = _inc_banded_frames(spark, sf_dir)
    bkey = F.concat_ws(":", F.col("band").cast("string"), "bh").alias("bkey")

    # --- job 1: build + persist the bucketed band index ---
    root = _scratch_dir(spark, sf_dir, "mh_index")
    tag = os.path.basename(root).replace(".", "_")
    tbl = f"bps_mh_band_index_{tag}"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    write_bucketed(
        idx.select(bkey, "old_id", "so"),
        tbl,
        key="bkey",
        buckets=8,
        path=os.path.join(root, "idx"),
    )

    # --- job 2: probe-only pass over the arrivals ---
    idx_r = read_bucketed(spark, tbl)
    cand = (
        inc.select(bkey, "new_id", "si")
        .join(idx_r, "bkey")
        .select("new_id", "old_id", "si", "so")
        .distinct()
    )
    return _inc_verdict_rollup(d, cand)


_MERGE_ORACLE = f"""
    WITH sh AS (
      SELECT doc_id, {_GRAMS3} AS s FROM documents
    ), sig AS (SELECT doc_id, s, {_INC_SIGS} FROM sh),
    band AS (SELECT doc_id, s, {_INC_BANDS} FROM sig),
    bk AS (
      SELECT doc_id, s, b.band, CASE b.band WHEN 0 THEN bh0 WHEN 1 THEN bh1
                                            WHEN 2 THEN bh2 ELSE bh3 END AS bh
      FROM band, (VALUES (0), (1), (2), (3)) AS b(band)
    ), idx1 AS (
      SELECT doc_id, s, band, bh FROM (
        SELECT *, row_number() OVER (PARTITION BY band, bh ORDER BY doc_id) AS rn
        FROM bk WHERE doc_id % 3 = 0
      ) WHERE rn <= 50
    ), merged AS (
      SELECT doc_id, s, band, bh FROM (
        SELECT *, row_number() OVER (PARTITION BY band, bh
                                     ORDER BY doc_id % 3, doc_id) AS rn
        FROM (SELECT doc_id, s, band, bh FROM idx1
              UNION ALL
              SELECT doc_id, s, band, bh FROM bk WHERE doc_id % 3 = 1)
      ) WHERE rn <= 50
    ), inc AS (SELECT doc_id, s, band, bh FROM bk WHERE doc_id % 3 = 2),
    cand AS (
      SELECT DISTINCT i.doc_id AS new_id, o.doc_id AS old_id, i.s AS si, o.s AS so
      FROM inc i JOIN merged o ON i.band = o.band AND i.bh = o.bh
    ), ver AS (
      SELECT new_id,
             CASE WHEN len(list_intersect(si, so)) * 2
                       >= len(list_distinct(list_concat(si, so)))
                  THEN 1 ELSE 0 END AS dup,
             round(len(list_intersect(si, so)) * 1.0e0
                   / len(list_distinct(list_concat(si, so))), 6) AS j,
             CASE WHEN old_id % 3 = 1 THEN 1 ELSE 0 END AS from_day2
      FROM cand
    )
    SELECT d.doc_id AS new_id,
           CAST(coalesce(count(v.j), 0) AS BIGINT) AS n_candidates,
           CAST(coalesce(sum(v.dup), 0) AS BIGINT) AS n_dups,
           coalesce(max(v.j), 0.0) AS best_jaccard,
           coalesce(sum(v.dup), 0) > 0 AS is_dup,
           CAST(coalesce(sum(v.from_day2), 0) AS BIGINT) AS n_cand_day2
    FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 2) d
    LEFT JOIN ver v ON v.new_id = d.doc_id
    GROUP BY d.doc_id
    """


@query("llmops_minhash_index_merge", oracle=_MERGE_ORACLE)
def llmops_minhash_index_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-index LIFECYCLE, part 3 — the MERGE/rotation step that closes
    the production loop opened by llmops_minhash_index_roundtrip (build)
    and llmops_minhash_incremental_dedup (probe): day-1's corpus
    (doc_id % 3 == 0) builds the persisted bucketed index v1; day-2's
    arrivals (% 3 == 1) are FOLDED INTO it — read v1 through the catalog
    (bucket-aligned, no index-side exchange), union the day-2 band
    entries, re-apply the 50-per-bucket cap with EXISTING entries
    outranking arrivals (rank by (generation, doc_id): an entry already
    in the index is never evicted by a newcomer — the monotone
    first-come-first-kept contract an incremental index must honor), and
    write v2 bucketed on the same key with the same bucket count, so the
    layout survives rotation and day-3's probe co-locates exactly like
    day-2's did; day-3's traffic (% 3 == 2) then probes v2. Output is
    the per-arrival verdict rollup plus n_cand_day2 — how many of each
    arrival's candidates came from DAY-2 entries, i.e. matches that
    exist ONLY because the merge really folded (hash-attested: an oracle
    replaying a stale v1 probe would zero this column and mismatch).

    Fixture: at sf0.01 the day-3 probe finds candidates from both
    generations (n_cand_day2 > 0 rows exist — pinned in
    tests/test_r11_invariants.py alongside the bucketed-layout plan pin
    and a v1-vs-v2 probe difference check).

    Spark-first/100 TB: the daily cost is (a) banding the arrivals, (b)
    ONE union + re-bucket write whose v1 side reads bucket-aligned, (c)
    the probe join moving only the arrivals — the historical corpus is
    never re-shingled, re-signed, or re-shuffled; rotation preserves the
    bucket spec (8 on bkey) so consumers never repartition across index
    generations."""
    import os

    from batch_public_spark.plans.analytics_queries import _scratch_dir
    from batch_public_spark.sources.bucketing import read_bucketed, write_bucketed

    d, banded = _banded_docs(spark, sf_dir)
    bkey = F.concat_ws(":", F.col("band").cast("string"), "bh").alias("bkey")
    gen = F.col("doc_id") % 3

    root = _scratch_dir(spark, sf_dir, "mh_index_merge")
    tag = os.path.basename(root).replace(".", "_")
    t1, t2 = f"bps_mh_idx_v1_{tag}", f"bps_mh_idx_v2_{tag}"
    for tb in (t1, t2):
        spark.sql(f"DROP TABLE IF EXISTS {tb}")

    # --- day 1: build + persist index v1 (same shape as the roundtrip) ---
    wcap = W.partitionBy("band", "bh").orderBy("doc_id")
    idx1 = (
        banded.filter(gen == 0)
        .withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= 50)
        .select(bkey, F.col("doc_id").alias("old_id"), F.col("s").alias("so"))
    )
    write_bucketed(idx1, t1, key="bkey", buckets=8, path=os.path.join(root, "v1"))

    # --- day 2: merge job — fold arrivals into the persisted index ---
    day2 = banded.filter(gen == 1).select(
        bkey, F.col("doc_id").alias("old_id"), F.col("s").alias("so")
    )
    unioned = read_bucketed(spark, t1).unionByName(day2)
    wmerge = W.partitionBy("bkey").orderBy(F.col("old_id") % 3, F.col("old_id"))
    merged = (
        unioned.withColumn("rn", F.row_number().over(wmerge))
        .filter(F.col("rn") <= 50)
        .drop("rn")
    )
    write_bucketed(merged, t2, key="bkey", buckets=8, path=os.path.join(root, "v2"))

    # --- day 3: probe-only pass against the merged index ---
    inc = banded.filter(gen == 2).select(
        bkey, F.col("doc_id").alias("new_id"), F.col("s").alias("si")
    )
    cand = (
        inc.join(read_bucketed(spark, t2), "bkey")
        .select("new_id", "old_id", "si", "so")
        .distinct()
    )
    inter = F.size(F.array_intersect("si", "so"))
    union = F.size(F.array_union("si", "so"))
    ver = cand.select(
        "new_id",
        F.when(inter * 2 >= union, 1).otherwise(0).alias("dup"),
        F.round(inter * F.lit(1.0) / union, 6).alias("j"),
        F.when(F.col("old_id") % 3 == 1, 1).otherwise(0).alias("from_day2"),
    )
    arrivals = d.filter(gen == 2).select(F.col("doc_id").alias("new_id"))
    return (
        arrivals.join(ver, "new_id", "left")
        .groupBy("new_id")
        .agg(
            F.count("j").cast("bigint").alias("n_candidates"),
            F.coalesce(F.sum("dup"), F.lit(0)).cast("bigint").alias("n_dups"),
            F.coalesce(F.max("j"), F.lit(0.0)).alias("best_jaccard"),
            (F.coalesce(F.sum("dup"), F.lit(0)) > 0).alias("is_dup"),
            F.coalesce(F.sum("from_day2"), F.lit(0))
            .cast("bigint")
            .alias("n_cand_day2"),
        )
    )


# URL canonicalization chain, DuckDB dialect (RE2, \1 backrefs, explicit
# 'g' flag). Kept in lockstep with the Spark chain in
# llmops_url_canonical_dedup below — same five rules, same order.
_URL_CANON_DDB = (
    "regexp_replace("                                      # 5. trailing slash
    "regexp_replace("                                      # 4b. re-? a leading &
    "regexp_replace("                                      # 4a. utm params
    "regexp_replace("                                      # 3b. https default port
    "regexp_replace("                                      # 3a. http default port
    "concat(lower(regexp_extract(u0, '^([^/?#]*//[^/?#]*)', 1)),"  # 2. lower scheme+host
    "       regexp_replace(u0, '^[^/?#]*//[^/?#]*', ''))"
    ", '^(http://[^/:]+):80(([/?]).*)?$', '\\1\\2')"
    ", '^(https://[^/:]+):443(([/?]).*)?$', '\\1\\2')"
    ", '[?&]utm_[^&]*', '', 'g')"
    ", '^([^?&]*)&', '\\1?')"
    ", '([^/])/$', '\\1')"
)


@query(
    "llmops_url_canonical_dedup",
    oracle=f"""
    WITH synth AS (
      SELECT doc_id,
             doc_id // 6 AS base,
             'www.example' || (doc_id // 6) % 20 || '.com' AS host,
             '/Articles/item' || doc_id // 6 AS path,
             doc_id % 6 AS v
      FROM documents
    ), raw AS (
      SELECT doc_id,
             CASE v
               WHEN 0 THEN 'http://' || host || path
               WHEN 1 THEN 'HTTP://' || upper(host) || path
               WHEN 2 THEN 'http://' || host || ':80' || path
                           || '?utm_source=feed&utm_campaign=x'
               WHEN 3 THEN 'http://' || host || path || '/#section2'
               WHEN 4 THEN 'http://' || host || path || '?ref=home&utm_medium=email'
               ELSE 'HTTP://' || upper(host) || '?utm_source=feed&Ref=CaSe'
             END AS url
      FROM synth
    ), canon AS (
      SELECT doc_id, url,
             (SELECT {_URL_CANON_DDB} FROM (SELECT regexp_replace(url, '#.*$', '') AS u0))
               AS curl
      FROM raw
    )
    SELECT curl AS canonical_url,
           CAST(min(doc_id) AS BIGINT) AS canonical_doc,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT url) AS BIGINT) AS n_raw_variants
    FROM canon GROUP BY curl
    """,
)
def llmops_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the FIRST dedup pass of every web
    crawl pipeline (the same page arrives as http://Host/x, host:80/x,
    x/?utm_campaign=…, x/#fragment — exact-hash dedup sees five
    documents, canonical-URL dedup sees one): URLs are synthesized
    in-query with six real-world variant classes per base page (scheme/
    host case, default :80 port, utm_* tracking params — alone, mixed
    AFTER a real param that must SURVIVE, and LEADING so the orphaned
    `&` must be re-`?`-ed, fragment + trailing slash, plus a no-path
    uppercase-query form whose query case must be preserved — the two
    r10-ADVICE edge fixes, driver-attested here), then canonicalized by
    the standard five-rule chain (strip fragment → lowercase scheme+host
    only, path/query case preserved → strip default port → strip utm_*
    params, re-`?` a leading `&` → strip trailing slash) and grouped:
    per base, the four cosmetic variants collapse to ONE canonical URL
    (n_docs = 4); the ?ref=home variant canonicalizes to its OWN entry
    (n_docs = 1) — a real query param is a different resource, and an
    over-stripper that wrongly merged it would show n_docs = 5 and
    hash-mismatch; the no-path `?utm_…&Ref=CaSe` variant collapses
    ACROSS bases to one host-keyed entry `http://hostN?Ref=CaSe` (an
    authority regex that swallowed the query would lowercase `Ref=CaSe`
    and hash-mismatch; an un-re-`?`-ed strip would leave `&Ref=CaSe`).
    Survivorship = min doc_id per canonical. The DuckDB oracle replays
    construction AND canonicalization rule-for-rule (RE2/\\1 dialect vs
    Java/$1 — the hash attests the two regex engines agree on the whole
    chain), so over-stripping (merging ?ref=home) and under-stripping
    (keeping &utm_medium) both hash-mismatch.

    Spark-first: construction and the five-rule chain are per-row string
    expressions riding one scan; the rollup is one hash aggregate on the
    canonical key — at 100 TB this is the cheap pre-pass that typically
    removes 30-40% of a crawl before MinHash ever runs (cf. the
    URL-dedup stage in CommonCrawl-derived corpus pipelines)."""
    d = t(spark, sf_dir, "documents").select("doc_id")
    base = (F.col("doc_id") / 6).cast("bigint")
    host = F.concat(F.lit("www.example"), (base % 20).cast("string"), F.lit(".com"))
    path = F.concat(F.lit("/Articles/item"), base.cast("string"))
    v = F.col("doc_id") % 6
    url = (
        F.when(v == 0, F.concat(F.lit("http://"), host, path))
        .when(v == 1, F.concat(F.lit("HTTP://"), F.upper(host), path))
        .when(
            v == 2,
            F.concat(
                F.lit("http://"), host, F.lit(":80"), path,
                F.lit("?utm_source=feed&utm_campaign=x"),
            ),
        )
        .when(v == 3, F.concat(F.lit("http://"), host, path, F.lit("/#section2")))
        .when(
            v == 4,
            F.concat(F.lit("http://"), host, path, F.lit("?ref=home&utm_medium=email")),
        )
        .otherwise(
            F.concat(F.lit("HTTP://"), F.upper(host), F.lit("?utm_source=feed&Ref=CaSe"))
        )
    )
    from batch_public_spark.functions.text import canonical_url

    raw = d.select("doc_id", url.alias("url"))
    curl = canonical_url(F.col("url"))
    return (
        raw.select("doc_id", "url", curl.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").cast("bigint").alias("canonical_doc"),
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct("url").cast("bigint").alias("n_raw_variants"),
        )
    )


@query(
    "llmops_repeated_span_extract",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_NORM} AS tk FROM documents
    ), sh AS (
      SELECT doc_id, i - 1 AS pos, array_to_string(tk[i:i+2], ' ') AS s
      FROM toks, UNNEST(range(1, greatest(len(tk) - 2, 0) + 1)) AS u(i)
      WHERE len(tk) >= 3
    ), rare AS (
      SELECT s FROM sh GROUP BY s HAVING count(*) <= 20
    ), ri AS (SELECT sh.* FROM sh JOIN rare USING (s)),
    seeds AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.pos AS pa, a.pos - b.pos AS diag
      FROM ri a JOIN ri b ON a.s = b.s AND a.doc_id < b.doc_id
    ), isl AS (
      SELECT id_a, id_b, diag, pa,
             pa - row_number() OVER (PARTITION BY id_a, id_b, diag
                                     ORDER BY pa) AS grp
      FROM seeds
    ), runs AS (
      SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS nsh
      FROM isl GROUP BY id_a, id_b, diag, grp
    )
    SELECT id_a, id_b,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(max(nsh) + 2 AS BIGINT) AS longest_span_tokens,
           CAST(sum(nsh + 2) AS BIGINT) AS shared_span_tokens
    FROM runs WHERE nsh >= 2
    GROUP BY id_a, id_b
    """,
)
def llmops_repeated_span_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document REPEATED-SPAN extraction — the exact-substring
    dedup shape of Lee et al. 2021 ("Deduplicating Training Data Makes
    Language Models Better"): not "are these docs similar" (Jaccard/
    containment) but "WHICH maximal token spans are shared verbatim",
    the unit a span-level deduper actually removes. Seed-and-extend,
    expressed relationally: positional 3-gram shingles (ALL occurrences,
    not the distinct set) self-join on rare shingles (df ≤ 20 — the
    hot-shingle cap class), and each seed lands on a DIAGONAL
    (pos_a − pos_b); consecutive seed positions on one diagonal are
    exactly the aligned extensions, so maximal shared runs fall out of
    the gaps-and-islands trick (pos − row_number per (pair, diagonal))
    with NO iterative extension loop. Emitted per pair: span count,
    longest span (run + 2 tokens), total shared span tokens — the
    numbers a span-dedup planner thresholds on.

    Fixture-calibrated: 402 multi-shingle runs across pairs at sf0.01,
    longest span 93 tokens (97 at sf0.1) — genuinely long verbatim
    overlaps exist, so longest/total are multi-valued everywhere. Docs
    under 3 tokens are excluded on both sides (a span needs a shingle).
    Rare-seed holes (a df > 20 shingle inside a true span) split runs on
    both engines identically — the measure is honestly "rare-seeded
    maximal runs", mirrored exactly in the oracle.

    Spark-first: one scan explodes positional shingles; the df cap
    bounds every join bucket at ≤ 20 occurrences (≤ 190 pairs/shingle at
    any corpus size); the islands window partitions by (pair, diagonal)
    — thousands of small partitions, no global sort; two hash
    aggregates finish. At 100 TB this replaces the suffix-array pass
    with shuffle-bounded relational ops."""
    from batch_public_spark.operators.semantic import word_shingles_all
    from batch_public_spark.operators.textops import tokens

    # spread(): positional-shingle explode is per-row text compute over
    # the 1-task fixture scan (guide §2.5); no-op at scale.
    d = spread(t(spark, sf_dir, "documents").select("doc_id", "text"))
    sh = (
        d.filter(F.size(tokens(F.col("text"))) >= 3)
        .select(
            "doc_id",
            F.posexplode(word_shingles_all(F.col("text"), 3)).alias("pos", "s"),
        )
        # three consumers (df counts + both self-join roles): cut once
        .localCheckpoint(eager=False)
    )
    rare = sh.groupBy("s").agg(F.count("*").alias("df")).filter(F.col("df") <= 20)
    ri = sh.join(rare.select("s"), "s")
    a = ri.select(F.col("doc_id").alias("id_a"), F.col("pos").alias("pa"), "s")
    b = ri.select(F.col("doc_id").alias("id_b"), F.col("pos").alias("pb"), "s")
    seeds = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "pa", (F.col("pa") - F.col("pb")).alias("diag"))
    )
    w = W.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    isl = seeds.withColumn("grp", F.col("pa") - F.row_number().over(w))
    runs = (
        isl.groupBy("id_a", "id_b", "diag", "grp")
        .agg(F.count("*").cast("bigint").alias("nsh"))
        .filter(F.col("nsh") >= 2)
    )
    return runs.groupBy("id_a", "id_b").agg(
        F.count("*").cast("bigint").alias("n_spans"),
        (F.max("nsh") + 2).cast("bigint").alias("longest_span_tokens"),
        F.sum(F.col("nsh") + 2).cast("bigint").alias("shared_span_tokens"),
    )


@query(
    "llmops_repeated_span_removal",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_NORM} AS tk FROM documents
    ), sh AS (
      SELECT doc_id, i - 1 AS pos, array_to_string(tk[i:i+2], ' ') AS s
      FROM toks, UNNEST(range(1, greatest(len(tk) - 2, 0) + 1)) AS u(i)
      WHERE len(tk) >= 3
    ), rare AS (
      SELECT s FROM sh GROUP BY s HAVING count(*) <= 20
    ), ri AS (SELECT sh.* FROM sh JOIN rare USING (s)),
    seeds AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.pos AS pa, a.pos - b.pos AS diag
      FROM ri a JOIN ri b ON a.s = b.s AND a.doc_id < b.doc_id
    ), isl AS (
      SELECT id_a, id_b, diag, pa,
             pa - row_number() OVER (PARTITION BY id_a, id_b, diag
                                     ORDER BY pa) AS grp
      FROM seeds
    ), cuts AS (
      SELECT id_b AS doc_id,
             min(pa) - diag AS st, max(pa) - diag + 2 AS en
      FROM isl GROUP BY id_a, id_b, diag, grp HAVING count(*) >= 2
    ), swept AS (
      SELECT doc_id, st, en,
             CASE WHEN st > coalesce(max(en) OVER (
                    PARTITION BY doc_id ORDER BY st, en
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS newg
      FROM cuts
    ), grps AS (
      SELECT doc_id, st, en,
             sum(newg) OVER (PARTITION BY doc_id ORDER BY st, en) AS g
      FROM swept
    ), merged AS (
      SELECT doc_id, min(st) AS st, max(en) AS en FROM grps GROUP BY doc_id, g
    ), spans AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans_removed FROM merged GROUP BY doc_id
    ), rem AS (
      SELECT doc_id, u.p AS pos FROM merged, UNNEST(range(st, en + 1)) AS u(p)
    ), tok_pos AS (
      SELECT t.doc_id, i - 1 AS pos, tk[i] AS tok
      FROM toks t JOIN spans USING (doc_id), UNNEST(range(1, len(tk) + 1)) AS u(i)
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens_before,
           CAST(count(r.pos) AS BIGINT) AS n_tokens_removed,
           CAST(count(*) - count(r.pos) AS BIGINT) AS n_tokens_after,
           CAST(any_value(s.n_spans_removed) AS BIGINT) AS n_spans_removed,
           md5(coalesce(array_to_string(coalesce(
             list(t.tok ORDER BY t.pos) FILTER (WHERE r.pos IS NULL), []), ' '), ''))
             AS rewritten_md5
    FROM tok_pos t
    JOIN spans s ON s.doc_id = t.doc_id
    LEFT JOIN rem r ON r.doc_id = t.doc_id AND r.pos = t.pos
    GROUP BY t.doc_id
    """,
)
def llmops_repeated_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span REMOVAL — the action step that
    consumes llmops_repeated_span_extract's statistics (Lee et al. 2021:
    after finding verbatim shared spans, REMOVE every occurrence except
    the first): spans are recomputed with their positions (same
    rare-seeded gaps-and-islands pipeline, same df ≤ 20 cap), the
    keep-first policy drops each span's occurrence in the HIGHER doc_id
    of every pair (min-id survivorship, matching operators.dedup — for a
    span shared by docs {1,5,9} every pairwise cut lands on 5 and 9, so
    only doc 1's copy survives), per-doc cut intervals are UNION-merged
    by a running-max sweep (overlapping cuts from different pairs must
    not double-delete), and each affected document is spliced: surviving
    tokens re-joined in position order. Emitted per affected doc:
    before/removed/after token counts, merged span count, and the md5 of
    the REWRITTEN text — the hash a downstream exact-dedup pass would
    key on, so the whole rewrite is value-attested, not just counted.

    Reconciliation with the extractor (pinned engine-side in
    tests/test_r11_invariants.py): every extractor pair's id_b appears
    here; per doc, n_tokens_removed ≥ the longest span any pair removes
    from it and ≤ the sum of its pairs' shared_span_tokens (union vs
    sum of overlapping cuts).

    Spark-first: identical scale shape to the extractor (capped seed
    join, (pair, diagonal)-partitioned islands window) plus a per-doc
    interval sweep (window partitioned by doc_id), a position anti-join
    for the splice, and ONE ordered collect per AFFECTED doc — bounded
    by document length, the unit a rewriter must hold anyway; unaffected
    docs are semi-join-pruned before tokens ever explode."""
    from batch_public_spark.operators.semantic import word_shingles_all
    from batch_public_spark.operators.textops import normalized_text, tokens

    # spread(): same 1-task-scan widening as the extractor (guide §2.5).
    d = spread(t(spark, sf_dir, "documents").select("doc_id", "text"))
    sh = (
        d.filter(F.size(tokens(F.col("text"))) >= 3)
        .select(
            "doc_id",
            F.posexplode(word_shingles_all(F.col("text"), 3)).alias("pos", "s"),
        )
        .localCheckpoint(eager=False)
    )
    rare = sh.groupBy("s").agg(F.count("*").alias("df")).filter(F.col("df") <= 20)
    ri = sh.join(rare.select("s"), "s")
    a = ri.select(F.col("doc_id").alias("id_a"), F.col("pos").alias("pa"), "s")
    b = ri.select(F.col("doc_id").alias("id_b"), F.col("pos").alias("pb"), "s")
    seeds = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "pa", (F.col("pa") - F.col("pb")).alias("diag"))
    )
    w = W.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    isl = seeds.withColumn("grp", F.col("pa") - F.row_number().over(w))
    cuts = (
        isl.groupBy("id_a", "id_b", "diag", "grp")
        .agg(F.min("pa").alias("pa0"), F.max("pa").alias("pa1"), F.count("*").alias("nsh"))
        .filter(F.col("nsh") >= 2)
        .select(
            F.col("id_b").alias("doc_id"),
            (F.col("pa0") - F.col("diag")).alias("st"),
            (F.col("pa1") - F.col("diag") + 2).alias("en"),
        )
    )
    # Union-merge the cut intervals per doc: a new group starts where the
    # interval clears the running max end of everything before it.
    wd = W.partitionBy("doc_id").orderBy("st", "en")
    swept = cuts.select(
        "doc_id",
        "st",
        "en",
        F.when(
            F.col("st")
            > F.coalesce(
                F.max("en").over(wd.rowsBetween(W.unboundedPreceding, -1)), F.lit(-1)
            ),
            1,
        )
        .otherwise(0)
        .alias("newg"),
    )
    grps = swept.withColumn("g", F.sum("newg").over(wd))
    merged = grps.groupBy("doc_id", "g").agg(
        F.min("st").alias("st"), F.max("en").alias("en")
    )
    spans = merged.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_spans_removed")
    )
    # Merged groups are position-disjoint by construction — exploding
    # them yields each removed position exactly once.
    rem = merged.select(
        "doc_id", F.explode(F.sequence(F.col("st"), F.col("en"))).alias("pos")
    ).withColumn("hit", F.lit(1))
    tok_pos = d.join(spans, "doc_id", "left_semi").select(
        "doc_id",
        F.posexplode(F.split(normalized_text(F.col("text")), " ")).alias("pos", "tok"),
    )
    joined = tok_pos.join(rem, ["doc_id", "pos"], "left")
    per_doc = joined.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens_before"),
        F.sum(F.when(F.col("hit").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_tokens_removed"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("hit").isNull(), F.struct("pos", "tok"))
                        )
                    ),
                    lambda s: s.tok,
                ),
                " ",
            )
        ).alias("rewritten_md5"),
    )
    return per_doc.join(spans, "doc_id").select(
        "doc_id",
        "n_tokens_before",
        "n_tokens_removed",
        (F.col("n_tokens_before") - F.col("n_tokens_removed"))
        .cast("bigint")
        .alias("n_tokens_after"),
        "n_spans_removed",
        "rewritten_md5",
    )


@query(
    "llmops_bitext_margin_mining",
    oracle="""
    WITH s AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id < 200
    ),
    a AS (SELECT vec_id AS a_id, v AS av FROM s WHERE vec_id % 2 = 0),
    b AS (SELECT vec_id AS b_id, v AS bv FROM s WHERE vec_id % 2 = 1),
    p AS (
      SELECT a_id, b_id, ROUND(list_cosine_similarity(av, bv), 6) AS sim
      FROM a CROSS JOIN b
    ),
    fa AS (
      SELECT a_id, sum(CAST(sim AS DECIMAL(10,6))) AS sum_a FROM (
        SELECT a_id, sim,
               row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id) AS rn
        FROM p) WHERE rn <= 4 GROUP BY a_id
    ),
    fb AS (
      SELECT b_id, sum(CAST(sim AS DECIMAL(10,6))) AS sum_b FROM (
        SELECT b_id, sim,
               row_number() OVER (PARTITION BY b_id ORDER BY sim DESC, a_id) AS rn
        FROM p) WHERE rn <= 4 GROUP BY b_id
    ),
    m AS (
      SELECT p.a_id, p.b_id, p.sim,
             ROUND(p.sim * 8.0 / CAST(fa.sum_a + fb.sum_b AS DOUBLE), 6) AS margin
      FROM p JOIN fa USING (a_id) JOIN fb USING (b_id)
      WHERE CAST(fa.sum_a + fb.sum_b AS DOUBLE) > 0
    ),
    best_a AS (
      SELECT a_id, b_id, sim, margin FROM (
        SELECT *, row_number() OVER (PARTITION BY a_id
                                     ORDER BY margin DESC, b_id) AS rn
        FROM m) WHERE rn = 1
    ),
    best_b AS (
      SELECT a_id, b_id FROM (
        SELECT a_id, b_id, row_number() OVER (PARTITION BY b_id
                                              ORDER BY margin DESC, a_id) AS rn
        FROM m) WHERE rn = 1
    )
    SELECT ba.a_id, ba.b_id, ba.sim AS cosine, ba.margin
    FROM best_a ba JOIN best_b bb ON ba.a_id = bb.a_id AND ba.b_id = bb.b_id
    """,
)
def llmops_bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITEXT MINING by margin scoring — the parallel-corpus miner of
    Artetxe & Schwenk 2019 ("Margin-based Parallel Corpus Mining with
    Multilingual Sentence Embeddings"), the operator that builds
    translation-pair training data out of two monolingual embedding
    pools: raw cosine is mis-calibrated across a multilingual space
    (hub sentences are near everything), so each candidate pair is
    scored by its RATIO MARGIN — cosine divided by the mean of both
    sides' average top-k similarities (k = 4 here) — and a pair is mined
    only when it is the MUTUAL best under that margin (a forward-best
    that is not backward-best is a hub artifact, dropped). The two
    embedding pools are played by even/odd vec_ids over a fixed sample
    (vec_id < 200: 100 per side, the ANN family's literal-bound idiom).

    Parity discipline: cosines round to 6 before any use; each side's
    top-4 sum accumulates in DECIMAL(10,6) (exact — no float summation
    order to drift), and the margin is one double division of exact
    operands, rounded to 6; every argmax carries an id tie-break. The
    sum_a + sum_b > 0 guard excludes degenerate all-negative
    neighborhoods identically in both engines.

    Spark-first/100 TB: the quadratic score matrix exists only inside
    the bounded sample — at scale the pair stream comes from the ANN
    candidate graph (llmops_ann_ivf / ann_lsh produce exactly the
    (query, neighbor, sim) triples this consumes), the per-side top-4
    denominators are two windowed aggregates over that candidate stream
    partitioned by each side's id, and mutual-best is two rank-1 windows
    plus an equi-join — nothing here is more than a shuffle on a side's
    id. The sample variant is the exactness anchor for that path, the
    same contract as llmops_ann_bruteforce."""
    from batch_public_spark.operators.semantic import cosine

    s = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    a = s.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("av")
    )
    b = s.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("bv")
    )
    pairs = (
        a.crossJoin(F.broadcast(b))
        .select("a_id", "b_id", F.round(cosine(F.col("av"), F.col("bv")), 6).alias("sim"))
        # four consumers (two top-k windows, the margin join's pair
        # stream): cut once so the 10k-pair cosine fold runs once
        .localCheckpoint(eager=False)
    )
    wa = W.partitionBy("a_id").orderBy(F.desc("sim"), "b_id")
    wb = W.partitionBy("b_id").orderBy(F.desc("sim"), "a_id")
    fa = (
        pairs.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") <= 4)
        .groupBy("a_id")
        .agg(F.sum(F.col("sim").cast("decimal(10,6)")).alias("sum_a"))
    )
    fb = (
        pairs.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= 4)
        .groupBy("b_id")
        .agg(F.sum(F.col("sim").cast("decimal(10,6)")).alias("sum_b"))
    )
    denom = (F.col("sum_a") + F.col("sum_b")).cast("double")
    m = (
        pairs.join(fa, "a_id")
        .join(fb, "b_id")
        .filter(denom > 0)
        .select(
            "a_id",
            "b_id",
            "sim",
            F.round(F.col("sim") * F.lit(8.0) / denom, 6).alias("margin"),
        )
    )
    wma = W.partitionBy("a_id").orderBy(F.desc("margin"), "b_id")
    wmb = W.partitionBy("b_id").orderBy(F.desc("margin"), "a_id")
    best_a = (
        m.withColumn("rn", F.row_number().over(wma))
        .filter(F.col("rn") == 1)
        .select("a_id", "b_id", F.col("sim").alias("cosine"), "margin")
    )
    best_b = (
        m.withColumn("rn", F.row_number().over(wmb))
        .filter(F.col("rn") == 1)
        .select("a_id", "b_id")
    )
    return best_a.join(best_b, ["a_id", "b_id"])


@query("llmops_bitext_margin_ann", oracle=None)
def llmops_bitext_margin_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITEXT MINING, production shape — the margin/mutual-best stage of
    llmops_bitext_margin_mining fed from an ANN CANDIDATE STREAM instead
    of the dense score matrix (the at-scale plan its docstring promises):
    both monolingual pools bucket through the SAME seeded hyperplane-LSH
    family (operators.semantic.hyperplane_signatures_gemm — the shared
    family is load-bearing: mixing hash families yields zero recall),
    candidates are the bucket-collision pairs across all 8 tables (with
    Hamming-1 multiprobe flips on side A for recall), exact cosine runs
    only on candidates, the Artetxe-Schwenk top-4 ratio-margin
    denominators are windowed aggregates OVER THE CANDIDATE STREAM
    partitioned by each side's id, and mutual-best is two rank-1 windows
    plus an equi-join. NOTHING here is more than a shuffle on a side's
    id — no cross join, no broadcast of a pool: both sides can be
    corpus-scale (the sample twin broadcasts its 100-vector B side as
    scaffolding; this plan drops even that).

    rows-only by nature (xxhash-free but numpy-seeded hyperplanes are
    engine-specific); its hash-checked anchor is the exact twin
    llmops_bitext_margin_mining on the same even/odd vec_id<200 pools,
    with mined-pair agreement pinned in
    tests/test_r12_invariants.py::test_bitext_ann_agrees_with_exact_twin
    (the ann_lsh ↔ ann_bruteforce recall-gate convention).

    Margin caveat, stated: candidate-stream top-4 denominators equal the
    exact ones only when each side's true top-4 are candidates — with
    recall < 1 the margin is an upper-biased estimate for sparse
    neighborhoods, which is exactly how production margin miners behave
    (Artetxe & Schwenk score over FAISS candidates, not the full
    matrix); the agreement gate quantifies the effect."""
    from batch_public_spark.operators.semantic import (
        fused_cosine,
        hyperplane_signatures_gemm,
        row_norm,
        valid_vectors,
    )

    planes, tables = 6, 8
    s = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    a = valid_vectors(s.filter(F.col("vec_id") % 2 == 0), "embedding")
    b = valid_vectors(s.filter(F.col("vec_id") % 2 == 1), "embedding")

    def buckets(df: DataFrame, id_alias: str, probe: bool) -> DataFrame:
        flips = [0] + [1 << p for p in range(planes)] if probe else [0]
        sigs = hyperplane_signatures_gemm(
            df, id_col="vec_id", vec_col="embedding", planes=planes, tables=tables
        ).withColumnRenamed("_hid", id_alias)
        return sigs.select(
            id_alias,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(tb).alias("tbl"),
                            F.element_at(F.col("_sigs"), tb + 1)
                            .bitwiseXOR(F.lit(flip))
                            .alias("bucket"),
                        )
                        for tb in range(tables)
                        for flip in flips
                    ]
                )
            ).alias("bk"),
        ).select(id_alias, F.col("bk.tbl").alias("tbl"), F.col("bk.bucket").alias("bucket"))

    # Candidate pairs: bucket collisions, id-only through the distinct
    # (vector payloads never enter the candidate shuffle — the ann_lsh
    # discipline).
    pair_ids = (
        buckets(a, "a_id", True)
        .join(buckets(b, "b_id", False), ["tbl", "bucket"])
        .select("a_id", "b_id")
        .distinct()
    )
    av = a.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("_av"),
        row_norm(F.col("embedding")).alias("_an"),
    )
    bv = b.select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("_bv"),
        row_norm(F.col("embedding")).alias("_bn"),
    )
    pairs = (
        pair_ids.join(av, "a_id")
        .join(bv, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(
                fused_cosine(F.col("_av"), F.col("_bv"), F.col("_an"), F.col("_bn")), 6
            ).alias("sim"),
        )
        # same four-consumer fan-out as the exact twin: cut once
        .localCheckpoint(eager=False)
    )
    wa = W.partitionBy("a_id").orderBy(F.desc("sim"), "b_id")
    wb = W.partitionBy("b_id").orderBy(F.desc("sim"), "a_id")
    fa = (
        pairs.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") <= 4)
        .groupBy("a_id")
        .agg(F.sum(F.col("sim").cast("decimal(10,6)")).alias("sum_a"))
    )
    fb = (
        pairs.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= 4)
        .groupBy("b_id")
        .agg(F.sum(F.col("sim").cast("decimal(10,6)")).alias("sum_b"))
    )
    denom = (F.col("sum_a") + F.col("sum_b")).cast("double")
    m = (
        pairs.join(fa, "a_id")
        .join(fb, "b_id")
        .filter(denom > 0)
        .select(
            "a_id",
            "b_id",
            "sim",
            F.round(F.col("sim") * F.lit(8.0) / denom, 6).alias("margin"),
        )
    )
    wma = W.partitionBy("a_id").orderBy(F.desc("margin"), "b_id")
    wmb = W.partitionBy("b_id").orderBy(F.desc("margin"), "a_id")
    best_a = (
        m.withColumn("rn", F.row_number().over(wma))
        .filter(F.col("rn") == 1)
        .select("a_id", "b_id", F.col("sim").alias("cosine"), "margin")
    )
    best_b = (
        m.withColumn("rn", F.row_number().over(wmb))
        .filter(F.col("rn") == 1)
        .select("a_id", "b_id")
    )
    return best_a.join(best_b, ["a_id", "b_id"])


@query(
    "llmops_quality_survivorship",
    oracle=f"""
    WITH m AS ({_QUALITY_SQL}),
    q AS (
      SELECT doc_id,
             CAST(ROUND(least(n_tok / 50.0, 1.0) * 0.3
                   + greatest(0.0, 1.0 - pr * 4) * 0.3
                   + least(swr * 5, 1.0) * 0.2
                   + (CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.3 END) * 0.2, 6)
               AS DECIMAL(10,6)) AS quality
      FROM m),
    pre AS (
      SELECT doc_id,
             md5(array_to_string(
               (list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                            x -> length(x) > 0))[1:8], ' ')) AS pkey
      FROM documents),
    ranked AS (
      SELECT p.pkey, p.doc_id, q.quality,
             row_number() OVER (PARTITION BY p.pkey
                                ORDER BY q.quality DESC, p.doc_id) AS rq,
             count(*) OVER (PARTITION BY p.pkey) AS n_members,
             min(p.doc_id) OVER (PARTITION BY p.pkey) AS minid_doc,
             max(q.quality) OVER (PARTITION BY p.pkey)
               - min(q.quality) OVER (PARTITION BY p.pkey) AS spread
      FROM pre p JOIN q USING (doc_id))
    SELECT pkey,
           doc_id AS survivor_doc,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(quality AS DOUBLE) AS survivor_quality,
           minid_doc,
           doc_id <> minid_doc AS policy_differs,
           CAST(spread AS DOUBLE) AS quality_spread
    FROM ranked WHERE rq = 1 AND n_members >= 2
    """,
)
def llmops_quality_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY-WEIGHTED survivorship — the curation-realistic alternative
    to min-id survivorship (operators.dedup keeps the smallest id; a
    training-data pipeline keeps the BEST COPY): near-dup families are
    keyed by the first-8-token prefix group (the dedup cascade's wave-2
    key, so the families here are exactly what that wave collapses), the
    survivor is the argmax of the Gopher/C4 quality heuristic (rounded to
    6, accumulated in exact DECIMAL, doc_id tie-break), and each family
    row reports the baseline min-id pick alongside — `policy_differs`
    hash-attests, family by family, where quality-weighting actually
    changes the outcome (an implementation that silently fell back to
    min-id would flip those booleans and mismatch). quality_spread (max −
    min within the family, exact decimal difference) quantifies what the
    better policy buys.

    Spark-first/100 TB: one scan projects (prefix-key md5, decimal
    quality); families form in ONE hash shuffle on the 16-byte key; the
    argmax/min/max/count are a single window pass per family partition —
    same plan skeleton as keyed first-wins dedup (operators/dedup.py),
    so swapping survivorship policy costs nothing structural."""
    from batch_public_spark.operators.textops import tokens

    # spread(): tokenize + quality_score is per-row text compute over
    # the 1-task fixture scan (guide §2.5); no-op at scale.
    d = spread(t(spark, sf_dir, "documents").select("doc_id", "text"))
    toks_lower = tokens(F.lower(F.col("text")))
    base = d.select(
        "doc_id",
        F.md5(F.array_join(F.slice(toks_lower, 1, 8), " ")).alias("pkey"),
        F.round(quality_score(F.col("text")), 6).cast("decimal(10,6)").alias("quality"),
    )
    wq = W.partitionBy("pkey")
    ranked = base.select(
        "pkey",
        "doc_id",
        "quality",
        F.row_number().over(wq.orderBy(F.desc("quality"), "doc_id")).alias("rq"),
        F.count("*").over(wq).alias("n_members"),
        F.min("doc_id").over(wq).alias("minid_doc"),
        (F.max("quality").over(wq) - F.min("quality").over(wq))
        .cast("double")
        .alias("quality_spread"),
    )
    return ranked.filter((F.col("rq") == 1) & (F.col("n_members") >= 2)).select(
        "pkey",
        F.col("doc_id").alias("survivor_doc"),
        F.col("n_members").cast("bigint").alias("n_members"),
        F.col("quality").cast("double").alias("survivor_quality"),
        "minid_doc",
        (F.col("doc_id") != F.col("minid_doc")).alias("policy_differs"),
        "quality_spread",
    )


@query(
    "llmops_sorted_neighborhood_blocking",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, tk,
             array_to_string(tk, ' ') AS norm,
             tk[1] AS blk,
             list_distinct(tk) AS ts
      FROM (SELECT doc_id, {_TOKS_NORM} AS tk FROM documents)
      WHERE len(tk) >= 1
    ), s AS (
      SELECT blk, doc_id, ts,
             lead(doc_id, 1) OVER w AS n1, lead(ts, 1) OVER w AS t1,
             lead(doc_id, 2) OVER w AS n2, lead(ts, 2) OVER w AS t2,
             lead(doc_id, 3) OVER w AS n3, lead(ts, 3) OVER w AS t3
      FROM d WINDOW w AS (PARTITION BY blk ORDER BY norm, doc_id)
    ), p AS (
      SELECT blk, doc_id AS id_a, 1 AS dist, n1 AS id_b, t1 AS tb, ts FROM s WHERE n1 IS NOT NULL
      UNION ALL
      SELECT blk, doc_id, 2, n2, t2, ts FROM s WHERE n2 IS NOT NULL
      UNION ALL
      SELECT blk, doc_id, 3, n3, t3, ts FROM s WHERE n3 IS NOT NULL
    )
    SELECT blk, id_a, id_b, CAST(dist AS INT) AS dist,
           ROUND(CAST(len(list_intersect(ts, tb)) AS DOUBLE)
                 / len(list_distinct(list_concat(ts, tb))), 6) AS jac
    FROM p
    """,
)
def llmops_sorted_neighborhood_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SORTED-NEIGHBORHOOD candidate generation (Hernandez & Stolfo 1995,
    the record-linkage classic) — the third candidate-pair source next to
    content blocking (llmops_ngram_jaccard_pairs) and MinHash banding
    (llmops_minhash_candidates): records sort by a normalization key and
    every record pairs with its w = 3 sort-successors, so near-dups that
    share a PREFIX but differ in suffix length land adjacent and pair
    even when an exact blocking key would split them. Each pair carries
    its sort distance and exact token-set Jaccard — the verifier is
    fused, so the output is directly consumable by the dedup cascade.

    This is the BLOCKED variant (the form that scales): the sort runs
    inside first-token blocks, windows never cross a block boundary.
    The pure form's single global sort order is a one-partition window —
    unshardable; blocked SNM trades the (rare) cross-block neighbor for
    a per-block partitioned window, the same trade
    llmops_ngram_jaccard_pairs documents for its block cap. At 100 TB
    the standard multi-pass answer (Hernandez & Stolfo's own fix) is
    re-running with a second sort key (e.g. reversed tokens) rather
    than widening any one pass's window.

    Spark-first: one scan projects (block, sort key, token set); the
    window is ONE shuffle by block key; the w successor pairs come from
    three ``lead()`` calls over that window — NO self-join, so there is
    no candidate-explosion path at any block size (per row the pair
    count is exactly min(w, block remainder)); Jaccard folds in-row
    (array_intersect/array_union, codegen'd). Parity: lead() semantics
    and the (norm, doc_id) total order are engine-identical; jac rounds
    to 6 with an exact-integer numerator/denominator."""
    d = (
        t(spark, sf_dir, "documents")
        .select("doc_id", tokens(normalized_text(F.col("text"))).alias("tk"))
        .filter(F.size("tk") >= 1)
        .select(
            "doc_id",
            F.element_at("tk", 1).alias("blk"),
            F.array_join("tk", " ").alias("norm"),
            F.array_distinct("tk").alias("ts"),
        )
    )
    w = W.partitionBy("blk").orderBy("norm", "doc_id")
    s = d.select(
        "blk",
        "doc_id",
        "ts",
        *[F.lead("doc_id", i).over(w).alias(f"n{i}") for i in (1, 2, 3)],
        *[F.lead("ts", i).over(w).alias(f"t{i}") for i in (1, 2, 3)],
    )
    nbrs = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("dist"),
                F.col(f"n{i}").alias("id_b"),
                F.col(f"t{i}").alias("tb"),
            )
            for i in (1, 2, 3)
        ]
    )
    p = s.select(
        "blk",
        F.col("doc_id").alias("id_a"),
        "ts",
        F.explode(nbrs).alias("nb"),
    ).filter(F.col("nb.id_b").isNotNull())
    return p.select(
        "blk",
        "id_a",
        F.col("nb.id_b").alias("id_b"),
        F.col("nb.dist").alias("dist"),
        F.round(jaccard(F.col("ts"), F.col("nb.tb")), 6).alias("jac"),
    )


_EXPIRE_ORACLE = f"""
    WITH sh AS (
      SELECT doc_id, {_GRAMS3} AS s FROM documents
    ), sig AS (SELECT doc_id, s, {_INC_SIGS} FROM sh),
    band AS (SELECT doc_id, s, {_INC_BANDS} FROM sig),
    bk AS (
      SELECT doc_id, s, b.band, CASE b.band WHEN 0 THEN bh0 WHEN 1 THEN bh1
                                            WHEN 2 THEN bh2 ELSE bh3 END AS bh
      FROM band, (VALUES (0), (1), (2), (3)) AS b(band)
    ), idx1 AS (
      SELECT doc_id, s, band, bh FROM (
        SELECT *, row_number() OVER (PARTITION BY band, bh ORDER BY doc_id) AS rn
        FROM bk WHERE doc_id % 3 = 0
      ) WHERE rn <= 50
    ), merged AS (
      SELECT doc_id, s, band, bh FROM (
        SELECT *, row_number() OVER (PARTITION BY band, bh
                                     ORDER BY doc_id % 3, doc_id) AS rn
        FROM (SELECT doc_id, s, band, bh FROM idx1
              UNION ALL
              SELECT doc_id, s, band, bh FROM bk WHERE doc_id % 3 = 1)
      ) WHERE rn <= 50
    ), expired AS (
      SELECT doc_id, s, band, bh FROM merged WHERE doc_id % 3 <> 0
    ), inc AS (SELECT doc_id, s, band, bh FROM bk WHERE doc_id % 3 = 2),
    cand AS (
      SELECT DISTINCT i.doc_id AS new_id, o.doc_id AS old_id, i.s AS si, o.s AS so
      FROM inc i JOIN expired o ON i.band = o.band AND i.bh = o.bh
    ), ver AS (
      SELECT new_id,
             CASE WHEN len(list_intersect(si, so)) * 2
                       >= len(list_distinct(list_concat(si, so)))
                  THEN 1 ELSE 0 END AS dup,
             round(len(list_intersect(si, so)) * 1.0e0
                   / len(list_distinct(list_concat(si, so))), 6) AS j
      FROM cand
    )
    SELECT d.doc_id AS new_id,
           CAST(coalesce(count(v.j), 0) AS BIGINT) AS n_candidates,
           CAST(coalesce(sum(v.dup), 0) AS BIGINT) AS n_dups,
           coalesce(max(v.j), 0.0) AS best_jaccard,
           coalesce(sum(v.dup), 0) > 0 AS is_dup
    FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 2) d
    LEFT JOIN ver v ON v.new_id = d.doc_id
    GROUP BY d.doc_id
    """


@query("llmops_minhash_index_expire", oracle=_EXPIRE_ORACLE)
def llmops_minhash_index_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-index LIFECYCLE, part 4 — EXPIRY/retention, closing the loop:
    build (llmops_minhash_index_roundtrip) → probe
    (llmops_minhash_incremental_dedup) → merge (llmops_minhash_index_merge)
    → expire. Day 4's retention job reads index v2 through the catalog
    (bucket-aligned), DROPS the day-1 generation (old_id % 3 == 0 — the
    entries that aged out of the dedup retention window), and writes v3
    bucketed on the same key with the same bucket count: expiry is a
    pure filter-rewrite, survivors keep their bucket residency, no
    re-rank (an entry's cap position is never recomputed — eviction by
    AGE only, so the monotone first-come-first-kept contract from the
    merge step still holds for what remains). Day-3's traffic then
    probes v3; the oracle replays the expired index, so a stale-v2 probe
    (one that silently kept the aged generation) would inflate
    n_candidates/best_jaccard for every arrival with a day-1 neighbor
    and hash-mismatch. The v2-vs-v3 probe DELTA — lost candidates are
    exactly the gen-0 ones, and at least one arrival really loses one —
    is pinned engine-side in tests/test_r11_invariants.py.

    Spark-first/100 TB: expiry costs ONE bucket-aligned scan + filter +
    re-bucket write (no shuffle beyond the write's own bucketing, no
    re-shingling, no probe-side change); retention by generation column
    beats per-entry TTL scans because the filter is a min/max-prunable
    predicate on the stored column."""
    import os

    from batch_public_spark.plans.analytics_queries import _scratch_dir
    from batch_public_spark.sources.bucketing import read_bucketed, write_bucketed

    d, banded = _banded_docs(spark, sf_dir)
    bkey = F.concat_ws(":", F.col("band").cast("string"), "bh").alias("bkey")
    gen = F.col("doc_id") % 3

    root = _scratch_dir(spark, sf_dir, "mh_index_expire")
    tag = os.path.basename(root).replace(".", "_")
    t2, t3 = f"bps_mh_exp_v2_{tag}", f"bps_mh_exp_v3_{tag}"
    for tb in (t2, t3):
        spark.sql(f"DROP TABLE IF EXISTS {tb}")

    # --- reconstruct + persist v2 exactly as the merge step writes it ---
    wcap = W.partitionBy("band", "bh").orderBy("doc_id")
    idx1 = (
        banded.filter(gen == 0)
        .withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= 50)
        .select("band", "bh", "doc_id", "s")
    )
    day2 = banded.filter(gen == 1).select("band", "bh", "doc_id", "s")
    wmerge = W.partitionBy("band", "bh").orderBy(F.col("doc_id") % 3, F.col("doc_id"))
    v2 = (
        idx1.unionByName(day2)
        .withColumn("rn", F.row_number().over(wmerge))
        .filter(F.col("rn") <= 50)
        .select(bkey, F.col("doc_id").alias("old_id"), F.col("s").alias("so"))
    )
    write_bucketed(v2, t2, key="bkey", buckets=8, path=os.path.join(root, "v2"))

    # --- day 4: retention job — drop the aged generation, re-bucket ---
    v3 = read_bucketed(spark, t2).filter(F.col("old_id") % 3 != 0)
    write_bucketed(v3, t3, key="bkey", buckets=8, path=os.path.join(root, "v3"))

    # --- probe day-3 traffic against the expired index ---
    inc = banded.filter(gen == 2).select(
        bkey, F.col("doc_id").alias("new_id"), F.col("s").alias("si")
    )
    cand = (
        inc.join(read_bucketed(spark, t3), "bkey")
        .select("new_id", "old_id", "si", "so")
        .distinct()
    )
    inter = F.size(F.array_intersect("si", "so"))
    union = F.size(F.array_union("si", "so"))
    ver = cand.select(
        "new_id",
        F.when(inter * 2 >= union, 1).otherwise(0).alias("dup"),
        F.round(inter * F.lit(1.0) / union, 6).alias("j"),
    )
    arrivals = d.filter(gen == 2).select(F.col("doc_id").alias("new_id"))
    return (
        arrivals.join(ver, "new_id", "left")
        .groupBy("new_id")
        .agg(
            F.count("j").cast("bigint").alias("n_candidates"),
            F.coalesce(F.sum("dup"), F.lit(0)).cast("bigint").alias("n_dups"),
            F.coalesce(F.max("j"), F.lit(0.0)).alias("best_jaccard"),
            (F.coalesce(F.sum("dup"), F.lit(0)) > 0).alias("is_dup"),
        )
    )


@query(
    "llmops_ngram_lm_perplexity",
    oracle=r"""
    WITH tk AS (
      SELECT doc_id,
             list_transform(list_filter(string_split_regex(trim(text), '\s+'),
                                        s -> length(s) > 0),
                            s -> lower(s)) AS toks
      FROM documents
    ), bg AS (
      SELECT doc_id,
             unnest(toks[1:length(toks)-1]) AS w1,
             unnest(toks[2:length(toks)]) AS w2
      FROM tk WHERE length(toks) >= 2
    ), pc AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ab FROM bg GROUP BY 1, 2
    ), cc AS (
      SELECT w1, CAST(count(*) AS BIGINT) AS c_a FROM bg GROUP BY 1
    ), vv AS (
      SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
      FROM (SELECT unnest(toks) AS w FROM tk)
    ), lm AS (
      SELECT pc.w1, pc.w2,
             CAST(round(-ln((pc.c_ab + 0.5) / (cc.c_a + 0.5 * vv.v)), 6)
                  AS DECIMAL(18,6)) AS lp
      FROM pc JOIN cc USING (w1) CROSS JOIN vv
    ), doc AS (
      SELECT b.doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(lm.lp) AS DOUBLE) / count(*) AS ce
      FROM bg b JOIN lm ON b.w1 = lm.w1 AND b.w2 = lm.w2
      GROUP BY b.doc_id
    ), mom AS (
      SELECT CAST(sum(CAST(round(ce, 6) AS DECIMAL(18,6))) AS DOUBLE)
               / count(*) AS m,
             sqrt((CAST(sum(CAST(round(ce, 6) AS DECIMAL(18,6))
                            * CAST(round(ce, 6) AS DECIMAL(18,6))) AS DOUBLE)
                   - CAST(sum(CAST(round(ce, 6) AS DECIMAL(18,6))) AS DOUBLE)
                     * CAST(sum(CAST(round(ce, 6) AS DECIMAL(18,6))) AS DOUBLE)
                     / count(*))
                  / nullif(count(*) - 1, 0)) AS sd
      FROM doc
    )
    SELECT d.doc_id, d.n_bigrams,
           round(d.ce, 6) AS cross_entropy,
           round(exp(d.ce), 6) AS perplexity,
           d.ce > mom.m + mom.sd AS flagged
    FROM doc d CROSS JOIN mom
    """,
)
def llmops_ngram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-GRAM LANGUAGE-MODEL PERPLEXITY filtering — the CCNet gate
    (Wenzek et al. 2020: score every document's perplexity under a
    KenLM n-gram model and bucket the corpus by it; the quality signal
    behind CCNet/RedPajama/FineWeb lineage): a word-bigram LM with
    add-0.5 smoothing is trained on the corpus itself (one pass:
    bigram counts, context counts, vocab size — production scores under
    a HELD-OUT reference LM, but the train-and-score plumbing is
    identical and self-scoring is the deterministic fixture form), each
    document's cross-entropy is the mean negative log-probability of
    its bigrams, perplexity = exp(ce), and `flagged` marks documents
    beyond mean + 1 sd of corpus cross-entropy — the moment-based,
    single-extra-aggregation stand-in for CCNet's percentile buckets
    (exact percentiles over per-doc scores would need a global sort;
    the approx_percentile swap is the eval_conformal_approx pattern).

    Parity discipline: the LM stores log-probs QUANTIZED to 1e-6 in
    exact DECIMAL — real n-gram LMs ship quantized log-probs (KenLM's
    trie does), and here quantization is also what makes the hash
    engine-portable: ln() runs ONCE per distinct bigram TYPE on an
    identical double (a ratio of exact integers), its round-6 result is
    decimal, and every per-document sum is exact decimal arithmetic —
    double summation order cannot drift, and a last-ulp libm-vs-JVM
    ln() difference would need to straddle a 1e-6 rounding boundary
    (p ~ 1e-9 per type). Moments of round-6 ce accumulate the same way;
    sqrt is IEEE-correctly-rounded, so `flagged` compares identical
    doubles.

    Scale shape: explode → two hash aggregations (bigram/context
    counts, both map-side combinable), the vocab scalar broadcast, one
    shuffle join of the bigram stream against the Zipf-headed LM table
    (AQE skew-split territory, the llmops_pmi_collocations note), one
    per-doc aggregation, one 1-row moment aggregate broadcast back.
    Nothing exceeds the TF-IDF/BM25 family's footprint."""
    d = t(spark, sf_dir, "documents")
    tk = d.select(
        "doc_id", F.transform(tokens(F.col("text")), F.lower).alias("toks")
    )
    bg = (
        tk.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with(slice(toks, 1, size(toks) - 1),"
                    "         slice(toks, 2, size(toks) - 1),"
                    "         (x, y) -> struct(x AS w1, y AS w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    # r15: the bigram type table is cut once (multi-consumer discipline,
    # scale posture in sources/tables.py) and c(w1) derived from it by
    # exact-integer SUM — sum over w2 of c(w1,w2) IS the bigram count of
    # w1 (the identity the KN variant already documents as "one shuffle
    # cheaper") — instead of a second aggregation over the raw bigram
    # stream. Before: the tokenize + explode subtree re-inlined into pc,
    # cc AND the per-doc scoring join (8 parquet scans in the executed
    # plan). The unigram vocab still reads tk directly (docs with a
    # single token carry no bigram, so V is NOT derivable from pc).
    pc = (
        bg.groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("c_ab"))
        .localCheckpoint(eager=False)
    )
    cc = pc.groupBy("w1").agg(F.sum("c_ab").cast("bigint").alias("c_a"))
    vv = tk.select(F.explode("toks").alias("w")).agg(
        F.countDistinct("w").cast("bigint").alias("v")
    )
    lm = (
        pc.join(cc, "w1")
        .crossJoin(F.broadcast(vv))
        .select(
            "w1",
            "w2",
            F.round(
                -F.log((F.col("c_ab") + 0.5) / (F.col("c_a") + 0.5 * F.col("v"))), 6
            )
            .cast("decimal(18,6)")
            .alias("lp"),
        )
    )
    doc = (
        bg.join(lm, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            (F.sum("lp").cast("double") / F.count("*")).alias("ce"),
        )
    )
    ce6 = F.round(F.col("ce"), 6).cast("decimal(18,6)")
    mom = doc.agg(
        (F.sum(ce6).cast("double") / F.count("*")).alias("m"),
        F.sqrt(
            F.try_divide(
                F.sum(ce6 * ce6).cast("double")
                - F.sum(ce6).cast("double") * F.sum(ce6).cast("double") / F.count("*"),
                F.count("*") - 1,
            )
        ).alias("sd"),
    )
    return doc.crossJoin(F.broadcast(mom)).select(
        "doc_id",
        "n_bigrams",
        F.round("ce", 6).alias("cross_entropy"),
        F.round(F.exp("ce"), 6).alias("perplexity"),
        (F.col("ce") > F.col("m") + F.col("sd")).alias("flagged"),
    )


@query(
    "llmops_kn_lm_perplexity",
    oracle=r"""
    WITH tk AS (
      SELECT doc_id,
             list_transform(list_filter(string_split_regex(trim(text), '\s+'),
                                        s -> length(s) > 0),
                            s -> lower(s)) AS toks
      FROM documents
    ), bg AS (
      SELECT doc_id,
             unnest(toks[1:length(toks)-1]) AS w1,
             unnest(toks[2:length(toks)]) AS w2
      FROM tk WHERE length(toks) >= 2
    ), pc AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ab FROM bg GROUP BY 1, 2
    ), ctx AS (
      SELECT w1, CAST(sum(c_ab) AS BIGINT) AS c_a,
             CAST(count(*) AS BIGINT) AS nf
      FROM pc GROUP BY 1
    ), cont AS (
      SELECT w2, CAST(count(*) AS BIGINT) AS np FROM pc GROUP BY 1
    ), tt AS (
      SELECT CAST(count(*) AS BIGINT) AS t FROM pc
    ), lm AS (
      SELECT pc.w1, pc.w2,
             CAST(round(-ln(((pc.c_ab - 0.75) / ctx.c_a)
                            + ((0.75 * ctx.nf * cont.np)
                               / (ctx.c_a * tt.t))), 6)
                  AS DECIMAL(18,6)) AS lp
      FROM pc JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN tt
    ), doc AS (
      SELECT b.doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(lm.lp) AS DOUBLE) / count(*) AS ce
      FROM bg b JOIN lm ON b.w1 = lm.w1 AND b.w2 = lm.w2
      GROUP BY b.doc_id
    ), mom AS (
      SELECT CAST(sum(CAST(round(ce, 6) AS DECIMAL(18,6))) AS DOUBLE)
               / count(*) AS m,
             sqrt((CAST(sum(CAST(round(ce, 6) AS DECIMAL(18,6))
                            * CAST(round(ce, 6) AS DECIMAL(18,6))) AS DOUBLE)
                   - CAST(sum(CAST(round(ce, 6) AS DECIMAL(18,6))) AS DOUBLE)
                     * CAST(sum(CAST(round(ce, 6) AS DECIMAL(18,6))) AS DOUBLE)
                     / count(*))
                  / nullif(count(*) - 1, 0)) AS sd
      FROM doc
    )
    SELECT d.doc_id, d.n_bigrams,
           round(d.ce, 6) AS cross_entropy,
           round(exp(d.ce), 6) AS perplexity,
           d.ce > mom.m + mom.sd AS flagged
    FROM doc d CROSS JOIN mom
    """,
)
def llmops_kn_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KNESER-NEY smoothed LM perplexity — the production form of the
    CCNet/KenLM quality gate (Kneser & Ney 1995; Chen & Goodman 1999;
    KenLM trains interpolated modified KN and CCNet scores under it —
    `llmops_ngram_lm_perplexity`'s add-k smoothing is the teaching
    stand-in, this is what actually ships): interpolated bigram KN with
    a fixed absolute discount d = 0.75,

        P(w2|w1) = (c(w1,w2) - d)/c(w1)
                   + (d · N1+(w1,·)/c(w1)) · (N1+(·,w2) / T)

    where N1+(w1,·) = distinct continuations of w1, N1+(·,w2) =
    distinct contexts preceding w2 (the "how many novel contexts has
    this word appeared in" continuation probability — KN's insight that
    unigram BACKOFF mass should count type novelty, not token
    frequency), and T = total bigram types. c(w1,w2) ≥ 1 > d keeps the
    discounted term positive without the max(·,0) clamp. Per-document
    cross-entropy / perplexity / mean+1sd flagging are shared with the
    add-k twin so the two gates are directly comparable; the KN ≤ add-k
    ordering on the corpus is pinned in tests/test_r14_invariants.py.

    Parity discipline (the add-k twin's, verbatim): log-probs are
    computed ONCE per distinct bigram TYPE from exact-integer ratios —
    d = 0.75 is binary-exact, `0.75·nf·np` and `c_a·T` stay under 2^53
    so both divisions and the final sum are correctly-rounded IEEE ops
    with identical parenthesization in both engines — then quantized to
    1e-6 exact DECIMAL, so per-doc sums cannot drift with summation
    order.

    Scale shape: identical to the add-k twin EXCEPT one shuffle
    cheaper — c(w1) and N1+(w1,·) both come from ONE re-aggregation of
    the (already aggregated, much smaller) bigram-type table rather
    than a second pass over the raw bigram stream; N1+(·,w2) is a
    second type-table aggregation; T a broadcast scalar. The per-doc
    scoring join is the same Zipf-headed AQE-skew-split shape."""
    d = t(spark, sf_dir, "documents")
    tk = d.select(
        "doc_id", F.transform(tokens(F.col("text")), F.lower).alias("toks")
    )
    bg = (
        tk.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with(slice(toks, 1, size(toks) - 1),"
                    "         slice(toks, 2, size(toks) - 1),"
                    "         (x, y) -> struct(x AS w1, y AS w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    # The bigram TYPE table feeds FOUR consumers (ctx, cont, tt, and the
    # lm join) — without a cut the tokenize + bigram-explode + count
    # subtree re-inlines into each (r15 measured: 10 parquet scans in the
    # executed plan). localCheckpoint cut per the multi-consumer
    # discipline (scale posture: sources/tables.py): pc is the REDUCED
    # type table (bounded by observed vocab², orders below the bigram
    # stream), so the pinned blocks stay small; the raw stream (bg) is
    # deliberately NOT cut — it re-streams once for the per-doc scoring
    # join exactly as the add-k twin does.
    pc = (
        bg.groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("c_ab"))
        .localCheckpoint(eager=False)
    )
    ctx = pc.groupBy("w1").agg(
        F.sum("c_ab").cast("bigint").alias("c_a"),
        F.count("*").cast("bigint").alias("nf"),
    )
    cont = pc.groupBy("w2").agg(F.count("*").cast("bigint").alias("np"))
    tt = pc.agg(F.count("*").cast("bigint").alias("t"))
    lm = (
        pc.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tt))
        .select(
            "w1",
            "w2",
            F.round(
                -F.log(
                    ((F.col("c_ab") - 0.75) / F.col("c_a"))
                    + (
                        (0.75 * F.col("nf") * F.col("np"))
                        / (F.col("c_a") * F.col("t"))
                    )
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lp"),
        )
    )
    doc = (
        bg.join(lm, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            (F.sum("lp").cast("double") / F.count("*")).alias("ce"),
        )
    )
    ce6 = F.round(F.col("ce"), 6).cast("decimal(18,6)")
    mom = doc.agg(
        (F.sum(ce6).cast("double") / F.count("*")).alias("m"),
        F.sqrt(
            F.try_divide(
                F.sum(ce6 * ce6).cast("double")
                - F.sum(ce6).cast("double") * F.sum(ce6).cast("double") / F.count("*"),
                F.count("*") - 1,
            )
        ).alias("sd"),
    )
    return doc.crossJoin(F.broadcast(mom)).select(
        "doc_id",
        "n_bigrams",
        F.round("ce", 6).alias("cross_entropy"),
        F.round(F.exp("ce"), 6).alias("perplexity"),
        (F.col("ce") > F.col("m") + F.col("sd")).alias("flagged"),
    )


# Heaps-law checkpoints: doc_id prefixes at which cumulative trigram
# token/type counts are sampled (bounded literal grid; prefixes beyond
# max(doc_id) are dropped so a small fixture cannot flatten the fit).
# TRIGRAM types because the synthetic corpus's word vocabulary saturates
# at 31 types by doc 25 (the llmops_good_turing_unseen finding) while
# trigram types grow 1.3k -> 14.5k across the same prefixes.
_HEAPS_CKPTS = [25, 50, 100, 200, 400]


def _heaps_oracle() -> str:
    ntoks = ",\n             ".join(
        f"CAST(count(*) FILTER (WHERE doc_id <= {c}) AS BIGINT) AS n{c}"
        for c in _HEAPS_CKPTS
    )
    vtypes = ",\n             ".join(
        f"CAST(count(*) FILTER (WHERE first_doc <= {c}) AS BIGINT) AS v{c}"
        for c in _HEAPS_CKPTS
    )
    rows = " UNION ALL ".join(
        f"SELECT {c} AS checkpoint, a.n{c} AS n_tokens, f.v{c} AS vocab "
        f"FROM a, f" for c in _HEAPS_CKPTS
    )
    return rf"""
    WITH tk AS (
      SELECT doc_id,
             list_transform(list_filter(string_split_regex(trim(text), '\s+'),
                                        s -> length(s) > 0),
                            s -> lower(s)) AS toks
      FROM documents
    ), tri AS (
      SELECT doc_id,
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
      FROM tk, unnest(generate_series(1, length(toks) - 2)) AS t(i)
      WHERE length(toks) >= 3
    ), a AS (
      SELECT {ntoks}
      FROM tri
    ), fd AS (
      SELECT g, CAST(min(doc_id) AS BIGINT) AS first_doc FROM tri GROUP BY g
    ), f AS (
      SELECT {vtypes}
      FROM fd
    ), dmax AS (
      SELECT CAST(max(doc_id) AS BIGINT) AS md FROM documents
    ), pts AS (
      SELECT r.checkpoint, r.n_tokens, r.vocab,
             CAST(round(ln(r.n_tokens), 6) AS DECIMAL(18,6)) AS x,
             CAST(round(ln(r.vocab), 6) AS DECIMAL(18,6)) AS y
      FROM ({rows}) r CROSS JOIN dmax
      WHERE r.checkpoint <= dmax.md AND r.n_tokens > 0 AND r.vocab > 0
    ), fit AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             (CAST(sum(x * y) AS DOUBLE) - CAST(sum(x) AS DOUBLE)
                * CAST(sum(y) AS DOUBLE) / count(*))
             / nullif(CAST(sum(x * x) AS DOUBLE) - CAST(sum(x) AS DOUBLE)
                * CAST(sum(x) AS DOUBLE) / count(*), 0) AS beta,
             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
             (CAST(sum(x * y) AS DOUBLE) - CAST(sum(x) AS DOUBLE)
                * CAST(sum(y) AS DOUBLE) / count(*))
             * ((CAST(sum(x * y) AS DOUBLE) - CAST(sum(x) AS DOUBLE)
                 * CAST(sum(y) AS DOUBLE) / count(*)))
             / nullif((CAST(sum(x * x) AS DOUBLE) - CAST(sum(x) AS DOUBLE)
                 * CAST(sum(x) AS DOUBLE) / count(*))
                * (CAST(sum(y * y) AS DOUBLE) - CAST(sum(y) AS DOUBLE)
                   * CAST(sum(y) AS DOUBLE) / count(*)), 0) AS r2
      FROM pts
    )
    SELECT p.checkpoint, p.n_tokens, p.vocab,
           round(exp((f.sy - f.beta * f.sx) / f.k
                     + f.beta * CAST(p.x AS DOUBLE)), 6) AS fit_vocab,
           CAST(f.k AS BIGINT) AS n_points,
           round(f.beta, 6) AS beta,
           round(exp((f.sy - f.beta * f.sx) / f.k), 6) AS k_coef,
           round(f.r2, 6) AS r2
    FROM pts p CROSS JOIN fit f
    """


@query("llmops_heaps_law", oracle=_heaps_oracle())
def llmops_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HEAPS'-LAW vocabulary-growth fit (Heaps 1978; Herdan 1960) —
    V(n) ~ K*n^beta, the scaling diagnostic a corpus team reads before
    sizing a tokenizer vocabulary or a dedup index: how fast do NEW
    types appear as the corpus grows? Sibling of llmops_zipf_fit (the
    static rank-frequency law) and llmops_good_turing_unseen (the
    unseen-mass estimate at one corpus size — Heaps is its growth
    trajectory). Cumulative trigram-token count n and trigram-type
    count V are sampled at the bounded doc_id-prefix checkpoints, and
    beta/K come from the closed-form log-log OLS; r2 reports fit
    quality. Checkpoints beyond max(doc_id) drop so the saturated tail
    cannot flatten beta.

    The distributed-form trick: cumulative DISTINCT counting needs no
    running state — V(c) = #{types whose FIRST document <= c}, so one
    min-per-type aggregation plus conditional counts replaces any
    ordered scan (the first_doc trick is events_daily_retention's
    first-touch idiom applied to types). Token counts are plain
    conditional sums. Parity: counts exact BIGINT, ln once per
    checkpoint quantized round-6 decimal, OLS moments are exact decimal
    sums, three final double divisions on identical operands.

    Scale shape: TWO map-side-combinable aggregations over one exploded
    scan (global conditional counts; min-per-type then conditional
    counts), both 1-row results broadcast-joined; the OLS runs on a
    <= 5-row literal grid. No window, no sort, no per-row state."""
    d = t(spark, sf_dir, "documents")
    # spread(): tokenize + trigram build/explode is per-row text compute
    # over the 1-task fixture scan (guide §2.5); no-op at scale. dmax
    # below stays on the plain scan (scan-bound aggregate).
    tk = spread(d.select("doc_id", "text")).select(
        "doc_id", F.transform(tokens(F.col("text")), F.lower).alias("toks")
    )
    tri = (
        tk.filter(F.size("toks") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 2),"
                    " i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"
                )
            ).alias("g"),
        )
    )
    # r15 single-pass fusion (guide §1.2): the token checkpoints (a) and
    # the vocab checkpoints (f) were two separate aggregations over the
    # SAME tokenize + trigram-explode stream — different grouping, so
    # ReuseExchange cannot dedupe them and the explode ran twice. The
    # per-checkpoint token counts now ride the per-type groupBy as 5
    # map-side-combinable conditional sums, and the global checkpoints
    # derive from the type table by exact-BIGINT sums (sum over types of
    # per-type count(doc_id<=c) IS count(doc_id<=c)); the vocab counts
    # read first_doc off the same frame. One stream pass, same values.
    fd = tri.groupBy("g").agg(
        F.min("doc_id").cast("bigint").alias("first_doc"),
        *[
            F.sum(F.when(F.col("doc_id") <= c, 1).otherwise(0))
            .cast("bigint")
            .alias(f"t{c}")
            for c in _HEAPS_CKPTS
        ],
    )
    af = fd.agg(
        *[F.sum(f"t{c}").cast("bigint").alias(f"n{c}") for c in _HEAPS_CKPTS],
        *[
            F.sum(F.when(F.col("first_doc") <= c, 1).otherwise(0))
            .cast("bigint")
            .alias(f"v{c}")
            for c in _HEAPS_CKPTS
        ],
    )
    dmax = d.agg(F.max("doc_id").cast("bigint").alias("md"))
    grid = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).cast("bigint").alias("checkpoint"),
                    F.col(f"n{c}").alias("n_tokens"),
                    F.col(f"v{c}").alias("vocab"),
                )
                for c in _HEAPS_CKPTS
            ]
        )
    ).alias("p")
    pts = (
        af.crossJoin(F.broadcast(dmax))
        .select(grid, "md")
        .select("p.checkpoint", "p.n_tokens", "p.vocab", "md")
        .filter(
            (F.col("checkpoint") <= F.col("md"))
            & (F.col("n_tokens") > 0)
            & (F.col("vocab") > 0)
        )
        .select(
            "checkpoint",
            "n_tokens",
            "vocab",
            F.round(F.log("n_tokens"), 6).cast("decimal(18,6)").alias("x"),
            F.round(F.log("vocab"), 6).cast("decimal(18,6)").alias("y"),
        )
    )
    sxy = F.sum(F.col("x") * F.col("y")).cast("double")
    sx = F.sum("x").cast("double")
    sy = F.sum("y").cast("double")
    sxx = F.sum(F.col("x") * F.col("x")).cast("double")
    syy = F.sum(F.col("y") * F.col("y")).cast("double")
    k = F.count("*")
    fit = pts.agg(
        k.cast("bigint").alias("k"),
        F.try_divide(sxy - sx * sy / k, F.nullif(sxx - sx * sx / k, F.lit(0.0))).alias(
            "beta"
        ),
        sx.alias("sx"),
        sy.alias("sy"),
        F.try_divide(
            (sxy - sx * sy / k) * (sxy - sx * sy / k),
            F.nullif((sxx - sx * sx / k) * (syy - sy * sy / k), F.lit(0.0)),
        ).alias("r2"),
    )
    return pts.crossJoin(F.broadcast(fit)).select(
        "checkpoint",
        "n_tokens",
        "vocab",
        F.round(
            F.exp(
                (F.col("sy") - F.col("beta") * F.col("sx")) / F.col("k")
                + F.col("beta") * F.col("x").cast("double")
            ),
            6,
        ).alias("fit_vocab"),
        F.col("k").alias("n_points"),
        F.round("beta", 6).alias("beta"),
        F.round(
            F.exp((F.col("sy") - F.col("beta") * F.col("sx")) / F.col("k")), 6
        ).alias("k_coef"),
        F.round("r2", 6).alias("r2"),
    )


# Exact-substring dedup window width (tokens). Lee et al. use 50 BPE
# tokens; the fixture's synthetic docs are ~40-400 words, so k = 8 keeps
# the planted-duplicate and natural-collision regimes both exercised.
_SUBSTR_K = 8


@query(
    "llmops_substring_dedup",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id,
             list_transform(list_filter(string_split_regex(trim(text), '\\s+'),
                                        s -> length(s) > 0),
                            s -> lower(s)) AS toks
      FROM documents
    ), g AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(toks[i:i+{_SUBSTR_K - 1}], ' ')) AS gh
      FROM tk, unnest(generate_series(1, length(toks) - {_SUBSTR_K - 1}))
                 AS t(i)
      WHERE length(toks) >= {_SUBSTR_K}
    ), gk AS (
      SELECT gh, CAST(min(doc_id) AS BIGINT) AS owner,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM g GROUP BY 1
    ), marked AS (
      SELECT g.doc_id, g.pos, g.pos + {_SUBSTR_K - 1} AS fin
      FROM g JOIN gk USING (gh)
      WHERE gk.n_docs >= 2 AND g.doc_id <> gk.owner
    ), flagged AS (
      SELECT doc_id, pos, fin,
             CASE WHEN max(fin) OVER (PARTITION BY doc_id ORDER BY pos
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) IS NULL
                    OR pos > max(fin) OVER (PARTITION BY doc_id ORDER BY pos
                                            ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING) + 1
                  THEN 1 ELSE 0 END AS new_span
      FROM marked
    ), spans AS (
      SELECT doc_id, pos, fin,
             sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS span
      FROM flagged
    ), per_span AS (
      SELECT doc_id, span, max(fin) - min(pos) + 1 AS removed
      FROM spans GROUP BY 1, 2
    ), per_doc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
             CAST(sum(removed) AS BIGINT) AS tokens_removed
      FROM per_span GROUP BY 1
    )
    SELECT tk.doc_id,
           CAST(length(tk.toks) AS BIGINT) AS n_tokens,
           coalesce(pd.n_spans, 0) AS n_spans,
           coalesce(pd.tokens_removed, 0) AS tokens_removed,
           CAST(length(tk.toks) AS BIGINT) - coalesce(pd.tokens_removed, 0)
             AS tokens_kept,
           round(coalesce(pd.tokens_removed, 0) * 1.0
                 / nullif(length(tk.toks), 0), 6) AS dup_fraction
    FROM tk LEFT JOIN per_doc pd USING (doc_id)
    """,
)
def llmops_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-DOCUMENT EXACT-SUBSTRING dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better": drop
    every >= k-token span that appears verbatim in more than one
    document — the production dedup family the cascade still lacked
    beside exact/prefix/MinHash-near/semantic): every k-token window is
    keyed by md5 of its space-joined lowercased tokens; a window shared
    by >= 2 distinct docs marks its k tokens for removal in every doc
    except the gram's min-doc_id owner (first-wins, the
    operators/dedup.py survivorship rule); overlapping/adjacent marked
    windows per doc merge via the cumulative-max interval-coalesce
    idiom (events_interval_coalesce — `pos > runmax(fin) + 1` starts a
    new span) into maximal removed spans. The k-gram cover is EXACT for
    the >= k-span semantics: a maximal shared span of length L >= k is
    covered by its L-k+1 windows, and any shared window certifies a
    shared span — so removed-token sets equal Lee et al.'s suffix-array
    answer at token granularity, per gram-owner policy. Reported per
    doc: span count, tokens removed/kept, duplicate fraction.

    Spark-first / 100 TB: this is the distributed formulation the
    suffix-array single-node algorithm does not have — NO doc-pair join
    exists anywhere (the r13-verdict ask: "never all-pairs"); the heavy
    intermediate is the gram stream (n_tokens rows, amplification
    exactly 1 per token), aggregated in ONE hash shuffle on the 16-byte
    gram key (map-side combinable counts + min), then re-joined back to
    the stream on the same key (AQE handles the Zipf-headed gram
    frequencies the same way the LM scoring joins do); the coalesce
    windows and final rollup all share one doc_id partitioning. The
    min/countDistinct pass never materializes posting lists, so no
    per-gram cap is needed — hot grams cost a skewed-key aggregate, not
    row amplification."""
    d = t(spark, sf_dir, "documents")
    tk = d.select(
        "doc_id", F.transform(tokens(F.col("text")), F.lower).alias("toks")
    )
    g = (
        tk.filter(F.size("toks") >= _SUBSTR_K)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {_SUBSTR_K - 1}),"
                    f" i -> struct(i AS pos,"
                    f" md5(concat_ws(' ', slice(toks, i, {_SUBSTR_K}))) AS gh))"
                )
            ).alias("w"),
        )
        .select("doc_id", "w.pos", "w.gh")
    )
    gk = g.groupBy("gh").agg(
        F.min("doc_id").cast("bigint").alias("owner"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    )
    marked = (
        g.join(gk, "gh")
        .filter((F.col("n_docs") >= 2) & (F.col("doc_id") != F.col("owner")))
        .select("doc_id", "pos", (F.col("pos") + _SUBSTR_K - 1).alias("fin"))
    )
    order = W.partitionBy("doc_id").orderBy("pos")
    prev_max = F.max("fin").over(order.rowsBetween(W.unboundedPreceding, -1))
    flagged = marked.select(
        "doc_id",
        "pos",
        "fin",
        F.when(prev_max.isNull() | (F.col("pos") > prev_max + 1), 1)
        .otherwise(0)
        .alias("new_span"),
    )
    spans = flagged.select(
        "doc_id",
        "pos",
        "fin",
        F.sum("new_span")
        .over(order.rowsBetween(W.unboundedPreceding, 0))
        .alias("span"),
    )
    per_span = spans.groupBy("doc_id", "span").agg(
        (F.max("fin") - F.min("pos") + 1).alias("removed")
    )
    per_doc = per_span.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_spans"),
        F.sum("removed").cast("bigint").alias("tokens_removed"),
    )
    nt = F.size("toks").cast("bigint")
    return (
        tk.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            nt.alias("n_tokens"),
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce(F.col("tokens_removed"), F.lit(0))
            .cast("bigint")
            .alias("tokens_removed"),
            (nt - F.coalesce(F.col("tokens_removed"), F.lit(0)))
            .cast("bigint")
            .alias("tokens_kept"),
            F.round(
                F.try_divide(
                    F.coalesce(F.col("tokens_removed"), F.lit(0)) * F.lit(1.0),
                    F.nullif(nt, F.lit(0)),
                ),
                6,
            ).alias("dup_fraction"),
        )
    )


# Unicode-normalization dedup fixture: canonical-equivalence classes the
# corpus fixture (synthetic ASCII word salad) cannot exercise. Each row is
# (doc_id, text); doc_id = 10*case + variant. Cases: precomposed vs
# combining acute; precomposed vs combining ring vs the U+212B ANGSTROM
# SIGN singleton; precomposed Hangul vs conjoining jamo; combining-class
# REORDERING (dot-above/dot-below swapped); an unaccented control that
# must NOT merge; a plain-ASCII singleton.
_NFC_FIXTURE = [
    (11, "café latte"),
    (12, "café latte"),
    (13, "cafe latte"),
    (21, "Ångström unit"),
    (22, "Ångström unit"),
    (23, "Ångström unit"),
    (31, "한국 corpus"),
    (32, "한국 corpus"),
    (41, "q̣̇x marker"),
    (42, "q̣̇x marker"),
    (51, "plain ascii control"),
]


def _nfc_values_sql() -> str:
    rows = ", ".join(f"({i}, '{s}')" for i, s in _NFC_FIXTURE)
    return f"(VALUES {rows}) AS t(doc_id, text)"


@query(
    "llmops_unicode_nfc_dedup",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, nfc_normalize(text) AS norm
      FROM {_nfc_values_sql()}
    )
    SELECT md5(norm) AS norm_key,
           CAST(count(*) AS BIGINT) AS n_variants,
           CAST(min(doc_id) AS BIGINT) AS survivor_doc,
           CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_raw,
           max(CASE WHEN text <> norm THEN 1 ELSE 0 END) = 1 AS any_renormalized
    FROM d GROUP BY norm
    """,
)
def llmops_unicode_nfc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNICODE-NORMALIZED dedup keys — the curation step exact dedup
    needs BEFORE hashing on real multilingual crawl text: canonically
    equivalent byte sequences (precomposed U+00E9 vs e + COMBINING
    ACUTE, the U+212B ANGSTROM singleton, conjoining Hangul jamo,
    REORDERED combining classes) are the same text to a reader and to
    any downstream tokenizer, but distinct bytes to md5 — so un-NFC'd
    exact dedup under-merges and near-dup shingles silently split.
    NFC-normalize (operators.textops.nfc_text — Arrow-batched
    ``unicodedata``; Spark has no built-in normalizer), then first-wins
    dedup per normalized key. Validated on an inline
    canonical-equivalence fixture (the corpus fixture is synthetic
    ASCII — the lang_id precedent, llmops_queries.py) whose expected
    merges cover all four equivalence mechanisms plus two must-NOT-merge
    controls; the oracle runs DuckDB's ICU ``nfc_normalize`` over the
    same VALUES, so the hash attests Python-unicodedata ↔ ICU agreement
    on every class, not just row counts.

    Scale: normalization is one Arrow-batched map-side projection; the
    dedup is the same single hash shuffle on a 16-byte key as
    operators/dedup.py — NFC slots in front of every exact/near-dup
    family at zero structural cost."""
    from batch_public_spark.operators.textops import nfc_text

    d = inline_rows(spark, "doc_id long, text string", _NFC_FIXTURE).withColumn(
        "norm", nfc_text(F.col("text"))
    )
    return d.groupBy("norm").agg(
        F.count("*").cast("bigint").alias("n_variants"),
        F.min("doc_id").cast("bigint").alias("survivor_doc"),
        F.countDistinct("text").cast("bigint").alias("n_distinct_raw"),
        (
            F.max(F.when(F.col("text") != F.col("norm"), 1).otherwise(0)) == 1
        ).alias("any_renormalized"),
    ).select(
        F.md5("norm").alias("norm_key"),
        "n_variants",
        "survivor_doc",
        "n_distinct_raw",
        "any_renormalized",
    )


@query(
    "llmops_source_ablation",
    oracle=f"""
    WITH m AS ({_QUALITY_SQL}),
    q AS (
      SELECT d.source,
             CAST(ROUND(least(m.n_tok / 50.0, 1.0) * 0.3
                   + greatest(0.0, 1.0 - m.pr * 4) * 0.3
                   + least(m.swr * 5, 1.0) * 0.2
                   + (CASE WHEN m.mwl >= 2.0 AND m.mwl <= 12.0
                           THEN 1.0 ELSE 0.3 END) * 0.2, 6)
               AS DECIMAL(10,6)) AS quality
      FROM m JOIN documents d USING (doc_id)
    ), per AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs, sum(quality) AS s
      FROM q GROUP BY source
    ), tot AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS nt, sum(s) AS st FROM per
    )
    SELECT p.source, p.n_docs,
           round(CAST(p.s AS DOUBLE) / p.n_docs, 6) AS mean_quality,
           round(CAST(t.st AS DOUBLE) / t.nt, 6) AS corpus_mean,
           round(CAST(t.st - p.s AS DOUBLE) / nullif(t.nt - p.n_docs, 0), 6)
             AS loo_mean,
           round(CAST(t.st - p.s AS DOUBLE) / nullif(t.nt - p.n_docs, 0)
                 - CAST(t.st AS DOUBLE) / t.nt, 6) AS ablation_delta
    FROM per p CROSS JOIN tot t
    """,
)
def llmops_source_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAVE-ONE-SOURCE-OUT data valuation — the mixture-ablation table
    every pretraining-data team keeps (which source, if dropped, RAISES
    corpus quality?): for each source, the corpus-mean quality recomputed
    WITHOUT it, and the ablation delta (loo − corpus mean; positive =
    the source drags quality down). The trick that makes it one pass at
    100 TB: the leave-one-out mean needs no second scan — it is pure
    COMPLEMENT ARITHMETIC on per-source exact-decimal sums,
    (S_total − S_src)/(N_total − N_src), so |sources| ablations cost one
    hash aggregation + a broadcast 1-row total (a real retraining
    ablation validates the shortlist; this query is the screen that
    picks it — the same role the docstrings of domain_reweight/
    domain_mix play for mixture WEIGHTS rather than membership).

    Parity: per-doc quality is the Gopher/C4 composite rounded to 6
    into DECIMAL(10,6) (the survivorship discipline), per-source and
    total sums are exact decimal, every emitted mean is one double
    division of exact operands; the single-source degenerate (nt == n)
    yields NULL loo/delta identically via x/0 -> NULL."""
    d = t(spark, sf_dir, "documents").select(
        "source",
        F.round(quality_score(F.col("text")), 6).cast("decimal(10,6)").alias("quality"),
    )
    per = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"), F.sum("quality").alias("s")
    )
    tot = per.agg(
        F.sum("n_docs").cast("bigint").alias("nt"), F.sum("s").alias("st")
    )
    loo = F.try_divide(
        (F.col("st") - F.col("s")).cast("double"), F.col("nt") - F.col("n_docs")
    )
    corpus = F.col("st").cast("double") / F.col("nt")
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.round(F.col("s").cast("double") / F.col("n_docs"), 6).alias("mean_quality"),
        F.round(corpus, 6).alias("corpus_mean"),
        F.round(loo, 6).alias("loo_mean"),
        F.round(loo - corpus, 6).alias("ablation_delta"),
    )


@query(
    "llmops_filter_disparity_audit",
    oracle=f"""
    WITH m AS ({_QUALITY_SQL}),
    q AS (
      SELECT lang,
             CAST(ROUND(least(n_tok / 50.0, 1.0) * 0.3
                   + greatest(0.0, 1.0 - pr * 4) * 0.3
                   + least(swr * 5, 1.0) * 0.2
                   + (CASE WHEN mwl >= 2.0 AND mwl <= 12.0
                           THEN 1.0 ELSE 0.3 END) * 0.2, 6)
               AS DECIMAL(10,6)) AS quality
      FROM m
    ), thr AS (
      SELECT CAST(sum(quality) AS DOUBLE) / count(*) AS cut FROM q
    ), per AS (
      SELECT q.lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN CAST(q.quality AS DOUBLE) >= thr.cut
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_retained
      FROM q CROSS JOIN thr GROUP BY q.lang
    ), mx AS (
      SELECT max(CAST(n_retained AS DOUBLE) / n_docs) AS best FROM per
    )
    SELECT p.lang, p.n_docs, p.n_retained,
           round(CAST(p.n_retained AS DOUBLE) / p.n_docs, 6) AS retention,
           round((CAST(p.n_retained AS DOUBLE) / p.n_docs) / mx.best, 6)
             AS ratio_vs_best,
           (CAST(p.n_retained AS DOUBLE) / p.n_docs) / mx.best < 0.8
             AS four_fifths_flag
    FROM per p CROSS JOIN mx
    """,
)
def llmops_filter_disparity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER DISPARITY audit — the Dodge et al. 2021 C4-audit question
    ("whose documents does the quality filter remove?") as a standing
    gate: quality filters tuned on majority-language text systematically
    under-retain other languages/dialects, so per language this reports
    the retention rate under the corpus gate (threshold = corpus-mean
    quality — data-derived, so the gate is non-degenerate at every SF),
    the ratio against the best-retained group, and the EEOC FOUR-FIFTHS
    verdict (ratio < 0.8 ⇒ the filter's disparate impact on that group
    needs review before the corpus ships). Run it after every filter
    change, next to llmops_quality_filter (which reports raw keep/drop
    counts but renders no disparity verdict).

    Parity: per-doc quality is the round-6 DECIMAL composite (the
    survivorship/ablation discipline), the threshold is one double
    division of exact sums, retention counts are integer CASE-sums, and
    each ratio divides exact operands once, rounding at emission; the
    four-fifths comparison runs on identical pre-round doubles in both
    engines. Scale: one scan-stage projection, one 1-row threshold
    aggregate broadcast back, one hash aggregation on the bounded lang
    key, one 1-row max broadcast — nothing exceeds the quality_filter
    footprint."""
    d = t(spark, sf_dir, "documents").select(
        "lang",
        F.round(quality_score(F.col("text")), 6).cast("decimal(10,6)").alias("quality"),
    )
    thr = d.agg((F.sum("quality").cast("double") / F.count("*")).alias("cut"))
    per = (
        d.crossJoin(F.broadcast(thr))
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(
                F.when(F.col("quality").cast("double") >= F.col("cut"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_retained"),
        )
    )
    return _four_fifths_verdict(per)


def _four_fifths_verdict(per: DataFrame) -> DataFrame:
    """Disparity verdict over a (lang, n_docs, n_retained) frame — shared
    by llmops_filter_disparity_audit and the injected-disparity test (the
    fixture corpus is word-salad with no real language disparity, so the
    registered query's flag column is attested all-false; the flag path
    is exercised in tests/test_r12_invariants.py)."""
    rate = F.col("n_retained").cast("double") / F.col("n_docs")
    mx = per.agg(F.max(rate).alias("best"))
    return per.crossJoin(F.broadcast(mx)).select(
        "lang",
        "n_docs",
        "n_retained",
        F.round(rate, 6).alias("retention"),
        F.round(rate / F.col("best"), 6).alias("ratio_vs_best"),
        (rate / F.col("best") < 0.8).alias("four_fifths_flag"),
    )


@query(
    "llmops_good_turing_unseen",
    oracle=r"""
    WITH tk AS (
      SELECT list_transform(list_filter(string_split_regex(trim(text), '\s+'),
                                        x -> length(x) > 0),
                            x -> lower(x)) AS toks
      FROM documents
    ), tg AS (
      SELECT unnest(toks[1:length(toks)-2]) AS w1,
             unnest(toks[2:length(toks)-1]) AS w2,
             unnest(toks[3:length(toks)]) AS w3
      FROM tk WHERE length(toks) >= 3
    ), c AS (
      SELECT w1 || ' ' || w2 || ' ' || w3 AS ng, CAST(count(*) AS BIGINT) AS r
      FROM tg GROUP BY 1
    ), ff AS (
      SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM c GROUP BY r
    ), scal AS (
      SELECT CAST(sum(n_r) AS BIGINT) AS s_obs,
             CAST(sum(r * n_r) AS BIGINT) AS n_tokens,
             CAST(coalesce(sum(n_r) FILTER (WHERE r = 1), 0) AS BIGINT) AS n1,
             CAST(coalesce(sum(n_r) FILTER (WHERE r = 2), 0) AS BIGINT) AS n2
      FROM ff
    )
    SELECT f.r, f.n_r,
           round((f.r + 1) * coalesce(f2.n_r, 0) * 1.0 / f.n_r, 6) AS r_star,
           s.s_obs, s.n_tokens,
           round(s.n1 * 1.0 / s.n_tokens, 6) AS unseen_mass,
           round(s.s_obs + s.n1 * 1.0 * (s.n1 - 1) / (2 * (s.n2 + 1)), 6)
             AS chao1_richness
    FROM ff f LEFT JOIN ff f2 ON f2.r = f.r + 1
    CROSS JOIN scal s
    WHERE f.r <= 5
    """,
)
def llmops_good_turing_unseen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GOOD-TURING unseen-mass estimation + CHAO1 richness over word
    TRIGRAM types — the coverage question a corpus team asks before
    dedup/contamination planning: how much probability mass belongs to
    n-grams we have NOT yet seen, and how many distinct n-grams does the
    population plausibly hold? The head of the frequency-of-frequencies
    table is emitted with the Good-Turing adjusted counts
    r* = (r+1) N_{r+1}/N_r (Good 1953; the smoothing inside Katz
    backoff), the unseen mass P0 = N_1/N, and the bias-corrected Chao1
    estimate S_obs + N_1(N_1-1)/(2(N_2+1)) (Chao 1984) — trigram types
    because the fixture's unigram space saturates at every SF while the
    trigram tail keeps real singletons (9.4k at sf0.001, 207 at sf0.1).

    Parity discipline: every statistic is a ratio of exact BIGINT counts
    divided once as doubles on identical operands, rounded only at
    emission; absent N_{r+1} rows coalesce to an exact 0 (r* = 0 is the
    Good-Turing statement "no mass evidence above r").

    Spark-first: explode -> ONE trigram-type hash aggregation (the only
    scan-sized shuffle) -> the frequency-of-frequencies table, whose
    size is bounded by the MAXIMUM count, not the vocabulary — the
    self-join, scalars, and emission all run on that tiny grid."""
    # spread(): tokenize + trigram build/explode is per-row text compute
    # over the 1-task fixture scan (guide §2.5); no-op at scale.
    d = spread(t(spark, sf_dir, "documents").select("text"))
    tk = d.select(
        F.transform(tokens(F.col("text")), F.lower).alias("toks")
    )
    tg = tk.filter(F.size("toks") >= 3).select(
        F.explode(
            F.expr(
                "zip_with(slice(toks, 1, size(toks) - 2),"
                " zip_with(slice(toks, 2, size(toks) - 2),"
                "          slice(toks, 3, size(toks) - 2),"
                "          (y, z) -> concat(y, ' ', z)),"
                " (x, yz) -> concat(x, ' ', yz))"
            )
        ).alias("ng")
    )
    c = tg.groupBy("ng").agg(F.count("*").cast("bigint").alias("r"))
    ff = c.groupBy("r").agg(F.count("*").cast("bigint").alias("n_r"))
    scal = ff.agg(
        F.sum("n_r").cast("bigint").alias("s_obs"),
        F.sum(F.col("r") * F.col("n_r")).cast("bigint").alias("n_tokens"),
        F.coalesce(F.sum(F.when(F.col("r") == 1, F.col("n_r"))), F.lit(0))
        .cast("bigint")
        .alias("n1"),
        F.coalesce(F.sum(F.when(F.col("r") == 2, F.col("n_r"))), F.lit(0))
        .cast("bigint")
        .alias("n2"),
    )
    f2 = ff.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r_next"))
    return (
        ff.filter(F.col("r") <= 5)
        .join(F.broadcast(f2), "r", "left")
        .crossJoin(F.broadcast(scal))
        .select(
            "r",
            "n_r",
            F.round(
                (F.col("r") + 1)
                * F.coalesce(F.col("n_r_next"), F.lit(0))
                * F.lit(1.0)
                / F.col("n_r"),
                6,
            ).alias("r_star"),
            "s_obs",
            "n_tokens",
            F.round(F.col("n1") * F.lit(1.0) / F.col("n_tokens"), 6).alias(
                "unseen_mass"
            ),
            F.round(
                F.col("s_obs")
                + F.col("n1") * F.lit(1.0) * (F.col("n1") - 1) / (2 * (F.col("n2") + 1)),
                6,
            ).alias("chao1_richness"),
        )
    )
