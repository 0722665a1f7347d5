"""Invariant tests for the wave-2 curation operators (curation_queries.py)
— properties the oracle hash-match can't express by itself."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_public_spark.plans import QUERIES
from tests.conftest import SF_DIR


def test_bloom_no_false_negatives(spark):
    """The bloom contract: every true duplicate must be flagged probably-
    seen (false positives are allowed; false negatives never)."""
    df = QUERIES["llmops_bloom_dedup"].fn(spark, SF_DIR).cache()
    fn = df.filter(F.col("truly_dup") & ~F.col("probably_seen")).count()
    assert fn == 0
    # The split must actually produce both classes of rows at this SF.
    assert df.count() > 0
    df.unpersist()


def test_chunks_cover_every_token_in_order(spark):
    """Stitching chunk windows back together at stride offsets must
    reproduce each document's full token stream (no gaps, no reorder)."""
    from batch_public_spark.operators.textops import normalized_text, tokens

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", tokens(normalized_text(F.col("text"))).alias("toks"))
    )
    chunks = QUERIES["llmops_chunk_documents"].fn(spark, SF_DIR).filter(F.col("doc_id") < 40)
    joined = chunks.join(docs, "doc_id").select(
        "doc_id",
        "chunk_start",
        "chunk_len",
        F.md5(
            F.array_join(F.slice("toks", F.col("chunk_start") + 1, 16), " ")
        ).alias("expect_md5"),
        "chunk_md5",
        F.size("toks").alias("n"),
    )
    assert joined.filter(F.col("chunk_md5") != F.col("expect_md5")).count() == 0
    # Stride coverage: last chunk must reach the end of the token stream.
    last = joined.groupBy("doc_id", "n").agg(
        F.max(F.col("chunk_start") + F.col("chunk_len")).alias("covered")
    )
    assert last.filter(F.col("covered") < F.col("n")).count() == 0


def test_weighted_sample_is_deterministic_and_length_biased(spark):
    a = QUERIES["llmops_weighted_sample"].fn(spark, SF_DIR)
    b = QUERIES["llmops_weighted_sample"].fn(spark, SF_DIR)
    assert sorted(r.doc_id for r in a.collect()) == sorted(r.doc_id for r in b.collect())
    # Length bias: the sampled docs' mean length exceeds the corpus mean
    # (weights are n_chars, so this holds overwhelmingly).
    corpus_mean = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet").agg(F.avg("n_chars")).first()[0]
    )
    sample_mean = a.agg(F.avg("n_chars")).first()[0]
    assert sample_mean > corpus_mean


def test_quality_classifier_decision_matches_integer_sum(spark):
    df = QUERIES["llmops_quality_classifier"].fn(spark, SF_DIR)
    bad = df.filter(
        (F.col("keep") != (F.col("w_sum") > 0))
        | ((F.col("quality_prob") > 0.5) != (F.col("w_sum") > 0))
    )
    assert bad.count() == 0


def test_source_overlap_is_symmetric_half_matrix(spark):
    df = QUERIES["llmops_source_overlap"].fn(spark, SF_DIR).cache()
    # Only ordered pairs, no self-pairs.
    assert df.filter(F.col("src_a") >= F.col("src_b")).count() == 0
    # Jaccard within (0, 1]; n_shared bounded by both set sizes.
    assert (
        df.filter(
            (F.col("overlap_jaccard") <= 0)
            | (F.col("overlap_jaccard") > 1)
            | (F.col("n_shared") > F.least("n_a", "n_b"))
        ).count()
        == 0
    )
    df.unpersist()


def test_pii_redact_leaves_no_pii_shapes(spark):
    from batch_public_spark.operators.textops import PII_RULES, pii_count, redact_pii

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    synth = docs.select(
        F.concat(
            F.col("text"),
            F.lit(" ssn 123-45-6789 or 4111 1111 1111 1111 call +1 (415) 555-0100 x"),
            F.lit(" mail a.b+c@example.co.uk"),
        ).alias("s")
    )
    red = synth.select(redact_pii(F.col("s")).alias("r"), pii_count(F.col("s")).alias("n"))
    # After redaction no rule matches again, and all four shapes counted.
    residual = red
    for pat, _ in PII_RULES:
        residual = residual.filter(F.regexp_count(F.col("r"), F.lit(pat)) > 0)
    assert residual.count() == 0
    assert red.filter(F.col("n") != 4).count() == 0
