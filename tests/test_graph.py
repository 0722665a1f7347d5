"""Connected-components correctness on synthetic graphs."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_public_spark.operators.graph import connected_components, dedup_by_components


def test_path_graph_converges(spark):
    """A long path needs multiple hash-min rounds (diameter > 1)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)] + [(100, 101), (101, 102)],
        "id_a long, id_b long",
    )
    got = {(r.id, r.component) for r in connected_components(edges).collect()}
    assert got == {(i, 0) for i in range(11)} | {(i, 100) for i in (100, 101, 102)}


def test_direction_insensitive(spark):
    """Edges are undirected regardless of (src, dst) order."""
    edges = spark.createDataFrame([(5, 1), (2, 5), (9, 7)], "id_a long, id_b long")
    got = {(r.id, r.component) for r in connected_components(edges).collect()}
    assert got == {(1, 1), (2, 1), (5, 1), (7, 7), (9, 7)}


def test_dedup_by_components_keeps_min_and_isolated(spark):
    df = spark.createDataFrame([(i, f"t{i}") for i in range(6)], "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "id_a long, id_b long")
    kept = sorted(r.doc_id for r in dedup_by_components(df, pairs).collect())
    # components {0,1,2} -> keep 0; {4,5} -> keep 4; 3 isolated -> kept
    assert kept == [0, 3, 4]
