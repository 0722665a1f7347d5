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


def test_result_schema_has_no_probe_column(spark):
    """r14: the convergence probe rides the per-round cut as an extra
    old_label column; it must never leak into the operator's result."""
    edges = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = connected_components(edges)
    assert out.columns == ["id", "component"]
    got = {(r.id, r.component) for r in out.collect()}
    assert got == {(1, 1), (2, 1), (3, 1)}


def test_converged_star_stops_after_one_round(spark):
    """A star graph converges in one hash-min round — the probe must
    report zero changes on round 2's frame and exit without raising."""
    edges = spark.createDataFrame([(0, i) for i in range(1, 6)], "id_a long, id_b long")
    got = {(r.id, r.component) for r in connected_components(edges, max_iter=2).collect()}
    assert got == {(i, 0) for i in range(6)}


def test_dedup_by_components_keeps_min_and_isolated(spark):
    df = spark.createDataFrame([(i, f"t{i}") for i in range(6)], "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "id_a long, id_b long")
    kept = sorted(r.doc_id for r in dedup_by_components(df, pairs).collect())
    # components {0,1,2} -> keep 0; {4,5} -> keep 4; 3 isolated -> kept
    assert kept == [0, 3, 4]
