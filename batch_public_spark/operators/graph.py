"""Connected components over candidate-pair graphs.

Near-dup dedup produces PAIRS (MinHash bands, SimHash blocks, embedding
cosine); turning pairs into dedup DECISIONS needs the transitive closure —
docs A~B and B~C are one cluster even though A~C was never emitted. The
greedy single-link shortcut in ``dedup_minhash`` drops only direct losers;
this module computes true components with hash-min label propagation:

    label(v) ← min(label(v), min over neighbors' labels)

iterated to fixpoint. Each round is two hash joins + an aggregation —
all shuffles on the vertex key, no driver-side graph. Rounds needed =
graph diameter (near-dup clusters are shallow: usually 2-4). Lineage is
truncated per round with ``localCheckpoint`` so the plan doesn't grow
exponentially across iterations — the classic Spark iterative-algorithm
trap.

At 100 TB this is the standard formulation (cf. the large-star/small-star
algorithm of Kiveris et al., "Connected Components in MapReduce and
Beyond"); hash-min is its simple dense-diameter-tolerant cousin and is
exactly what production dedup pipelines run on candidate graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Return (id, component) where component = min vertex id reachable.

    ``edges`` is an undirected pair list; isolated vertices absent from it
    are absent from the result (callers union them back with
    component = own id if needed).

    Raises ``RuntimeError`` if labels are still changing after ``max_iter``
    rounds — returning non-converged labels would silently under-merge
    clusters (dedup would keep extra duplicates with no signal)."""
    # Undirected: canonicalize to (min, max) and dedupe BEFORE mirroring —
    # the distinct then shuffles |E| canonical rows instead of 2|E|
    # mirrored ones (guide §2.3: shuffle fewer bytes), and the mirror is a
    # map-side projection. Self-loops are kept once and not re-mirrored,
    # so the symmetrized set is exactly the old one.
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    canon = e.select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
    ).distinct()
    sym = canon.unionByName(
        canon.filter(F.col("u") != F.col("v")).select(
            F.col("v").alias("u"), F.col("u").alias("v")
        )
    )
    # Lazy checkpoint: the first iteration's `changed` action materializes
    # it inside a job that was running anyway (eager would schedule a
    # dedicated driver-blocking job just for the cut).
    sym = sym.localCheckpoint(eager=False)

    # label(v) starts as v's min direct neighbor (or itself).
    labels = (
        sym.groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).alias("label"))
        .withColumnRenamed("u", "id")
    )

    converged = False
    for _ in range(max_iter):
        # candidate label via one hop: min label among neighbors.
        nbr = (
            sym.join(labels.withColumnRenamed("id", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("u", "id")
        )
        # The update join already holds old AND new label side by side, so
        # carry the old label THROUGH the checkpoint and probe convergence
        # with a narrow filter over the persisted frame — the former
        # new-vs-old compare was one extra shuffle join per round whose
        # only output was a boolean (guide §2.4: remove shuffles outright).
        # Cost: one extra int column in the per-round persisted cut.
        upd = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                F.col("label").alias("old_label"),
                F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=False)
        )
        changed = upd.filter(F.col("label") != F.col("old_label")).limit(1).count()
        labels = upd.select("id", "label")
        if changed == 0:
            converged = True
            break

    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds (graph diameter exceeds the budget); raise max_iter"
        )
    return labels.select("id", F.col("label").alias("component"))


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Keep one representative (the min id) per connected component of the
    near-dup pair graph; rows not in any pair survive untouched."""
    comp = connected_components(pairs, src=src, dst=dst)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def pagerank_weighted(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iters: int = 2,
    damping: float = 0.85,
    round_at: int = 8,
) -> DataFrame:
    """Weighted PageRank over a directed edge list → (vertex, pr).

    pr'(v) = (1-d)/N + d · Σ_{u→v} pr(u) · w(u,v) / wdeg(u)

    Spark-first iterative shape (same discipline as hash-min CC above and
    semantic.kmeans_lloyd): each iteration is one join of the edge list
    with the current rank vector plus one aggregation — both shuffles on
    the vertex key, so a cluster reuses the partitioning across rounds.
    Ranks are rounded to ``round_at`` per iteration, which makes the whole
    computation bit-reproducible across engines/partitionings (and
    oracle-checkable); lineage is truncated per round with
    ``localCheckpoint`` for deep runs.

    Dangling vertices (no out-edges) leak their mass — acceptable for the
    co-occurrence graphs this serves (symmetrized ⇒ no danglers)."""
    # Materialize the edge list ONCE before anything derives from it —
    # verts, wdeg, and the per-iteration joins all read the checkpointed
    # blocks. (Checkpointing verts and the weighted edges separately, each
    # upstream of the cut, ran the whole edge-construction pipeline — for
    # the co-occurrence graph: corpus scan, explode, distinct, self-join —
    # twice.)
    e0 = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"), F.col(weight).alias("w")
    ).localCheckpoint(eager=False)
    verts = (
        e0.select(F.col("u").alias("vertex"))
        .union(e0.select(F.col("v").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # The count materializes e0 and verts in ONE job (lazy checkpoints cut
    # lineage at first computation without scheduling a dedicated job each
    # — eager checkpointing here added a driver-blocking job per cut, pure
    # fixed overhead when the iteration frames are vocabulary-sized).
    n = verts.count()
    if n == 0:
        # empty graph → empty (vertex, pr) result, not ZeroDivisionError
        return verts.withColumn("pr", F.lit(0.0))
    wdeg = e0.groupBy("u").agg(F.sum("w").alias("wdeg"))
    e = e0.join(wdeg, "u").localCheckpoint(eager=False)

    pr = verts.withColumn("pr", F.round(F.lit(1.0 / n), round_at))
    base = (1.0 - damping) / n
    for _ in range(iters):
        contrib = (
            e.join(pr, e["u"] == pr["vertex"])
            .select(
                F.col("v").alias("vertex"),
                (F.col("pr") * F.col("w") / F.col("wdeg")).alias("c"),
            )
            .groupBy("vertex")
            .agg(F.sum("c").alias("in_mass"))
        )
        pr = (
            verts.join(contrib, "vertex", "left")
            .select(
                "vertex",
                F.round(
                    F.lit(base) + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0)),
                    round_at,
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return pr
