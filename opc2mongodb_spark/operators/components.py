"""Connected components over candidate-pair edges (dedup clustering).

Completes the dedup pipeline: exact fingerprints collapse identical docs,
MinHash-LSH + Jaccard verification emit near-duplicate PAIRS, and this
operator turns pairs into dedup GROUPS — each document labeled with the
minimum doc id reachable through the pair graph, so ``keep = doc_id ==
cluster_id`` is a deterministic keep-one-per-cluster policy.

Algorithm: iterative min-label propagation (the alternating "large-star"
style loop every distributed CC implementation reduces to):

    label(v) <- min(label(v), min over neighbors' labels)

repeated to fixpoint. Per iteration: one groupBy-min over the edge list +
one join back to labels — both shuffles on the vertex id, map-side
combinable, no skew beyond the degree distribution the graph already has.
Convergence is O(graph diameter) iterations; near-duplicate clusters are
near-cliques, so 2-3 iterations in practice. The driver loop only checks a
scalar "did any label change" count per iteration — no data is collected.

Delta iteration: after round one, only the FRONTIER (vertices whose label
changed last round) propagates — a label that did not change contributes
exactly what it contributed before, so re-sending it is pure waste. Min
propagation is monotone, and any change reaches every neighbor on the very
next round, so frontier propagation converges to the same fixpoint. At
scale this turns late iterations from |E|-sized joins into
|changed-frontier|-sized ones (the standard Pregel/GraphX delta pattern).

At 100 TB: labels and edges are both hash-partitioned on vertex id, so each
iteration is two co-partitioned shuffles; ``localCheckpoint`` cuts the
lineage so the plan does not grow with iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERATIONS = 50  # backstop only; diameter bounds real convergence


def release_checkpoint(df: DataFrame) -> None:
    """Actually free the block-stored RDD behind a localCheckpointed frame.

    ``DataFrame.unpersist()`` only drops CacheManager entries created by
    ``persist()``; the RDD a ``localCheckpoint`` materializes is invisible to
    it and its blocks linger until the JVM's ContextCleaner happens to GC the
    Dataset — measured here: 11 persistent RDDs after three clustering runs,
    every ``unpersist()`` a silent no-op. An iterative operator that
    checkpoints per round MUST release deterministically or a long session
    (bench loop, streaming driver) accumulates executor-memory blocks until
    GC thrash. Walk the analyzed plan's LogicalRDD leaves and unpersist the
    underlying RDDs directly; fall back to the plain unpersist if the JVM
    internals ever shift.
    """
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getSimpleName() == "LogicalRDD":
                leaf.rdd().unpersist(False)
    except Exception:  # pragma: no cover - py4j internals shifted
        df.unpersist()


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    max_iterations: int = MAX_ITERATIONS,
) -> DataFrame:
    """Label every vertex with the minimum vertex id in its component.

    ``vertices``: one column ``id_col``. ``edges``: columns (a_id, b_id),
    undirected. Returns (``id_col``, cluster_id); vertices with no edges are
    their own cluster.

    Shuffle budget: exactly ONE |E|-sized shuffle per iteration (the
    neighbor-min groupBy). ``sym`` is hash-partitioned on ``src`` and
    ``labels`` on ``vid`` ONCE up front; ``localCheckpoint`` preserves that
    partitioning (AQE is disabled for the loop — under AQE the checkpointed
    LogicalRDD reports UnknownPartitioning and every join re-shuffles both
    sides every round), so the frontier join and the labels join are
    zero-exchange co-partitioned joins, ``shuffle_hash``-hinted so the big
    edge side is streamed, never sorted. AQE has nothing to offer inside the
    loop: the groupBy is map-side combinable (hot vertices collapse before
    the shuffle) and the joins never shuffle. One driver action per
    iteration: the convergence count_if scans every partition, which also
    materializes the lazy checkpoint in the same job.

    Raises ``RuntimeError`` if the propagation has not converged after
    ``max_iterations`` — partially-propagated labels are WRONG answers, never
    returned silently. A graph that legitimately needs more iterations
    (diameter > 50 means a path-like graph, not near-duplicate near-cliques)
    should pass a larger ``max_iterations`` explicitly.
    """
    spark = vertices.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _cc_loop(vertices, edges, id_col, max_iterations, n_part)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)


def _cc_loop(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str,
    max_iterations: int,
    n_part: int,
) -> DataFrame:
    # Symmetrize in ONE pass over the edge plan: unionAll of two selects
    # would execute the (possibly expensive) upstream pair generation twice.
    sym = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("a_id").alias("src"), F.col("b_id").alias("dst")),
                F.struct(F.col("b_id").alias("src"), F.col("a_id").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")

    sym = sym.repartition(n_part, "src").localCheckpoint(eager=True)
    labels = (
        vertices.select(F.col(id_col).alias("vid"), F.col(id_col).alias("label"))
        .repartition(n_part, "vid")
        .localCheckpoint(eager=True)
    )

    def _step(lbls: DataFrame, front: DataFrame) -> DataFrame:
        # min label among each vertex's FRONTIER neighbors (delta iteration —
        # unchanged labels were already propagated). Both joins are
        # co-partitioned zero-exchange joins; the shuffle_hash hints build
        # the hash map on the small side ((shrinking) frontier / |V|-sized
        # neighbor-min) and STREAM the big side (sort-merge would re-sort
        # |E| rows every round). Returns (vid, label, _changed).
        neighbor_min = (
            sym.join(front.hint("shuffle_hash"), sym.src == front.vid)
            .groupBy("dst")
            .agg(F.min("label").alias("nmin"))
        )
        return lbls.join(
            neighbor_min.hint("shuffle_hash"),
            lbls.vid == neighbor_min.dst,
            "left",
        ).select(
            "vid",
            F.least(
                F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
            ).alias("label"),
            (F.col("nmin") < F.col("label")).alias("_changed"),
        )

    changed = 0
    frontier = labels  # round one: every vertex propagates
    try:
        for _ in range(max_iterations):
            # LAZY checkpoint + ONE aggregate action per round: the count_if
            # scan computes every partition, so the checkpoint blocks are
            # fully materialized by the same job that returns the
            # convergence scalar (an eager checkpoint + separate count would
            # schedule 2 driver jobs per round — pure constant overhead that
            # dominated small/medium runs).
            new_labels = _step(labels, frontier).localCheckpoint(eager=False)
            changed = new_labels.agg(
                F.count_if(F.col("_changed")).alias("n")
            ).first()[0]
            # previous round's checkpoint blocks are dead once the new one
            # is materialized (the agg above) — without this, repeated calls
            # accumulate cached RDD blocks and degrade 4x+ under memory
            # pressure. Release AFTER materialization: the new checkpoint's
            # lineage reads the old blocks until it is persisted.
            release_checkpoint(labels)
            # next round's frontier: a cheap filter over the checkpointed
            # labels — preserves the (vid, n) partitioning, no lineage growth
            frontier = new_labels.filter(F.col("_changed")).drop("_changed")
            labels = new_labels.drop("_changed")
            if changed == 0:
                break
    finally:
        release_checkpoint(sym)
    if changed != 0:
        release_checkpoint(labels)
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations; labels would be partially propagated. Pass a larger "
            "max_iterations for graphs with diameter beyond the backstop."
        )

    # Materialize the result off the iteration checkpoint so the final block
    # can be released too; the caller gets a plain, self-contained DataFrame.
    out = labels.select(
        F.col("vid").alias(id_col), F.col("label").alias("cluster_id")
    ).localCheckpoint(eager=True)
    release_checkpoint(labels)
    return out
