"""Exact Gram matrix + deterministic power iteration (PCA-1), 100 TB-shaped.

The reference has no linear-algebra surface (its engine is a protocol
bridge, OPC2MongoDB/Program.cs); this operator serves the training-data
pipeline: the corpus Gram/covariance matrix and its dominant eigenvector
are the backbone of PCA whitening, spectral outlier scoring, and the
"remove the first principal component" post-processing common for text
embeddings (Arora et al.'s SIF baseline, public).

Scale contract:

- ``gram_matrix``: the D x D Gram G = X^T X is accumulated WITHOUT joining
  or shuffling vectors: each row double-posexplodes to D^2 (i, j, product)
  terms and ONE map-side-combinable decimal sum groups them on (i, j).
  Per-task aggregation state is D^2 cells (64 x 64 here) no matter how
  many input vectors — shuffle volume is #partitions x D^2, never O(n).
  The input goes through the gated ``spread()`` first: the terms of a
  single input row must never serialize onto one task when the scan
  arrives under-parallel (the sf0.1 single-file case), while an
  already-parallel 100 TB scan is left untouched. (The r8 rework: the
  previous 64-wide-aggregate form generated a whole-stage method so large
  that EVERY fresh plan re-paid ~15 s of codegen+JIT before the first
  row; the long form's single small aggregate compiles in milliseconds
  and produces the (i, j, g) frame directly, no stack unpivot.)
- ``power_iteration``: iterates x_{k+1} = G x_k / m_k on the D^2-row Gram
  frame. Every matrix-vector product is a broadcast join of the 64-row
  vector onto the Gram frame; the per-i sums are DECIMAL-pinned so
  summation order cannot change a bit. The normalizer m_k is the SIGNED
  component of the largest |y| (smallest-i tiebreak via struct-max), so
  the iterate's peak component is driven to exactly 1.0 — a deterministic
  sign convention with one IEEE division per component and no sqrt.
- Fixed iteration count (like q_kmeans_iter's fixed Lloyd round): the
  driver-side loop chains a bounded number of tiny-frame stages; nothing
  about the input size reaches the loop.

Cross-engine determinism: products are pinned at decimal(28,12) before
summation (the kmeans/embedding_drift pin — float32-scale components keep
~5 digits of headroom, 16 integer digits absorb corpus-scale sums); the
decimal -> double casts exceed 2^53 so every rendered component goes
through %.9e (queries.py module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PIN = "decimal(28,12)"


def gram_matrix(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    as_double: bool = True,
) -> DataFrame:
    """(i, j, g): g = sum over rows of v[i] * v[j], exact decimal sums.

    ``i``/``j`` are 0-based ints; the full D^2 (not triangle) is emitted so
    consumers can matrix-multiply without re-mirroring. With
    ``as_double=False`` the exact decimal(28,12) sum is returned instead of
    its double projection — callers that must render a bit-identical value
    cross-engine string-render the decimal directly, because the
    decimal -> double cast itself was measured 1 ulp apart between engines
    (the q_gram_matrix flap that motivated this flag).
    """
    from opc2mongodb_spark.plans.spread import spread

    v = F.col(vec_col).cast("array<double>")
    src = spread(embeddings.select(v.alias("_v")), "_v")
    terms = src.select(
        F.posexplode("_v").alias("i", "vi"), F.col("_v")
    ).select("i", "vi", F.posexplode("_v").alias("j", "vj"))
    cast_out = (lambda c: c.cast("double")) if as_double else (lambda c: c)
    return (
        terms.groupBy("i", "j")
        .agg(
            cast_out(
                F.sum((F.col("vi") * F.col("vj")).cast(_PIN))
            ).alias("g")
        )
        .select(
            F.col("i").cast("int").alias("i"),
            F.col("j").cast("int").alias("j"),
            "g",
        )
    )


# The iterate is re-quantized to 9 fractional digits after every
# normalization. Rationale: the decimal -> double casts feeding y and m were
# measured 1 ulp apart between engines, so the IEEE division y/m can differ
# by ~1e-16 absolute cross-engine; snapping to the 1e-9 grid makes the
# engine-visible iterate EXACTLY equal again each round (a boundary flip
# would need the quotient within 1e-16 of a grid midpoint), so errors never
# compound across iterations and the final component renders bit-identically
# as a decimal string.
_X_PIN = "decimal(20,9)"


def _normalize(y: DataFrame) -> DataFrame:
    """x = round9(y / m), m the SIGNED peak-|y| component (min-i tiebreak).

    m is an unpartitioned-window max rather than an agg + broadcast +
    crossJoin (r13, guide §2.4): the window form computes y ONCE and in
    ONE stage (a single-partition exchange of the D-row frame), where the
    agg form evaluated the y subtree twice (peak agg + crossJoin left
    side) and serialized an extra aggregate + BroadcastExchange +
    BroadcastNestedLoopJoin stage chain per iteration — pure fixed stage
    latency on a frame that is ALWAYS exactly D rows. Scale-safe for the
    same reason: the single-partition window touches D rows no matter
    the input size (dimension-bound, never data-bound). Identical max-
    struct semantics, so the iterate is bit-identical."""
    from pyspark.sql import Window

    m = F.max(
        F.struct(F.abs(F.col("y")).alias("a"), (-F.col("i")).alias("ni"),
                 F.col("y").alias("yy"))
    ).over(Window.partitionBy())["yy"]
    return y.select("i", (F.col("y") / m).cast(_X_PIN).alias("x"))


def power_iteration(gram: DataFrame, iters: int = 3) -> DataFrame:
    """Dominant-eigenvector estimate (i, x) after ``iters`` rounds from x0=1.

    Each round: y[i] = sum_j G[i,j] * x[j] with decimal-pinned products
    (order-free exact sums), then peak-normalize onto the 1e-9 grid (see
    ``_X_PIN``). Returns x as decimal(20,9) — render with a plain string
    cast, never a double round-trip. All frames are D- or D^2-row; the
    input scale only ever touched ``gram_matrix``.

    The gram frame is persisted here: the loop references it iters+1
    times (x0's dims + one matvec per round), and without the cache every
    reference re-derives the full input-scale aggregation (the
    q_bitmap_distinct shared-derivation discipline). D^2 rows, trivially
    cacheable.

    It is also repartitioned by ``i`` before the persist (r13, guide
    §2.4 "two operations keyed the same way share one exchange"): the
    gram arrives hash-partitioned on (i, j) from its groupBy, which does
    NOT satisfy the per-round ``groupBy("i")`` — every matvec paid a
    fresh Exchange of the cached frame, and so did x0's ``distinct()``
    on i. Partitioned by ``i`` once at cache time, the broadcast matvec
    join preserves the partitioning and all iters+1 downstream
    aggregations run exchange-free (measured with _normalize's window
    form: 18.6 -> 4.0 s median interleaved A/B on q_pca_power at sf0.1,
    results bit-identical). D^2 rows at any input scale, so the one-off
    repartition is constant work.
    """
    gram = gram.repartition("i").persist()
    x = gram.select("i").distinct().select(
        "i", F.lit(1.0).cast(_X_PIN).alias("x")
    )
    for _ in range(iters):
        y = (
            gram.join(
                F.broadcast(
                    x.select(
                        F.col("i").alias("j"),
                        F.col("x").cast("double").alias("xj"),
                    )
                ),
                "j",
            )
            .groupBy("i")
            .agg(
                F.sum((F.col("g") * F.col("xj")).cast(_PIN))
                .cast("double")
                .alias("y")
            )
        )
        x = _normalize(y)
    return x


def rayleigh_quotient(gram: DataFrame, x: DataFrame) -> DataFrame:
    """One-row (lambda_est): x^T G x / x^T x with decimal-pinned sums."""
    x = x.select("i", F.col("x").cast("double").alias("x"))
    xg = gram.join(
        F.broadcast(x.select(F.col("i").alias("j"), F.col("x").alias("xj"))), "j"
    ).join(F.broadcast(x), "i")
    num = xg.agg(
        F.sum((F.col("x") * F.col("g") * F.col("xj")).cast(_PIN))
        .cast("double")
        .alias("num")
    )
    den = x.agg(
        F.sum((F.col("x") * F.col("x")).cast(_PIN)).cast("double").alias("den")
    )
    return num.crossJoin(F.broadcast(den)).select(
        (F.col("num") / F.col("den")).alias("lambda_est")
    )
