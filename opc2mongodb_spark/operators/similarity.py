"""Similarity search over embedding columns (north-star I5).

Two paths:

- ``cosine_topk``: brute-force exact top-k against a query vector. The query
  side is a 1-row broadcast (never collected to the driver); the scan side
  streams through a codegen'd fold — O(N·d) with no shuffle except the final
  top-k (TakeOrderedAndProject). This is the correctness baseline and is
  already the right plan for one-off queries at 100 TB.

- ``ann_lsh_topk``: sign-random-projection LSH. Anchor vectors (data-derived,
  deterministic) induce a bit-bucket per vector; search only the query's
  bucket. At scale: bucketing is one broadcast join + narrow map; the probe
  reads ~N/2^bits of the data. More anchors → finer buckets; multi-probe =
  relax the bucket filter to hamming distance ≤ r.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opc2mongodb_spark.functions.vectors import cosine, dot


def _query_vec(embeddings: DataFrame, query_id: int, id_col: str, vec_col: str):
    return F.broadcast(
        embeddings.filter(F.col(id_col) == query_id).select(
            F.col(vec_col).alias("_qv")
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to the query vector (query row excluded).
    Deterministic: ties broken by id."""
    q = _query_vec(embeddings, query_id, id_col, vec_col)
    return (
        embeddings.filter(F.col(id_col) != query_id)
        .crossJoin(q)
        .select(
            F.col(id_col),
            cosine(F.col(vec_col), F.col("_qv")).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def bucketize_lsh(
    embeddings: DataFrame,
    anchor_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-projection bucket per vector: one bit per anchor (dot > 0).

    Anchors are data vectors selected by id — deterministic and identically
    computable in the SQL oracle (vs. RNG hyperplanes, which would not be).

    Plan: the anchors fold into ONE broadcast row (array of structs sorted
    by anchor id) and every bit is computed in a single narrow projection —
    no groupBy shuffle, no bucket-rejoin. Bucketing N vectors is one map
    over the scan, which is the shape you want when N is 100 TB of rows.
    """
    anchors = F.broadcast(
        embeddings.filter(F.col(id_col).isin(anchor_ids))
        .select(F.col(id_col).alias("_aid"), F.col(vec_col).alias("_av"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_aid", "_av")),
                lambda l, r: F.when(l["_aid"] < r["_aid"], -1)
                .when(l["_aid"] > r["_aid"], 1)
                .otherwise(0),
            ).alias("_anchors")
        )
    )
    return embeddings.crossJoin(anchors).select(
        F.col(id_col),
        F.concat_ws(
            "",
            F.transform(
                F.col("_anchors"),
                lambda s: F.when(dot(F.col(vec_col), s["_av"]) > 0, F.lit("1"))
                .otherwise(F.lit("0")),
            ),
        ).alias("bucket"),
    )


def ann_lsh_topk(
    embeddings: DataFrame,
    query_id: int,
    anchor_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine ranking within the query's LSH bucket."""
    buckets = bucketize_lsh(embeddings, anchor_ids, id_col, vec_col)
    with_bucket = embeddings.join(buckets, id_col)
    qb = F.broadcast(
        with_bucket.filter(F.col(id_col) == query_id).select(
            F.col("bucket").alias("_qbucket"), F.col(vec_col).alias("_qv")
        )
    )
    return (
        with_bucket.filter(F.col(id_col) != query_id)
        .crossJoin(qb)
        .filter(F.col("bucket") == F.col("_qbucket"))
        .select(
            F.col(id_col),
            F.col("bucket"),
            cosine(F.col(vec_col), F.col("_qv")).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def neardup_pairs(
    embeddings: DataFrame,
    threshold: float,
    anchor_ids: list[int],
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_radius: int = 1,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed within a block.

    Candidates must share the coarse block AND collide in sign-projection
    LSH space (hamming distance <= ``probe_radius`` between buckets). Pair
    space is bounded by Σ|(block, bucket) collision group|², never
    Σ|block|² — a popular block at 100 TB no longer implies a quadratic/
    skewed self-join; candidate cost tracks real near-duplicate density.

    Exactly-once emission without a dedup shuffle: only the LEFT side
    explodes its probe set (own bucket + all <=radius bit-flip variants).
    Hamming distance is symmetric and the probe strings are pairwise
    distinct, so for each qualifying pair (a<b) precisely ONE probe row of
    a matches b's bucket.

    Recall/cost dial (``probe_radius``, 4 anchors): radius r admits
    Σ_{k<=r} C(4,k)/16 of the random-pair space — r=0: 6%, r=1: 31%,
    r=2: 69%. Recall at a REAL near-dup threshold (cos>=0.9, bit-flip
    p≈0.14) is ≈0.90 at r=1; on this synthetic corpus whose best pairs sit
    at cos≈0.4-0.48 (θ≈66°, p≈0.37 — almost coin-flip bits) measured
    recall at r=1 is 0.5-0.8. That is the honest sign-LSH trade-off, not a
    bug: raise radius or threshold for recall, never fall back to
    all-pairs.

    Candidate generation is NARROW (ids + block + bucket); vectors and
    precomputed per-row L2 norms are joined back onto |pairs| rows only —
    wide payloads never ride through the self-join (see dedup.py for the
    measured cost of getting that wrong). Cosine keeps the bit-exact
    dot/(na*nb) fold, so the DuckDB oracle replays the full pipeline.
    """
    from itertools import combinations

    from opc2mongodb_spark.functions.vectors import l2_norm

    n_bits = len(anchor_ids)
    buckets = bucketize_lsh(embeddings, anchor_ids, id_col, vec_col)
    base = embeddings.select(F.col(id_col), F.col(block_col)).join(
        buckets, id_col
    )
    probe_cols = [F.col("bucket")]
    for r in range(1, probe_radius + 1):
        for pos_set in combinations(range(1, n_bits + 1), r):
            p = F.col("bucket")
            for pos in pos_set:
                p = _flip_bit(p, pos, n_bits)
            probe_cols.append(p)
    probes = F.array(*probe_cols)
    left = base.select(
        F.col(id_col).alias("a_id"),
        F.col(block_col).alias("_blk"),
        F.explode(probes).alias("_probe"),
    )
    right = base.select(
        F.col(id_col).alias("b_id"),
        F.col(block_col).alias("_rblk"),
        F.col("bucket").alias("_rbucket"),
    )
    cand = left.join(
        right,
        (F.col("_blk") == F.col("_rblk"))
        & (F.col("_probe") == F.col("_rbucket"))
        & (F.col("a_id") < F.col("b_id")),
    ).select("a_id", "b_id")

    e = embeddings.select(
        F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("_n")
    )
    ea = e.select(
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("_va"),
        F.col("_n").alias("_na"),
    )
    eb = e.select(
        F.col(id_col).alias("b_id"),
        F.col(vec_col).alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    cos = dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    return (
        cand.join(ea, "a_id")
        .join(eb, "b_id")
        .select("a_id", "b_id", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def _flip_bit(bucket: F.Column, pos: int, n_bits: int) -> F.Column:
    flipped = F.when(F.substring(bucket, pos, 1) == "1", "0").otherwise("1")
    parts = []
    if pos > 1:
        parts.append(F.substring(bucket, 1, pos - 1))
    parts.append(flipped)
    if pos < n_bits:
        parts.append(F.substring(bucket, pos + 1, n_bits - pos))
    return F.concat(*parts)


def ann_multiprobe_topk(
    embeddings: DataFrame,
    query_id: int,
    anchor_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe LSH: search the query's bucket plus every bucket at
    hamming distance 1 — the standard recall fix for sign-projection LSH
    without adding tables. Probe set is built as Column expressions from the
    query bucket (no collect); candidates = n_bits+1 hash-bucket lookups."""
    n_bits = len(anchor_ids)
    buckets = bucketize_lsh(embeddings, anchor_ids, id_col, vec_col)
    with_bucket = embeddings.join(buckets, id_col)
    qrow = with_bucket.filter(F.col(id_col) == query_id).select(
        F.col("bucket").alias("_qb"), F.col(vec_col).alias("_qv")
    )
    probes = F.array(
        F.col("_qb"), *[_flip_bit(F.col("_qb"), p, n_bits) for p in range(1, n_bits + 1)]
    )
    qprobes = F.broadcast(qrow.select(probes.alias("_probes"), F.col("_qv")))
    return (
        with_bucket.filter(F.col(id_col) != query_id)
        .crossJoin(qprobes)
        .filter(F.array_contains(F.col("_probes"), F.col("bucket")))
        .select(
            F.col(id_col),
            F.col("bucket"),
            cosine(F.col(vec_col), F.col("_qv")).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def ann_recall_audit(
    embeddings: DataFrame,
    query_ids: list[int],
    anchor_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of the sign-LSH index against exact brute force, per query —
    the audit that tells you whether the bucket layout (anchor count) is
    adequate BEFORE trusting the ANN path on a corpus. Returns
    (query_id, n_hits, recall_at_k).

    Cost model (by design): the exact side is |queries| x |corpus| — run it
    on a SAMPLED query set (the point of an audit), never the full corpus.
    Queries broadcast; the LSH side reuses the same one-map bucketize; both
    rankings break cosine ties on the vector id so the top-k sets are
    deterministic cross-engine (the fold-based cosine is bit-identical).
    """
    from pyspark.sql import Window

    e = embeddings.select(F.col(id_col), F.col(vec_col))
    buckets = bucketize_lsh(embeddings, anchor_ids, id_col, vec_col)
    qs = F.broadcast(
        e.join(buckets, id_col)
        .filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("_qid"),
            F.col(vec_col).alias("_qv"),
            F.col("bucket").alias("_qb"),
        )
    )
    rk_w = Window.partitionBy("_qid").orderBy(
        F.desc("_cos"), F.asc(id_col)
    )

    def topk(df):
        return (
            df.withColumn("_rk", F.row_number().over(rk_w))
            .filter(F.col("_rk") <= k)
            .select("_qid", id_col)
        )

    exact = topk(
        e.crossJoin(qs)
        .filter(F.col(id_col) != F.col("_qid"))
        .select(
            "_qid", id_col, cosine(F.col(vec_col), F.col("_qv")).alias("_cos")
        )
    )
    lsh = topk(
        e.join(buckets, id_col)
        .join(qs, F.col("bucket") == F.col("_qb"))
        .filter(F.col(id_col) != F.col("_qid"))
        .select(
            "_qid", id_col, cosine(F.col(vec_col), F.col("_qv")).alias("_cos")
        )
    )
    hits = exact.join(lsh, ["_qid", id_col]).groupBy("_qid").agg(
        F.count(F.lit(1)).alias("_nh")
    )
    return (
        qs.select("_qid")
        .join(hits, "_qid", "left")
        .select(
            F.col("_qid").alias("query_id"),
            F.coalesce(F.col("_nh"), F.lit(0)).cast("long").alias("n_hits"),
            (
                F.coalesce(F.col("_nh"), F.lit(0)).cast("double")
                / F.lit(float(k))
            ).alias("recall_at_k"),
        )
    )


def ivf_recall_audit(
    embeddings: DataFrame,
    query_ids: list[int],
    centroid_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of the IVF (nearest-centroid, nprobe=1) index against exact
    brute force, per sampled query — the IVF twin of
    :func:`ann_recall_audit`, so both ANN paths carry the same
    index-quality instrumentation. Low recall here says to raise nprobe
    (probe neighboring cells) or refine the coarse quantizer, BEFORE the
    index is trusted on a corpus.

    Same cost contract: the exact side is |queries| x |corpus| by design
    (sampled audit); the IVF side touches only the query's own cell.
    Centroids and queries broadcast; both rankings break cosine ties on
    the vector id, and the fold-based cosine is bit-identical cross-engine,
    so the hit counts are exact.
    """
    from pyspark.sql import Window

    from opc2mongodb_spark.operators.kmeans import assign_cells

    e = embeddings.select(F.col(id_col), F.col(vec_col))
    cents = embeddings.filter(F.col(id_col).isin(centroid_ids)).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
    )
    assign = assign_cells(embeddings, cents, id_col, vec_col)
    qs = F.broadcast(
        e.join(assign, id_col)
        .filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("_qid"),
            F.col(vec_col).alias("_qv"),
            F.col("cell").alias("_qc"),
        )
    )
    rk_w = Window.partitionBy("_qid").orderBy(F.desc("_cos"), F.asc(id_col))

    def topk(df):
        return (
            df.withColumn("_rk", F.row_number().over(rk_w))
            .filter(F.col("_rk") <= k)
            .select("_qid", id_col)
        )

    exact = topk(
        e.crossJoin(qs)
        .filter(F.col(id_col) != F.col("_qid"))
        .select(
            "_qid", id_col, cosine(F.col(vec_col), F.col("_qv")).alias("_cos")
        )
    )
    ivf = topk(
        e.join(assign, id_col)
        .join(qs, F.col("cell") == F.col("_qc"))
        .filter(F.col(id_col) != F.col("_qid"))
        .select(
            "_qid", id_col, cosine(F.col(vec_col), F.col("_qv")).alias("_cos")
        )
    )
    hits = ivf.join(exact, ["_qid", id_col]).groupBy("_qid").agg(
        F.count(F.lit(1)).alias("_nh")
    )
    return (
        qs.select("_qid")
        .join(hits, "_qid", "left")
        .select(
            F.col("_qid").alias("query_id"),
            F.coalesce(F.col("_nh"), F.lit(0)).cast("long").alias("n_hits"),
            (
                F.coalesce(F.col("_nh"), F.lit(0)).cast("double")
                / F.lit(float(k))
            ).alias("recall_at_k"),
        )
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    score_col: str = "rel",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy Maximal Marginal Relevance re-ranking per query — the
    retrieval-diversity pass layered over a top-k candidate set
    (Carbonell & Goldstein 1998): repeatedly pick the candidate
    maximizing ``lam * rel - (1 - lam) * max_cos_sim_to_already_picked``
    so near-duplicate hits stop crowding the result list.

    ``candidates`` is the OUTPUT of a top-k retrieval (``cosine_topk`` /
    ``ann_lsh_topk`` / BM25): a few dozen rows per ``query_col`` group,
    carrying the relevance score and the embedding. The greedy recursion
    is inherently sequential with cross-candidate interaction — not
    expressible in Column algebra — so this is a legitimate
    ``applyInPandas`` escalation (the repo's I2 rule): per-group work is
    O(k * n * d) on a candidate frame BOUNDED by the upstream k (never
    data-sized), Arrow-batched, no state. Determinism: ties on the MMR
    objective break toward the smallest ``id_col``, and every float op is
    a SEQUENTIAL index-order accumulation in float64 — the exact op
    sequence of the JVM ``functions.vectors.dot`` fold and DuckDB's
    ``list_dot_product`` (sim = dot(a,b)/(norm_a*norm_b), max via a `>`
    compare), so q_mmr_rerank's unrolled-greedy SQL oracle matches
    BITWISE, not approximately. numpy matrix products are deliberately
    NOT used here: their pairwise/BLAS accumulation order diverges by
    ulps, which a greedy ARGMAX amplifies into different picks. At 100 TB
    the candidate generation is the distributed cost; this pass touches
    |queries| * n rows total and parallelizes per query group.

    Output: (``query_col``, ``id_col``, mmr_rank, mmr_score) — the key
    columns keep their input NAMES AND TYPES (string ids work; the
    output schema is derived from the input schema, not hardcoded)."""
    import pandas as pd
    from pyspark.sql import types as T

    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam!r}")

    out_schema = T.StructType(
        [
            T.StructField(query_col, candidates.schema[query_col].dataType),
            T.StructField(id_col, candidates.schema[id_col].dataType),
            T.StructField("mmr_rank", T.IntegerType()),
            T.StructField("mmr_score", T.DoubleType()),
        ]
    )

    def _sdot(u: list, w: list) -> float:  # pragma: worker
        acc = 0.0
        for x, y in zip(u, w):
            acc += x * y
        return acc

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:  # pragma: worker
        import math

        qid = pdf[query_col].iloc[0]
        pdf = pdf.sort_values(id_col, kind="stable", ignore_index=True)
        # float(x) widens float32 exactly; all arithmetic below is plain
        # Python float64 in index order (see determinism note above)
        vecs = [[float(x) for x in v] for v in pdf[vec_col]]
        norms = [math.sqrt(_sdot(v, v)) for v in vecs]
        rel = [float(r) for r in pdf[score_col]]
        ids = list(pdf[id_col])
        n = len(pdf)
        picked: list[int] = []
        scores: list[float] = []
        max_sim = [0.0] * n  # max cos sim of each candidate to picked set
        remaining = [True] * n
        for _ in range(min(k, n)):
            best, best_key = None, None
            for i in range(n):
                if not remaining[i]:
                    continue
                obj = lam * rel[i] - (1.0 - lam) * max_sim[i]
                key = (-obj, ids[i])
                if best_key is None or key < best_key:
                    best, best_key = i, key
            picked.append(best)
            scores.append(lam * rel[best] - (1.0 - lam) * max_sim[best])
            remaining[best] = False
            nb = norms[best]
            for i in range(n):
                if not remaining[i]:
                    continue
                if nb == 0.0 or norms[i] == 0.0:
                    s = 0.0  # zero vectors: sim 0 to everything
                else:
                    s = _sdot(vecs[i], vecs[best]) / (norms[i] * nb)
                if s > max_sim[i]:
                    max_sim[i] = s
        return pd.DataFrame(
            {
                query_col: [qid] * len(picked),
                id_col: [ids[i] for i in picked],
                "mmr_rank": list(range(1, len(picked) + 1)),
                "mmr_score": scores,
            }
        )

    return candidates.select(query_col, id_col, score_col, vec_col).groupBy(
        query_col
    ).applyInPandas(_mmr, schema=out_schema)
