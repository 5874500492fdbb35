"""Similarity search over embedding columns (SURVEY §2.9 X4-X5 +
north-star ANN / near-dup).

The `embeddings` fixture carries `array<float>` vectors (the stand-in
for the reference's only array column, `instructions.accounts TEXT[]`,
``migrations/20251023000003_create_instructions.sql:18``). Cosine
similarity is a fold over `zip_with` products — built-in higher-order
functions, JVM-side, deterministic left-to-right summation (matches
DuckDB's sequential list loop bit-for-bit in double precision).

Scale posture:
- brute-force top-k to ONE query vector is a map + TakeOrderedAndProject
  — embarrassingly parallel, no shuffle; fine at any scale.
- all-pairs near-dup is O(n²) — `q_embed_near_dup` blocks by
  (`label` × trained √N k-means cell), so verified-candidate work
  totals N^1.5 with recall certified by `q_embed_near_dup_recall`;
  `q_ann_lsh` buckets by deterministic hyperplane signs (LSH) so
  candidate generation is a bucket-equijoin, the 100 TB-safe path.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import parallelize, table
from ..scratch import scratch_dir
from ..storage import ITER_STORAGE, iter_checkpoint


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + left-fold — double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def q_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 to the vec_id=0 query vector (X4).

    The single query vector is collected driver-side (one row — the
    legitimate collect) and inlined as a literal so the scan side needs
    no join at all. Scale: map + top-k merge, no shuffle."""
    em = table(spark, sf_dir, "embeddings")
    qvec = em.where(F.col("vec_id") == 0).select("embedding").head()[0]
    qlit = F.lit([float(x) for x in qvec])  # ONE array literal: 64 CreateArray children would each be a codegen node (~0.5s extra Janino compile per query shape)
    return (
        em.select(
            "vec_id",
            (F.round(cosine(F.col("embedding"), qlit), 4) + 0.0).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(10)
    )


def unit(a: Column) -> Column:
    """L2-normalize into array<double> — computed ONCE per vector so
    pairwise cosine degrades to a single dot-product fold."""
    n = norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


EMBED_BLOCK_SALTS = 4  # S: a hot label cell splits into S(S+1)/2 block tasks


def q_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (north star): pairs (a<b)
    with cosine > 0.99, blocked by (label × trained √N k-means cell).

    This is the SemDeDup-style scale path (Abbas et al. '23), not an
    exact all-pairs scan: candidate pairs must agree on BOTH the
    `label` coarse cell and the corpus-trained fine cluster from the
    shared √N Lloyd trajectory (`_semdedup_final`, materialized once
    per build and reused by q_semdedup / q_knn_join). With K = ⌊√N⌋
    clusters, expected block size is √N and the verified-candidate
    work totals N^1.5 — bounded at any corpus size, vs the Σ n_label²
    quadratic of the exact within-label baseline this entry replaced
    after the sf1 proof run measured ~N²/L growth (r4 VERDICT item 2;
    there is no sound sub-quadratic blocking for EXACT ε-similarity
    in high dimension — concentration of measure replicates each
    vector to ~60% of metric cells — so the exact form survives only
    as the bounded-panel truth inside q_embed_near_dup_recall).

    The blocking is deterministic (fixed init, fixed iterations,
    round-6 centroids) and the oracle replays the identical Lloyd
    trajectory in unrolled SQL CTEs, so both engines emit the same
    pair set; recall against the exact definition is measured by
    q_embed_near_dup_recall on a bounded audit panel.

    Hot-cell salting (the r1 VERDICT scale gap): each vector gets a
    deterministic salt s = vec_id % S and the self-join becomes a
    triangle-block join on (lo, hi) block keys, so a hot cell of n
    vectors becomes S(S+1)/2 independent tasks of ~(n/S)² work
    instead of one n² task (see triangle_pairs)."""
    sem = _semdedup_final(spark, sf_dir)
    em = sem.select(
        "vec_id", "label", "cluster", unit(F.col("x")).alias("u")
    )
    return triangle_pairs(em, ["label", "cluster"]).where(F.col("cos_sim") > 0.99)


NEAR_DUP_PANEL = 200  # audit-panel bound: recall truth stays ≤ panel² pairs
NEAR_DUP_AUDIT_TOP = 50  # tail audit: the top-K closest real pairs
NEAR_DUP_PERT = 0.005  # planted-twin perturbation scale (cos > 0.9999)


def _sqdist_fold(X: "np.ndarray", C: "np.ndarray") -> "np.ndarray":
    """Squared-L2 distances (n, k) via the exact left-to-right
    Σᵢ(xᵢ−cᵢ)² accumulation — each step one IEEE add in index order,
    bit-identical to the oracle's ``list_sum(list_transform(...))``
    fold and to _ivf_probes' sequential Python sum (ADVICE r5: the
    algebraically expanded −2X·Cᵀ+|C|² gemm can rank NEAR-TIED
    centroids differently in floating point, flipping an assignment
    in one engine only — 'caught'/cluster comparisons carry no
    rounding slack). Cost is the same flop count as the gemm, DIM
    vectorized passes instead of one BLAS call — still Arrow-batch
    vectorized, never per-row."""
    acc = np.zeros((X.shape[0], C.shape[0]), dtype=np.float64)
    for i in range(X.shape[1]):
        d = X[:, i, None] - C[None, :, i]
        acc += d * d
    return acc


def _argmin_sqdist(X: "np.ndarray", C: "np.ndarray") -> "np.ndarray":
    """Nearest-centroid index with the EXACT-FOLD outcome at gemm
    speed (the r6 all-rows fold was DIM memory-bandwidth passes per
    batch — 3× the sf10 wall on the √N-centroid assignment): rank
    every row with the expanded −2X·Cᵀ+|C|² gemm, then re-rank ONLY
    the rows whose top-2 margin is within a rigorous error bound of
    the expanded form via :func:`_sqdist_fold`. The expanded form's
    deviation from the exact fold is ≲ DIM·ε·(|x|²+|c|²) ≈ 1.4e-14 of
    the operand scale; the 1e-10-of-scale margin gate is ~10⁴× that,
    so any row it passes has the same argmin under both forms, and
    the flagged rows (exact ties included) get the oracle-identical
    fold ranking outright. (The gate must stay well below typical
    top-2 margins too: with K ≈ √N near-equidistant centroids the
    nearest-two margin is often ~1e-5 of scale — a 1e-6 gate flagged
    a large fraction of rows and gave back most of the gemm saving.)
    Ties → lowest index, identical in both paths (np.argmin picks
    first)."""
    c_sq = (C * C).sum(axis=1)
    G = -2.0 * (X @ C.T) + c_sq[None, :]
    a = np.argmin(G, axis=1)
    if C.shape[0] > 1:
        # second-smallest via mask-and-restore (no O(n·k) partition
        # copy — this path shadows every assignment at 100 TB)
        rows = np.arange(X.shape[0])
        m1 = G[rows, a].copy()
        G[rows, a] = np.inf
        m2 = G.min(axis=1)
        G[rows, a] = m1
        scale = (X * X).sum(axis=1) + c_sq.max() + 1.0
        risky = (m2 - m1) <= 1e-10 * scale
        if risky.any():
            a[risky] = np.argmin(_sqdist_fold(X[risky], C), axis=1)
    return a


def q_embed_near_dup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall sign-off for q_embed_near_dup's cluster blocking (the
    same contract as the LSH and ANN sign-offs), two audits over a
    bounded panel (vec_id < NEAR_DUP_PANEL — constant cost at any
    corpus size):

    1. PLANTED twins: each panel vector gets a deterministic
       multiplicative perturbation x·(1 + δ·hash-noise) — a genuine
       near-duplicate (min_planted_cos certifies cosine > 0.99 inside
       the result) — and we measure whether the twin's trained-cell
       assignment equals the original's, i.e. whether the production
       blocking would compare the pair. This is the recall that
       matters: of real near-dups, what fraction does the blocking
       catch.
    2. TAIL audit: the NEAR_DUP_AUDIT_TOP closest real within-label
       pairs (the corpus plants nothing above ~0.46 cosine, so a
       thresholded truth set would be vacuous at every sf) and the
       fraction sharing a cell — a conservative floor, since blocking
       recall rises with similarity.

    Deterministic on both engines: the noise is the shared integer
    hash ((vec_id·64+i)·2654435761 mod 1000003 − 501501)/501501, the
    twin assignment replays the trained Lloyd centroids (oracle =
    same unrolled CTEs + cross-join argmin), pair ranking ties break
    on (vec_a, vec_b)."""
    from pyspark.sql import types as T

    sem = _semdedup_final(spark, sf_dir)
    cents = _lloyd_cents(spark, sf_dir, "_sem")
    ids = np.array([c for c, _ in cents])
    C = np.array([cx for _, cx in cents], dtype=np.float64)

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("pc", T.IntegerType()),
                T.StructField("pcos", T.DoubleType()),
            ]
        )
    )
    def twin_of(vid: pd.Series, xs: pd.Series) -> pd.DataFrame:
        X = np.stack(xs.to_numpy()).astype(np.float64)
        V = vid.to_numpy().astype(np.int64)[:, None]
        i = np.arange(DIM, dtype=np.int64)[None, :]
        noise = ((((V * DIM + i) * 2654435761) % 1000003) - 501501) / 501501.0
        P = X * (1.0 + NEAR_DUP_PERT * noise)
        pc_idx = _argmin_sqdist(P, C)
        cos = (X * P).sum(axis=1) / (
            np.sqrt((X * X).sum(axis=1)) * np.sqrt((P * P).sum(axis=1))
        )
        return pd.DataFrame(
            {"pc": ids[pc_idx].astype(np.int32), "pcos": cos}
        )

    panel = sem.where(F.col("vec_id") < NEAR_DUP_PANEL).select(
        "vec_id", "label", "cluster", "x", unit(F.col("x")).alias("u")
    )
    planted = (
        panel.select(
            "cluster", twin_of(F.col("vec_id"), F.col("x")).alias("t")
        )
        .select(
            (F.col("t.pc") == F.col("cluster")).cast("int").alias("caught"),
            F.col("t.pcos").alias("pcos"),
        )
        .agg(
            F.count("*").alias("n_planted"),
            F.coalesce(F.sum("caught"), F.lit(0))
            .cast("long")
            .alias("caught_planted"),
            F.round(F.min("pcos"), 2).alias("min_planted_cos"),
        )
    )
    a = panel.select(
        F.col("vec_id").alias("va"),
        F.col("label").alias("la"),
        F.col("cluster").alias("ca"),
        F.col("u").alias("ua"),
    )
    b = panel.select(
        F.col("vec_id").alias("vb"),
        F.col("label").alias("lb"),
        F.col("cluster").alias("cb"),
        F.col("u").alias("ub"),
    )
    top = (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("va") < F.col("vb")))
        .select(
            F.round(dot(F.col("ua"), F.col("ub")), 4).alias("cos_sim"),
            (F.col("ca") == F.col("cb")).cast("int").alias("caught"),
            "va",
            "vb",
        )
        .orderBy(F.col("cos_sim").desc(), F.col("va").asc(), F.col("vb").asc())
        .limit(NEAR_DUP_AUDIT_TOP)
    )
    tail = top.agg(
        F.count("*").alias("n_tail"),
        F.coalesce(F.sum("caught"), F.lit(0)).cast("long").alias("caught_tail"),
    )
    return planted.crossJoin(tail).select(
        "n_planted",
        "caught_planted",
        (
            F.coalesce(
                F.round(
                    F.try_divide(F.col("caught_planted"), F.col("n_planted")), 4
                ),
                F.lit(1.0),
            )
            + 0.0
        ).alias("recall_planted"),
        (F.col("min_planted_cos") + 0.0).alias("min_planted_cos"),
        "n_tail",
        "caught_tail",
        (
            F.coalesce(
                F.round(F.try_divide(F.col("caught_tail"), F.col("n_tail")), 4),
                F.lit(1.0),
            )
            + 0.0
        ).alias("recall_tail"),
    )


def triangle_pairs(em: DataFrame, block: str | list[str]) -> DataFrame:
    """All unordered same-block pairs with rounded cosine, via the
    salted triangle-block join (see q_embed_near_dup's docstring for
    the derivation): each row replicates to its (lo, hi) salt blocks
    so a hot block becomes S(S+1)/2 bounded tasks instead of one n²
    task. ``em`` must carry (vec_id, <block cols>, u) with u already
    unit-normalized; emits (vec_a < vec_b, cos_sim rounded to 4).
    ``block`` may be one column name or a list (composite block)."""
    blocks = [block] if isinstance(block, str) else list(block)
    s_n = EMBED_BLOCK_SALTS
    em = em.withColumn("salt", F.pmod(F.col("vec_id"), F.lit(s_n)).cast("int"))
    left = em.select(
        F.col("vec_id").alias("vec_a"),
        *blocks,
        F.col("u").alias("ua"),
        F.col("salt").alias("lo"),
        F.explode(F.sequence(F.col("salt"), F.lit(s_n - 1))).alias("hi"),
    )
    right = em.select(
        F.col("vec_id").alias("vec_b"),
        *blocks,
        F.col("u").alias("ub"),
        F.explode(F.sequence(F.lit(0), F.col("salt"))).alias("lo"),
        F.col("salt").alias("hi"),
    )
    pairs = left.join(right, blocks + ["lo", "hi"]).where(
        (F.col("lo") != F.col("hi")) | (F.col("vec_a") < F.col("vec_b"))
    )
    return pairs.select(
        F.least("vec_a", "vec_b").alias("vec_a"),
        F.greatest("vec_a", "vec_b").alias("vec_b"),
        F.round(dot(F.col("ua"), F.col("ub")), 4).alias("cos_sim"),
    )


# --- ANN: random-hyperplane LSH ------------------------------------------
# Deterministic integer hyperplane coefficients shared with the oracle:
# c[j][i] = ((j*64 + i) * 2654435761) % 1000003 - 501501
N_PLANES = 4
DIM = 64


def _plane(j: int) -> list[int]:
    return [((j * DIM + i) * 2654435761) % 1000003 - 501501 for i in range(DIM)]


HYPERPLANES = [_plane(j) for j in range(N_PLANES)]


def lsh_bucket(emb: Column) -> Column:
    """Sign-bit bucket id in [0, 2^N_PLANES): bit j = (emb · c_j) >= 0."""
    bucket = None
    for j, coefs in enumerate(HYPERPLANES):
        proj = F.aggregate(
            F.zip_with(
                emb,
                F.lit([float(c) for c in coefs]),
                lambda x, c: x.cast("double") * c,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        term = F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return bucket.cast("long")


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 to the vec_id=0 query via random-hyperplane LSH with
    MULTI-PROBE: 4 sign bits → 16 buckets; probe the query's bucket
    plus every bucket at Hamming distance 1 (a near neighbor that
    disagrees on one hyperplane lands one bit-flip away), rank by
    exact cosine within the probed candidates.

    Multi-probe lifts per-neighbor collision probability from
    p^4 ≈ 0.55 to p^4 + 4p^3(1-p) ≈ 0.90 at these cosine distances
    (p = 1 - θ/π per plane) while still touching 5/16 of the space.

    Scale: bucketing is map-side; the probe set is a 5-literal IN
    filter (pushable, no join); at 100 TB the bucket id becomes the
    table's partition key so a query touches `1 + n_planes`
    partitions — partition pruning does the index lookup."""
    em = table(spark, sf_dir, "embeddings")
    with_b = em.select(
        "vec_id", "embedding", lsh_bucket(F.col("embedding")).alias("bucket")
    )
    qrow = with_b.where(F.col("vec_id") == 0).select("embedding", "bucket").head()
    qlit = F.lit([float(x) for x in qrow[0]])
    qb = int(qrow[1])
    probes = [qb] + [qb ^ (1 << j) for j in range(N_PLANES)]
    return (
        with_b.where(F.col("bucket").isin(probes) & (F.col("vec_id") != 0))
        .select(
            "vec_id",
            (F.round(cosine(F.col("embedding"), qlit), 4) + 0.0).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(5)
    )


# --- ANN: IVF coarse quantizer --------------------------------------------
N_CENTROIDS = 8  # IVF cell count (Lloyd-trained on a hash-spread sample)
N_PROBE = 2


def _ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained IVF assignment table (vec_id, label, x, cluster) —
    K = N_CENTROIDS Lloyd-trained cells, materialized per build and
    shared by q_ann_ivf / q_ann_ivf_indexed / q_ann_recall."""
    return _lloyd_final(spark, sf_dir, N_CENTROIDS, "_ivf")


def _ivf_probes(qvec: list[float], cents: list[tuple[int, list[float]]], n_probe: int) -> list[int]:
    """The query's n_probe nearest trained cells by squared L2 —
    sequential left-to-right summation in Python doubles, the same
    IEEE op order as the oracle's list_sum fold over (p₁−p₂)², so the
    probe ranking is engine-identical; ties break toward lower cid
    (cents are cid-sorted, sort is stable on the distance key)."""
    dists = [
        (sum((float(q) - float(c)) * (float(q) - float(c)) for q, c in zip(qvec, cx)), cid)
        for cid, cx in cents
    ]
    return [cid for _, cid in sorted(dists)[:n_probe]]


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via an IVF-Flat index (the other scale path next to
    LSH): K = N_CENTROIDS Lloyd-TRAINED centroids (3 iterations,
    first-K init — r4 VERDICT item 3: first-K vectors as centroids
    gave unbalanced cells, i.e. straggler tasks at scale; trained
    centroids balance cell sizes) define coarse cells; every vector
    is assigned to its argmin-L2 cell map-side (the standard IVF-Flat
    assignment); the query probes its ``N_PROBE`` nearest cells and
    ranks by exact cosine only within those cells' members.

    Spark shape: training is the shared _lloyd_final trajectory
    (Arrow-batched gemm assignment, (K·DIM)-row centroid update,
    bounded driver collect), materialized once per build; this query
    then SCANS the assignment table with a literal `cluster IN
    (probes)` filter — no join, no shuffle, scan → filter → top-k
    (plan-gated). At 100 TB: same table written partitioned BY cell
    (q_ann_ivf_indexed) so the probe is partition pruning. The oracle
    replays the identical Lloyd trajectory via unrolled CTEs; ties
    break toward the lower cell id in both engines."""
    assign = _ivf_assign(spark, sf_dir)
    cents = _lloyd_cents(spark, sf_dir, "_ivf")
    qvec = [float(v) for v in assign.where(F.col("vec_id") == 0).select("x").head()[0]]
    probe_cells = _ivf_probes(qvec, cents, N_PROBE)
    qlit = F.lit(qvec)  # ONE array literal: 64 CreateArray children would each be a codegen node (~0.5s extra Janino compile per query shape)
    return (
        assign.where(
            F.col("cluster").isin(probe_cells) & (F.col("vec_id") != 0)
        )
        .select(
            "vec_id",
            (F.round(cosine(F.col("x"), qlit), 4) + 0.0).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(5)
    )


_COS = (
    "list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"
    " / (sqrt(list_sum(list_transform({a}, x -> x * x)))"
    " * sqrt(list_sum(list_transform({b}, x -> x * x))))"
)

# _IVF_SQL / _KNN_JOIN_SQL / _NEAR_DUP_SQL are defined after
# _kmeans_ctes (they replay the trained Lloyd trajectory).


def q_ann_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF index MATERIALIZED: q_ann_ivf's docstring promises "at
    100 TB, write the table partitioned BY cell and a query reads only
    N_PROBE partitions" — this entry does exactly that. Vectors are
    assigned to cells (same gemm-in-pandas-UDF as q_ann_ivf), written
    hive-partitioned by cell under the repo warehouse, and the probe
    reads back with `cell IN (probes)` — which lands as directory-level
    PartitionFilters (plan-gated in tests/test_plans.py): the index
    lookup IS partition pruning, no filter evaluation per row, files of
    non-probed cells never open. Cells come from the same trained
    Lloyd trajectory as q_ann_ivf; ranking within candidates is the
    same exact-cosine fold, so the result set equals q_ann_ivf's and
    shares its oracle."""
    import os

    assign = _ivf_assign(spark, sf_dir)
    cents = _lloyd_cents(spark, sf_dir, "_ivf")
    path = scratch_dir(spark, "storage", "ivf_index")
    (
        assign.select("vec_id", "x", F.col("cluster").alias("cell"))
        .repartition("cell")
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(path)
    )

    qvec = [float(v) for v in assign.where(F.col("vec_id") == 0).select("x").head()[0]]
    probe_cells = _ivf_probes(qvec, cents, N_PROBE)
    qlit = F.lit(qvec)

    index = spark.read.parquet(path)
    return (
        index.where(F.col("cell").isin(probe_cells) & (F.col("vec_id") != 0))
        .select(
            "vec_id",
            (F.round(cosine(F.col("x"), qlit), 4) + 0.0).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(5)
    )


KNN_JOIN_K = 3


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN self-join: the top-3 nearest neighbors for EVERY vector,
    searched within its IVF cell — the kNN-graph builder that feeds
    dedup clustering, label propagation, and diversity scoring (vs
    q_knn_topk's single-query lookup).

    Scale: the cell count GROWS WITH THE CORPUS — k = max(8, ⌊√N⌋) —
    so expected cell size is √N and total within-cell pair work is
    N²/k = N^1.5, not N²/8 (the fixed-k round-3 version measured 29 s
    at sf1: with k pinned, cells grow linearly and the quadratic
    returns). √N is the standard IVF sizing rule (FAISS's
    `sqrt(N)`-lists guidance); the centroid collect grows as √N too
    (~31k rows for 1e9 vectors — still a bounded dim collect).
    Candidate generation is the salted triangle-block join inside
    each coarse cell (never all-pairs across cells); the undirected
    pair stream is mirrored into directed edges and ranked per source
    with a WindowGroupLimit top-k. Recall is bounded by the cell
    assignment (neighbors straddling a cell boundary are missed — the
    standard IVF trade; probe>1 would widen it). Cells are the SHARED
    trained √N Lloyd trajectory (_semdedup_final — r4 VERDICT item 3:
    trained centroids replace the first-√N-vectors quantizer, so cell
    sizes balance and the per-cell quadratic has no straggler tail),
    same cosine fold as every similarity op."""
    cells = _semdedup_final(spark, sf_dir).select(
        "vec_id",
        F.col("cluster").alias("cell"),
        unit(F.col("x")).alias("u"),
    )
    pairs = triangle_pairs(cells, "cell")
    # Mirror each undirected pair into its two directed edges with ONE
    # explode instead of a self-union (r16, guide §2.4): the union's
    # two branches each re-executed the whole triangle join — the
    # dominant N^1.5 dot-product work ran TWICE (two BroadcastHashJoin
    # subtrees under Union in the r15 plan). Same multiset of rows,
    # one join execution.
    directed = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("vec_a").alias("vec_id"),
                    F.col("vec_b").alias("neighbor"),
                ),
                F.struct(
                    F.col("vec_b").alias("vec_id"),
                    F.col("vec_a").alias("neighbor"),
                ),
            )
        ).alias("e"),
        "cos_sim",
    ).select("e.vec_id", "e.neighbor", "cos_sim")
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor").asc()
    )
    return (
        directed.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= KNN_JOIN_K)
        .select("vec_id", "rk", "neighbor", (F.col("cos_sim") + 0.0).alias("cos_sim"))
    )


def _plane_sql(j: int) -> str:
    coefs = ", ".join(f"{c}.0" for c in HYPERPLANES[j])
    return (
        f"(CASE WHEN list_sum(list_transform(list_zip(CAST(embedding AS DOUBLE[]), "
        f"[{coefs}]), p -> p[1] * p[2])) >= 0 THEN {1 << j} ELSE 0 END)"
    )


_ANN_SQL = f"""
WITH wb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         CAST({" + ".join(_plane_sql(j) for j in range(N_PLANES))} AS BIGINT) AS bucket
  FROM embeddings
), q AS (SELECT e AS qe, bucket AS qb FROM wb WHERE vec_id = 0)
SELECT vec_id,
       round(
         list_sum(list_transform(list_zip(e, qe), p -> p[1] * p[2]))
         / (sqrt(list_sum(list_transform(e, x -> x * x)))
            * sqrt(list_sum(list_transform(qe, x -> x * x)))),
         4) + 0.0 AS cos_sim
FROM wb, q
WHERE (bucket = qb OR {" OR ".join(f"bucket = xor(qb, {1 << j})" for j in range(N_PLANES))})
  AND vec_id <> 0
ORDER BY cos_sim DESC, vec_id ASC LIMIT 5
"""

def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 vector quantization — the storage/serving
    compression step of an embedding pipeline (4x smaller than
    float32, 8x smaller than the double working form).

    Per vector: scale = max|x| / 127; q_i = clamp(⌊x_i/scale + 0.5⌋,
    −127, 127). The half-rounding is spelled as floor(+0.5) on BOTH
    engines (their native round() functions disagree on tie-breaking),
    so the quantized codes are bit-identical and the oracle can pin
    the integer checksum exactly. `within_bound` asserts the
    reconstruction error |x − q·scale| ≤ scale/2 for every component —
    the defining property of correct symmetric quantization. Zero
    shuffle, pure map-side array expressions."""
    em = parallelize(table(spark, sf_dir, "embeddings"), spark)
    xs = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    # let-bind through a 1-element transform: HOFs get no codegen CSE
    def body(v: Column) -> Column:
        # greatest(..) guards the all-zero vector (scale 0 → div/0)
        scale = F.greatest(
            F.array_max(F.transform(v, F.abs)) / 127.0, F.lit(1e-12)
        )
        q = F.transform(
            v,
            lambda x: F.least(
                F.greatest(F.floor(x / scale + 0.5), F.lit(-127.0)),
                F.lit(127.0),
            ).cast("long"),
        )
        err_ok = F.forall(
            F.zip_with(
                v, q, lambda x, qq: F.abs(x - qq.cast("double") * scale)
                <= scale * 0.5000001
            ),
            lambda b: b,
        )
        return F.struct(
            F.round(scale + 1e-9, 6).alias("scale"),
            F.aggregate(
                q, F.lit(0).cast("long"), lambda acc, x: acc + x
            ).alias("checksum"),
            err_ok.alias("within_bound"),
        )

    out = F.get(F.transform(F.array(xs), body), 0)
    return em.select("vec_id", out.alias("_q")).select(
        "vec_id",
        F.col("_q.scale").alias("scale"),
        F.col("_q.checksum").alias("checksum"),
        F.col("_q.within_bound").alias("within_bound"),
    )


def q_embed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style keep-set: drop every vector that near-duplicates
    (cosine > 0.99, blocked by label × trained √N cluster) a lower-id
    vector; return the survivors. The greedy keep-lowest-id rule is
    deterministic and needs no transitive closure — a vector is
    dropped iff it appears as the higher id of ANY near-dup pair.

    Scale: the pair stage is q_embed_near_dup's N^1.5 blocked
    candidate set; the keep step is a LEFT ANTI join of the
    vector table against the reduced drop list — the embedding
    payload crosses the anti join as keys only."""
    pairs = q_embed_near_dup(spark, sf_dir)
    drop = pairs.select(F.col("vec_b").alias("vec_id")).distinct()
    em = table(spark, sf_dir, "embeddings")
    return em.join(drop, "vec_id", "left_anti").select("vec_id", "label")


# --- ANN: product quantization --------------------------------------------
# M subspaces of DIM/M dims; K codes per subspace. The codebook is the
# subvectors of the first K vectors (deterministic "trained" centroids,
# same stance as IVF's vec_id<8 cells) so the oracle can rebuild it.
PQ_M = 4
PQ_K = 8
PQ_SUB = DIM // PQ_M


def _sq_dist(a: Column, b: Column) -> Column:
    """Σ (aᵢ−bᵢ)² via zip_with + left fold — the sequential summation
    both engines share bit-for-bit (same contract as :func:`dot`)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_codebook(spark: SparkSession, sf_dir: str) -> list[list[list[float]]]:
    """codebook[m][k] = subvector m of vector k (vec_id < PQ_K),
    collected driver-side — K·DIM floats, the legitimate dim collect."""
    em = table(spark, sf_dir, "embeddings")
    rows = sorted(
        em.where(F.col("vec_id") < PQ_K).select("vec_id", "embedding").collect(),
        key=lambda r: r["vec_id"],
    )
    full = [[float(x) for x in r["embedding"]] for r in rows]
    return [
        [full[k][m * PQ_SUB : (m + 1) * PQ_SUB] for k in range(PQ_K)]
        for m in range(PQ_M)
    ]


def _pq_encoded(em: DataFrame, codebook) -> DataFrame:
    """Adds per-subspace code/distance structs: for each subspace the
    argmin over K literal centroids, ties to the lowest code (array_min
    over (dist, code) structs — lexicographic struct order). All map
    side: at 100 TB encoding is an embarrassingly parallel scan and the
    8-byte code column replaces the 256-byte vector downstream."""
    xs = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    cols = [em["vec_id"]]
    for m in range(PQ_M):
        sub = F.slice(xs, m * PQ_SUB + 1, PQ_SUB)
        best = F.array_min(
            F.array(
                *[
                    F.struct(
                        _sq_dist(sub, F.lit(codebook[m][k])).alias("d"),
                        F.lit(k).alias("c"),
                    )
                    for k in range(PQ_K)
                ]
            )
        )
        cols.append(best.alias(f"_b{m}"))
    return em.select(*cols)


def q_embed_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (north star: the vector-compression
    step between int8 quantization and IVF): each vector becomes M=4
    sub-codes from K=8-entry codebooks — 3 bits per subspace, a 170x
    compression of the 64-dim float32 vector.

    Output pins the packed integer code exactly (codes are argmin ids —
    integer-exact across engines because both compute the same
    sequential-fold distances) and the reconstruction error (sum of
    per-subspace min distances) to 4 decimals. Zero shuffle: encoding
    is pure map-side expression work."""
    em = parallelize(table(spark, sf_dir, "embeddings"), spark)
    enc = _pq_encoded(em, _pq_codebook(spark, sf_dir))
    code = None
    err = None
    for m in range(PQ_M):
        c = F.col(f"_b{m}.c").cast("long") * (PQ_K**m)
        d = F.col(f"_b{m}.d")
        code = c if code is None else code + c
        err = d if err is None else err + d
    return enc.select(
        "vec_id",
        code.alias("pq_code"),
        (F.round(err, 4) + 0.0).alias("recon_err"),
    )


def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via asymmetric distance computation (ADC) over the PQ
    codes: the query (vec_id=0) precomputes a distance table
    dtable[m][k] = ||q_m − c_{m,k}||² (M·K = 32 doubles, driver-side);
    every per-vector approximate distance is then M table lookups — no
    vector math at all on the scan side.

    Scale: this is the FAISS IVFADC search shape — the fact table
    carries only the code columns, the distance table broadcasts as
    literals, and ranking is map + TakeOrderedAndProject with no
    shuffle. Exactness is delegated to the oracle re-deriving the same
    codes and table; approx distances are deterministic because both
    engines sum the same 4 doubles in subspace order."""
    codebook = _pq_codebook(spark, sf_dir)
    em = table(spark, sf_dir, "embeddings")
    q = [float(x) for x in em.where(F.col("vec_id") == 0).head()["embedding"]]

    def seq_sq(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    dtable = [
        [seq_sq(q[m * PQ_SUB : (m + 1) * PQ_SUB], codebook[m][k]) for k in range(PQ_K)]
        for m in range(PQ_M)
    ]
    enc = _pq_encoded(parallelize(em, spark), codebook)
    approx = None
    for m in range(PQ_M):
        term = F.element_at(F.lit(dtable[m]), F.col(f"_b{m}.c") + 1)
        approx = term if approx is None else approx + term
    return (
        enc.where(F.col("vec_id") != 0)
        .select("vec_id", (F.round(approx, 4) + 0.0).alias("approx_dist"))
        .orderBy(F.col("approx_dist").asc(), F.col("vec_id").asc())
        .limit(5)
    )


_PQ_CODES_SQL = f"""
  v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
  ms AS (SELECT unnest(range({PQ_M})) AS m),
  sub AS (SELECT vec_id, m, list_slice(x, m*{PQ_SUB}+1, (m+1)*{PQ_SUB}) AS s
          FROM v CROSS JOIN ms),
  cent AS (SELECT vec_id AS code, m, s AS cs FROM sub WHERE vec_id < {PQ_K}),
  d AS (SELECT sub.vec_id, sub.m, cent.code,
               list_sum(list_transform(list_zip(sub.s, cent.cs),
                        p -> (p[1]-p[2])*(p[1]-p[2]))) AS d
        FROM sub JOIN cent ON sub.m = cent.m),
  best AS (SELECT vec_id, m, code, d,
                  row_number() OVER (PARTITION BY vec_id, m
                                     ORDER BY d ASC, code ASC) AS rn
           FROM d)
"""

_PQ_SQL = f"""
WITH {_PQ_CODES_SQL}
SELECT vec_id,
       CAST(sum(code * CAST(pow({PQ_K}, m) AS BIGINT)) AS BIGINT) AS pq_code,
       round(sum(d), 4) + 0.0 AS recon_err
FROM best WHERE rn = 1 GROUP BY vec_id
"""

_ANN_PQ_SQL = f"""
WITH {_PQ_CODES_SQL},
  qsub AS (SELECT m, s AS qs FROM sub WHERE vec_id = 0),
  dtable AS (SELECT cent.m, cent.code,
                    list_sum(list_transform(list_zip(qs, cs),
                             p -> (p[1]-p[2])*(p[1]-p[2]))) AS qd
             FROM cent JOIN qsub ON cent.m = qsub.m)
SELECT best.vec_id,
       round(sum(dtable.qd), 4) + 0.0 AS approx_dist
FROM best JOIN dtable ON best.m = dtable.m AND best.code = dtable.code
WHERE best.rn = 1 AND best.vec_id <> 0
GROUP BY best.vec_id
ORDER BY approx_dist ASC, best.vec_id ASC LIMIT 5
"""


# --- k-means clustering ---------------------------------------------------
# Lloyd's algorithm with deterministic init (centroids = vectors of
# vec_id 0..K-1) and a fixed iteration count, so a DuckDB oracle can
# unroll the exact same computation. Per-iteration centroids round to
# 6 decimals on BOTH sides — this quantization absorbs the last-ulp
# summation-order differences between Spark's hash-agg avg and
# DuckDB's, so the argmin assignments stay engine-identical.
KM_K = 4
KM_ITERS = 3


def _km_assign(em: DataFrame, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """Map-side argmin over literal (id, centroid) pairs (ties → lowest
    id): the same array_min-over-structs shape as PQ encoding. No
    shuffle. Centroids keep their original cluster ids even if some
    cluster emptied out along the way (drop-cluster rule)."""
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    _sq_dist(F.col("x"), F.lit(cx)).alias("d"),
                    F.lit(cid).alias("c"),
                )
                for cid, cx in cents
            ]
        )
    )
    return em.select("vec_id", "x", best["c"].alias("cluster"), best["d"].alias("d"))


def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means clustering of the embedding corpus (north star: semantic
    clustering for training-data mixing / SemDeDup cells): K=4,
    3 Lloyd iterations, deterministic first-K init.

    Per iteration: assignment is a map-side argmin against K broadcast
    (literal) centroids; the update is posexplode → groupBy(cluster,
    dim) avg — a (K·DIM)-row aggregate with map-side partial combine,
    then a K·DIM-double driver collect (the legitimate dim collect,
    same stance as IVF centroids). This is exactly Spark MLlib's
    KMeans dataflow shape, minus sampled init. At 100 TB: per-round
    cost is one scan + one tiny shuffle; centroids stay driver-side.
    Empty clusters keep no centroid (drop-cluster rule, mirrored in
    the oracle)."""
    final = _kmeans_final(spark, sf_dir)
    return final.select(
        "vec_id",
        "cluster",
        (F.round(F.sqrt(F.col("d")), 4) + 0.0).alias("dist"),
    )


# sf_dirs whose k-means assignment table has been materialized by THIS
# process — q_kmeans/q_cluster_mix/q_semdedup share one Lloyd
# trajectory per build instead of each re-deriving it (round-3 advice).
_KMEANS_BUILT: set[str] = set()


def _kmeans_assign_path(spark: SparkSession, sf_dir: str) -> str:
    # Session-keyed via scratch_dir (VERDICT r9 finding 1): the
    # materialize-once cache is per-process anyway (_KMEANS_BUILT), so
    # keying the path by the session's run id costs nothing within a
    # bench run and makes concurrent processes collision-free.
    import os
    import re

    tag = re.sub(r"\W+", "_", os.path.abspath(sf_dir)).strip("_")
    return scratch_dir(spark, "storage", f"kmeans_assign_{tag}")


def _kmeans_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final k-means assignment frame (vec_id, x, cluster, d), shared
    by q_kmeans, q_cluster_mix and q_semdedup.

    MATERIALIZED once per build (the q_ann_ivf_indexed pattern): the
    first caller runs the Lloyd trajectory and writes the assignment
    to a warehouse parquet table; later callers in the same process
    scan that table — their plans contain a FileScan, not the
    iterative job. At 100 TB this is how the pipeline actually runs:
    cluster once, join the assignment everywhere."""
    import os

    path = _kmeans_assign_path(spark, sf_dir)
    if path in _KMEANS_BUILT and os.path.isdir(path):
        return spark.read.parquet(path)
    final = _kmeans_lloyd(spark, sf_dir)
    final.write.mode("overwrite").parquet(path)
    _KMEANS_BUILT.add(path)
    return spark.read.parquet(path)


def _kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the Lloyd iterations and returns the final assignment
    frame (vec_id, x, cluster, d)."""
    # persisted across the iteration jobs (each assignment+update is an
    # action) — the same input caching MLlib's KMeans does; released in
    # the caller's plan once the final assignment materializes
    em = (
        parallelize(table(spark, sf_dir, "embeddings"), spark)
        .select(
            "vec_id",
            F.transform(F.col("embedding"), lambda e: e.cast("double")).alias("x"),
        )
        .persist(ITER_STORAGE)
    )
    init = sorted(
        em.where(F.col("vec_id") < KM_K).select("vec_id", "x").collect(),
        key=lambda r: r["vec_id"],
    )
    cents = [(int(r["vec_id"]), [float(v) for v in r["x"]]) for r in init]
    for _ in range(KM_ITERS):
        a = _km_assign(em, cents)
        means = (
            a.select("cluster", F.posexplode("x").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("val"), 6).alias("m"))
            .collect()
        )
        by_c: dict[int, dict[int, float]] = {}
        for r in means:
            by_c.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
        cents = [
            (c, [by_c[c][i] for i in range(DIM)]) for c in sorted(by_c)
        ]
    # materialize the final assignment, then release the cached input —
    # a returned frame must not leave CacheManager entries behind
    # (they'd accumulate across a bench session; see the dup-clusters
    # lineage test)
    final = iter_checkpoint(_km_assign(em, cents))
    em.unpersist()
    return final


RRF_K = 60
RRF_TOP = 10


def q_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: the BM25 sparse
    ranking (q_bm25's fixed 3-term query) and the dense cosine ranking
    to the vec_id=0 query vector are fused as
    RRF(d) = Σ 1/(60 + rankᵢ(d)) — the standard hybrid-search
    combiner, rank-based so the two incomparable score scales never
    mix. Docs absent from the sparse list (no query term) contribute
    only their dense term.

    Scale: each ranking is its own reduced pipeline (inverted-index
    BM25; map + top-k cosine); fusion joins RANK LISTS, not corpora —
    the dense list is the base (it covers every doc), the sparse list
    left-joins on. Ranks tie-break by id in both engines."""
    from .text import q_bm25

    sparse = q_bm25(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()))
        .alias("r_sparse"),
    )
    em = table(spark, sf_dir, "embeddings")
    qvec = em.where(F.col("vec_id") == 0).select("embedding").head()[0]
    qlit = F.lit([float(x) for x in qvec])
    dense = em.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(
            Window.orderBy(
                F.round(cosine(F.col("embedding"), qlit), 4).desc(),
                F.col("vec_id").asc(),
            )
        )
        .alias("r_dense"),
    )
    rrf = (
        F.coalesce(1.0 / (RRF_K + F.col("r_sparse")), F.lit(0.0))
        + 1.0 / (RRF_K + F.col("r_dense"))
    )
    return (
        dense.join(sparse, "doc_id", "left")
        .select(
            "doc_id",
            "r_dense",
            "r_sparse",
            (F.round(rrf + 1e-9, 6) + 0.0).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
        .limit(RRF_TOP)
    )


NDCG_AT = 10


def q_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation: NDCG@10 of the dense cosine
    ranking, with graded relevance rel(d) = 1 when d shares the query
    vector's label (the fixture's cluster label stands in for
    judgments). DCG = Σ rel/log₂(rank+1) over the top-10; the ideal
    DCG normalizes by the best attainable ordering — the metric a
    curation pipeline tracks when it tunes its retrieval leg.

    One ranked window over the reduced score column; the label lookup
    rides the same row. Deterministic: ranking on rounded cosine with
    id tie-break, log₂ on small-integer ranks."""
    em = table(spark, sf_dir, "embeddings")
    qrow = em.where(F.col("vec_id") == 0).select("embedding", "label").head()
    qlit = F.lit([float(x) for x in qrow[0]])
    qlabel = qrow[1]
    ranked = em.where(F.col("vec_id") != 0).select(
        "vec_id",
        (F.col("label") == F.lit(qlabel)).cast("int").alias("rel"),
        F.row_number()
        .over(
            Window.orderBy(
                F.round(cosine(F.col("embedding"), qlit), 4).desc(),
                F.col("vec_id").asc(),
            )
        )
        .alias("rk"),
    )
    top = ranked.where(F.col("rk") <= NDCG_AT)
    dcg = F.sum(F.col("rel") / F.log2(F.col("rk") + 1))
    ideal = ranked.select(
        "rel",
        F.row_number()
        .over(Window.orderBy(F.col("rel").desc(), F.col("vec_id").asc()))
        .alias("irk"),
    ).where(F.col("irk") <= NDCG_AT)
    idcg = ideal.agg(
        F.sum(F.col("rel") / F.log2(F.col("irk") + 1)).alias("idcg")
    )
    return (
        top.agg(dcg.alias("dcg"), F.sum("rel").alias("n_relevant"))
        .join(F.broadcast(idcg))
        .select(
            (F.round(F.col("dcg") + 1e-9, 4) + 0.0).alias("dcg"),
            "n_relevant",
            (F.round(F.col("dcg") / F.col("idcg") + 1e-9, 4) + 0.0).alias(
                "ndcg"
            ),
        )
    )


def q_cluster_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic training-mix report: document counts and character
    mass per (k-means cluster × language) — the composition table a
    data-mixing pass reads to rebalance a corpus by TOPIC, not just by
    metadata (the embeddings fixture aligns vec_id with doc_id).

    The cluster assignment is q_kmeans's exact trajectory; the join to
    documents is keyed on the id and the rollup is one map-side-
    combined aggregate over (K × |langs|) groups."""
    final = _kmeans_final(spark, sf_dir).select("vec_id", "cluster")
    docs = table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "lang", "n_chars"
    )
    return (
        final.join(docs, "vec_id")
        .groupBy("cluster", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars"),
        )
    )


SEMDEDUP_TAU = 0.95


def _sem_k(n: int) -> int:
    """SemDeDup / blocking cluster count: max(8, ⌊√N⌋) — the cluster
    COUNT scales with the corpus so expected cluster size is √N and
    the within-cluster quadratic totals N^1.5 (the published SemDeDup
    runs K ∝ corpus size for exactly this reason; the round-3 fixed
    K=4 version measured 38.9 s at sf1, 35× its sf0.1 time, because
    cluster sizes grew linearly). The floor is N_CENTROIDS so
    q_knn_join can share this exact trajectory (its published sizing
    rule, FAISS's sqrt(N) lists with a small floor)."""
    return max(N_CENTROIDS, int(math.floor(math.sqrt(n))))


# Trained centroids per materialized assignment table (driver-side,
# K·DIM doubles — bounded). Backed by a `_cents.json` sidecar inside
# the table directory (underscore-prefixed: invisible to the parquet
# scanner) so a fresh process can probe without retraining.
_LLOYD_CENTS: dict[str, list[tuple[int, list[float]]]] = {}


def _lloyd_cents(spark: SparkSession, sf_dir: str, tag: str) -> list[tuple[int, list[float]]]:
    import json
    import os

    path = _kmeans_assign_path(spark, sf_dir) + tag
    if path not in _LLOYD_CENTS:
        with open(os.path.join(path, "_cents.json")) as f:
            _LLOYD_CENTS[path] = [(int(c), [float(v) for v in cx]) for c, cx in json.load(f)]
    return _LLOYD_CENTS[path]


IVF_TRAIN_PER_CENTROID = 256  # FAISS's max_points_per_centroid guidance
# Hard ceiling on the driver-side training collect (VERDICT r9 item 7):
# without it, 256·K grows unboundedly with K — at K=√N on 2e9 vectors
# that is ~8M×64 doubles ≈ 4 GB on the driver. 2^18 is the FAISS-sized
# absolute cap (faiss clips clustering input the same way); past it
# each centroid trains on <256 samples, which costs some quantization
# quality (slightly less balanced cells → longer candidate tails), not
# correctness — assignment is always the full corpus, and the recall
# gates (q_ann_recall / q_lsh_recall, tests/test_similarity_quality.py)
# pin the floor. Every shipped fixture sits far below the cap, so
# training there is byte-identical with or without it.
IVF_TRAIN_MAX_SAMPLES = 1 << 18


def ivf_train_bound(k: int) -> int:
    """Training-sample bound for a fixed-K trainer: 256 per centroid,
    capped at IVF_TRAIN_MAX_SAMPLES, never below K (the init needs K
    distinct sample vectors). Shared by the Spark trainer and the
    DuckDB oracle constructor so the two can never disagree."""
    return max(k, min(IVF_TRAIN_PER_CENTROID * k, IVF_TRAIN_MAX_SAMPLES))


def _lloyd_final(spark: SparkSession, sf_dir: str, k_of, tag: str) -> DataFrame:
    """Trained k-means assignment (vec_id, label, x, cluster),
    materialized per build like _kmeans_final, with the trained
    centroids persisted alongside (`_cents.json`).

    Shared blocking/index infrastructure: `_semdedup_final` (tag
    "_sem", K = max(8, ⌊√N⌋)) feeds q_semdedup, q_embed_near_dup /
    q_embed_dedup and q_knn_join; tag "_ivf" (K = N_CENTROIDS) feeds
    the IVF ANN family with TRAINED centroids (r4 VERDICT item 3 —
    first-K init gave unbalanced cells ⇒ straggler tasks at scale).

    Two training regimes, one contract:
    - dynamic K (callable ``k_of``): distributed Lloyd — Arrow-batched
      gemm assignment (a literal argmin over √N centroids would blow
      past codegen limits), (K·DIM)-row centroid update, bounded
      driver collect per iteration. Cost is linear per iteration —
      right for the blocking trajectory whose K grows with the corpus.
    - fixed K (int ``k_of``, the IVF family): FAISS-style SAMPLED
      training — the 256·K vectors with the smallest multiplicative
      hash of vec_id (a deterministic SPREAD sample — not an id
      prefix, which on label/time-ordered production data is a biased
      slice; bounded TakeOrdered collect, constant at any corpus
      size) train driver-side in numpy; the cluster only runs the ONE
      final assignment pass. At every
      shipped fixture the sample bound exceeds the corpus, so sampled
      and full training coincide exactly; at 100 TB training cost is
      O(1) while assignment stays one scan.

    Both regimes are deterministic (first-K init, fixed iterations,
    round-6 centroid quantization, ties → lowest id) so the DuckDB
    oracles replay them exactly via unrolled CTEs (_kmeans_ctes,
    ``train_bound`` mirroring the sample)."""
    import json
    import os

    from pyspark.sql import types as T

    path = _kmeans_assign_path(spark, sf_dir) + tag
    if path in _KMEANS_BUILT and os.path.isdir(path):
        return spark.read.parquet(path)

    # No parallelize/persist on the fixed-K (sampled) path: the gemm
    # assignment is vectorized Arrow work (~ms per million rows), so
    # fanning a tiny fixture across 32 pandas-UDF tasks only buys task
    # overhead; at production scale the parquet scan yields ≥cores
    # splits on its own. The iterative path persists below (it scans
    # the input once per Lloyd iteration).
    em = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform(F.col("embedding"), lambda e: e.cast("double")).alias("x"),
    )

    def _assign(cc: list[tuple[int, list[float]]]):
        ids = np.array([c for c, _ in cc])
        C = np.array([cx for _, cx in cc], dtype=np.float64)  # (k, DIM)

        @F.pandas_udf(T.IntegerType())
        def cluster_of(xs: pd.Series) -> pd.Series:
            X = np.stack(xs.to_numpy()).astype(np.float64)
            # exact-fold argmin at gemm speed (see _argmin_sqdist);
            # ties → lowest centroid id (ids sorted ascending)
            return pd.Series(
                ids[_argmin_sqdist(X, C)].astype(np.int32)
            )

        return em.select(
            "vec_id", "label", "x", cluster_of(F.col("x")).alias("cluster")
        )

    if isinstance(k_of, int):
        k = k_of
        bound = ivf_train_bound(k)
        assert bound <= max(k, IVF_TRAIN_MAX_SAMPLES)  # driver-collect cap
        # Deterministic SPREAD sample, not a vec_id prefix (ADVICE r5:
        # on production data ordered by label/time the first 256·K ids
        # are a biased slice, undermining cell balance — FAISS
        # subsamples randomly). The 256·K rows with the smallest
        # multiplicative hash of vec_id form a pseudo-random
        # permutation prefix: TakeOrdered top-k (one scan, no full
        # sort shuffle, bounded driver collect), identical predicate
        # in the oracle's training CTEs. At every shipped fixture the
        # bound exceeds the corpus, so the sample is the full corpus
        # and training is byte-identical to full training.
        # vec_id is reduced mod the prime BEFORE the multiply (ADVICE
        # r6): past ~3.5e9 ids the raw product overflows int64, where
        # Spark wraps silently but DuckDB raises — breaking the
        # identical-predicate contract exactly at the 100 TB design
        # point. (a·h) mod p == ((a mod p)·h) mod p, and the reduced
        # product tops out at ~2.7e15, so the two forms agree wherever
        # the old one was overflow-free (all shipped fixtures) and the
        # new one never overflows. pmod keeps any negative id in
        # [0, p) the way DuckDB's double-% idiom does.
        hcol = F.pmod(
            F.pmod(F.col("vec_id").cast("long"), F.lit(1000003))
            * F.lit(2654435761),
            F.lit(1000003),
        )
        srows = sorted(
            em.select("vec_id", "x")
            .orderBy(hcol.asc(), F.col("vec_id").asc())
            .limit(bound)
            .collect(),
            key=lambda r: r["vec_id"],
        )
        S = np.array([[float(v) for v in r["x"]] for r in srows])
        # init = the K lowest-id sample vectors; centroid ids are their
        # vec_ids (ascending, so positional argmin ties = lowest id)
        cents_ids = [int(r["vec_id"]) for r in srows[:k]]
        C = S[:k].copy()
        for _ in range(KM_ITERS):
            d = _sqdist_fold(S, C)
            a = np.argmin(d, axis=1)  # ties → first = lowest cid
            new_ids: list[int] = []
            new_C: list[np.ndarray] = []
            for j, cid in enumerate(cents_ids):
                members = S[a == j]
                if len(members):  # drop-cluster rule, ids stay original
                    new_ids.append(cid)
                    new_C.append(np.round(members.mean(axis=0), 6))
            cents_ids, C = new_ids, np.array(new_C)
        cents = [
            (int(cid), [float(x) for x in row])
            for cid, row in zip(cents_ids, C)
        ]
    else:
        # Loop housekeeping (r15, guide §2.4): the iteration jobs run
        # on a session CLONE with shuffle partitions sized to the
        # corpus (_size_rounds_to) — the session-wide AQE initial
        # count is sized to the whole fixture, which makes every
        # centroid-update aggregate pay a 32-way map output for a
        # (K·DIM)-row result at bench scale. The gemm assignment is
        # Arrow-vectorized, so the map fan-out is capped by input
        # bytes too (parallelize bytes_per_split) instead of always
        # splitting a sub-MB fixture across every core; at real scale
        # both knobs defer to the natural file splits / the
        # cluster-sized conf. Values are unchanged: assignment is
        # per-row, and the update's round-to-6 centroid quantization
        # absorbs partial-combine order by design (it already must —
        # reduce-side fetch order is nondeterministic).
        from .hashing import _iter_session, _size_rounds_to

        caller_spark = spark
        spark = _iter_session(spark)
        em = parallelize(
            table(spark, sf_dir, "embeddings"), spark, bytes_per_split=2 << 20
        ).select(
            "vec_id",
            "label",
            F.transform(F.col("embedding"), lambda e: e.cast("double")).alias(
                "x"
            ),
        ).persist(ITER_STORAGE)
        k = k_of(em.count())
        _size_rounds_to(spark, k * DIM)
        init = sorted(
            em.where(F.col("vec_id") < k).select("vec_id", "x").collect(),
            key=lambda r: r["vec_id"],
        )
        cents = [(int(r["vec_id"]), [float(v) for v in r["x"]]) for r in init]
        for _ in range(KM_ITERS):
            a = _assign(cents)
            # one row PER CLUSTER (not per cluster x dim): at K=sqrt(N)
            # on 2e9 vectors the flat (cluster, pos, m) collect is
            # ~2.8M driver Rows; packing each centroid into one sorted
            # array keeps the collect at K rows (VERDICT r9 item 7).
            # POSTURE (VERDICT r11 item 7): this collect — and the
            # matching per-iteration broadcast of `cents` into the
            # next _assign closure — is the ONLY driver round-trip in
            # the loop, and it grows as √N rows x DIM doubles (~31k x
            # 64 ≈ 16 MB at 1e9 vectors; pinned by
            # tests/test_similarity_quality.py::test_centroid_collect_sqrt_bound).
            # Escape plan for 1e9+ vectors, where even √N x DIM
            # pressures the driver: keep the (cluster, pos, avg)
            # partial aggregation but SKIP the driver hop — leave the
            # centroid frame distributed, and replace the closure
            # capture with a broadcast-hash JOIN of the assignment
            # against the K-row centroid frame (a tree-aggregated
            # update: partials combine map-side, the reduced frame
            # broadcasts executor-to-executor without ever collecting).
            # Not wired today because the collect doubles as the
            # deterministic-trajectory contract with the DuckDB oracle
            # (round-6 quantization happens on sorted driver rows).
            means = (
                a.select("cluster", F.posexplode("x").alias("pos", "val"))
                .groupBy("cluster", "pos")
                .agg(F.round(F.avg("val"), 6).alias("m"))
                .groupBy("cluster")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "m"))
                    ).alias("pm")
                )
                .collect()
            )
            cents = [
                (int(r["cluster"]), [float(p["m"]) for p in r["pm"]])
                for r in sorted(means, key=lambda r: r["cluster"])
            ]
    # the parquet write IS the lineage truncation (no extra
    # localCheckpoint pass — callers only ever see the table scan)
    _assign(cents).write.mode("overwrite").parquet(path)
    em.unpersist()
    with open(os.path.join(path, "_cents.json"), "w") as f:
        json.dump(cents, f)
    _LLOYD_CENTS[path] = cents
    _KMEANS_BUILT.add(path)
    # Read back on the CALLER's session: the dynamic-K branch swapped
    # `spark` for a loop-sized clone (8-way shuffles), and a consumer
    # plan bound to that clone would inherit the tiny shuffle sizing
    # for its own corpus-scale joins (the exact conf-leak class
    # session.scoped exists to prevent).
    if not isinstance(k_of, int):
        spark = caller_spark
    return spark.read.parquet(path)


def _semdedup_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared √N blocking trajectory (see _lloyd_final)."""
    return _lloyd_final(spark, sf_dir, _sem_k, "_sem")


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup as published (Abbas et al. '23), composed from the
    engine's own parts: k-means clusters the corpus semantically with
    K = max(4, ⌊√N⌋) clusters (see _sem_k — K scales with the corpus,
    so the within-cluster quadratic totals N^1.5), near-duplicate
    pairs are found ONLY within each cluster (the salted
    triangle-block join — the clusters are the blocking key, so the
    quadratic never crosses cluster boundaries), and the keep-set
    drops the higher id of every pair over cosine τ=0.95. Returns the
    kept (vec_id, cluster).

    Scale: cluster assignment is an Arrow-batched map-side gemm;
    pairing cost is bounded per salt-block AND per cluster (√N
    expected size); the drop list reduces before the anti-join. The
    oracle replays the identical pipeline in SQL (unrolled k-means
    CTEs with the same dynamic K + within-cluster pair join)."""
    final = _semdedup_final(spark, sf_dir)
    em = final.select(
        "vec_id", "cluster", unit(F.col("x")).alias("u")
    )
    pairs = triangle_pairs(em, "cluster").where(F.col("cos_sim") > SEMDEDUP_TAU)
    drop = pairs.select(F.col("vec_b").alias("vec_id")).distinct()
    return em.join(drop, "vec_id", "left_anti").select("vec_id", "cluster")


def _kmeans_ctes(k_sql: str | None = None, train_bound: int | None = None) -> str:
    """Unrolled Lloyd iterations as chained CTEs — the same rounded
    centroid quantization at each step. Shared by the k-means,
    cluster-mix (fixed K), SemDeDup (dynamic √N K) and IVF (fixed K,
    sample-trained) oracles (a{KM_ITERS} holds the final assignment).

    ``train_bound``: when set, the TRAINING iterations (t < KM_ITERS)
    see only the ``train_bound`` vectors with the smallest
    multiplicative hash of vec_id — the FAISS-style bounded training
    sample, SPREAD across the id space rather than a biased prefix
    (ADVICE r5) — while the FINAL assignment covers the full corpus,
    and the init centroids are the K lowest-id SAMPLE vectors. At
    every shipped fixture the bound exceeds the corpus, so sampled
    and full training are byte-identical there."""
    k = k_sql if k_sql is not None else str(KM_K)
    if train_bound is not None:
        # mirrors the Spark overflow-safe pmod form: reduce vec_id mod
        # the prime first (never overflows), normalize to [0, p)
        sample = (
            "(SELECT * FROM v ORDER BY"
            " ((((CAST(vec_id AS BIGINT) % 1000003) + 1000003) % 1000003)"
            " * 2654435761) % 1000003 ASC,"
            f" vec_id ASC LIMIT {train_bound})"
        )
        tsrc = sample + " v"
        c0 = (
            f"c0 AS (SELECT vec_id AS c, x AS cx FROM {sample} s"
            f" ORDER BY vec_id ASC LIMIT ({k}))"
        )
    else:
        tsrc = "v"
        c0 = f"c0 AS (SELECT vec_id AS c, x AS cx FROM v WHERE vec_id < ({k}))"
    ctes = [
        "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings)",
        f"ms AS (SELECT unnest(range({DIM})) AS i)",
        c0,
    ]
    for t in range(KM_ITERS + 1):
        src = tsrc if t < KM_ITERS else "v"
        ctes.append(
            f"""d{t} AS (SELECT v.vec_id, c.c,
               list_sum(list_transform(list_zip(v.x, c.cx),
                        p -> (p[1]-p[2])*(p[1]-p[2]))) AS d
               FROM {src} CROSS JOIN c{t} c)"""
        )
        ctes.append(
            f"""a{t} AS (SELECT vec_id, c, d FROM (
               SELECT vec_id, c, d, row_number() OVER (
                 PARTITION BY vec_id ORDER BY d ASC, c ASC) AS rn FROM d{t})
               WHERE rn = 1)"""
        )
        if t < KM_ITERS:
            ctes.append(
                f"""m{t} AS (SELECT a.c, ms.i, round(avg(v.x[ms.i+1]), 6) AS m
                   FROM a{t} a JOIN v USING (vec_id) CROSS JOIN ms
                   GROUP BY a.c, ms.i)"""
            )
            ctes.append(
                f"c{t + 1} AS (SELECT c, list(m ORDER BY i) AS cx FROM m{t} GROUP BY c)"
            )
    return ",\n".join(ctes)


_KMEANS_SQL = (
    "WITH "
    + _kmeans_ctes()
    + f"""
    SELECT vec_id, c AS cluster, round(sqrt(d), 4) + 0.0 AS dist
    FROM a{KM_ITERS}"""
)

_SEM_K_SQL = (
    f"SELECT greatest({N_CENTROIDS}, CAST(floor(sqrt(count(*))) AS BIGINT)) "
    "FROM embeddings"
)

_SEMDEDUP_SQL = (
    "WITH "
    + _kmeans_ctes(f"({_SEM_K_SQL})")
    + f""",
    uu AS (
      SELECT vec_id,
             list_transform(x, e -> e / sqrt(list_sum(
               list_transform(x, y -> y * y)))) AS u
      FROM v
    ),
    sd_pairs AS (
      SELECT y.vec_id AS vb
      FROM a{KM_ITERS} x JOIN a{KM_ITERS} y
        ON x.c = y.c AND x.vec_id < y.vec_id
      JOIN uu ux ON ux.vec_id = x.vec_id
      JOIN uu uy ON uy.vec_id = y.vec_id
      WHERE round(list_sum(list_transform(list_zip(ux.u, uy.u),
                    p -> p[1] * p[2])), 4) > {SEMDEDUP_TAU}
    )
    SELECT a.vec_id, a.c AS cluster FROM a{KM_ITERS} a
    WHERE a.vec_id NOT IN (SELECT vb FROM sd_pairs)"""
)

# --- trained-trajectory oracles (IVF / kNN-join / near-dup family) --------
# Each replays the exact Lloyd trajectory its Spark twin materializes:
# K = N_CENTROIDS for the IVF family, K = max(8, ⌊√N⌋) (_SEM_K_SQL)
# for the shared blocking trajectory. a{KM_ITERS} is the trained
# assignment, d{KM_ITERS} the squared-L2 distances to the trained
# centroids (probe ranking), v the double-cast vectors.

_IVF_SQL = (
    "WITH "
    + _kmeans_ctes(
        str(N_CENTROIDS), train_bound=ivf_train_bound(N_CENTROIDS)
    )
    + f""", probe AS (
  SELECT c AS cell FROM (
    SELECT c, row_number() OVER (ORDER BY d ASC, c ASC) AS rn
    FROM d{KM_ITERS} WHERE vec_id = 0
  ) WHERE rn <= {N_PROBE}
), q AS (
  SELECT x AS qe FROM v WHERE vec_id = 0
)
SELECT v.vec_id, round({_COS.format(a="v.x", b="qe")}, 4) + 0.0 AS cos_sim
FROM v JOIN a{KM_ITERS} a ON v.vec_id = a.vec_id, q
WHERE a.c IN (SELECT cell FROM probe) AND v.vec_id <> 0
ORDER BY cos_sim DESC, v.vec_id ASC LIMIT 5
"""
)

_KNN_JOIN_SQL = (
    "WITH "
    + _kmeans_ctes(f"({_SEM_K_SQL})")
    + f""", uu AS (
  SELECT vec_id,
         list_transform(x, e -> e / sqrt(list_sum(
           list_transform(x, y -> y * y)))) AS u
  FROM v
), directed AS (
  SELECT x.vec_id AS vec_id, y.vec_id AS neighbor,
         round(list_sum(list_transform(list_zip(ux.u, uy.u),
               p -> p[1] * p[2])), 4) AS cos_sim
  FROM a{KM_ITERS} x JOIN a{KM_ITERS} y
    ON x.c = y.c AND x.vec_id <> y.vec_id
  JOIN uu ux ON ux.vec_id = x.vec_id
  JOIN uu uy ON uy.vec_id = y.vec_id
)
SELECT vec_id, rk, neighbor, cos_sim + 0.0 AS cos_sim FROM (
  SELECT vec_id, neighbor, cos_sim,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos_sim DESC, neighbor ASC) AS rk
  FROM directed
) WHERE rk <= {KNN_JOIN_K}
"""
)

# Panel/blocked near-dup: un = unit vectors + label + trained cluster.
_NEAR_DUP_UN_CTE = f"""un AS (
  SELECT v.vec_id, e.label, a.c AS cluster,
         list_transform(v.x, x -> x / sqrt(list_sum(
           list_transform(v.x, y -> y * y)))) AS u
  FROM v JOIN a{KM_ITERS} a ON v.vec_id = a.vec_id
  JOIN embeddings e ON e.vec_id = v.vec_id
)"""

_NEAR_DUP_SQL = (
    "WITH "
    + _kmeans_ctes(f"({_SEM_K_SQL})")
    + f""", {_NEAR_DUP_UN_CTE}
SELECT * FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round(list_sum(list_transform(list_zip(a.u, b.u), p -> p[1] * p[2])), 4)
           AS cos_sim
  FROM un a JOIN un b
    ON a.label = b.label AND a.cluster = b.cluster AND a.vec_id < b.vec_id
) WHERE cos_sim > 0.99
"""
)

_NEAR_DUP_RECALL_SQL = (
    "WITH "
    + _kmeans_ctes(f"({_SEM_K_SQL})")
    + f""", {_NEAR_DUP_UN_CTE},
pert AS (
  SELECT v.vec_id, a.c AS cluster, v.x,
         list_transform(list_zip(v.x, range(0, {DIM})), p ->
           p[1] * (1 + {NEAR_DUP_PERT} *
             ((((v.vec_id * {DIM} + p[2]) * 2654435761) % 1000003) - 501501)
             / 501501.0)) AS p
  FROM v JOIN a{KM_ITERS} a ON v.vec_id = a.vec_id
  WHERE v.vec_id < {NEAR_DUP_PANEL}
),
pd_ AS (
  SELECT pert.vec_id, pert.cluster, c.c AS pc,
         list_sum(list_transform(list_zip(pert.p, c.cx),
                  q -> (q[1]-q[2])*(q[1]-q[2]))) AS d
  FROM pert CROSS JOIN c{KM_ITERS} c
),
pa AS (
  SELECT vec_id, cluster, pc FROM (
    SELECT vec_id, cluster, pc,
           row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, pc ASC) AS rn
    FROM pd_) WHERE rn = 1
),
planted AS (
  SELECT count(*) AS n_planted,
         CAST(coalesce(sum(CASE WHEN pa.cluster = pa.pc THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS caught_planted,
         round(min({_COS.format(a="pert.x", b="pert.p")}), 2)
           AS min_planted_cos
  FROM pa JOIN pert ON pa.vec_id = pert.vec_id
),
t AS (
  SELECT round(list_sum(list_transform(list_zip(a.u, b.u),
               p -> p[1] * p[2])), 4) AS cos_sim,
         CASE WHEN a.cluster = b.cluster THEN 1 ELSE 0 END AS caught,
         a.vec_id AS va, b.vec_id AS vb
  FROM un a JOIN un b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE a.vec_id < {NEAR_DUP_PANEL} AND b.vec_id < {NEAR_DUP_PANEL}
  ORDER BY cos_sim DESC, va ASC, vb ASC
  LIMIT {NEAR_DUP_AUDIT_TOP}
),
tail AS (
  SELECT count(*) AS n_tail,
         CAST(coalesce(sum(caught), 0) AS BIGINT) AS caught_tail
  FROM t
)
SELECT n_planted, caught_planted,
       coalesce(round(caught_planted * 1.0 / n_planted, 4), 1.0) + 0.0
         AS recall_planted,
       min_planted_cos + 0.0 AS min_planted_cos,
       n_tail, caught_tail,
       coalesce(round(caught_tail * 1.0 / n_tail, 4), 1.0) + 0.0
         AS recall_tail
FROM planted CROSS JOIN tail
"""
)


_QUANT_SQL = """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings
    ), s AS (
      SELECT vec_id, x,
             greatest(list_max(list_transform(x, e -> abs(e))) / 127.0,
                      1e-12) AS scale
      FROM v
    ), q AS (
      SELECT vec_id, x, scale,
             list_transform(x, e -> CAST(least(greatest(
               floor(e / scale + 0.5), -127.0), 127.0) AS BIGINT)) AS qc
      FROM s
    )
    SELECT vec_id,
           round(scale + 1e-9, 6) AS scale,
           CAST(list_sum(qc) AS BIGINT) AS checksum,
           true AS within_bound
    FROM q
"""

def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality measurement as a catalog query — the recall@5
    number every index deployment signs off on before switching
    retrieval from brute force: for 5 query vectors, the exact cosine
    top-5 (oracle-checkable: emitted as an id list the DuckDB side
    recomputes) next to the IVF index's top-5 overlap under the
    within-bound contract (IVF assignment and probing are
    deterministic — trained Lloyd centroids, argmin-L2 gemm, 2-probe
    — so ``recall_ok`` = at least 4 of 5 exact neighbors found is a
    stable boolean; measured 4–5/5 at sf0.001 through sf0.1).

    Plan shape: one corpus pass computes BOTH rankings (the trained
    cell assignment comes from the shared materialized _ivf_assign
    table — the same index q_ann_ivf serves from — the cosine to the
    broadcast query side and two row_number windows over the same qid
    partitioning); candidates never materialize separately."""
    assign = _ivf_assign(spark, sf_dir)
    cents = _lloyd_cents(spark, sf_dir, "_ivf")
    q_rows = sorted(
        assign.where(F.col("vec_id") < 5).select("vec_id", "x").collect(),
        key=lambda r: r["vec_id"],
    )
    q_data = [
        (
            int(r["vec_id"]),
            [float(x) for x in r["x"]],
            _ivf_probes([float(x) for x in r["x"]], cents, N_PROBE),
        )
        for r in q_rows
    ]
    qdf = spark.createDataFrame(
        q_data, "qid int, qe array<double>, probes array<int>"
    )
    pairs = (
        assign.crossJoin(F.broadcast(qdf))
        .select(
            "qid",
            "vec_id",
            (F.round(cosine(F.col("x"), F.col("qe")), 4) + 0.0).alias("cos"),
            F.array_contains("probes", F.col("cluster")).alias("is_cand"),
        )
    )
    w_exact = Window.partitionBy("qid").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    w_ivf = Window.partitionBy("qid", "is_cand").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    ranked = pairs.select(
        "qid",
        "vec_id",
        F.row_number().over(w_exact).alias("r_exact"),
        F.row_number().over(w_ivf).alias("r_ivf"),
        "is_cand",
    )
    return ranked.groupBy("qid").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("r_exact") <= 5,
                            F.struct("r_exact", "vec_id"),
                        )
                    )
                ),
                lambda s: s["vec_id"].cast("string"),
            ),
        ).alias("exact_top5"),
        (
            F.count_if(
                (F.col("r_exact") <= 5)
                & F.col("is_cand")
                & (F.col("r_ivf") <= 5)
            )
            >= 4
        ).alias("recall_ok"),
    )


MATRYOSHKA_DIM = 8  # truncated-prefix representation width
MATRYOSHKA_Q = 5  # evaluation query vectors (vec_id < Q)


def q_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation retrieval evaluation: for each of 5
    query vectors, rank the corpus by full 64-dim cosine AND by the
    8-dim PREFIX cosine (the Matryoshka/MRL trick — nested prefixes of
    one embedding trade accuracy for 8× less compute and memory), then
    report the top-10 overlap between the two rankings. This is the
    measurement every embedding-serving stack runs before switching
    its first-stage retrieval to truncated vectors.

    Both rankings come out of ONE pass: the corpus cross-joins the
    broadcast 5-row query side, each pair computes both cosines, and
    two row_number windows over the same (qid) partitioning rank them
    — overlap@10 is then a count_if(rank_full<=10 AND rank_trunc<=10)
    per query, no set intersection materialized. Scale: |Q| replicas
    of the scan (batched queries at 100 TB), shuffle carries only
    (qid, vec_id, 2 cosines); ties broken by rounded-cosine then
    vec_id so the oracle ranks identically."""
    em = table(spark, sf_dir, "embeddings")
    q = em.where(F.col("vec_id") < MATRYOSHKA_Q).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    d = MATRYOSHKA_DIM
    pairs = em.crossJoin(F.broadcast(q)).select(
        "qid",
        "vec_id",
        (F.round(cosine(F.col("embedding"), F.col("qe")), 4) + 0.0).alias("cf"),
        (
            F.round(
                cosine(
                    F.slice(F.col("embedding"), 1, d),
                    F.slice(F.col("qe"), 1, d),
                ),
                4,
            )
            + 0.0
        ).alias("ct"),
    )
    wf = Window.partitionBy("qid").orderBy(F.desc("cf"), F.asc("vec_id"))
    wt = Window.partitionBy("qid").orderBy(F.desc("ct"), F.asc("vec_id"))
    ranked = pairs.select(
        "qid",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wt).alias("rt"),
    )
    return ranked.groupBy("qid").agg(
        F.count_if((F.col("rf") <= 10) & (F.col("rt") <= 10)).alias(
            "overlap_at_10"
        ),
        F.round(
            F.count_if((F.col("rf") <= 10) & (F.col("rt") <= 10)) / 10.0
            + F.lit(1e-9),
            2,
        ).alias("recall_at_10"),
    )


ORACLE: dict[str, str] = {
    "q_ann_recall": """
        -- exact side recomputed; the IVF overlap is the engine's
        -- deterministic within-bound boolean (centroids/probing are
        -- fixed, so recall_ok is stable; measured 4-5/5 across sfs)
        WITH q AS (
          SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
          FROM embeddings WHERE vec_id < 5
        ), pairs AS (
          SELECT q.qid, e.vec_id,
                 round(
                   list_sum(list_transform(
                     list_zip(CAST(e.embedding AS DOUBLE[]), q.qe),
                     p -> p[1] * p[2]))
                   / (sqrt(list_sum(list_transform(
                        CAST(e.embedding AS DOUBLE[]), x -> x * x)))
                      * sqrt(list_sum(list_transform(q.qe, x -> x * x)))),
                   4) + 0.0 AS cos
          FROM embeddings e CROSS JOIN q
        ), ranked AS (
          SELECT qid, vec_id,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY cos DESC, vec_id ASC)
                   AS r_exact
          FROM pairs
        )
        SELECT qid,
               string_agg(CAST(vec_id AS VARCHAR), ','
                          ORDER BY r_exact) AS exact_top5,
               true AS recall_ok
        FROM ranked WHERE r_exact <= 5
        GROUP BY qid
    """,
    "q_matryoshka": """
        WITH q AS (
          SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
          FROM embeddings WHERE vec_id < 5
        ), pairs AS (
          SELECT q.qid, e.vec_id,
                 round(
                   list_sum(list_transform(
                     list_zip(CAST(e.embedding AS DOUBLE[]), q.qe),
                     p -> p[1] * p[2]))
                   / (sqrt(list_sum(list_transform(
                        CAST(e.embedding AS DOUBLE[]), x -> x * x)))
                      * sqrt(list_sum(list_transform(q.qe, x -> x * x)))),
                   4) + 0.0 AS cf,
                 round(
                   list_sum(list_transform(
                     list_zip(CAST(e.embedding[1:8] AS DOUBLE[]),
                              q.qe[1:8]),
                     p -> p[1] * p[2]))
                   / (sqrt(list_sum(list_transform(
                        CAST(e.embedding[1:8] AS DOUBLE[]), x -> x * x)))
                      * sqrt(list_sum(list_transform(q.qe[1:8],
                                                     x -> x * x)))),
                   4) + 0.0 AS ct
          FROM embeddings e CROSS JOIN q
        ), ranked AS (
          SELECT qid,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY cf DESC, vec_id ASC) AS rf,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY ct DESC, vec_id ASC) AS rt
          FROM pairs
        )
        SELECT qid,
               count(*) FILTER (WHERE rf <= 10 AND rt <= 10)
                 AS overlap_at_10,
               round(count(*) FILTER (WHERE rf <= 10 AND rt <= 10) / 10.0
                     + 1e-9, 2) AS recall_at_10
        FROM ranked GROUP BY qid
    """,
    "q_embed_pq": _PQ_SQL,
    "q_ann_pq": _ANN_PQ_SQL,
    "q_kmeans": _KMEANS_SQL,
    "q_semdedup": _SEMDEDUP_SQL,
    "q_cluster_mix": (
        "WITH "
        + _kmeans_ctes()
        + f"""
        SELECT a.c AS cluster, d.lang,
               count(*) AS n_docs,
               CAST(sum(d.n_chars) AS BIGINT) AS chars
        FROM a{KM_ITERS} a JOIN documents d ON a.vec_id = d.doc_id
        GROUP BY a.c, d.lang"""
    ),
    "q_embed_quantize": _QUANT_SQL,
    "q_embed_dedup": f"""
        SELECT vec_id, label FROM embeddings
        WHERE vec_id NOT IN (SELECT vec_b FROM ({_NEAR_DUP_SQL}))
    """,
    "q_ann_lsh": _ANN_SQL,
    "q_ann_ivf": _IVF_SQL,
    "q_ann_ivf_indexed": _IVF_SQL,
    "q_knn_join": _KNN_JOIN_SQL,
    "q_rank_fusion": None,  # filled below — needs the BM25 oracle text
    "q_knn_topk": """
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               round(
                 list_sum(list_transform(list_zip(CAST(embedding AS DOUBLE[]), qe),
                                         p -> p[1] * p[2]))
                 / (sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)))
                    * sqrt(list_sum(list_transform(qe, x -> x * x)))),
                 4) + 0.0 AS cos_sim
        FROM embeddings, q
        ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
    """,
    "q_embed_near_dup": _NEAR_DUP_SQL,
    "q_embed_near_dup_recall": _NEAR_DUP_RECALL_SQL,
}


def _rrf_sql() -> str:
    """RRF oracle — embeds the BM25 oracle as the sparse leg (imported
    here, not duplicated) and the rounded-cosine ranking as the dense
    leg."""
    from .text import ORACLE as _text_oracle

    return f"""
    WITH sparse_raw AS ({_text_oracle["q_bm25"]}),
    sparse AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS r_sparse
      FROM sparse_raw
    ), emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), q AS (SELECT e AS qe FROM emb WHERE vec_id = 0),
    dense AS (
      SELECT vec_id AS doc_id,
             row_number() OVER (
               ORDER BY round({_COS.format(a="e", b="qe")}, 4) DESC,
                        vec_id ASC) AS r_dense
      FROM emb CROSS JOIN q
    )
    SELECT dense.doc_id, r_dense, r_sparse,
           round(coalesce(1.0 / ({RRF_K} + r_sparse), 0.0)
                 + 1.0 / ({RRF_K} + r_dense) + 1e-9, 6) + 0.0 AS rrf
    FROM dense LEFT JOIN sparse ON dense.doc_id = sparse.doc_id
    ORDER BY rrf DESC, dense.doc_id ASC LIMIT {RRF_TOP}
    """


ORACLE["q_rank_fusion"] = _rrf_sql()

ORACLE["q_ndcg"] = f"""
    WITH emb AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), q AS (SELECT e AS qe, label AS qlabel FROM emb WHERE vec_id = 0),
    ranked AS (
      SELECT vec_id,
             CAST(emb.label = q.qlabel AS INT) AS rel,
             row_number() OVER (
               ORDER BY round({_COS.format(a="e", b="qe")}, 4) DESC,
                        vec_id ASC) AS rk
      FROM emb CROSS JOIN q WHERE vec_id <> 0
    ), ideal AS (
      SELECT rel, row_number() OVER (ORDER BY rel DESC, vec_id ASC) AS irk
      FROM ranked
    ), idcg AS (
      SELECT sum(rel / log2(irk + 1)) AS idcg FROM ideal
      WHERE irk <= {NDCG_AT}
    )
    SELECT round(sum(rel / log2(rk + 1)) + 1e-9, 4) + 0.0 AS dcg,
           CAST(sum(rel) AS BIGINT) AS n_relevant,
           round(sum(rel / log2(rk + 1)) / any_value(idcg.idcg) + 1e-9, 4)
             + 0.0 AS ndcg
    FROM ranked CROSS JOIN idcg
    WHERE rk <= {NDCG_AT}
"""
