"""Embedding similarity search over array<float> columns.

Baseline: brute-force cosine top-k — one scan, no shuffle (the probe
broadcasts), exact. Scale path: LSH bucketing via signed random
hyperplanes — candidates shuffle on bucket ids, so the pairwise work
is per-bucket, then exact cosine re-ranks. Hyperplanes are generated
from a fixed seed on the driver and broadcast inside the (Arrow-
vectorized) Pandas UDF closure.
"""

from __future__ import annotations

from collections.abc import Mapping
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.registry import register


def cosine_col(a: Column, b: Column) -> Column:
    """Exact cosine similarity between two array<float> columns,
    computed element-sequentially in double (deterministic — float
    reduction order never varies with partitioning)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(
        F.transform(b, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


@register("ann_bruteforce")
def op_ann_bruteforce(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Exact top-k nearest neighbors of a probe vector by cosine.

    The probe (one row) broadcasts; the scan stays a single stage.
    Top-k uses a total order (similarity desc, id) so results are
    deterministic under ties.
    """
    field = config.get("field", "embedding")
    id_field = config.get("id_field", "vec_id")
    k = int(config.get("k", 10))
    if "probe" in config:
        probe_df = df.sparkSession.createDataFrame(
            [(list(map(float, config["probe"])),)], f"__probe array<float>")
    else:
        probe_df = df.filter(F.col(id_field) == config["probe_id"]).select(
            F.col(field).alias("__probe"))
    out = (
        df.join(F.broadcast(probe_df))
        .withColumn("cos_sim", cosine_col(F.col(field), F.col("__probe")))
        .select(id_field, "cos_sim")
        .orderBy(F.col("cos_sim").desc(), F.col(id_field))
        .limit(k)
    )
    return out


@lru_cache(maxsize=8)
def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).randn(n_planes, dim)


def _bucket_udf(dim: int, n_planes: int, seed: int):
    if not 1 <= n_planes <= 62:
        # 62 sign bits fill an int64 without touching the sign bit; beyond
        # that the packed id would silently wrap and multi-probe XOR masks
        # would stop matching stored buckets.
        raise ValueError(f"n_planes={n_planes} out of range (1..62)")
    planes = _hyperplanes(dim, n_planes, seed)

    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf(T.LongType())
    def bucket(embs: pd.Series) -> pd.Series:
        mat = np.vstack(embs.to_numpy())  # (batch, dim) — Arrow batch in, one matmul
        bits = (mat @ planes.T) > 0
        return pd.Series(bits.astype(np.int64) @ weights)

    return bucket


def _multi_bucket_udf(dim: int, n_planes: int, seed: int, n_tables: int):
    """All L tables' bucket ids in one kernel: the L*n_planes
    hyperplanes stack into a single (L*b, dim) matrix, so the per-batch
    cost is one matmul regardless of table count."""
    if not 1 <= n_planes <= 62:
        raise ValueError(f"n_planes={n_planes} out of range (1..62)")
    planes = np.vstack([_hyperplanes(dim, n_planes, seed + t)
                        for t in range(n_tables)])  # (L*b, dim)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(embs: pd.Series) -> pd.Series:
        mat = np.vstack(embs.to_numpy())
        bits = (mat @ planes.T) > 0                      # (batch, L*b)
        packed = (bits.reshape(len(mat), n_tables, n_planes).astype(np.int64)
                  @ weights)                             # (batch, L)
        return pd.Series(list(packed))

    return buckets


@register("lsh_bucket")
def op_lsh_bucket(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Sign-random-projection bucket id per embedding (n_planes sign
    bits packed into an int). Same seed => same buckets everywhere."""
    field = config.get("field", "embedding")
    dim = int(config.get("dim", 64))
    n_planes = int(config.get("n_planes", 12))
    seed = int(config.get("seed", 42))
    return df.withColumn("lsh_bucket",
                         _bucket_udf(dim, n_planes, seed)(F.col(field)))


@register("ann_lsh")
def op_ann_lsh(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Approximate top-k: probe's LSH bucket only, exact cosine
    re-rank inside it. Bucket pruning replaces the full scan — at
    2^n_planes buckets the candidate set is corpus/2^n_planes on
    average.

    ``probe_radius: r`` (multi-probe LSH) additionally scans every
    bucket up to r sign-flips away — recall rises toward brute force
    without re-indexing or changing n_planes, at sum(C(n_planes,i))x
    the candidate count. The recall/cost knob is per-QUERY, which a
    fixed-granularity index can't offer.
    """
    from itertools import combinations

    field = config.get("field", "embedding")
    id_field = config.get("id_field", "vec_id")
    k = int(config.get("k", 10))
    n_planes = int(config.get("n_planes", 12))
    radius = int(config.get("probe_radius", 0))
    masks = [sum(1 << b for b in bits)
             for r in range(1, radius + 1)
             for bits in combinations(range(n_planes), r)]
    if len(masks) > 512:
        raise ValueError(
            f"probe_radius={radius} over {n_planes} planes expands to "
            f"{len(masks)} buckets (>512) — lower the radius or n_planes")
    bucketed = op_lsh_bucket(df, config, views)
    if "probe" in config:  # literal probe vector, like ann_bruteforce
        probe_df = df.sparkSession.createDataFrame(
            [(list(map(float, config["probe"])),)], "__probe array<float>")
        probe = op_lsh_bucket(
            probe_df, {**config, "field": "__probe"}, views
        ).withColumnsRenamed({"lsh_bucket": "__pb"})
    else:
        probe = bucketed.filter(F.col(id_field) == config["probe_id"]).select(
            F.col(field).alias("__probe"), F.col("lsh_bucket").alias("__pb"))
    b, pb = F.col("lsh_bucket"), F.col("__pb")
    cond = b == pb
    for m in masks:
        cond = cond | (b == pb.bitwiseXOR(F.lit(m)))
    return (
        bucketed.join(F.broadcast(probe), cond)
        .withColumn("cos_sim", cosine_col(F.col(field), F.col("__probe")))
        .select(id_field, "cos_sim")
        .orderBy(F.col("cos_sim").desc(), F.col(id_field))
        .limit(k)
    )


def _assign_udf(centroids: np.ndarray):
    """Nearest-centroid (cosine) assignment, one matmul per Arrow
    batch. Centroids ride in the closure (k x dim — tiny) and are
    row-normalized once per executor."""
    norms = np.linalg.norm(centroids, axis=1, keepdims=True)
    cents = (centroids / np.where(norms == 0, 1.0, norms)).T  # (dim, k)

    @F.pandas_udf(T.IntegerType())
    def assign(embs: pd.Series) -> pd.Series:
        mat = np.vstack(embs.to_numpy()).astype(np.float64)
        mn = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.where(mn == 0, 1.0, mn)
        return pd.Series(np.argmax(mat @ cents, axis=1)).astype("int32")

    return assign


def _ivf_centroids(df: DataFrame, config: Mapping) -> np.ndarray:
    """Deterministic coarse quantizer: the k vectors with the smallest
    xxhash64(id) seed the centroids (stable across runs/partitions —
    no RNG, no sort-order dependence), then ``refine`` distributed
    Lloyd iterations. Only k x dim floats ever reach the driver; the
    per-vector assignments stay on the cluster."""
    field = config.get("field", "embedding")
    id_field = config.get("id_field", "vec_id")
    k = int(config.get("n_cells", 16))
    seed = (df.select(F.col(field).alias("__e"))
            .orderBy(F.xxhash64(F.col(id_field)), F.col(id_field))
            .limit(k).collect())
    cents = np.array([list(r["__e"]) for r in seed], dtype=np.float64)
    for _ in range(int(config.get("refine", 1))):
        assigned = df.select(
            _assign_udf(cents)(F.col(field)).alias("__c"),
            F.posexplode(field).alias("__pos", "__v"))
        means = (assigned.groupBy("__c", "__pos")
                 .agg(F.avg(F.col("__v").cast("double")).alias("__m"))
                 .collect())
        nxt = cents.copy()
        for r in means:
            nxt[r["__c"], r["__pos"]] = r["__m"]
        cents = nxt
    return cents


@register("ivf_assign")
def op_ivf_assign(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Attach the IVF cell id (nearest coarse centroid) to every
    embedding. At write time ``ivf_cell`` becomes a partition column,
    so probes prune whole files — the disk-level analogue of an IVF
    index's inverted lists."""
    field = config.get("field", "embedding")
    cents = _ivf_centroids(df, config)
    return df.withColumn("ivf_cell", _assign_udf(cents)(F.col(field)))


@register("ann_ivf")
def op_ann_ivf(df: DataFrame, config: Mapping, views) -> DataFrame:
    """IVF approximate top-k: rank the probe against the k_cells coarse
    centroids (driver-side — k x dim floats), scan only the nearest
    ``nprobe`` cells, exact cosine re-rank inside them. Touches
    ~nprobe/n_cells of the corpus; recall is tunable via nprobe with
    no index rebuild."""
    field = config.get("field", "embedding")
    id_field = config.get("id_field", "vec_id")
    k = int(config.get("k", 10))
    nprobe = int(config.get("nprobe", 2))
    cents = _ivf_centroids(df, config)
    assigned = df.withColumn("ivf_cell", _assign_udf(cents)(F.col(field)))

    probe_row = df.filter(F.col(id_field) == config["probe_id"]).select(field).head()
    if probe_row is None:  # unknown probe id -> empty result, like ann_lsh
        return df.sparkSession.createDataFrame(
            [], df.select(id_field).schema.add("cos_sim", T.DoubleType()))
    probe = np.array(list(probe_row[0]), dtype=np.float64)
    probe /= np.linalg.norm(probe) or 1.0
    norms = np.linalg.norm(cents, axis=1)
    sims = (cents / np.where(norms == 0, 1.0, norms)[:, None]) @ probe
    cells = [int(c) for c in np.argsort(-sims)[:nprobe]]

    probe_df = df.sparkSession.createDataFrame(
        [(list(map(float, probe_row[0])),)], f"__probe array<float>")
    return (
        assigned.filter(F.col("ivf_cell").isin(cells))
        .join(F.broadcast(probe_df))
        .withColumn("cos_sim", cosine_col(F.col(field), F.col("__probe")))
        .select(id_field, "cos_sim")
        .orderBy(F.col("cos_sim").desc(), F.col(id_field))
        .limit(k)
    )


def _assign_multi_udf(centroids: np.ndarray, nprobe: int):
    """Top-``nprobe`` nearest cells (cosine) per vector — the query
    side of a batch kNN-join probes several inverted lists while the
    index side stays single-cell. One matmul + one argsort per Arrow
    batch; ties break to the lower cell index (stable argsort), so
    the probe set is deterministic at any partitioning."""
    norms = np.linalg.norm(centroids, axis=1, keepdims=True)
    cents = (centroids / np.where(norms == 0, 1.0, norms)).T  # (dim, k)
    nprobe = min(nprobe, centroids.shape[0])

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(embs: pd.Series) -> pd.Series:
        mat = np.vstack(embs.to_numpy()).astype(np.float64)
        mn = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.where(mn == 0, 1.0, mn)
        order = np.argsort(-(mat @ cents), axis=1, kind="stable")
        return pd.Series(list(order[:, :nprobe].astype(np.int32)))

    return assign


def _norm_of(col: Column) -> Column:
    """Euclidean norm of an array<float> column, element-sequential in
    double (reduction order never varies with partitioning)."""
    return F.sqrt(F.aggregate(
        F.transform(col, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def _safe_norm(col: Column) -> Column:
    """`_norm_of` with zero pinned to 1.0 — knn_join's contract scores
    zero-norm vectors at cosine 0 instead of NaN (matches the cogroup
    kernel's guard; keeps impl parity on degenerate inputs)."""
    n = _norm_of(col)
    return F.when(n == 0.0, F.lit(1.0)).otherwise(n)


def _knn_cells_cogroup(qside: DataFrame, iside: DataFrame,
                       q_type, i_type, k: int,
                       exclude_self: bool) -> DataFrame:
    """Per-cell kNN kernel: cogroup (queries of cell) x (index rows of
    cell), one blocked float64 matmul per cell, emit each query's
    per-cell top-k as NARROW (qid, iid, cos) rows. Query blocks are
    sized so the similarity matrix stays ~64 MB regardless of cell
    size. Ties: index columns are sorted by id ascending and the
    argsort is stable, so equal cosines pick the smaller neighbor id —
    the same total order the final window (and the oracle) uses.
    Zero-norm vectors are guarded to norm 1 (cosine 0) instead of
    producing NaN."""
    out_schema = T.StructType([
        T.StructField("__qid", q_type), T.StructField("__iid", i_type),
        T.StructField("cos_sim", T.DoubleType())])

    def cell_topk(q: pd.DataFrame, i: pd.DataFrame):
        if not len(q) or not len(i):
            return pd.DataFrame({"__qid": [], "__iid": [],
                                 "cos_sim": []})
        order = i["__iid"].to_numpy().argsort(kind="stable")
        iid = i["__iid"].to_numpy()[order]
        im = np.vstack(i["__iemb"].to_numpy()).astype(np.float64)[order]
        inorm = np.linalg.norm(im, axis=1)
        inorm = np.where(inorm == 0, 1.0, inorm)
        qid_all = q["__qid"].to_numpy()
        qm_all = np.vstack(q["__qemb"].to_numpy()).astype(np.float64)
        block = max(1, 8_000_000 // len(iid))  # ~64 MB of doubles
        outs = []
        for s in range(0, len(qid_all), block):
            qid = qid_all[s:s + block]
            qm = qm_all[s:s + block]
            qnorm = np.linalg.norm(qm, axis=1)
            qnorm = np.where(qnorm == 0, 1.0, qnorm)
            sims = (qm @ im.T) / (qnorm[:, None] * inorm[None, :])
            if exclude_self:
                sims[qid[:, None] == iid[None, :]] = -np.inf
            top = np.argsort(-sims, axis=1, kind="stable")[:, :k]
            rows = np.repeat(np.arange(len(qid)), top.shape[1])
            cols = top.ravel()
            keep = np.isfinite(sims[rows, cols])
            outs.append(pd.DataFrame({
                "__qid": qid[rows[keep]], "__iid": iid[cols[keep]],
                "cos_sim": sims[rows[keep], cols[keep]]}))
        return pd.concat(outs, ignore_index=True)

    return (qside.groupBy("__cell")
            .cogroup(iside.groupBy("__cell"))
            .applyInPandas(cell_topk, out_schema))


@register("knn_join")
def op_knn_join(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Batch kNN-join: the top-``k`` nearest neighbors (cosine) of
    EVERY vector in ``df`` against an ``index`` corpus (default:
    ``df`` itself, excluding self-matches) — the many-to-many ANN
    shape SemDeDup-style semantic clustering and RAG index builds
    run at corpus scale. ``ann_*`` answer one probe; this answers all
    of them in one bucketed plan. No counterpart in the reference
    (zero vector ops, SURVEY.md §2).

    Output: one row per (query, rank): ``<id_field>``, ``knn_rank``
    (1-based; ties on cosine break to the smaller neighbor id —
    deterministic in every engine), ``neighbor_id``, ``cos_sim``.
    Queries whose candidate set is empty simply emit no rows.
    Zero-norm vectors score cosine 0 (norms are pinned to 1 in every
    impl and in the oracle — never NaN/inf).

    method: "ivf" (default) — a deterministic coarse quantizer
    (xxhash-seeded + Lloyd refine, `_ivf_centroids`) partitions the
    INDEX side into single cells while each QUERY probes its
    ``nprobe`` nearest cells. Work is per-cell — query×index pairs
    within a cell — never all-pairs, and because the index side lands
    in exactly ONE cell each (query, index) pair arises at most once.
    The default ``impl: "cogroup"`` never materializes pair rows at
    all: a cogrouped applyInPandas runs ONE blocked numpy matmul per
    cell (queries × index of the cell) and emits each query's
    per-cell top-k as narrow (qid, iid, cos) rows — sound because a
    single-cell index makes per-cell top-k a superset filter of the
    global top-k — so the final per-query window ranks ≤ k·nprobe
    narrow candidates. ``impl: "pairs"`` keeps the explicit
    cell-join + Arrow pair-dot shape (pytest-pinned identical).
    ``nprobe == n_cells`` probes every list and is EXACT (the parity
    gate's geometry); recall tunes with nprobe and no index rebuild.

    method: "lsh" — both sides hash into ``n_tables`` ×
    ``n_planes`` sign-random-projection tables (one stacked-matmul
    Arrow kernel per side, `_multi_bucket_udf`); candidates join per
    (table, bucket) and are deduped as narrow id pairs BEFORE the
    vectors attach (the dedup_embedding_against shape — multi-table
    duplication is real here). Recall follows the standard
    amplification 1-(1-p^b)^L.

    Scale shape (either method): one bucket/cell-key shuffle for the
    candidate join + one query-id shuffle for the per-query top-k
    window — the window partitions on the high-cardinality query id,
    never globally. Cell skew is AQE-skew-join territory; IVF's Lloyd
    refine keeps cells balanced by construction.

    config: ``k`` (default 10), ``index`` (view name or DataFrame;
    default self with ``exclude_self`` defaulting true), ``field`` /
    ``id_field`` (+ ``index_field`` / ``index_id_field`` overrides),
    ``method``, IVF: ``n_cells``/``nprobe``/``refine``, LSH:
    ``dim``/``n_planes``/``n_tables``/``seed``.
    """
    field = config.get("field", "embedding")
    id_field = config.get("id_field", "vec_id")
    k = int(config.get("k", 10))
    method = config.get("method", "ivf")
    index = config.get("index")
    self_join = index is None
    if isinstance(index, str):
        index = views[index]
    idx_df = df if self_join else index
    i_field = config.get("index_field", field)
    i_id = config.get("index_id_field", id_field)
    exclude_self = bool(config.get("exclude_self", self_join))
    # NULL embeddings have no position in cosine space: they neither
    # query nor serve as neighbors (documented contract — the oracle
    # replays the same exclusion)
    df = df.filter(F.col(field).isNotNull())
    idx_df = idx_df.filter(F.col(i_field).isNotNull())

    if method == "ivf":
        n_cells = int(config.get("n_cells", 16))
        nprobe = int(config.get("nprobe", 2))
        impl = config.get("impl", "cogroup")
        cents = _ivf_centroids(
            idx_df, {**config, "field": i_field, "id_field": i_id,
                     "n_cells": n_cells})
        # index side: ONE cell each => (query, index) candidate pairs
        # arise at most once — no dedup needed in either impl
        iside = idx_df.select(
            F.col(i_id).alias("__iid"), F.col(i_field).alias("__iemb"),
            _assign_udf(cents)(F.col(i_field)).alias("__cell"))
        qside = df.select(
            F.col(id_field).alias("__qid"), F.col(field).alias("__qemb"),
            F.explode(_assign_multi_udf(cents, nprobe)(F.col(field)))
            .alias("__cell"))
        if impl == "cogroup":
            # default scale path: ONE blocked numpy matmul per cell
            # (cogrouped applyInPandas) computes every query x index
            # cosine of the cell and keeps each query's per-cell
            # top-k. Correct because the index side is single-cell:
            # any global top-k neighbor is inside its own cell's
            # top-k for that query. Pair rows with 2x wide vectors
            # are never materialized; only <= k * nprobe narrow
            # candidate rows per query reach the final window.
            scored = _knn_cells_cogroup(
                qside, iside, df.schema[id_field].dataType,
                idx_df.schema[i_id].dataType, k, exclude_self)
        elif impl == "pairs":
            # reference impl (pytest-pinned equal to cogroup): vectors
            # ride the cell join, one Arrow pair-dot per candidate.
            # Norms attach once per SIDE row (the O(dim) aggregate
            # must not re-run per candidate — review r9), zero-guarded
            # like the cogroup kernel.
            cands = (qside.withColumn("__qnorm", _safe_norm(F.col("__qemb")))
                     .join(iside.withColumn(
                         "__inorm", _safe_norm(F.col("__iemb"))), "__cell"))
            if exclude_self:
                cands = cands.filter(F.col("__qid") != F.col("__iid"))
            scored = (cands
                      .withColumn(
                          "cos_sim",
                          _pair_dot_udf(F.col("__qemb"), F.col("__iemb"))
                          / (F.col("__qnorm") * F.col("__inorm")))
                      .select("__qid", "__iid", "cos_sim"))
        else:
            raise ValueError(
                f"knn_join impl must be cogroup|pairs, got {impl!r}")
    elif method == "lsh":
        dim = int(config.get("dim", 64))
        n_planes = int(config.get("n_planes", 12))
        n_tables = int(config.get("n_tables", 1))
        seed = int(config.get("seed", 42))
        multi = _multi_bucket_udf(dim, n_planes, seed, n_tables)
        qb = df.select(F.col(id_field).alias("__qid"),
                       F.posexplode(multi(F.col(field)))
                       .alias("__tbl", "__bkt"))
        ib = idx_df.select(F.col(i_id).alias("__iid"),
                           F.posexplode(multi(F.col(i_field)))
                           .alias("__tbl", "__bkt"))
        cands = (qb.join(ib, ["__tbl", "__bkt"])
                 .select("__qid", "__iid")
                 .dropDuplicates(["__qid", "__iid"]))
        if exclude_self:
            cands = cands.filter(F.col("__qid") != F.col("__iid"))
        qside = df.select(F.col(id_field).alias("__qid"),
                          F.col(field).alias("__qemb"),
                          _safe_norm(F.col(field)).alias("__qnorm"))
        iside = idx_df.select(F.col(i_id).alias("__iid"),
                              F.col(i_field).alias("__iemb"),
                              _safe_norm(F.col(i_field)).alias("__inorm"))
        scored = (cands.join(qside, "__qid").join(iside, "__iid")
                  .withColumn("cos_sim",
                              _pair_dot_udf(F.col("__qemb"), F.col("__iemb"))
                              / (F.col("__qnorm") * F.col("__inorm")))
                  # narrow BEFORE the per-query window: the rank
                  # shuffle must never carry the wide vectors
                  .select("__qid", "__iid", "cos_sim"))
    else:
        raise ValueError(f"knn_join method must be ivf|lsh, got {method!r}")

    from pyspark.sql import Window
    w = Window.partitionBy("__qid").orderBy(
        F.col("cos_sim").desc(), F.col("__iid"))
    return (scored
            .withColumn("knn_rank", F.row_number().over(w))
            .filter(F.col("knn_rank") <= k)
            .select(F.col("__qid").alias(id_field), "knn_rank",
                    F.col("__iid").alias("neighbor_id"), "cos_sim"))


@F.pandas_udf(T.DoubleType())
def _pair_dot_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batched pair dot products: one einsum per Arrow batch. Catalyst
    higher-order functions (zip_with+aggregate) are interpreted per
    element — for 64-dim pairs the numpy kernel is ~5x faster."""
    if len(a) == 0:
        return pd.Series([], dtype="float64")
    ma = np.vstack(a.to_numpy()).astype(np.float64)
    mb = np.vstack(b.to_numpy()).astype(np.float64)
    return pd.Series(np.einsum("ij,ij->i", ma, mb))


@register("similarity_join")
def op_similarity_join(df: DataFrame, config: Mapping, views) -> DataFrame:
    """All pairs with cosine >= threshold, via LSH buckets: pairwise
    work runs inside buckets (shuffle on bucket id), never across the
    corpus. The embedding-cosine near-dup primitive. Norms are
    computed once per vector JVM-side; the per-pair dot products run
    as an Arrow-batched numpy kernel.

    ``n_tables: L`` (default 1) unions candidates from L independent
    hash tables (distinct hyperplane seeds). One table recalls a pair
    at angle theta with probability (1-theta/pi)^n_planes — low for
    moderate similarities — while L tables recall 1-(1-p^b)^L, the
    standard amplification. Candidate ids are deduped across tables
    BEFORE embeddings are attached, so the exact-verification work is
    per unique pair and the wide vectors never ride the union."""
    field = config.get("field", "embedding")
    id_field = config.get("id_field", "vec_id")
    threshold = float(config.get("threshold", 0.9))
    n_tables = int(config.get("n_tables", 1))
    seed = int(config.get("seed", 42))
    norm = F.sqrt(F.aggregate(
        F.transform(F.col(field), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))

    def verified(cands: DataFrame) -> DataFrame:
        # norms computed once per vector, not once per candidate pair
        sides = df.select(F.col(id_field).alias("__id"),
                          F.col(field).alias("__emb"), norm.alias("__norm"))
        return (
            cands
            .join(sides.select(F.col("__id").alias("id_a"),
                               F.col("__emb").alias("emb_a"),
                               F.col("__norm").alias("norm_a")), "id_a")
            .join(sides.select(F.col("__id").alias("id_b"),
                               F.col("__emb").alias("emb_b"),
                               F.col("__norm").alias("norm_b")), "id_b")
            .withColumn("cos_sim",
                        _pair_dot_udf(F.col("emb_a"), F.col("emb_b"))
                        / (F.col("norm_a") * F.col("norm_b")))
            .filter(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", "cos_sim")
        )

    if n_tables <= 1:
        # single-table fast path: embeddings ride the one bucket join
        # directly, and no pair-dedup is needed — each vector lands in
        # exactly one lsh_bucket, so the self-join emits every
        # (id_a, id_b) at most once (contrast near_dup_minhash, where
        # multi-band duplication is real).
        bucketed = op_lsh_bucket(df, config, views).select(
            F.col(id_field).alias("__id"), F.col(field).alias("__emb"),
            norm.alias("__norm"), "lsh_bucket")
        left = bucketed.select(F.col("__id").alias("id_a"),
                               F.col("__emb").alias("emb_a"),
                               F.col("__norm").alias("norm_a"), "lsh_bucket")
        right = bucketed.select(F.col("__id").alias("id_b"),
                                F.col("__emb").alias("emb_b"),
                                F.col("__norm").alias("norm_b"), "lsh_bucket")
        return (
            left.join(right, "lsh_bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cos_sim",
                        _pair_dot_udf(F.col("emb_a"), F.col("emb_b"))
                        / (F.col("norm_a") * F.col("norm_b")))
            .filter(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", "cos_sim")
        )

    # multi-table: ONE corpus scan computes all L bucket ids (stacked
    # hyperplanes, single matmul per Arrow batch), then a posexplode to
    # (id, table, bucket) — narrow rows — and ONE self-join shuffled on
    # (table, bucket), exactly the minhash-band shape. Cross-table
    # dedup shuffles only the (id, id) candidate stream; the wide
    # vectors never ride the explosion.
    dim = int(config.get("dim", 64))
    n_planes = int(config.get("n_planes", 12))
    multi = _multi_bucket_udf(dim, n_planes, seed, n_tables)
    # repartition on the (table, bucket) key: both self-join branches
    # share one exchange — and one bucket-kernel pass over the corpus
    b = (df.select(F.col(id_field).alias("__id"),
                   F.posexplode(multi(F.col(field))).alias("__tbl", "__bkt"))
         .repartition("__tbl", "__bkt"))
    cands = (
        b.select(F.col("__id").alias("id_a"), "__tbl", "__bkt")
        .join(b.select(F.col("__id").alias("id_b"), "__tbl", "__bkt"),
              ["__tbl", "__bkt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return verified(cands)


@register("dedup_embedding")
def op_dedup_embedding(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Embedding-cosine near-dedup: drop rows whose embedding is
    within threshold of a smaller-id row (same greedy policy as
    dedup_near_minhash)."""
    id_field = config.get("id_field", "vec_id")
    pairs = op_similarity_join(df, config, views)
    losers = pairs.select(F.col("id_b").alias(id_field)).dropDuplicates()
    return df.join(losers, id_field, "left_anti")


@register("dedup_embedding_groups")
def op_dedup_embedding_groups(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Transitive embedding near-dedup: cosine pairs -> connected
    components -> keep the minimum id per cluster. Survivors are
    well-defined across similarity chains (a~b~c), unlike the greedy
    pairwise policy."""
    from .dedup import op_connected_components

    id_field = config.get("id_field", "vec_id")
    pairs = op_similarity_join(df, config, views)
    comps = op_connected_components(pairs, config, views)
    losers = comps.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_field))
    return df.join(losers, id_field, "left_anti")


@register("dedup_embedding_against")
def op_dedup_embedding_against(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Incremental embedding near-dedup: drop batch rows whose
    embedding is within cosine ``threshold`` of ANY vector in a
    HISTORY corpus — the semantic complement of ``dedup_against``
    (fingerprints) and ``dedup_near_against`` (minhash bands), closing
    the incremental-dedup family for vector columns. The reference has
    no incremental or vector notion at all (SURVEY.md §2).

    Shape at scale: both sides hash into the SAME ``n_tables`` ×
    ``n_planes`` sign-random-projection tables (one stacked-matmul
    Arrow kernel per side), candidates join on (table, bucket) —
    batch×history work is per-bucket, never all-pairs — then exact
    cosine verifies each deduped candidate pair. Only ids ride the
    bucket join; the wide vectors attach per unique candidate pair
    afterwards. For a 4× narrower history, store
    ``quantize_embedding`` output and ``dequantize_embedding`` it as
    the ``history`` input — buckets and cosines are recomputed from
    the dequantized vectors, so no raw-fp32 history is ever re-read.

    config: ``history`` (view/DataFrame), ``history_field`` /
    ``history_id_field`` (default: same as batch), ``threshold``,
    ``dim``, ``n_planes``, ``n_tables``, ``seed`` as similarity_join.
    Recall follows the standard amplification 1-(1-p^b)^L; a
    low-planes/many-tables config (e.g. 2×30) is a recall~1 parity
    geometry the oracle can check exactly.
    """
    field = config.get("field", "embedding")
    id_field = config.get("id_field", "vec_id")
    threshold = float(config.get("threshold", 0.9))
    dim = int(config.get("dim", 64))
    n_planes = int(config.get("n_planes", 12))
    n_tables = int(config.get("n_tables", 1))
    seed = int(config.get("seed", 42))
    history = config["history"]
    if isinstance(history, str):
        history = views[history]
    h_field = config.get("history_field", field)
    h_id = config.get("history_id_field", id_field)

    multi = _multi_bucket_udf(dim, n_planes, seed, n_tables)
    bb = df.select(F.col(id_field).alias("__bid"),
                   F.posexplode(multi(F.col(field))).alias("__tbl", "__bkt"))
    hb = history.select(F.col(h_id).alias("__hid"),
                        F.posexplode(multi(F.col(h_field)))
                        .alias("__tbl", "__bkt"))
    cands = (bb.join(hb, ["__tbl", "__bkt"])
             .select("__bid", "__hid")
             .dropDuplicates(["__bid", "__hid"]))
    bside = df.select(F.col(id_field).alias("__bid"),
                      F.col(field).alias("__bemb"),
                      _norm_of(F.col(field)).alias("__bnorm"))
    hside = history.select(F.col(h_id).alias("__hid"),
                           F.col(h_field).alias("__hemb"),
                           _norm_of(F.col(h_field)).alias("__hnorm"))
    hits = (cands.join(bside, "__bid").join(hside, "__hid")
            .withColumn("__cos",
                        _pair_dot_udf(F.col("__bemb"), F.col("__hemb"))
                        / (F.col("__bnorm") * F.col("__hnorm")))
            .filter(F.col("__cos") >= threshold)
            .select(F.col("__bid").alias(id_field))
            .dropDuplicates())
    return df.join(hits, id_field, "left_anti")


@register("embedding_outlier")
def op_embedding_outlier(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Centroid-similarity scoring — the SemDeDup / prototype-distance
    curation signal: each vector's cosine similarity to its group's
    centroid (global when ``by`` is unset, else per-``by`` column,
    e.g. a cluster id from ivf_assign or a source label). Low
    ``centroid_sim`` = semantic outlier; near-1 = redundant
    prototype mass. No counterpart in the reference (zero vector ops,
    SURVEY.md §2).

    Determinism at any partitioning: each element is quantized to a
    scaled long — floor(x * 10^6) — and summed as exact int64 (float
    reduction order varies with partitioning; float→decimal casts
    drift between engines at repr ties, see q_embedding_stats — floor
    of a double is the one tie-free fixed-point both engines agree
    on bit-for-bit). Cosine is taken against the quantized SUM
    vector, which equals cosine against the quantized mean because
    cosine is scale-invariant — so no division is ever needed and
    DuckDB reproduces the score exactly. The 1e-6 quantization error
    on the centroid is ~1e-5 relative for unit-ish embeddings —
    noise for a curation score (``scale`` overrides the default).

    Scale shape: one map-side-partial aggregation to k×dim longs
    (k = group count), broadcast back, one codegen'd cosine per row.
    No per-row Python, no driver collect of vectors.

    ``mode: "filter"`` keeps rows with centroid_sim >= ``min_sim``
    (drop outliers); ``max_sim`` instead/also drops redundant
    near-prototype rows (SemDeDup proper). Default annotates.
    """
    field = config.get("field", "embedding")
    dim = int(config.get("dim") or 0)
    if dim < 1:
        raise ValueError("embedding_outlier requires dim (vector length)")
    by = config.get("by")
    mode = config.get("mode", "annotate")
    if mode not in ("annotate", "filter"):
        raise ValueError(f"embedding_outlier mode must be annotate|filter, got {mode!r}")

    keys = [by] if by else []
    scale = float(config.get("scale", 1e6))
    # scaled-long per-dim sums: exact int64 arithmetic, deterministic
    # under any partition order, no decimal repr ties. |sum| stays
    # far under 2^53 for unit-ish embeddings, so the final
    # long->double centroid cast is exact.
    sums = df.groupBy(*keys).agg(*[
        F.sum(F.floor(F.col(field)[i].cast("double") * F.lit(scale)))
        .alias(f"__s{i}") for i in range(dim)])
    centroid = sums.select(
        *keys,
        F.array(*[F.col(f"__s{i}").cast("double")
                  for i in range(dim)]).alias("__centroid"))
    if keys:
        # NULL-safe joinback: a NULL `by` key forms a regular group in
        # the aggregation above; a plain equi-join would drop its
        # centroid match and NULL-score the whole group
        from ..operators.relational import _nullsafe_left_join
        out = _nullsafe_left_join(df, centroid, keys)
    else:
        out = df.crossJoin(F.broadcast(centroid))
    out = out.withColumn(
        "centroid_sim", cosine_col(F.col(field), F.col("__centroid"))
    ).drop("__centroid")
    if mode == "filter":
        cond = F.lit(True)
        if "min_sim" in config:
            cond = cond & (F.col("centroid_sim") >= float(config["min_sim"]))
        if "max_sim" in config:
            cond = cond & (F.col("centroid_sim") <= float(config["max_sim"]))
        return out.filter(cond).drop("centroid_sim")
    return out


@register("quantize_embedding")
def op_quantize_embedding(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Scalar quantization of an embedding column — the fp32 -> intN
    storage path for 100 TB vector corpora (4x smaller at 8 bits
    before compression, and parquet dictionary/RLE bites much harder
    on small ints). Each dimension quantizes independently:
    q = clamp(floor((x - lo_d) / (hi_d - lo_d) * (2^bits - 1))).

    Per-dim bounds come from an exact min/max aggregation (min/max
    are reduction-order-independent, so the codebook is deterministic
    at any partitioning — no decimal machinery needed), or pass
    ``bounds: [lo, hi]`` to apply one global range with zero extra
    passes (the profile-then-quantize production shape). The bounds
    used are attached as ``q_lo``/``q_hi`` array columns so
    dequantize_embedding is self-contained.

    floor() on identical IEEE doubles is tie-free in every engine —
    the quantized codes are exactly reproducible (oracle-checked).
    NULL embeddings stay NULL.
    """
    field = config.get("field", "embedding")
    dim = int(config.get("dim") or 0)
    if dim < 1:
        raise ValueError("quantize_embedding requires dim (vector length)")
    bits = int(config.get("bits", 8))
    if not 1 <= bits <= 16:
        raise ValueError(f"bits={bits} out of range (1..16)")
    levels = (1 << bits) - 1
    out_field = config.get("as", field)

    bounds = config.get("bounds")
    if bounds is not None:
        lo_arr = F.array(*[F.lit(float(bounds[0]))] * dim)
        hi_arr = F.array(*[F.lit(float(bounds[1]))] * dim)
        src = df
    else:
        agg = df.agg(*(
            [F.min(F.col(field)[i].cast("double")).alias(f"__lo{i}")
             for i in range(dim)]
            + [F.max(F.col(field)[i].cast("double")).alias(f"__hi{i}")
               for i in range(dim)]))
        code = agg.select(
            F.array(*[F.col(f"__lo{i}") for i in range(dim)]).alias("__lo"),
            F.array(*[F.col(f"__hi{i}") for i in range(dim)]).alias("__hi"))
        src = df.crossJoin(F.broadcast(code))
        lo_arr, hi_arr = F.col("__lo"), F.col("__hi")

    x = F.transform(F.col(field), lambda v: v.cast("double"))
    width = F.zip_with(hi_arr, lo_arr, lambda h, l:
                       F.when(h > l, h - l).otherwise(F.lit(1.0)))
    shifted = F.zip_with(x, lo_arr, lambda v, l: v - l)
    q = F.zip_with(shifted, width, lambda s, w: F.least(
        F.greatest(F.floor(s / w * F.lit(float(levels))), F.lit(0)),
        F.lit(levels)).cast("int"))
    out = (src.withColumns({"q_lo": lo_arr, "q_hi": hi_arr})
           .withColumn(out_field, q))
    return out.drop("__lo", "__hi")


@register("dequantize_embedding")
def op_dequantize_embedding(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Inverse of quantize_embedding: midpoint reconstruction
    x ~ lo_d + (q + 0.5) * (hi_d - lo_d) / (2^bits - 1), reading the
    ``q_lo``/``q_hi`` codebook columns the quantizer attached.
    Reconstruction error is bounded by half a quantization step per
    dimension (property-tested)."""
    field = config.get("field", "embedding")
    bits = int(config.get("bits", 8))
    levels = float((1 << bits) - 1)
    out_field = config.get("as", field)
    lo, hi = F.col("q_lo"), F.col("q_hi")
    width = F.zip_with(hi, lo, lambda h, l:
                       F.when(h > l, h - l).otherwise(F.lit(1.0)))
    recon = F.zip_with(
        F.zip_with(F.col(field), width, lambda q, w:
                   (q.cast("double") + F.lit(0.5)) * w / F.lit(levels)),
        lo, lambda v, l: v + l)
    return df.withColumn(out_field, recon).drop("q_lo", "q_hi")
