"""Similarity search over an embedding column (array<float>).

* brute_force_topk — exact cosine top-k: the query matrix is broadcast
  (small), each corpus partition computes a (batch x queries) GEMM in
  numpy inside mapInPandas and emits per-partition top-k candidates, then
  a single small groupBy merges them. Shuffle volume is O(queries * k *
  partitions), never O(corpus).
* ivf_build / ivf_query — the persisted IVF scale path: k-means centroids
  fitted on a CROSS-PARTITION sample (engine.plan.sample_table — no
  first-partition bias), every row assigned to its nearest cell in one
  distributed pass, and the index written as a cell-partitioned parquet
  table (one file per cell via repartition-by-cell). Queries then read
  ONLY their nprobe probed cells — partition pruning at the scan, no
  re-assignment of the corpus per query pass.
* ivf_topk — one-shot convenience wrapper (fit + assign + probe in a
  single pass, nothing persisted) for ad-hoc queries; same math.
  Recall < 1.0 by construction; the brute-force path is the correctness
  baseline.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _emb_matrix(series: pd.Series) -> np.ndarray:
    return np.vstack([np.asarray(v, dtype=np.float64) for v in series])


def brute_force_topk(df: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id",
                     emb_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k of each query against the corpus.

    Returns (query_id, neighbor_id, rank, cosine), self-matches excluded.
    """
    spark = df.sparkSession
    q_rows = queries.select(id_col, emb_col).collect()  # queries are small
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q_mat = _normalize(np.vstack([np.asarray(r[emb_col], dtype=np.float64)
                                  for r in q_rows]))
    bq = spark.sparkContext.broadcast((q_ids, q_mat))

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c = _normalize(_emb_matrix(pdf[emb_col]))
            sims = c @ mat.T  # (batch, queries)
            cid = pdf[id_col].values.astype(np.int64)
            out = []
            kk = min(k + 1, len(pdf))  # +1 to survive self-match removal
            for j in range(len(ids)):
                top = np.argpartition(-sims[:, j], kk - 1)[:kk]
                out.append(pd.DataFrame({
                    "query_id": ids[j],
                    "neighbor_id": cid[top],
                    "cosine": sims[top, j],
                }))
            yield pd.concat(out, ignore_index=True)

    partials = df.select(id_col, emb_col).mapInPandas(
        partial, "query_id long, neighbor_id long, cosine double")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (partials
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cosine"))


def cosine_neardup_pairs(df: DataFrame, queries: DataFrame,
                         threshold: float = 0.9, id_col: str = "vec_id",
                         emb_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (query_id, neighbor_id) with
    cosine >= threshold, neighbor != query. Same broadcast-GEMM shape as
    brute_force_topk but threshold-filtered inside the partition, so only
    matches cross the wire."""
    spark = df.sparkSession
    q_rows = queries.select(id_col, emb_col).collect()
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q_mat = _normalize(np.vstack([np.asarray(r[emb_col], dtype=np.float64)
                                  for r in q_rows]))
    bq = spark.sparkContext.broadcast((q_ids, q_mat, float(threshold)))

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat, thr = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c = _normalize(_emb_matrix(pdf[emb_col]))
            sims = c @ mat.T
            cid = pdf[id_col].values.astype(np.int64)
            rows, cols = np.nonzero(sims >= thr)
            if len(rows) == 0:
                continue
            yield pd.DataFrame({"query_id": ids[cols],
                                "neighbor_id": cid[rows],
                                "cosine": sims[rows, cols]})

    out = df.select(id_col, emb_col).mapInPandas(
        partial, "query_id long, neighbor_id long, cosine double")
    return (out.filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id", "cosine"))


def _kmeans_fit(sample: np.ndarray, n_clusters: int, iters: int = 10,
                seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), n_clusters, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(_normalize(sample) @ _normalize(cent).T, axis=1)
        for c in range(n_clusters):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def _distributed_sample(df: DataFrame, emb_col: str,
                        sample_rows: int) -> np.ndarray:
    """Cross-partition embedding sample (no first-partition bias): reuses
    the engine's plan sampler (bounded head takes from up to 64
    evenly-strided partitions)."""
    from ..engine.plan import sample_table

    tbl = sample_table(df.select(emb_col), sample_rows)
    return _emb_matrix(pd.Series(tbl.column(0).to_pylist()))


def _query_matrix(queries: DataFrame, id_col: str, emb_col: str):
    q_rows = queries.select(id_col, emb_col).collect()  # queries are small
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q_mat = _normalize(np.vstack([np.asarray(r[emb_col], dtype=np.float64)
                                  for r in q_rows]))
    return q_ids, q_mat


def _topk_merge(partials: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (partials
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cosine"))


def ivf_build(df: DataFrame, path: str, n_clusters: int = 16,
              id_col: str = "vec_id", emb_col: str = "embedding",
              sample_rows: int = 10_000, seed: int = 7,
              centroids: Optional[np.ndarray] = None) -> np.ndarray:
    """Fit centroids on a distributed sample, assign every row to its
    nearest cell in ONE pass, and persist the index:

      <path>/centroids  — (cell, centroid) parquet, driver-small
      <path>/cells      — the corpus partitioned BY CELL (one file per
                          cell via repartition-by-cell), so a query pass
                          scans only its probed cells (partition pruning)

    centroids: optional pre-fitted/deterministic centroid matrix
    (n_clusters x dim) — skips the sample + k-means fit. Besides reusing
    an external fit, this is what makes the index SQL-recomputable for
    the correctness oracle (e.g. centroids = the first n_clusters corpus
    vectors: cell assignment and probing become plain cosine argmax,
    expressible in DuckDB).

    Returns the (normalized) centroid matrix."""
    spark = df.sparkSession
    if centroids is not None:
        cent = _normalize(np.asarray(centroids, dtype=np.float64))
        n_clusters = len(cent)
    else:
        sample = _distributed_sample(df, emb_col, sample_rows)
        cent = _normalize(_kmeans_fit(sample, n_clusters, seed=seed))
    bc = spark.sparkContext.broadcast(cent)
    emb_t = df.schema[emb_col].dataType.simpleString()

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = _normalize(_emb_matrix(pdf[emb_col]))
            out = pdf[[id_col, emb_col]].copy()
            out["cell"] = np.argmax(m @ c_.T, axis=1).astype(np.int32)
            yield out

    assigned = df.select(id_col, emb_col).mapInPandas(
        assign, f"{id_col} long, {emb_col} {emb_t}, cell int")
    (assigned.repartition(F.col("cell"))
     .write.mode("overwrite").partitionBy("cell")
     .parquet(f"{path}/cells"))
    cent_pdf = pd.DataFrame({"cell": range(n_clusters),
                             "centroid": [c.tolist() for c in cent]})
    (spark.createDataFrame(cent_pdf)
     .write.mode("overwrite").parquet(f"{path}/centroids"))
    return cent


def ivf_query(spark, path: str, queries: DataFrame, k: int = 5,
              nprobe: int = 4, id_col: str = "vec_id",
              emb_col: str = "embedding") -> DataFrame:
    """Probe a persisted IVF index: reads ONLY the nprobe cells each query
    needs (cell is a parquet partition column — the scan prunes the rest),
    GEMMs per partition, merges per-partition top-k."""
    cent_rows = spark.read.parquet(f"{path}/centroids").collect()
    cent = np.vstack([np.asarray(r["centroid"], dtype=np.float64)
                      for r in sorted(cent_rows, key=lambda r: r["cell"])])
    q_ids, q_mat = _query_matrix(queries, id_col, emb_col)
    q_cells = np.argsort(-(q_mat @ cent.T), axis=1)[:, :nprobe]
    needed = sorted({int(c) for row in q_cells for c in row})
    idx = (spark.read.parquet(f"{path}/cells")
           .where(F.col("cell").isin(needed)))
    bq = spark.sparkContext.broadcast((q_ids, q_mat, q_cells))

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat, cells = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c = _normalize(_emb_matrix(pdf[emb_col]))
            cid = pdf[id_col].values.astype(np.int64)
            cell = pdf["cell"].values
            out = []
            for j in range(len(ids)):
                probe_mask = np.isin(cell, cells[j])
                if not probe_mask.any():
                    continue
                sub = c[probe_mask]
                sims = sub @ mat[j]
                kk = min(k + 1, len(sub))
                top = np.argpartition(-sims, kk - 1)[:kk]
                out.append(pd.DataFrame({
                    "query_id": ids[j],
                    "neighbor_id": cid[probe_mask][top],
                    "cosine": sims[top],
                }))
            if out:
                yield pd.concat(out, ignore_index=True)

    partials = idx.select(id_col, emb_col, "cell").mapInPandas(
        partial, "query_id long, neighbor_id long, cosine double")
    return _topk_merge(partials, k)


def ivf_topk(df: DataFrame, queries: DataFrame, k: int = 5,
             n_clusters: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", emb_col: str = "embedding",
             sample_rows: int = 10_000) -> DataFrame:
    """One-shot IVF (fit + assign + probe in one pass, nothing persisted).
    For repeated query passes build the index once with ivf_build and
    probe it with ivf_query instead."""
    spark = df.sparkSession
    sample = _distributed_sample(df, emb_col, sample_rows)
    cent = _normalize(_kmeans_fit(sample, n_clusters))
    q_rows = queries.select(id_col, emb_col).collect()
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q_mat = _normalize(np.vstack([np.asarray(r[emb_col], dtype=np.float64)
                                  for r in q_rows]))
    # per query: the nprobe nearest cells
    q_cells = np.argsort(-(q_mat @ cent.T), axis=1)[:, :nprobe]
    bq = spark.sparkContext.broadcast((q_ids, q_mat, cent, q_cells))

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat, centroids, cells = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c = _normalize(_emb_matrix(pdf[emb_col]))
            cid = pdf[id_col].values.astype(np.int64)
            assign = np.argmax(c @ centroids.T, axis=1)
            out = []
            for j in range(len(ids)):
                probe_mask = np.isin(assign, cells[j])
                if not probe_mask.any():
                    continue
                sub = c[probe_mask]
                sims = sub @ mat[j]
                kk = min(k + 1, len(sub))
                top = np.argpartition(-sims, kk - 1)[:kk]
                out.append(pd.DataFrame({
                    "query_id": ids[j],
                    "neighbor_id": cid[probe_mask][top],
                    "cosine": sims[top],
                }))
            if out:
                yield pd.concat(out, ignore_index=True)

    partials = df.select(id_col, emb_col).mapInPandas(
        partial, "query_id long, neighbor_id long, cosine double")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (partials
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cosine"))


def _hyperplane_sign(j: int, k: int) -> int:
    """Deterministic balanced ±1 pattern (Rademacher-style hyperplanes):
    pure integer arithmetic so a SQL oracle reproduces it exactly."""
    return 1 if (j * 1009 + k * 613) % 2027 < 1013 else -1


def hyperplane_lsh_signatures(df: DataFrame, emb_col: str = "embedding",
                              id_col: str = "vec_id",
                              n_bits: int = 16,
                              dim: int = 64) -> DataFrame:
    """Random-hyperplane (SimHash-for-vectors) signatures, the classic
    cosine LSH: bit j = sign of the projection of the embedding onto a
    fixed ±1 hyperplane. Projections are computed on FLOOR-quantized
    integer components (floor(x * 2^20)) with JVM expressions only, so
    the whole signature is bit-exactly reproducible in SQL — no float
    summation-order hazard between engines — while preserving the LSH
    property (quantization error ~1e-6 of the component scale).

    Returns (id, simhash, band0..band3) with 4 bands of n_bits/4 bits:
    vectors within small angle collide in >=1 band with high probability.
    Scale shape: pure per-row expressions + the band equi-join, no
    driver data, no Python workers."""
    q = F.transform(F.col(emb_col),
                    lambda x: F.floor(x.cast("double") * F.lit(1048576.0))
                    .cast("long"))
    df = df.select(F.col(id_col), q.alias("__q"))
    bit_cols = []
    for j in range(n_bits):
        signs = F.array(*[F.lit(_hyperplane_sign(j, k)).cast("long")
                          for k in range(dim)])
        dot = F.aggregate(
            F.zip_with(F.col("__q"), signs, lambda a, b: a * b),
            F.lit(0).cast("long"), lambda acc, x: acc + x)
        bit_cols.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0))
                        .cast("long").alias(f"b{j}"))
    sig = df.select(F.col(id_col), *bit_cols)
    packed = None
    for j in range(n_bits):
        term = F.shiftleft(F.col(f"b{j}"), j)
        packed = term if packed is None else packed.bitwiseOR(term)
    out = sig.select(F.col(id_col), packed.alias("simhash"))
    bits_per_band = n_bits // 4
    mask = (1 << bits_per_band) - 1
    for band in range(4):
        out = out.withColumn(
            f"band{band}",
            F.shiftright(F.col("simhash"), band * bits_per_band)
            .bitwiseAND(F.lit(mask)))
    return out


def hyperplane_neardup_pairs(df: DataFrame, emb_col: str = "embedding",
                             id_col: str = "vec_id", n_bits: int = 16,
                             dim: int = 64) -> DataFrame:
    """Candidate near-dup pairs via hyperplane-LSH banding: ids sharing a
    band value are candidates (a < b, deduped across bands), with the
    hamming distance of their full signatures attached (integer — exact
    cross-engine compare). The production post-step is exact cosine on
    the candidates only (cosine_neardup_pairs shape)."""
    sigs = hyperplane_lsh_signatures(df, emb_col, id_col, n_bits, dim)
    pairs = None
    for band in range(4):
        left = sigs.select(F.col(id_col).alias("a"),
                           F.col("simhash").alias("sig_a"),
                           F.col(f"band{band}").alias("k"))
        right = sigs.select(F.col(id_col).alias("b"),
                            F.col("simhash").alias("sig_b"),
                            F.col(f"band{band}").alias("k"))
        p = (left.join(right, "k").filter(F.col("a") < F.col("b"))
             .select("a", "b", "sig_a", "sig_b"))
        pairs = p if pairs is None else pairs.unionAll(p)
    pairs = pairs.dropDuplicates(["a", "b"])
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (pairs.withColumn("hamming", ham.cast("long"))
            .select("a", "b", "hamming"))
