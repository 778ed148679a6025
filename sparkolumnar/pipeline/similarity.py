"""Similarity search over an embedding column (array<float>).

* brute_force_topk — exact cosine top-k: the query matrix is broadcast
  (small), each corpus partition computes a (batch x queries) GEMM in
  numpy inside mapInPandas and emits per-partition top-k candidates, then
  a single small groupBy merges them. Shuffle volume is O(queries * k *
  partitions), never O(corpus).
* ivf_topk — IVF scale path: k-means centroids fitted on a driver-side
  sample (numpy), broadcast; each row is assigned to its nearest centroid
  JVM-free inside the same GEMM pass; queries probe only the nprobe
  nearest cells. Recall < 1.0 by construction; the brute-force path is
  the correctness baseline.
"""

from __future__ import annotations

from typing import Iterator

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


def ivf_topk(df: DataFrame, queries: DataFrame, k: int = 5,
             n_clusters: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", emb_col: str = "embedding",
             sample_rows: int = 10_000) -> DataFrame:
    """Approximate cosine top-k via inverted-file (IVF) cells.

    At 10^12 scale the cell assignment becomes a bucketed table; here the
    assignment happens in the same pass and the probe filter cuts the GEMM
    to nprobe/n_clusters of the corpus.
    """
    spark = df.sparkSession
    sample = _emb_matrix(
        pd.Series([r[emb_col] for r in df.select(emb_col).limit(sample_rows).collect()]))
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
