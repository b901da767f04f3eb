"""Similarity search over the embeddings table (list<float> column).

Baseline: brute-force cosine top-k — a broadcast query matrix and one numpy
matmul per batch (zero-copy Arrow list column -> 2D float array). Scale
path: IVF — cluster embeddings once (deterministic seeded k-means), route
each query to the nprobe nearest centroids, search only those partitions;
the partition assignment is the shuffle key.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column -> (n, dim) float64 matrix, zero-copy flatten."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    n = len(col)
    return flat.reshape(n, -1).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def ann_topk(sf_dir: str, k: int = 10, query_vec_id: int = 0) -> rd.Dataset:
    """Brute-force cosine top-k for one query vector (the oracle baseline).

    The query is broadcast via ray.put; each batch computes a vectorized
    matmul and emits only its local top-k (combiner), so the final sort
    moves k rows per batch, not the corpus.
    """
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    qsel = qt.filter(pc.equal(qt["vec_id"], query_vec_id))
    q = _normalize(_to_matrix(qsel["embedding"]))[0]
    q_ref = ray.put(q)

    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])

    def local_topk(t: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        m = _normalize(_to_matrix(t["embedding"]))
        cos = m @ qv
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -cos))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[order], pa.int64()),
                "cos": pa.array(cos[order], pa.float64()),
            }
        )

    def round_cos(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("cos"),
            "cos",
            pa.array(np.round(t["cos"].to_numpy(zero_copy_only=False), 6)),
        )

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .sort([("cos"), ("vec_id")], descending=[True, False])
        .limit(k)
        .map_batches(round_cos, batch_format="pyarrow")
    )


def knn_batch(sf_dir: str, n_queries: int = 5, k: int = 3) -> rd.Dataset:
    """k-NN for the first ``n_queries`` vec_ids against the whole table
    (excluding self): one broadcast query MATRIX, one matmul per batch,
    per-batch local top-k per query, tiny global merge."""
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    mask = pc.less(qt["vec_id"], n_queries)
    qsel = qt.filter(mask)
    q_ids = qsel["vec_id"].to_numpy(zero_copy_only=False)
    Q = _normalize(_to_matrix(qsel["embedding"]))
    q_ref = ray.put((q_ids, Q))

    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])

    def local(t: pa.Table) -> pa.Table:
        qids, qm = ray.get(q_ref)
        m = _normalize(_to_matrix(t["embedding"]))
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        sims = m @ qm.T  # (batch, nq)
        out_q, out_n, out_c = [], [], []
        for col, qid in enumerate(qids):
            cos = sims[:, col]
            keep = ids != qid
            cids = ids[keep]
            ccos = cos[keep]
            order = np.lexsort((cids, -ccos))[:k]
            out_q.extend([int(qid)] * len(order))
            out_n.extend(cids[order].tolist())
            out_c.extend(ccos[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )

    import pandas as pd

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        g["cos"] = np.round(g["cos"].to_numpy(), 6)
        return g

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge, batch_format="pandas")
        .sort(["query_id", "rank"])
    )


# ---------------------------------------------------------------------------
# IVF (the scale path)
# ---------------------------------------------------------------------------


def _kmeans_fit(X: np.ndarray, n_clusters: int, seed: int = 11, iters: int = 10):
    """Small deterministic k-means (numpy); at scale fit on a sample."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)
    C = X[np.sort(idx)].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                C[c] = X[m].mean(axis=0)
    return C


def ann_ivf(sf_dir: str, k: int = 10, query_vec_id: int = 0,
            n_clusters: int = 8, nprobe: int = 2) -> rd.Dataset:
    """IVF cosine top-k: partition vectors by nearest centroid (the shuffle
    key), search only the ``nprobe`` centroids nearest the query.

    Centroids are fit deterministically on a driver-side sample (at 100 TB:
    fit on ds.random_sample, broadcast centroids, assign in map_batches).
    Approximate by construction; recall vs brute force is asserted in tests.
    """
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    t = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    X = _normalize(_to_matrix(t["embedding"]))
    C = _kmeans_fit(X, n_clusters)
    C = _normalize(C)
    qv = X[t["vec_id"].to_numpy(zero_copy_only=False).tolist().index(query_vec_id)]
    probe = np.argsort(-(C @ qv))[:nprobe]
    bc = ray.put((C, qv, set(int(p) for p in probe)))

    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])

    def local(tb: pa.Table) -> pa.Table:
        Cm, q, probeset = ray.get(bc)
        m = _normalize(_to_matrix(tb["embedding"]))
        ids = tb["vec_id"].to_numpy(zero_copy_only=False)
        assign = (m @ Cm.T).argmax(axis=1)
        keep = np.isin(assign, list(probeset))
        m, ids = m[keep], ids[keep]
        if len(ids) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "cos": pa.array([], pa.float64())}
            )
        cos = m @ q
        order = np.lexsort((ids, -cos))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[order], pa.int64()),
                "cos": pa.array(np.round(cos[order], 6), pa.float64()),
            }
        )

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .sort([("cos"), ("vec_id")], descending=[True, False])
        .limit(k)
    )


def embedding_near_dups(sf_dir: str, threshold: float = 0.3) -> rd.Dataset:
    """Embedding-cosine near-duplicate pairs (the dedup-family variant over
    the embeddings table): per-batch matmul against the broadcast normalized
    matrix emits only (a, b, cos) pairs above threshold — the batch never
    ships vectors through a shuffle. At corpus scale, replace the broadcast
    with IVF partitioning (see ann_ivf) so each batch only multiplies
    against its own cluster's members."""
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    t = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    all_ids = t["vec_id"].to_numpy(zero_copy_only=False)
    M = _normalize(_to_matrix(t["embedding"]))
    bc = ray.put((all_ids, M))

    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])

    def pairs(tb: pa.Table) -> pa.Table:
        ids_all, Mm = ray.get(bc)
        m = _normalize(_to_matrix(tb["embedding"]))
        ids = tb["vec_id"].to_numpy(zero_copy_only=False)
        sims = m @ Mm.T
        rows_a, rows_b, rows_c = [], [], []
        for i in range(len(ids)):
            hits = np.flatnonzero(sims[i] >= threshold)
            for j in hits:
                # emit each unordered pair once (a < b)
                if ids[i] < ids_all[j]:
                    rows_a.append(int(ids[i]))
                    rows_b.append(int(ids_all[j]))
                    rows_c.append(round(float(sims[i, j]), 6))
        return pa.table(
            {
                "a": pa.array(rows_a, pa.int64()),
                "b": pa.array(rows_b, pa.int64()),
                "cos": pa.array(rows_c, pa.float64()),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow").sort(["a", "b"])
