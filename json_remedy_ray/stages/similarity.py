"""Similarity search over an embedding column (SURVEY §2.9).

Two paths:
  - brute-force cosine top-k (functions/queries.knn_bruteforce): the
    baseline, matmul per batch against a broadcast query matrix;
  - IVF (inverted-file) variant here: k-means centroids trained on a
    deterministic driver-side sample, broadcast once, every batch
    assigned to its nearest centroid; queries probe only the
    ``nprobe`` nearest centroid partitions.  This is the scale path:
    the full matmul touches every vector, IVF touches
    ~nprobe/ncentroids of them.

  - hyperplane-LSH near-dup over embeddings: 16 seeded random
    hyperplanes -> 16-bit bucket key -> pairwise cosine within buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def _stack(col) -> np.ndarray:
    if isinstance(col, (pa.Array, pa.ChunkedArray)):
        vals = col.to_numpy(zero_copy_only=False)
    else:  # pandas Series / list
        vals = np.asarray(col, dtype=object)
    return np.stack(vals).astype(np.float64)


def train_centroids(ds: rd.Dataset, n_centroids: int = 16, sample_rows: int = 2048,
                    iters: int = 10, seed: int = 42,
                    vec_col: str = "embedding") -> np.ndarray:
    """Deterministic Lloyd's k-means on a driver-side sample (the sample is
    `limit(sample_rows)`, deterministic for a deterministic source)."""
    sample = _stack(ds.limit(sample_rows).to_pandas()[vec_col])
    sample = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    rng = np.random.RandomState(seed)
    cents = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def ivf_build(ds: rd.Dataset, centroids: np.ndarray,
              id_col: str = "vec_id", vec_col: str = "embedding") -> rd.Dataset:
    """Assign every vector to its nearest centroid (adds ``list_id``)."""
    cents_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cents_ref)
        X = _stack(batch[vec_col])
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        lid = np.argmax(Xn @ cents.T, axis=1).astype(np.int32)
        return batch.append_column("list_id", pa.array(lid, type=pa.int32()))

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=4096)


def ivf_search(indexed: rd.Dataset, centroids: np.ndarray, queries: np.ndarray,
               query_ids: np.ndarray, k: int = 10, nprobe: int = 4,
               id_col: str = "vec_id", vec_col: str = "embedding") -> pd.DataFrame:
    """Search only the ``nprobe`` nearest centroid lists per query."""
    Qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    probe = np.argsort(-(Qn @ centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    wanted_lists = sorted({int(l) for row in probe for l in row})
    q_ref = ray.put((query_ids, Qn, probe))

    wanted_arr = pa.array(wanted_lists, type=pa.int32())
    sub = indexed.map_batches(
        lambda b: b.filter(pc.is_in(b["list_id"], value_set=wanted_arr)),
        batch_format="pyarrow", batch_size=None,
    )

    def score(batch: pa.Table) -> pa.Table:
        qids, Qn_, probe_ = ray.get(q_ref)
        X = _stack(batch[vec_col])
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        vec_ids = batch[id_col].to_numpy()
        lids = batch["list_id"].to_numpy()
        rows_q, rows_n, rows_s = [], [], []
        for qi, qid in enumerate(qids):
            mask = np.isin(lids, probe_[qi]) & (vec_ids != qid)
            if not mask.any():
                continue
            sims = Xn[mask] @ Qn_[qi]
            cand = vec_ids[mask]
            top = min(k, len(cand))
            sel = np.argpartition(-sims, top - 1)[:top]
            rows_q.extend([qid] * top)
            rows_n.extend(cand[sel].tolist())
            rows_s.extend(sims[sel].tolist())
        return pa.table({
            "query_id": pa.array(rows_q, type=pa.int64()),
            "neighbor_id": pa.array(rows_n, type=pa.int64()),
            "sim": pa.array(rows_s, type=pa.float64()),
        })

    partials = sub.map_batches(score, batch_format="pyarrow", batch_size=4096)
    pdf = partials.to_pandas()
    out = (pdf.sort_values(["query_id", "sim", "neighbor_id"], ascending=[True, False, True])
              .groupby("query_id").head(k).reset_index(drop=True))
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out[["query_id", "neighbor_id", "rank"]]


def embedding_neardup_pairs(ds: rd.Dataset, threshold: float = 0.95, n_planes: int = 16,
                            seed: int = 42, id_col: str = "vec_id",
                            vec_col: str = "embedding") -> rd.Dataset:
    """Hyperplane-LSH bucketing + in-bucket cosine verification."""
    def dim_of(first_row) -> int:
        return len(first_row)

    sample = ds.limit(1).to_pandas()[vec_col].iloc[0]
    rng = np.random.RandomState(seed)
    planes = rng.randn(dim_of(sample), n_planes)
    planes_ref = ray.put(planes)

    def bucket(batch: pa.Table) -> pa.Table:
        P = ray.get(planes_ref)
        X = _stack(batch[vec_col])
        bits = (X @ P) > 0
        keys = np.zeros(len(X), dtype=np.int64)
        for b in range(bits.shape[1]):
            keys |= bits[:, b].astype(np.int64) << b
        return pa.table({
            "vec_id": batch[id_col],
            "bucket": pa.array(keys, type=pa.int64()),
            vec_col: batch[vec_col],
        })

    bucketed = ds.map_batches(bucket, batch_format="pyarrow", batch_size=4096)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        """In-bucket cosine verification.  Giant buckets are chunked (no
        silent drop — round 1 truncated at 512): rows are ordered by
        component sum so identical/near-identical vectors land adjacent,
        then verified in 512-row chunks."""
        empty = pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                              "vec_b": pd.Series([], dtype="int64"),
                              "cosine": pd.Series([], dtype="float64")})
        if len(g) < 2:
            return empty
        X_all = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        ids_all = g["vec_id"].to_numpy()
        if len(g) > 512:
            order = np.lexsort((ids_all, X_all.sum(axis=1)))
            X_all, ids_all = X_all[order], ids_all[order]
        out = []
        # 1-row chunk overlap keeps identical/adjacent vectors connected
        # across boundaries (no pair duplicated: the overlap is one row)
        for lo in range(0, max(1, len(ids_all) - 1), 511):
            ids = ids_all[lo:lo + 512]
            X = X_all[lo:lo + 512]
            ord2 = np.argsort(ids)
            ids, X = ids[ord2], X[ord2]
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            sims = Xn @ Xn.T
            ai, bj = np.nonzero(np.triu(sims >= threshold, k=1))
            if len(ai):
                out.append(pd.DataFrame({
                    "vec_a": pd.Series(ids[ai], dtype="int64"),
                    "vec_b": pd.Series(ids[bj], dtype="int64"),
                    "cosine": pd.Series(sims[ai, bj], dtype="float64"),
                }))
        return pd.concat(out, ignore_index=True) if out else empty

    return bucketed.groupby("bucket").map_groups(pairs, batch_format="pandas")
