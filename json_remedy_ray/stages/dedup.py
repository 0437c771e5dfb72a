"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

Ray-native shapes (SURVEY §2.9, ray_guide "Aggregation at scale"):

  MinHash-LSH:  shingle -> minhash signature -> explode to
                (band, band_hash, doc_id, signature) rows inside ONE
                map_batches -> groupby(band, band_hash) -> candidate
                pairs verified by signature-estimated Jaccard inside
                map_groups -> min-representative mapping.

  SimHash:      64-bit signature per doc -> bucket by 16-bit bands ->
                pairwise Hamming check within buckets.

All hashing is seeded/deterministic (blake2b with fixed keys), so
retries and re-runs are stable.  The signature travels WITH the band
rows, so pair verification needs no second pass over the corpus — at
100 TB that second pass would be a full shuffle-join; this design pays
~512 bytes per band row instead.

Connected components: candidate pairs are near-dups only (a tiny
fraction of the corpus), so the final union-find runs on the driver;
at larger dup rates swap in iterative min-label propagation (a few
groupby rounds) — the pairs Dataset is the stable interface either way.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Base-64-bit hashes of the k-char shingles of a document."""
    data = text.encode("utf-8", errors="ignore")
    if len(data) < k:
        data = data + b" " * (k - len(data))
    # rolling window over bytes; blake2b per shingle is C-speed
    hashes = np.empty(len(data) - k + 1, dtype=np.uint64)
    for i in range(len(data) - k + 1):
        hashes[i] = np.uint64(
            int.from_bytes(hashlib.blake2b(data[i:i + k], digest_size=8).digest(), "little")
        )
    return np.unique(hashes)


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray, k: int = 5) -> np.ndarray:
    base = _shingle_hashes(text, k)
    if len(base) == 0:
        return np.zeros(len(a), dtype=np.uint64)
    # (num_perm, n_shingles) universal hashing, min over shingles
    with np.errstate(over="ignore"):
        vals = (a[:, None] * base[None, :] + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


class MinHashStage:
    """Actor-pool stage: signature + LSH band rows per document.

    Emits ``bands_per_doc`` rows per input doc:
    (doc_id, band, band_hash, signature: fixed_size_binary)."""

    def __init__(self, num_perm: int = 64, bands: int = 8, shingle_k: int = 5,
                 id_col: str = "doc_id", text_col: str = "text", seed: int = 42):
        assert num_perm % bands == 0
        self.a, self.b = _perm_params(num_perm, seed)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_id, out_band, out_bh, out_sig = [], [], [], []
        for did, text in zip(ids, texts):
            sig = minhash_signature(text or "", self.a, self.b, self.shingle_k)
            sig_bytes = sig.tobytes()
            for band in range(self.bands):
                rows = sig[band * self.rows_per_band:(band + 1) * self.rows_per_band]
                bh = int.from_bytes(
                    hashlib.blake2b(rows.tobytes(), digest_size=8).digest(), "little"
                )
                out_id.append(did)
                out_band.append(band)
                out_bh.append(bh - (1 << 63))  # signed for arrow int64
                out_sig.append(sig_bytes)
        return pa.table({
            "doc_id": pa.array(out_id, type=pa.int64()),
            "band": pa.array(out_band, type=pa.int32()),
            "band_hash": pa.array(out_bh, type=pa.int64()),
            "signature": pa.array(out_sig, type=pa.binary()),
        })


def _bucket_pairs(g: pd.DataFrame, threshold: float, num_perm: int) -> pd.DataFrame:
    """Candidate pairs within one LSH bucket, verified by
    signature-estimated Jaccard (fraction of equal minhashes)."""
    g = g.drop_duplicates("doc_id").sort_values("doc_id")
    if len(g) < 2:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "est_jaccard": pd.Series([], dtype="float64")})
    ids = g["doc_id"].to_numpy()
    sigs = np.stack([np.frombuffer(s, dtype=np.uint64) for s in g["signature"]])
    rows_a, rows_b, ests = [], [], []
    cap = min(len(ids), 256)  # skew guard: a giant bucket is a degenerate band
    for i in range(cap):
        eq = (sigs[i + 1:cap] == sigs[i]).mean(axis=1)
        hit = np.where(eq >= threshold)[0]
        for j in hit:
            rows_a.append(ids[i])
            rows_b.append(ids[i + 1 + j])
            ests.append(float(eq[j]))
    return pd.DataFrame({"doc_a": pd.Series(rows_a, dtype="int64"),
                         "doc_b": pd.Series(rows_b, dtype="int64"),
                         "est_jaccard": pd.Series(ests, dtype="float64")})


def minhash_dedup_pairs(ds: rd.Dataset, threshold: float = 0.8, num_perm: int = 64,
                        bands: int = 8, shingle_k: int = 5,
                        id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Dataset[(doc_id, text)] -> Dataset[(doc_a, doc_b, est_jaccard)]."""
    band_rows = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands,
                               "shingle_k": shingle_k, "id_col": id_col,
                               "text_col": text_col},
        batch_format="pyarrow", batch_size=1024, concurrency=(1, 8),
    )
    pairs = band_rows.groupby(["band", "band_hash"]).map_groups(
        lambda g: _bucket_pairs(g, threshold, num_perm), batch_format="pandas"
    )
    return pairs


def components_from_pairs(pairs_df: pd.DataFrame) -> pd.DataFrame:
    """Union-find over candidate pairs -> (doc_id, dup_of) with dup_of the
    minimum doc_id of the component.  Driver-side: pairs are near-dups
    only (documented assumption)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x: int, y: int) -> None:
        rx, ry = find(x), find(y)
        if rx != ry:
            if ry < rx:
                rx, ry = ry, rx
            parent[ry] = rx

    seen = pairs_df[["doc_a", "doc_b"]].drop_duplicates()
    for a, b in zip(seen["doc_a"], seen["doc_b"]):
        union(int(a), int(b))
    rows = sorted((d, find(d)) for d in parent)
    return pd.DataFrame(rows, columns=["doc_id", "dup_of"]).astype("int64")


# ------------------------------------------------------------------ simhash

def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (deterministic blake2b)."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in (text or "").split():
        h = int.from_bytes(hashlib.blake2b(tok.encode("utf-8", "ignore"), digest_size=8).digest(), "little")
        bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8))
        acc += bits.astype(np.int64) * 2 - 1
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= 1 << i
    return out


class SimHashStage:
    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        sigs = [simhash64(t or "") - (1 << 63) for t in texts]
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "simhash": pa.array(sigs, type=pa.int64()),
        })


def simhash_dedup_pairs(ds: rd.Dataset, max_hamming: int = 3,
                        id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """SimHash near-dup pairs: band the 64-bit signature into 4 x 16-bit
    keys (banding guarantees recall only for Hamming<=3: a pair differing
    in <=3 bits must agree on >=1 of 4 bands), groupby band key, verify
    Hamming <= max_hamming inside the bucket.  max_hamming > 3 lowers
    recall (pairs may disagree on every band) — documented LSH tradeoff."""
    sigs = ds.map_batches(
        SimHashStage, fn_constructor_kwargs={"id_col": id_col, "text_col": text_col},
        batch_format="pyarrow", batch_size=2048, concurrency=(1, 8),
    )

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        hs = batch["simhash"].to_pylist()
        out_id, out_band, out_key, out_sig = [], [], [], []
        for did, h in zip(ids, hs):
            u = h + (1 << 63)
            for band in range(4):
                out_id.append(did)
                out_band.append(band)
                out_key.append((u >> (band * 16)) & 0xFFFF)
                out_sig.append(h)
        return pa.table({
            "doc_id": pa.array(out_id, type=pa.int64()),
            "band": pa.array(out_band, type=pa.int32()),
            "band_key": pa.array(out_key, type=pa.int32()),
            "simhash": pa.array(out_sig, type=pa.int64()),
        })

    exploded = sigs.map_batches(explode, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                              "doc_b": pd.Series([], dtype="int64"),
                              "hamming": pd.Series([], dtype="int64")})
        if len(g) < 2:
            return empty
        ids = g["doc_id"].to_numpy()
        hs = (g["simhash"].to_numpy().astype(np.int64).view(np.uint64))
        rows = []
        cap = min(len(ids), 512)
        for i in range(cap):
            x = hs[i + 1:cap] ^ hs[i]
            pop = np.array([bin(v).count("1") for v in x])
            for j in np.where(pop <= max_hamming)[0]:
                rows.append((ids[i], ids[i + 1 + j], int(pop[j])))
        if not rows:
            return empty
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"]).astype(
            {"doc_a": "int64", "doc_b": "int64", "hamming": "int64"})

    return exploded.groupby(["band", "band_key"]).map_groups(bucket_pairs, batch_format="pandas")


# ------------------------------------------------------------ ngram jaccard

def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact word n-gram Jaccard (verification metric for candidates)."""
    ta, tb = a.split(), b.split()
    sa = {tuple(ta[i:i + n]) for i in range(max(0, len(ta) - n + 1))}
    sb = {tuple(tb[i:i + n]) for i in range(max(0, len(tb) - n + 1))}
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)
