"""Incremental MinHash near-dup dedup: the planted decision sets."""

from json_remedy_ray.functions.queries import (
    _FRESH_OFFSET,
    _PLANT_OFFSET,
    _read,
    incremental_minhash_dedup,
)

SF = "/root/testdata/sf0.001"


def test_planted_decision_sets(ray_session):
    """Every ' ~dup' copy of a corpus doc must be dropped; every fresh
    unique doc must survive — the surviving set is exactly the fresh
    planting rule."""
    out = incremental_minhash_dedup(SF)
    kept = set(out["doc_id"].astype("int64"))
    pdf = _read(SF, "documents", columns=["doc_id", "n_chars"]).to_pandas()
    ids = pdf["doc_id"].to_numpy()
    nch = pdf["n_chars"].to_numpy()
    want_fresh = {int(i) + _FRESH_OFFSET for i in ids[ids % 11 == 0]}
    dup_copies = {int(i) + _PLANT_OFFSET
                  for i in ids[(ids % 7 == 0) & (nch >= 300)]}
    assert kept == want_fresh
    assert not (kept & dup_copies)
    assert len(dup_copies) > 0 and len(want_fresh) > 0  # both rules fired


def test_block_local_identical_sig_combiner(ray_session):
    """Duplicates co-located in ONE block must collapse at the combiner
    (side-channel est=1.0 stars) with connectivity identical to the
    all-pairs mode's union-find."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from json_remedy_ray.stages.dedup import (
        components_from_pairs,
        minhash_dedup_pairs,
    )

    texts = []
    for i in range(40):
        base = f"document body {i} " + " ".join(
            f"w{(i * 7 + j) % 23}" for j in range(60))
        texts.append(base)
    # plant 3 exact-duplicate clusters inside the same (single) block
    texts += [texts[0]] * 4 + [texts[1]] * 3 + [texts[2]] * 2
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    }))
    span = minhash_dedup_pairs(ds, threshold=0.8, n_buckets=4).to_pandas()
    allp = minhash_dedup_pairs(ds, threshold=0.8, n_buckets=4,
                               mode="all").to_pandas()
    # est=1.0 side stars exist for the planted identical docs
    assert (span["est_jaccard"] == 1.0).sum() >= 9
    c_span = components_from_pairs(span).set_index("doc_id")["dup_of"]
    c_all = components_from_pairs(allp).set_index("doc_id")["dup_of"]
    # same components (compare on the union of covered docs; singletons
    # absent from pair lists are implicitly their own component)
    for d in set(c_span.index) | set(c_all.index):
        assert c_span.get(d, d) == c_all.get(d, d), d
