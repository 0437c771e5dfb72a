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
