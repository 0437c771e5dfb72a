"""Regression tests for the round-2 VERDICT / ADVICE findings.

1. HLL leading-zero rank must be exact (the old float64-log2 path
   undercounted by 1 near powers of two, biasing registers down).
2. hash_strings must hash null slots as empty strings even when the
   null slot's offsets span garbage bytes (Arrow only guarantees
   monotonic offsets).
3. heuristics_batch alpha_ratio must equal the scalar doc_features on
   Unicode-whitespace text (RE2 \\s is ASCII-only; NBSP is common in
   web text).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _scalar_lz64(v: int) -> int:
    """Reference: leading zeros of a 64-bit value via bit_length."""
    return 64 - int(v).bit_length()


def test_leading_zeros64_exact_random_and_boundaries():
    from json_remedy_ray.stages.sketch import leading_zeros64

    rng = np.random.RandomState(7)
    vals = rng.randint(0, 1 << 63, size=20000, dtype=np.int64).astype(np.uint64)
    # the boundary family that breaks float64 log2: values within 2^-11
    # below a power of two (mantissa rounds them UP across the boundary)
    edges = []
    for b in range(1, 64):
        edges += [(1 << b) - 1, (1 << b), (1 << b) + 1]
        if b > 12:
            edges.append((1 << b) - (1 << (b - 12)) + 1)
    vals = np.concatenate([vals, np.array(edges, dtype=np.uint64),
                           np.array([0, (1 << 64) - 1], dtype=np.uint64)])
    got = leading_zeros64(vals)
    want = np.array([_scalar_lz64(int(v)) for v in vals], dtype=np.int64)
    assert np.array_equal(got, want)


def test_hll_rank_matches_scalar_bitscan():
    """hll_register_batch register for a single known doc equals the
    scalar rank computed by bit-scanning the same hash."""
    from json_remedy_ray.functions.vhash import hash_strings
    from json_remedy_ray.stages.sketch import _M, _P, hll_register_batch

    texts = [f"doc number {i} with some text" for i in range(500)]
    tbl = pa.table({"text": pa.array(texts)})
    regs = np.frombuffer(
        hll_register_batch(tbl)["registers"][0].as_py(), dtype=np.uint8)
    want = np.zeros(_M, dtype=np.uint8)
    for h in hash_strings(pa.array(texts)):
        h = int(h)
        idx = h >> (64 - _P)
        rest = (h << _P) & ((1 << 64) - 1)
        rank = (64 - rest.bit_length() + 1) if rest else (64 - _P + 1)
        rank = min(rank, 64 - _P + 1)
        want[idx] = max(want[idx], rank)
    assert np.array_equal(regs, want)


def test_hash_strings_null_slot_with_garbage_extent():
    """A null slot whose offsets span garbage bytes must hash exactly as
    an empty string (dedup/partitioning determinism for null docs)."""
    from json_remedy_ray.functions.vhash import hash_strings

    # hand-built array: offsets [0,3,6,9] over b"abcGARxyz", slot 1 null
    # -> the null slot spans the garbage bytes b"GAR"
    offsets = pa.array([0, 3, 6, 9], type=pa.int32())
    data = pa.py_buffer(b"abcGARxyz")
    validity = pa.array([True, False, True]).buffers()[1]
    garbage = pa.StringArray.from_buffers(
        3, offsets.buffers()[1], data, validity)
    assert garbage.null_count == 1

    clean = pa.array(["abc", "", "xyz"], type=pa.string())
    got = hash_strings(garbage)
    want = hash_strings(clean)
    assert np.array_equal(got, want)


def test_rolling_hashes_null_slot_with_garbage_extent():
    from json_remedy_ray.functions.vhash import rolling_hashes

    offsets = pa.array([0, 3, 6, 9], type=pa.int32())
    data = pa.py_buffer(b"abcGARxyz")
    validity = pa.array([True, False, True]).buffers()[1]
    garbage = pa.StringArray.from_buffers(
        3, offsets.buffers()[1], data, validity)
    clean = pa.array(["abc", "", "xyz"], type=pa.string())
    Wg, og = rolling_hashes(garbage, 2)
    Wc, oc = rolling_hashes(clean, 2)
    assert np.array_equal(og, oc)
    assert np.array_equal(Wg, Wc)


def test_heuristics_alpha_ratio_unicode_whitespace_parity():
    """The ADVICE-reported divergence: 'caf\\xa0e une' scored 1.0 scalar
    vs 0.889 batch because RE2 \\s missed NBSP.  Batch must now equal the
    scalar reference on every Unicode-whitespace separator."""
    from json_remedy_ray.stages.heuristics import doc_features, heuristics_batch

    texts = [
        "caf\xa0e une",                 # NBSP (the reported case)
        "line one\u2028line two",       # LINE SEPARATOR
        "a\u3000b\u2003c\u205fd",       # ideographic + em + math spaces
        "tab\tsep\x0bvt\x0cff",         # ASCII controls
        "plain ascii words here",
        "\xa0\xa0\xa0",                 # all-whitespace doc
    ]
    out = heuristics_batch(pa.table({"text": texts}))
    got = out["alpha_ratio"].to_pylist()
    for t, g in zip(texts, got):
        want = doc_features(t)[2]
        assert g == pytest.approx(want, abs=1e-6), (t, g, want)


def test_perplexity_nll_twin_exact_integers():
    """The SQL-twin gate: nll_batch integers are exactly the scalar sums,
    and the float ppl is the deterministic function exp((nll/1e6)/n_pairs)
    of those same integers."""
    import math

    from json_remedy_ray.stages.perplexity import _MICRO, PerplexityScorer

    s = PerplexityScorer()
    texts = ["", "a", "ab", "hello world", "caf\xe9 au lait", "the the the",
             "x" * 5000, None]
    batch = pa.table({"text": pa.array(texts, type=pa.string())})
    out = s.nll_batch(batch)
    nll = out["nll_micro"].to_pylist()
    npairs = out["n_pairs"].to_pylist()
    ppl = s(batch)["ppl"].to_pylist()
    for t, got_nll, got_np, got_ppl in zip(texts, nll, npairs, ppl):
        want_nll, want_np = s.nll_micro_one(t or "")
        if want_np < 1:
            want_nll = 0
        assert (got_nll, got_np) == (want_nll, want_np), t
        if got_np >= 1 and len((t or "").encode()) >= 2:
            want_ppl = min(math.exp((got_nll / _MICRO) / got_np), 3.4e38)
            assert got_ppl == pytest.approx(want_ppl, rel=1e-6), t
        else:
            assert np.isinf(got_ppl), t


def test_hot_key_salting_planted_hot_user(ray_session, tmp_path):
    """Verdict #3 gate: one planted hot user holding >50% of event rows
    must (a) be detected by the bounded heavy-hitters pass, and (b) leave
    both group-local operators oracle-green with the salting path
    actually exercised (tiny time buckets / small salt_n)."""
    import os
    import shutil

    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from json_remedy_ray.functions.queries import (
        ORACLES,
        events_asof_join_orders,
        events_session_windows,
    )
    from json_remedy_ray.state.partitioning import detect_hot_keys

    d = str(tmp_path / "salted")
    os.makedirs(d)
    rng = np.random.RandomState(3)
    # hot user 1: 1200 events over ~10 days (bursts); 20 cold users: 40 each
    hot_ts = (np.datetime64("2024-01-01T00:00:00", "us")
              + (np.sort(rng.randint(0, 10 * 86400, 1200)) * 1_000_000).astype("timedelta64[us]"))
    cold_ids = np.repeat(np.arange(2, 22), 40)
    cold_ts = (np.datetime64("2024-01-03T00:00:00", "us")
               + (rng.randint(0, 5 * 86400, len(cold_ids)) * 1_000_000).astype("timedelta64[us]"))
    ev = pa.table({
        "event_id": pa.array(np.arange(1200 + len(cold_ids)), type=pa.int64()),
        "ts": pa.array(np.concatenate([hot_ts, cold_ts])),
        "user_id": pa.array(np.concatenate([np.ones(1200, np.int64), cold_ids]),
                            type=pa.int64()),
        "event_type": pa.array(["a"] * (1200 + len(cold_ids))),
        "value": pa.array(np.ones(1200 + len(cold_ids))),
        "props": pa.array(["{}"] * (1200 + len(cold_ids))),
    })
    pq.write_table(ev, f"{d}/events.parquet")
    shutil.copy("/root/testdata/sf0.001/orders.parquet", f"{d}/orders.parquet")

    hot = detect_hot_keys(rd.read_parquet(f"{d}/events.parquet", columns=["user_id"]),
                          "user_id", 0.05)
    assert 1 in hot
    assert 2 not in hot  # cold users stay unsalted at the 5% threshold

    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")

    def norm(df):
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

    # salt_n=4 / 6h buckets: the hot user's rows land in MANY sub-groups
    got = norm(events_asof_join_orders(d, hot_threshold=0.05, salt_n=4).to_pandas())
    want = norm(con.execute(ORACLES["events_asof_join_orders"]).df())
    pd.testing.assert_frame_equal(got, want)

    got = norm(events_session_windows(d, gap_minutes=30, hot_threshold=0.05,
                                      salt_bucket_hours=6).to_pandas())
    want = norm(con.execute(ORACLES["events_session_windows"]).df())
    pd.testing.assert_frame_equal(got, want)


def _mk_bucket_frame(vectors, ids):
    import pandas as pd

    return pd.DataFrame({"vec_id": np.asarray(ids, dtype=np.int64),
                         "embedding": [np.asarray(v) for v in vectors]})


def test_embedding_bucket_near_copies_exhaustive_regime():
    """Verdict #4 gate: near-but-NOT-exact copies (cosine ~0.97) planted
    inside one >512-row bucket must ALL be recovered (the old
    component-sum chunk ordering could miss them)."""
    from json_remedy_ray.stages.similarity import verify_embedding_bucket

    rng = np.random.RandomState(11)
    dim = 32
    base = rng.randn(600, dim)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs, ids = [], []
    for i, v in enumerate(base):
        vecs.append(v)
        ids.append(i)
    # plant a perturbed copy of every 4th vector at id+10_000_000
    planted = []
    for i in range(0, 600, 4):
        noise = rng.randn(dim)
        noise -= (noise @ base[i]) * base[i]           # orthogonal noise
        noise /= np.linalg.norm(noise)
        c = 0.97
        vecs.append(c * base[i] + np.sqrt(1 - c * c) * noise)  # exact cosine 0.97
        ids.append(i + 10_000_000)
        planted.append(i)
    g = _mk_bucket_frame(vecs, ids)
    assert len(g) > 512
    out = verify_embedding_bucket(g, threshold=0.95)
    got = set(zip(out["vec_a"], out["vec_b"]))
    for i in planted:
        assert (i, i + 10_000_000) in got, i
    # and the reported cosine is right
    m = out[(out["vec_b"] - out["vec_a"]) == 10_000_000]
    assert np.allclose(m["cosine"], 0.97, atol=1e-9)


def test_embedding_bucket_large_regime_exact_recall():
    """A 4200-row bucket is inside the exhaustive-tile regime: every
    planted near-copy (cosine 0.97) must be recovered, no duplicates."""
    from json_remedy_ray.stages.similarity import verify_embedding_bucket

    rng = np.random.RandomState(12)
    dim = 16
    base = rng.randn(4200, dim)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs = [v for v in base]
    ids = list(range(4200))
    planted = []
    for i in range(0, 4200, 40):
        noise = rng.randn(dim)
        noise -= (noise @ base[i]) * base[i]
        noise /= np.linalg.norm(noise)
        c = 0.97
        vecs.append(c * base[i] + np.sqrt(1 - c * c) * noise)
        ids.append(i + 10_000_000)
        planted.append(i)
    g = _mk_bucket_frame(vecs, ids)
    out = verify_embedding_bucket(g, threshold=0.95)
    assert not out.duplicated(["vec_a", "vec_b"]).any()
    got = set(zip(out["vec_a"], out["vec_b"]))
    recovered = sum((i, i + 10_000_000) in got for i in planted)
    assert recovered == len(planted), (recovered, len(planted))


def test_embedding_bucket_fallback_regime_exact_copies():
    """Past the exhaustive cap (forced low here), the projection-sorted
    50%-overlap fallback must still recover EXACT duplicates (distance 0
    -> adjacent in projection order) and emit no duplicate pairs."""
    from json_remedy_ray.stages.similarity import verify_embedding_bucket

    rng = np.random.RandomState(13)
    dim = 16
    base = rng.randn(2000, dim)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs = [v for v in base]
    ids = list(range(2000))
    planted = []
    for i in range(0, 2000, 20):
        vecs.append(base[i].copy())            # exact copy
        ids.append(i + 10_000_000)
        planted.append(i)
    g = _mk_bucket_frame(vecs, ids)
    out = verify_embedding_bucket(g, threshold=0.95, exhaustive_max=512)
    assert not out.duplicated(["vec_a", "vec_b"]).any()
    got = set(zip(out["vec_a"], out["vec_b"]))
    recovered = sum((i, i + 10_000_000) in got for i in planted)
    assert recovered == len(planted), (recovered, len(planted))


def test_minhash_identical_cluster_emits_chain_not_quadratic(ray_session):
    """Round-2 advice: a 600-doc identical cluster emitted ~69k pairs
    (O(N*chunk)); identical-signature runs must now emit their N-1 chain
    per band, and the dedup mapping must still connect the whole cluster
    to the minimum doc_id."""
    import ray.data as rd

    from json_remedy_ray.stages.dedup import (
        components_from_pairs,
        minhash_dedup_pairs,
    )

    ident = ["All work and no play makes Jack a dull boy. " * 12] * 600
    distinct = [f"Unique filler document number {i} talks about topic {i*7}. " * 10
                for i in range(50)]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(650), type=pa.int64()),
        "text": pa.array(ident + distinct),
    })
    ds = rd.from_arrow(tbl)
    pairs = minhash_dedup_pairs(ds, threshold=0.8).to_pandas()
    cluster = pairs[(pairs["doc_a"] < 600) & (pairs["doc_b"] < 600)]
    # <= bands * (N-1) before cross-band dedup (was ~69k per band)
    assert len(cluster) <= 8 * 599, len(cluster)
    uniq = cluster[["doc_a", "doc_b"]].drop_duplicates()
    assert len(uniq) <= 2 * 599, len(uniq)
    mapping = components_from_pairs(pairs)
    m = mapping[mapping["doc_id"] < 600]
    assert len(m) == 600
    assert (m["dup_of"] == 0).all()


def _make_jpeg(width: int, height: int, ncomp: int = 3,
               progressive: bool = False) -> bytes:
    """Minimal JPEG marker stream: SOI + APP0(JFIF) + DQT + SOF + EOI.
    Header-only (no entropy data) — exactly what the parser reads."""
    import struct

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    app0 = b"JFIF\x00\x01\x01\x00\x00H\x00H\x00\x00"
    dqt = bytes([0]) + bytes(64)
    sof_payload = struct.pack(">BHHB", 8, height, width, ncomp)
    for c in range(ncomp):
        sof_payload += bytes([c + 1, 0x11, 0])
    sof_marker = 0xC2 if progressive else 0xC0
    return (b"\xff\xd8" + seg(0xE0, app0) + seg(0xDB, dqt)
            + seg(sof_marker, sof_payload) + b"\xff\xd9")


def test_multimodal_real_jpeg_header_decode(ray_session):
    """Verdict #6: JPEG SOFn dims decode like the PNG/WAV fixtures —
    parser level and through the actual Ray actor-pool stage."""
    import ray.data as rd

    from json_remedy_ray.stages.multimodal import ImageDecodeStage, parse_jpeg_header

    specs = [(640, 480, 3, False, "RGB"), (31, 77, 1, False, "L"),
             (1920, 1080, 3, True, "RGB"), (10, 10, 4, False, "CMYK")]
    rows = [{"doc_id": i, "payload": _make_jpeg(w, h, nc, prog)}
            for i, (w, h, nc, prog, _) in enumerate(specs)]
    for (w, h, nc, prog, mode), row in zip(specs, rows):
        assert parse_jpeg_header(row["payload"]) == (w, h, mode)
    out = (rd.from_items(rows)
           .map_batches(ImageDecodeStage, concurrency=1, batch_format="pyarrow")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["img_width"].tolist() == [w for w, *_ in specs]
    assert out["img_height"].tolist() == [h for _, h, *_ in specs]
    assert out["img_mode"].tolist() == [m for *_, m in specs]


def test_jpeg_parser_rejects_non_jpeg_and_truncated():
    from json_remedy_ray.stages.multimodal import parse_jpeg_header

    assert parse_jpeg_header(b"") is None
    assert parse_jpeg_header(b"\xff\xd8") is None            # SOI only
    assert parse_jpeg_header(b"not a jpeg at all") is None
    assert parse_jpeg_header(b"\x89PNG\r\n\x1a\n") is None
    # DHT (C4) must NOT be mistaken for a SOF
    import struct
    dht = b"\xff\xd8" + bytes([0xFF, 0xC4]) + struct.pack(">H", 4) + b"\x00\x00"
    assert parse_jpeg_header(dht + b"\xff\xd9") is None
    # truncated mid-SOF
    good = _make_jpeg(100, 50)
    sof_at = good.index(b"\xff\xc0")
    assert parse_jpeg_header(good[:sof_at + 5]) is None


def test_components_pointer_doubling_chain_logarithmic(ray_session):
    """Verdict #7: a planted 256-node CHAIN (diameter 255 — plain
    propagation needs ~255 rounds) must converge in <= 2*log2(n) rounds
    with pointer doubling, and still equal the union-find mapping."""
    import pandas as pd
    import ray.data as rd

    from json_remedy_ray.stages.dedup import (
        components_from_pairs,
        components_min_label,
    )

    n = 256
    pairs_df = pd.DataFrame({"doc_a": np.arange(n - 1, dtype=np.int64),
                             "doc_b": np.arange(1, n, dtype=np.int64)})
    pairs = rd.from_arrow(pa.Table.from_pandas(pairs_df))
    got, rounds = components_min_label(pairs, max_iters=40, return_rounds=True)
    assert rounds <= 2 * int(np.log2(n)), rounds
    want = components_from_pairs(pairs_df)
    pd.testing.assert_frame_equal(got, want)
    assert (got["dup_of"] == 0).all()


def test_gopher_repetition_scalar_batch_parity():
    """Repetition features: batch path equals the scalar Counter
    reference on crafted repetition patterns, unicode, and edge cases."""
    from json_remedy_ray.stages.textstats import (
        gopher_repetition_batch,
        gopher_repetition_one,
    )

    texts = [
        "the cat sat on the mat the cat sat again",
        "spam spam spam spam spam spam",
        "every word here is completely different",
        "", "one", None,
        "Caf\xe9 caf\xe9 CAF\xc9 caf\xe9",        # case folding
        "a b a b a b a b",                       # alternating bigram
        "x\xa0y x\xa0y",                          # NBSP inside... splits!
        ("lorem ipsum dolor " * 50).strip(),
    ]
    out = gopher_repetition_batch(pa.table({"text": pa.array(texts, type=pa.string())}))
    for i, t in enumerate(texts):
        want = gopher_repetition_one(t or "")
        got = (out["n_words"][i].as_py(), out["n_distinct_words"][i].as_py(),
               out["top_bigram_count"][i].as_py(), out["dup_word_frac"][i].as_py(),
               out["top_bigram_frac"][i].as_py())
        for a, b in zip(got, want):
            if isinstance(b, float) or hasattr(b, "dtype"):
                assert a == pytest.approx(float(b), abs=1e-6), (t, got, want)
            else:
                assert a == b, (t, got, want)


def test_contamination_scan_planted(ray_session):
    """Planted contamination: a doc embedding a benchmark snippet
    mid-text must be flagged; clean docs must not."""
    from json_remedy_ray.stages.textstats import contamination_flags_batch

    snip = "THE-BENCHMARK-ANSWER-KEY-SEGMENT-0042"
    texts = [
        f"some long preamble {snip} and a postamble",     # contaminated
        "a perfectly clean document with original text",  # clean
        snip,                                             # exact snippet
        "the-benchmark-answer-key-segment-0042 lowercase",# case-sensitive: clean
        None,
    ]
    out = contamination_flags_batch(
        pa.table({"text": pa.array(texts, type=pa.string())}), [snip])
    assert out["contaminated"].to_pylist() == [True, False, True, False, False]
    assert out["n_snippet_hits"].to_pylist() == [1, 0, 1, 0, 0]


def test_jpeg_parser_truncated_at_sof_payload():
    """Review finding: a JPEG truncated exactly inside the SOF payload
    must return None, not raise struct.error (the parser is a probe run
    on every non-PNG payload)."""
    from json_remedy_ray.stages.multimodal import parse_jpeg_header

    data = b"\xff\xd8\xff\xc0\x00\x11\x08\x00\x10\x00\x20"  # 5 payload bytes
    assert parse_jpeg_header(data) is None
    good = _make_jpeg(100, 50)
    sof_at = good.index(b"\xff\xc0")
    for cut in range(sof_at, sof_at + 10):
        assert parse_jpeg_header(good[:cut]) is None, cut


def _make_mp4(timescale: int, duration: int, version: int = 0,
              brand: bytes = b"isom") -> bytes:
    import struct

    ftyp = struct.pack(">I4s", 16, b"ftyp") + brand + struct.pack(">I", 0)
    if version == 0:
        body = bytes([0, 0, 0, 0]) + b"\x00" * 8 + struct.pack(
            ">II", timescale, duration) + b"\x00" * 80
    else:
        body = bytes([1, 0, 0, 0]) + b"\x00" * 16 + struct.pack(
            ">IQ", timescale, duration) + b"\x00" * 80
    mvhd = struct.pack(">I4s", 8 + len(body), b"mvhd") + body
    moov = struct.pack(">I4s", 8 + len(mvhd), b"moov") + mvhd
    return ftyp + moov


def test_multimodal_real_mp4_header_decode(ray_session):
    """ISO-BMFF ftyp/mvhd decode like the PNG/JPEG/WAV fixtures —
    parser level and through the actual Ray actor-pool stage."""
    import ray.data as rd

    from json_remedy_ray.stages.multimodal import (
        VideoFrameSampleStage,
        parse_mp4_header,
    )

    specs = [  # (timescale, duration, version, brand, expect_dur_s)
        (1000, 5000, 0, b"isom", 5.0),
        (90000, 900000, 0, b"mp42", 10.0),
        (600, 3600, 1, b"avc1", 6.0),       # 64-bit duration mvhd v1
    ]
    rows = []
    for i, (ts, dur, v, brand, _) in enumerate(specs):
        payload = _make_mp4(ts, dur, v, brand)
        assert parse_mp4_header(payload) == (brand.decode(), ts, dur)
        rows.append({"doc_id": i, "payload": payload})
    rows.append({"doc_id": 99, "payload": b"definitely not a video"})
    out = (rd.from_items(rows)
           .map_batches(VideoFrameSampleStage, concurrency=1, batch_format="pyarrow")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for i, (_, _, _, brand, dur_s) in enumerate(specs):
        assert out.loc[i, "video_brand"] == brand.decode()
        assert out.loc[i, "video_duration_s"] == pytest.approx(dur_s)
        assert out.loc[i, "n_sampled_frames"] == 4
        offs = out.loc[i, "frame_time_offsets"]
        assert len(offs) == 4 and offs[0] == 0.0 and max(offs) < dur_s
    assert out.loc[3, "video_brand"] == "fake"  # non-MP4 fallback


def test_mp4_parser_rejects_garbage_and_truncation():
    from json_remedy_ray.stages.multimodal import parse_mp4_header

    good = _make_mp4(1000, 5000)
    assert parse_mp4_header(b"") is None
    assert parse_mp4_header(b"RIFFxxxxWAVE") is None
    assert parse_mp4_header(good[:12]) is None          # ftyp only
    for cut in range(13, len(good), 7):
        r = parse_mp4_header(good[:cut])
        assert r is None or r == ("isom", 1000, 5000)
    v1 = _make_mp4(600, 3600, version=1)
    mvhd_at = v1.index(b"mvhd")
    assert parse_mp4_header(v1[:mvhd_at + 20]) is None  # truncated mvhd v1


def test_histogram_quantiles_match_sorted_rule(ray_session, tmp_path):
    """The histogram quantile path must equal DuckDB quantile_disc (value
    at 1-based index ceil(q*n)) on a random value distribution split
    across parquet files."""
    import math
    import os

    import duckdb
    import pyarrow.parquet as pq

    from json_remedy_ray.functions.queries import ORACLES, docs_length_quantiles

    d = str(tmp_path / "qtile")
    os.makedirs(d)
    rng = np.random.RandomState(5)
    vals = np.concatenate([rng.randint(10, 200, 700),
                           rng.randint(195, 205, 300),   # heavy tie region
                           np.full(50, 199)])
    tbl = pa.table({"doc_id": pa.array(np.arange(len(vals)), type=pa.int64()),
                    "n_chars": pa.array(vals, type=pa.int64())})
    pq.write_table(tbl, f"{d}/documents.parquet")
    got = docs_length_quantiles(d)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    want = con.execute(ORACLES["docs_length_quantiles"]).df()
    assert got.reset_index(drop=True).equals(want.astype("int64").reset_index(drop=True))
    # and against the plain sorted-array rule
    s = np.sort(vals)
    for q, col in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.9, "p90"), (0.99, "p99")]:
        assert got.loc[0, col] == s[max(1, math.ceil(q * len(s))) - 1]


def test_mp4_unknown_duration_sentinel(ray_session):
    """ISO-BMFF all-ones duration means UNKNOWN — the stage must emit
    zero frames, not seek 584 years into a live stream."""
    import ray.data as rd

    from json_remedy_ray.stages.multimodal import VideoFrameSampleStage

    rows = [{"doc_id": 0, "payload": _make_mp4(90000, 0xFFFFFFFF)},
            {"doc_id": 1, "payload": _make_mp4(600, 0xFFFFFFFFFFFFFFFF, version=1)},
            {"doc_id": 2, "payload": _make_mp4(1000, 5000)}]
    out = (rd.from_items(rows)
           .map_batches(VideoFrameSampleStage, concurrency=1, batch_format="pyarrow")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.loc[0, "video_duration_s"] == 0 and out.loc[0, "n_sampled_frames"] == 0
    assert out.loc[1, "video_duration_s"] == 0 and out.loc[1, "n_sampled_frames"] == 0
    assert out.loc[2, "n_sampled_frames"] == 4


def test_quantiles_empty_table(ray_session, tmp_path):
    """Empty documents table: one row of NULLs, same as quantile_disc."""
    import os

    import pyarrow.parquet as pq

    from json_remedy_ray.functions.queries import docs_length_quantiles

    d = str(tmp_path / "qempty")
    os.makedirs(d)
    pq.write_table(pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "n_chars": pa.array([], type=pa.int64())}),
                   f"{d}/documents.parquet")
    out = docs_length_quantiles(d)
    assert len(out) == 1 and out.isna().all(axis=None)


def test_range_join_planted_hot_customer(ray_session, tmp_path):
    """Salting-branch gate for the range join (same standard as the
    as-of join's planted test): one customer holding >50% of orders must
    be detected, scattered, replicated — and stay oracle-green."""
    import os

    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from json_remedy_ray.functions.queries import ORACLES, orders_range_self_join
    from json_remedy_ray.state.partitioning import detect_hot_keys

    d = str(tmp_path / "rsalt")
    os.makedirs(d)
    rng = np.random.RandomState(9)
    hot_dates = (np.datetime64("1995-01-01")
                 + rng.randint(0, 400, 900).astype("timedelta64[D]"))
    cold_ids = np.repeat(np.arange(2, 32), 20)
    cold_dates = (np.datetime64("1995-06-01")
                  + rng.randint(0, 200, len(cold_ids)).astype("timedelta64[D]"))
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(900 + len(cold_ids)), type=pa.int64()),
        "o_custkey": pa.array(np.concatenate([np.ones(900, np.int64), cold_ids]),
                              type=pa.int64()),
        "o_orderdate": pa.array(np.concatenate([hot_dates, cold_dates])
                                .astype("datetime64[us]")),
        "o_totalprice": pa.array(np.ones(900 + len(cold_ids))),
    })
    pq.write_table(orders, f"{d}/orders.parquet")

    hot = detect_hot_keys(rd.read_parquet(f"{d}/orders.parquet", columns=["o_custkey"]),
                          "o_custkey", 0.05)
    assert 1 in hot and 2 not in hot

    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{d}/orders.parquet')")

    def norm(df):
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

    got = norm(orders_range_self_join(d, hot_threshold=0.05, salt_n=4).to_pandas())
    want = norm(con.execute(ORACLES["orders_range_self_join"]).df())
    assert len(got) > 1000  # the hot customer generates real pair volume
    pd.testing.assert_frame_equal(got, want)


def test_heuristics_sql_twin_alpha_space_unicode_whitespace():
    """The heuristics_documents_sql ENGINE side must count alpha_space
    with the full UWS class like its SQL twin (which uses [^\\pL + UWS])
    — RE2's ASCII \\s missed NBSP and the twins diverged on web text the
    ASCII test corpus can't expose."""
    import duckdb

    from json_remedy_ray.functions.queries import ORACLES

    texts = ["caf\xa0e une", "a b", "plain words", "\xa0\xa0", ""]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, ?)" for i in range(len(texts)))
                + ") t(doc_id, text)", texts)
    want = con.execute(ORACLES["heuristics_documents_sql"]
                       + " ORDER BY doc_id").df()

    # the engine-side batch fn, without a Ray session
    from json_remedy_ray.functions import queries as q

    captured = {}
    orig_read = q._read

    class FakeDs:
        def __init__(self, tbl): self.tbl = tbl
        def map_batches(self, f, **kw):
            captured["out"] = f(self.tbl)
            return self
        def to_pandas(self): return captured["out"].to_pandas()
        def sort_values(self, *a, **k):
            return captured["out"].to_pandas().sort_values(*a, **k)

    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts, type=pa.string())})
    try:
        q._read = lambda *a, **k: FakeDs(tbl)
        got = q.heuristics_documents_sql("unused")
    finally:
        q._read = orig_read
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got)
    got = got.sort_values("doc_id").reset_index(drop=True)
    for c in ["n_chars", "word_count", "nonspace_chars",
              "alpha_space_chars", "stopword_count"]:
        assert list(got[c]) == list(want[c]), (c, list(got[c]), list(want[c]))


def test_multimodal_gif_header_decode():
    """GIF87a/89a logical-screen decode next to PNG/JPEG; dims are the
    little-endian u16 pair at bytes 6-10, mode always palette."""
    import struct

    from json_remedy_ray.stages.multimodal import parse_gif_header

    assert parse_gif_header(b"GIF89a" + struct.pack("<HH", 320, 200)
                            + b"\x00\x00\x00") == (320, 200, "P")
    assert parse_gif_header(b"GIF87a" + struct.pack("<HH", 1, 65535)
                            + b"\x00") == (1, 65535, "P")
    assert parse_gif_header(b"GIF90a" + bytes(6)) is None
    assert parse_gif_header(b"GIF89a\x01") is None        # truncated
    assert parse_gif_header(b"\x89PNG\r\n\x1a\n" + bytes(8)) is None


def test_nfc_normalize_batch_semantics(ray_session):
    """ASCII rows untouched (prefilter); decomposed accents compose;
    already-NFC non-ASCII rows report changed=False."""
    import pyarrow as pa

    from json_remedy_ray.stages.textstats import nfc_normalize_batch

    batch = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array(["plain ascii", "café", "café", None]),
    })
    out = nfc_normalize_batch(batch)
    assert out["text_nfc"].to_pylist() == [
        "plain ascii", "café", "café", ""]
    assert out["changed"].to_pylist() == [False, True, False, False]
