"""Round-4 verdict items: exchange-based connected components at pair
counts the driver fallback is meant for, and vectorized broadcast-join
attachment."""

import numpy as np
import pandas as pd


def test_components_exchange_random_graph_matches_union_find(ray_session):
    """30k random pairs over 60k nodes — a critical-density graph whose
    largest tree has ~n^(1/3) diameter, the convergence-hostile shape —
    must reproduce the driver union-find mapping exactly."""
    import ray.data as rd

    from json_remedy_ray.stages.dedup import (
        components_from_pairs,
        components_min_label,
    )

    rng = np.random.default_rng(7)
    pairs = pd.DataFrame({
        "doc_a": rng.integers(0, 60_000, 30_000),
        "doc_b": rng.integers(0, 60_000, 30_000),
    })
    got, rounds = components_min_label(rd.from_pandas(pairs),
                                       return_rounds=True)
    want = components_from_pairs(pairs)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))
    assert rounds < 128  # converged, not max_iters-truncated


def test_components_exchange_chain_logarithmic(ray_session):
    """1000-node chain: pointer doubling must converge in <= 2*log2(n)
    rounds on the exchange implementation too."""
    import ray.data as rd

    from json_remedy_ray.stages.dedup import components_min_label

    chain = pd.DataFrame({"doc_a": np.arange(999),
                          "doc_b": np.arange(1, 1000)})
    got, rounds = components_min_label(rd.from_pandas(chain),
                                       return_rounds=True)
    assert (got["dup_of"] == 0).all() and len(got) == 1000
    assert rounds <= 20, rounds


def test_gopher_ngram_scalar_batch_parity():
    """Vectorized n-gram repetition kernel == the scalar Counter
    reference on adversarial texts (repeats, overlaps, short docs,
    empties, unicode whitespace)."""
    import pyarrow as pa

    from json_remedy_ray.stages.textstats import (
        gopher_ngram_repetition_batch,
        gopher_ngram_repetition_one,
    )

    texts = [
        "a b c d e f g h i j",
        "x y z x y z x y z x y z",          # heavy 3-gram repetition
        "one two three four five one two three four five extra",
        "w " * 40,                            # single repeated token
        "", "   ", "short", "a b c d",
        "p q r s t u v w p q r s t u v w p q r s t u v w",  # 8-gram dups
        "café naïve café naïve café naïve café naïve café naïve",
    ]
    batch = pa.table({"doc_id": pa.array(range(len(texts))),
                      "text": pa.array(texts, type=pa.string())})
    got = gopher_ngram_repetition_batch(batch).to_pandas()
    for i, t in enumerate(texts):
        ref = gopher_ngram_repetition_one(t)
        for col, want in ref.items():
            g = got.loc[i, col]
            if isinstance(want, float):
                assert abs(float(g) - want) < 1e-6, (i, col, g, want)
            else:
                assert int(g) == want, (i, col, g, want)


def test_crossdoc_span_dedup_no_duplicates(ray_session):
    """A corpus with NO cross-doc duplicated n-gram must rebuild every
    doc unchanged (review finding: Ray's to_pandas() on the zero-row
    span dataset is column-less and crashed the sort)."""
    import pyarrow as pa
    import ray.data as rd

    from json_remedy_ray.stages.dedup import crossdoc_span_dedup

    docs = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["alpha beta gamma delta epsilon zeta eta theta iota",
                          "one two three four five six seven eight nine ten"]),
    })
    out = (crossdoc_span_dedup(rd.from_arrow(docs), n=8).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_removed"].tolist() == [0, 0]
    assert out.loc[0, "clean_text"].startswith("alpha beta")


def test_hash_oracles_negative_doc_ids(ray_session):
    """Engine vs DuckDB oracle on NEGATIVE doc_ids (review finding:
    DuckDB % follows the dividend's sign while the engine hash is
    unsigned; hash-derived ids span the full int64 range)."""
    import os
    import tempfile

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from json_remedy_ray.functions.queries import ORACLES, QUERIES

    ids = [-(2**62) - 7, -5, -1, 0, 3, 2**61 + 11]
    docs = pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array([f"w{i} x y z" for i in range(len(ids))]),
        "lang": pa.array(["en"] * len(ids)),
        "source": pa.array(["s0", "s1", "s0", "s1", "s0", "s1"]),
        "n_chars": pa.array([10] * len(ids), type=pa.int64()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{d}/documents.parquet')")
        for q in ("assign_training_shards", "url_canonical_dedup",
                  "sample_stratified_rate", "sample_stratified_k"):
            res = QUERIES[q](d)
            got = (res.to_pandas() if hasattr(res, "to_pandas") else res)
            want = con.execute(ORACLES[q]).df()
            cols = sorted(got.columns)
            g = got[cols].sort_values(cols).reset_index(drop=True)
            w = want[cols].sort_values(cols).reset_index(drop=True)
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False)
            except AssertionError as e:
                raise AssertionError(f"{q}: {e}") from None


def test_compression_ratio_signal(ray_session):
    """Scalar parity + the signal's defining property: repetitive text
    compresses to a much lower ratio than natural-entropy text."""
    import os
    import tempfile
    import zlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from json_remedy_ray.functions.queries import compression_ratio_documents

    rep = "spam ham " * 200
    rng = np.random.default_rng(0)
    nat = "".join(chr(97 + int(c)) + (" " if i % 7 == 0 else "")
                  for i, c in enumerate(rng.integers(0, 26, 1600)))
    rows = [{"doc_id": 0, "text": rep}, {"doc_id": 1, "text": nat},
            {"doc_id": 2, "text": ""}]
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pylist(rows),
                       os.path.join(d, "documents.parquet"))
        out = (compression_ratio_documents(d).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
    for i, r in enumerate(rows):
        b = r["text"].encode()
        assert out.loc[i, "raw_len"] == len(b)
        assert out.loc[i, "compressed_len"] == len(zlib.compress(b, 6))
    assert out.loc[0, "ratio_micro"] < out.loc[1, "ratio_micro"] // 3
    assert out.loc[2, "ratio_micro"] == 0


def test_running_total_planted_hot_user(ray_session, tmp_path):
    """Running-sum two-phase carry: a planted hot user (>50% of rows,
    salted into many time buckets) must hash-match the DuckDB running
    window exactly — including NEGATIVE values (the per-segment base is
    a repeat, not a maximum.accumulate) and a NULL value row."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from json_remedy_ray.functions.queries import (
        ORACLES,
        events_running_total,
    )

    d = str(tmp_path / "run")
    os.makedirs(d)
    rng = np.random.RandomState(5)
    n_hot, n_cold_users = 1200, 20
    hot_ts = (np.datetime64("2024-01-01T00:00:00", "us")
              + (np.sort(rng.randint(0, 10 * 86400, n_hot))
                 * 1_000_000).astype("timedelta64[us]"))
    cold_ids = np.repeat(np.arange(2, 2 + n_cold_users), 40)
    cold_ts = (np.datetime64("2024-01-03T00:00:00", "us")
               + (rng.randint(0, 5 * 86400, len(cold_ids))
                  * 1_000_000).astype("timedelta64[us]"))
    n = n_hot + len(cold_ids)
    vals = rng.uniform(-50, 50, n)           # negatives exercised
    vals[7] = np.nan                         # mid-stream NULL
    vals[0] = np.nan                         # LEADING NULL (the hot
    # user's first event: a pure SQL window SUM is NULL here, the
    # engine's zero-fill contract says 0 — the oracle COALESCEs)
    ev = pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "ts": pa.array(np.concatenate([hot_ts, cold_ts])),
        "user_id": pa.array(np.concatenate(
            [np.ones(n_hot, np.int64), cold_ids]), type=pa.int64()),
        "event_type": pa.array(["a"] * n),
        "value": pa.array(vals, from_pandas=True),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(ev, f"{d}/events.parquet")
    got = (events_running_total(d, salt_bucket_hours=12).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    want = (con.execute(ORACLES["events_running_total"]).df()
            .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "run_v100"]],
        want[["event_id", "user_id", "run_v100"]], check_dtype=False)
