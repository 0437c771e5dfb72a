"""Deterministic Common-Crawl-style webpages corpus (input_hint shape).

Synthesizes the flagship input table
``(url: string, warc_ts: timestamp[us], html: binary, text: large_string,
lang: string)`` from the driver's ``documents`` table — no external
data, no RNG state: every field is a pure function of ``doc_id`` (seeded
by FNV-style integer mixing), so any scale factor regenerates
byte-identically and in parallel.

A deterministic fraction of pages embeds malformed JSON drawn from the
fixture grammar (code fences, Python literals, unquoted keys,
truncations, multiple values, comments — the categories of
FIXTURES.md §1); hosts follow a Zipf-ish skew so the salted
host-partitioning path is actually exercised (north_rule: explicit
skew handling).
"""

from __future__ import annotations

import pyarrow as pa

# Zipf-skewed host pool: host i is picked with weight ~ 1/(i+1)
_HOSTS = [
    "popular.example.com", "big-news.example.org", "forum.example.net",
    "blog.example.io", "shop.example.com", "wiki.example.org",
    "docs.example.dev", "mail.example.net", "app.example.co", "cdn.example.com",
    "alpha.example.site", "beta.example.site", "gamma.example.site",
    "delta.example.site", "epsilon.example.site", "zeta.example.site",
]
_CUM_WEIGHTS: list[float] = []
_total = 0.0
for _i in range(len(_HOSTS)):
    _total += 1.0 / (_i + 1.0)
    _CUM_WEIGHTS.append(_total)
_CUM_WEIGHTS = [w / _total for w in _CUM_WEIGHTS]

_EPOCH_US = 1_700_000_000_000_000  # fixed base timestamp (us)


def _mix(x: int) -> int:
    """Deterministic 64-bit integer mix (splitmix64 finalizer, public)."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _host_for(doc_id: int) -> str:
    u = (_mix(doc_id) & 0xFFFFFFFF) / 0x100000000
    for host, w in zip(_HOSTS, _CUM_WEIGHTS):
        if u <= w:
            return host
    return _HOSTS[-1]


# malformation grammar: templates parameterized by two deterministic ints.
# Categories mirror FIXTURES.md §1 / the reference's ExUnit corpus.
def _snippets(a: int, b: int) -> list[tuple[str, str]]:
    return [
        ("valid_fastpath", '{"id": %d, "score": %d, "ok": true}' % (a, b)),
        ("code_fence", '```json\n{"id": %d, "tags": ["t%d"]}\n```' % (a, b)),
        ("python_literals", "{'id': %d, 'active': True, 'ref': None}" % a),
        ("unquoted_keys", '{id: %d, name: "item%d", level: high}' % (a, b)),
        ("trailing_comma", '{"id": %d, "vals": [%d, %d,],}' % (a, b, a + b)),
        ("truncated", '{"id": %d, "payload": "data%d' % (a, b)),
        ("single_quotes", "{'k%d': 'v%d'}" % (a % 10, b % 10)),
        ("multiple_json", '{"a": %d}{"b": %d}' % (a, b)),
        ("comments", '{"id": %d, // row %d\n "x": 1}' % (a, b)),
        ("smart_quotes", "{“id”: %d, “name”: “row%d”}" % (a, b)),
        ("missing_delim", '{"id": %d, "inner": {"v": %d}' % (a, b)),
        ("ellipsis", '[%d, %d, ...]' % (a, b)),
    ]


_REPLICATE_STRIDE = 100_000_000


def make_webpage_batch(batch: pa.Table, text_col: str = "text",
                       id_col: str = "doc_id", lang_col: str = "lang",
                       malformed_frac: float = 0.5, replicate: int = 1) -> pa.Table:
    """map_batches transform: documents rows -> webpages rows.

    ``replicate`` > 1 deterministically clones each document under
    ``replicate`` distinct doc_ids/urls (id + k*stride) so benches can
    scale the corpus without external data; clones draw different hosts
    and malformation templates because both derive from the new id."""
    doc_ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    langs = batch[lang_col].to_pylist() if lang_col in batch.column_names else ["en"] * len(doc_ids)
    if replicate > 1:
        doc_ids = [d + k * _REPLICATE_STRIDE for k in range(replicate) for d in doc_ids]
        texts = texts * replicate
        langs = langs * replicate

    urls, tss, htmls, out_texts = [], [], [], []
    threshold = int(malformed_frac * 1000)
    for did, base_text, lang in zip(doc_ids, texts, langs):
        host = _host_for(did)
        urls.append(f"https://{host}/p/{did}")
        tss.append(_EPOCH_US + did * 1_000_000)
        h = _mix(did * 31 + 7)
        if (h % 1000) < threshold:
            snips = _snippets(did % 100_000, h % 97)
            _, snippet = snips[h % len(snips)]
            pos = (h >> 8) % 3
            if pos == 0:
                text = snippet + "\n" + base_text
            elif pos == 1:
                text = base_text + "\nHere is the data: " + snippet
            else:
                words = base_text.split()
                mid = len(words) // 2
                text = " ".join(words[:mid]) + "\n" + snippet + "\n" + " ".join(words[mid:])
        else:
            text = base_text
        out_texts.append(text)
        htmls.append(("<html><body><p>" + text + "</p></body></html>").encode())

    return pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(tss, type=pa.timestamp("us")),
        "html": pa.array(htmls, type=pa.binary()),
        "text": pa.array(out_texts, type=pa.large_string()),
        "lang": pa.array(langs, type=pa.string()),
    })


def build_webpages(sf_dir: str, out_dir: str, malformed_frac: float = 0.5,
                   replicate: int = 1, num_files: int = 128):
    """Materialize the webpages corpus for ``sf_dir`` under ``out_dir``
    (idempotent: skips if the output already exists).  Returns the path.

    ``num_files`` controls the output shard count: downstream read+map
    parallelism tracks the file/row-group count, so a 3-file corpus caps
    the whole pipeline at ~3 tasks no matter how many CPUs exist
    (measured: the flagship stopped scaling past 8 CPUs until this)."""
    import os

    import ray.data as rd

    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    ds = ds.map_batches(
        lambda b: make_webpage_batch(b, malformed_frac=malformed_frac, replicate=replicate),
        batch_format="pyarrow",
        batch_size=2048,
    )
    ds = ds.repartition(num_files)
    ds.write_parquet(out_dir)
    with open(done, "w") as f:
        f.write("ok")
    return out_dir
