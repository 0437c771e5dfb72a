"""html_link_stats: counters + linkfarm decision on a tiny planted table."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def tiny_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("link_sf")
    docs = pa.table({
        # doc 0: link farm (div by 3 AND 5 -> farm + external + nav = 6
        # links over almost no text); doc 7: only nav links + long text
        "doc_id": pa.array([0, 7], type=pa.int64()),
        "text": pa.array(["tiny", "word " * 400]),
        "lang": pa.array(["en", "en"]),
        "source": pa.array(["s", "s"]),
        "n_chars": pa.array([4, 2000], type=pa.int64()),
    })
    pq.write_table(docs, str(d / "documents.parquet"))
    return str(d)


def test_counters_and_linkfarm(ray_session, tiny_sf):
    from json_remedy_ray.functions.queries import html_link_stats

    got = (html_link_stats(tiny_sf).to_pandas()
           .set_index("doc_id").sort_index())
    d0, d7 = got.loc[0], got.loc[7]
    assert d0["title"] == "Doc 0" and d7["title"] == "Doc 7"
    # doc 0: nav(2) + farm(3) + external(1); doc 7: nav(2) only
    assert d0["n_links"] == 6 and d7["n_links"] == 2
    assert d0["n_internal"] == 5 and d7["n_internal"] == 2
    assert bool(d0["is_linkfarm"]) and not bool(d7["is_linkfarm"])
    # span chars are the exact deletion delta and bounded by page size
    assert 0 < d0["anchor_span_chars"] < d0["page_chars"]
    assert (d0["anchor_span_chars"] * 2 >= d0["page_chars"]) == bool(
        d0["is_linkfarm"])
