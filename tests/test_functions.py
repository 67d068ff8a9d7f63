"""Unit tests: string function family + IO seam."""

import pyarrow as pa
import pytest

from scraper_ray.functions.strings import (
    build_signed_url,
    clean_suffix,
    concat_key,
    extract_numeric_id,
    split_coords,
    truncate,
)


def test_extract_numeric_id():
    arr = pa.array(["house12345.html", "item/987/", "none"])
    assert extract_numeric_id(arr).to_pylist() == ["12345", "987", ""]


def test_clean_suffix():
    arr = pa.array(["楼宇(VR看房)", "plain"])
    assert clean_suffix(arr).to_pylist() == ["楼宇", "plain"]


def test_truncate():
    arr = pa.array(["x" * 300, "short"])
    out = truncate(arr, 250).to_pylist()
    assert len(out[0]) == 250 and out[1] == "short"


def test_split_coords():
    lng, lat = split_coords(pa.array(["116.39,39.90", "-73.9,40.7"]))
    assert lng.to_pylist() == [116.39, -73.9]
    assert lat.to_pylist() == [39.9, 40.7]


def test_concat_key():
    out = concat_key(pa.array(["sh", "bj"]), pa.array(["1", "2"]))
    assert out.to_pylist() == ["sh_1", "bj_2"]


def test_build_signed_url_deterministic():
    u1 = build_signed_url("http://api.test/v3/place", {"k": "1", "a": "2"}, "s3cr3t")
    u2 = build_signed_url("http://api.test/v3/place", {"a": "2", "k": "1"}, "s3cr3t")
    assert u1 == u2                      # param order canonicalized
    assert "sig=" in u1
    u3 = build_signed_url("http://api.test/v3/place", {"a": "2"}, "s3cr3t")
    assert u1 != u3


@pytest.mark.usefixtures("ray_session")
def test_read_write_roundtrip(tmp_path):
    import ray.data as rd

    from scraper_ray.sources.io import read_table, write_dataset

    ds = rd.from_items([{"a": i, "b": f"v{i}"} for i in range(100)])
    out = str(tmp_path / "t")
    write_dataset(ds, out, format="parquet")
    back = read_table(out).to_pandas().sort_values("a").reset_index(drop=True)
    assert back["b"].tolist() == [f"v{i}" for i in range(100)]
    # csv path
    csv_dir = str(tmp_path / "c")
    write_dataset(ds, csv_dir, format="csv")
    import glob

    vals: set[int] = set()
    for csv_file in glob.glob(csv_dir + "/*"):
        vals |= set(read_table(csv_file, columns=["a"]).to_pandas()["a"])
    assert vals == set(range(100))
    # lance falls back gracefully when the package is missing
    with pytest.warns(UserWarning, match="lance is not installed"):
        write_dataset(ds, str(tmp_path / "l"), format="lance")


@pytest.mark.usefixtures("ray_session")
def test_listing_split(tmp_path):
    """detail/info split + dedupe-last-wins + clamp over a small crawl."""
    from scraper_ray.crawl import CrawlConfig, crawl, read_docs
    from scraper_ray.pipelines.listing import dedupe_last_wins, split_detail_info
    from scraper_ray.synthweb import WebConfig, default_politeness, gen_seeds

    web = WebConfig(seed=9, n_entities=4, items_per_page=5, max_pages_cap=5,
                    dup_rate=0.3, alias_rate=0.2)
    pol = default_politeness(web, wave_units=32)
    out = str(tmp_path / "docs")
    crawl(gen_seeds(web, 30), CrawlConfig(web=web, politeness=pol,
                                          out_dir=out, batch_size=64))
    docs = read_docs(out)
    detail, info = split_detail_info(docs)
    d = dedupe_last_wins(detail).to_pandas()
    assert d["source_id"].is_unique
    assert (d["photo"].str.startswith("http://cdn.")).all()
    assert set(d.columns) >= {"source_id", "entity", "property_id", "title",
                              "photo", "timestamp"}
    i = dedupe_last_wins(info, order_col="page_url").to_pandas()
    assert i["source_id"].is_unique
    assert (i["n_items"] >= 0).all()
    # J1 propagation: every detail property_id is a fetched list page
    doc_ids = set(docs.to_pandas()["doc_id"])
    assert set(d["property_id"]) - {""} <= doc_ids


def test_pii_scrub_batch_planted():
    import pyarrow as pa

    from scraper_ray.pipelines.text import pii_scrub_batch

    t = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "mail me at jane.doe+x@corp.example.org today",
            "call 555-123-4567 or 555 987 6543 now",
            "customer alice met supplier bob",
            "nothing sensitive here",
        ],
    })
    out = pii_scrub_batch(t)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows[1]["clean_text"] == "mail me at <EMAIL> today"
    assert rows[1]["n_redacted"] == 1
    assert rows[2]["clean_text"] == "call <PHONE> or <PHONE> now"
    assert rows[2]["n_redacted"] == 2
    assert rows[3]["clean_text"] == "<NAME> met <NAME>"
    assert rows[3]["n_redacted"] == 2
    assert rows[4]["clean_text"] == "nothing sensitive here"
    assert rows[4]["n_redacted"] == 0


def test_flat_tokens_edges():
    """Empty batch, empty string, and single-token rows all round-trip:
    lens match, doc index aligns every flat token to its row."""
    import numpy as np
    import pyarrow as pa

    from scraper_ray.pipelines.common import flat_tokens

    t = pa.table({"text": pa.array(["a b", "", "xyz"], pa.string())})
    flat, lens, doc = flat_tokens(t)
    # "" splits to one empty token (python str.split(" ") parity)
    assert lens.tolist() == [2, 1, 1]
    assert flat.to_pylist() == ["a", "b", "", "xyz"]
    assert doc.tolist() == [0, 0, 1, 2]

    empty = pa.table({"text": pa.array([], pa.string())})
    flat, lens, doc = flat_tokens(empty)
    assert len(flat) == 0 and len(lens) == 0 and len(doc) == 0
    assert isinstance(doc, np.ndarray)


def test_keyed_repartition_sort_and_hash_modes_agree(ray_session):
    """keyed_repartition routes small exchanges through the sort
    shuffle and big ones through the hash shuffle; both must deliver
    the same co-location contract (every key's rows whole in one batch)
    and the same total content. Force each mode on the same input."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from scraper_ray.pipelines import common

    t = pa.table({
        "k": pa.array((np.arange(5000) * 7919) % 101),
        "v": pa.array(np.arange(5000)),
    })
    ds = rd.from_arrow(t)

    def collect(out):
        seen_keys: dict[int, int] = {}
        total = []
        for batch in out.iter_batches(batch_format="pyarrow",
                                      batch_size=None):
            for k in set(batch.column("k").to_pylist()):
                seen_keys[k] = seen_keys.get(k, 0) + 1
            total.extend(batch.column("v").to_pylist())
        return seen_keys, sorted(total)

    orig = common.SORT_COLOCATE_CUTOFF
    try:
        common.SORT_COLOCATE_CUTOFF = 10**9   # force sort mode
        keys_s, vals_s = collect(common.keyed_repartition(ds, ["k"]))
        common.SORT_COLOCATE_CUTOFF = -1      # force hash mode
        keys_h, vals_h = collect(common.keyed_repartition(ds, ["k"]))
    finally:
        common.SORT_COLOCATE_CUTOFF = orig
    # co-location: every key appears in exactly one batch, both modes
    assert all(c == 1 for c in keys_s.values())
    assert all(c == 1 for c in keys_h.values())
    # content equality
    assert vals_s == vals_h == list(range(5000))
    # no stray helper column leaks out of the sort mode
    assert set(keys_s) == set(keys_h)
