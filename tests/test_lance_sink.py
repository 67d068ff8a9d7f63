"""The distributed Lance sink (sources/io.py:_write_lance_distributed)
exercised against a stub ``lance`` module: every map_batches task writes
its own fragment files directly to the sink path and ships back only the
fragment-metadata JSON; the driver commits ALL fragments in ONE atomic
manifest operation. The stub pins exactly that contract — fragment JSON
round-trip, single commit, no table bytes through the driver — so the
north rule's target sink is tested even though the lance wheel isn't in
this container (a real install swaps in transparently).
"""

import json
import os
import sys
import types
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# fragment-writer helpers travel inside map_batches closures to worker
# processes, which can't import this test module — ship it by value
from ray import cloudpickle as _cp

_cp.register_pickle_by_value(sys.modules[__name__])


class FakeFragmentMetadata:
    """Mimics lance.fragment.FragmentMetadata's JSON round-trip."""

    def __init__(self, rel_path: str, num_rows: int):
        self.rel_path = rel_path
        self.num_rows = num_rows

    def to_json(self) -> str:
        return json.dumps({"rel_path": self.rel_path,
                           "num_rows": self.num_rows})

    @classmethod
    def from_json(cls, s: str) -> "FakeFragmentMetadata":
        d = json.loads(s)
        return cls(d["rel_path"], d["num_rows"])


def fake_write_fragments(table: pa.Table, path: str, schema=None):
    """Worker-side fragment write: data lands under *path* directly
    (never funnels through the driver), metadata returns."""
    os.makedirs(path, exist_ok=True)
    if schema is not None:
        table = table.cast(schema)
    name = f"frag-{uuid.uuid4().hex}.parquet"
    pq.write_table(table, os.path.join(path, name))
    return [FakeFragmentMetadata(name, table.num_rows)]


def _make_stub_lance():
    """Build stub ``lance`` + ``lance.fragment`` modules recording every
    commit into MANIFEST.json (one file per commit, so the test can
    assert single-commit semantics from disk state)."""
    lance = types.ModuleType("lance")
    fragment = types.ModuleType("lance.fragment")
    fragment.FragmentMetadata = FakeFragmentMetadata
    fragment.write_fragments = fake_write_fragments
    lance.fragment = fragment

    class LanceOperation:
        class Overwrite:
            def __init__(self, schema, fragments):
                self.schema = schema
                self.fragments = fragments

    class LanceDataset:
        @staticmethod
        def commit(path, op):
            mpath = os.path.join(path, "MANIFEST.json")
            n_prior = len(json.load(open(mpath))["commits"]) \
                if os.path.exists(mpath) else 0
            manifest = {"commits": [{
                "op": type(op).__name__,
                "schema": [[f.name, str(f.type)] for f in op.schema],
                "fragments": [{"rel_path": f.rel_path,
                               "num_rows": f.num_rows}
                              for f in op.fragments],
            }] * 1}
            manifest["commits"] = ([json.load(open(mpath))["commits"][i]
                                    for i in range(n_prior)]
                                   if n_prior else []) + manifest["commits"]
            with open(mpath, "w") as f:
                json.dump(manifest, f)

    # driver-side sequential fallback (lance-seq): append parquet parts
    def write_dataset(batch, path, mode="create"):
        os.makedirs(path, exist_ok=True)
        pq.write_table(pa.table(batch),
                       os.path.join(path, f"seq-{uuid.uuid4().hex}.parquet"))

    lance.LanceOperation = LanceOperation
    lance.LanceDataset = LanceDataset
    lance.write_dataset = write_dataset
    return lance, fragment


@pytest.fixture()
def stub_lance():
    lance, fragment = _make_stub_lance()
    sys.modules["lance"] = lance
    sys.modules["lance.fragment"] = fragment
    try:
        yield lance
    finally:
        sys.modules.pop("lance", None)
        sys.modules.pop("lance.fragment", None)


def _input_ds(n_blocks=4, rows_per_block=100):
    import ray.data as rd

    tables = [pa.table({
        "doc_id": pa.array(range(b * rows_per_block,
                                 (b + 1) * rows_per_block), pa.int64()),
        "text": pa.array([f"doc {b}/{i}" for i in range(rows_per_block)],
                         pa.string()),
    }) for b in range(n_blocks)]
    ds = rd.from_arrow(tables)
    return ds


@pytest.mark.usefixtures("ray_session")
def test_distributed_fragment_write_and_single_commit(stub_lance, tmp_path):
    from scraper_ray.sources.io import write_dataset

    out = str(tmp_path / "tbl.lance")
    ds = _input_ds()
    ret = write_dataset(ds, out, format="lance")
    assert ret == out

    manifest = json.load(open(os.path.join(out, "MANIFEST.json")))
    # ONE atomic commit carrying every fragment
    assert len(manifest["commits"]) == 1
    commit = manifest["commits"][0]
    assert commit["op"] == "Overwrite"
    # the committed manifest schema is the dataset's schema, in order
    assert commit["schema"] == [["doc_id", "int64"], ["text", "string"]]
    frag_files = sorted(f for f in os.listdir(out) if f.startswith("frag-"))
    committed = sorted(f["rel_path"] for f in commit["fragments"])
    # fragment JSON round-trip: every written fragment committed once
    assert committed == frag_files
    assert len(set(committed)) == len(committed)
    assert sum(f["num_rows"] for f in commit["fragments"]) == 400

    # the fragments on disk reassemble the exact input
    got = pa.concat_tables(
        [pq.read_table(os.path.join(out, f)) for f in frag_files])
    assert sorted(got.column("doc_id").to_pylist()) == list(range(400))
    # parallel write: more than one fragment (4 input blocks)
    assert len(frag_files) > 1


@pytest.mark.usefixtures("ray_session")
def test_lance_seq_fallback_when_fragment_api_missing(stub_lance, tmp_path):
    """Old lance builds without lance.fragment fall back to the
    sequential driver write, with a warning."""
    del stub_lance.fragment
    sys.modules.pop("lance.fragment")
    from scraper_ray.sources.io import write_dataset

    out = str(tmp_path / "seq.lance")
    with pytest.warns(UserWarning, match="lance.fragment API unavailable"):
        write_dataset(_input_ds(), out, format="lance")
    parts = [f for f in os.listdir(out) if f.startswith("seq-")]
    got = pa.concat_tables(
        [pq.read_table(os.path.join(out, f)) for f in parts])
    assert sorted(got.column("doc_id").to_pylist()) == list(range(400))
