"""Unit tests: cuckoo filter + seen-shard state + sharded actor pool."""

import hashlib

import pytest

from scraper_ray.state.cuckoo import CuckooFilter, SeenShardState


def _d(i: int) -> bytes:
    return hashlib.sha1(f"url-{i}".encode()).digest()


def test_cuckoo_no_false_negatives():
    f = CuckooFilter(capacity=4096)
    for i in range(3000):
        f.insert(_d(i))
    assert all(f.contains(_d(i)) for i in range(3000))


def test_cuckoo_low_false_positive_rate():
    f = CuckooFilter(capacity=4096)
    for i in range(3000):
        f.insert(_d(i))
    fp = sum(f.contains(_d(i)) for i in range(10_000, 20_000))
    assert fp / 10_000 < 0.05   # 16-bit fingerprints -> ~1e-3 expected


def test_cuckoo_overflow_keeps_correctness():
    # overfill far past capacity: inserts must never lose an item
    f = CuckooFilter(capacity=64)
    for i in range(2000):
        f.insert(_d(i))
    assert all(f.contains(_d(i)) for i in range(2000))


def test_shard_state_add_if_new_and_order():
    st = SeenShardState(capacity=1024)
    batch = [_d(1), _d(2), _d(1), _d(3), _d(2)]
    assert st.add_if_new(batch) == [True, True, False, True, False]
    assert st.add_if_new([_d(2), _d(4)]) == [False, True]
    assert len(st) == 4


def test_shard_state_dump_load_roundtrip():
    st = SeenShardState(capacity=1024)
    st.add_if_new([_d(i) for i in range(500)])
    st2 = SeenShardState.load(st.dump())
    assert len(st2) == 500
    assert st2.add_if_new([_d(3), _d(999)]) == [False, True]
    # filter state survives too (no false negatives after reload)
    assert all(st2.filter.contains(_d(i)) for i in range(500))


@pytest.mark.usefixtures("ray_session")
def test_sharded_seen_actor_pool():
    from scraper_ray.state.seen import ShardedSeen

    seen = ShardedSeen(n_shards=3, capacity_per_shard=1024)
    digests = [_d(i) for i in range(200)] + [_d(5), _d(6)]
    mask = seen.add_if_new(digests)
    assert mask[:200].all() and not mask[200:].any()
    assert seen.total() == 200
    # snapshot/restore across a fresh pool
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        seen.snapshot(tmp)
        seen2 = ShardedSeen(n_shards=3, capacity_per_shard=1024)
        seen2.restore(tmp)
        mask2 = seen2.add_if_new([_d(0), _d(9999)])
        assert list(mask2) == [False, True]


def test_cuckoo_hypothesis_vs_set_model():
    """Property test: SeenShardState.add_if_new behaves exactly like a
    set under arbitrary insert sequences (incl. heavy duplication and
    overfill past filter capacity)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(ops=st.lists(st.integers(min_value=0, max_value=200),
                        min_size=0, max_size=400))
    def check(ops):
        st_state = SeenShardState(capacity=64)   # tiny -> forces overflow
        model: set[bytes] = set()
        for batch_start in range(0, len(ops), 7):
            batch = [_d(i) for i in ops[batch_start:batch_start + 7]]
            got = st_state.add_if_new(batch)
            want = []
            for d in batch:
                want.append(d not in model)
                model.add(d)
            assert got == want
        assert len(st_state) == len(model)
        # dump/load preserves behavior
        st2 = SeenShardState.load(st_state.dump())
        probe = [_d(i) for i in range(0, 250, 5)]
        assert st2.add_if_new(probe) == [d not in model for d in probe]

    check()


def test_delta_journal_opt_in_and_overflow(monkeypatch):
    """Delta journaling is opt-in (un-checkpointed runs grow no shadow
    set), and a journal past DELTA_CAP drops itself and forces the next
    snapshot to escalate to a full dump."""
    from scraper_ray.state.cuckoo import SeenShardState

    off = SeenShardState(1 << 10)
    off.add_if_new([bytes([i]) * 20 for i in range(8)])
    assert off.new_since_dump == [] and off.dump_delta() is None

    on = SeenShardState(1 << 10, track_deltas=True)
    on.add_if_new([bytes([i]) * 20 for i in range(8)])
    blob = on.dump_delta()
    assert blob is not None
    import pickle

    assert len(pickle.loads(blob)["delta"]) == 8
    assert on.new_since_dump == []          # journal drained

    monkeypatch.setattr(SeenShardState, "DELTA_CAP", 4)
    on.add_if_new([bytes([100 + i]) * 20 for i in range(6)])
    assert on.delta_overflow and on.dump_delta() is None
    # a full dump re-arms journaling
    on.dump()
    on.add_if_new([bytes([200]) * 20])
    assert pickle.loads(on.dump_delta())["delta"] == [bytes([200]) * 20]
