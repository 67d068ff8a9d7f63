"""Hot-key salting: the (user, day)-salted sessionization and as-of
join must produce results identical to their unsalted counterparts —
including under a 50%-skew user (one key owning half the events)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda x: "null" if pd.isna(x) else str(x))
    return sorted(tuple(r) for r in df.itertuples(index=False, name=None))


@pytest.mark.usefixtures("ray_session")
def test_salted_equals_unsalted_on_driver_data():
    from scraper_ray.pipelines.temporal import (
        q_asof_join, q_asof_join_salted, q_sessions, q_sessions_salted,
    )

    assert _canon(q_sessions_salted(SF).to_pandas()) == \
        _canon(q_sessions(SF).to_pandas())
    assert _canon(q_asof_join_salted(SF).to_pandas()) == \
        _canon(q_asof_join(SF).to_pandas())


@pytest.mark.usefixtures("ray_session")
def test_salted_with_hot_user(tmp_path):
    """One user owns 50% of all events spanning many days; sessions that
    span midnight boundaries and orders on sparse days must still come
    out exactly equal to the unsalted computation."""
    rng = np.random.default_rng(17)
    n = 4000
    hot = n // 2
    users = np.concatenate([np.zeros(hot, dtype=np.int64),
                            rng.integers(1, 40, size=n - hot)])
    base = np.datetime64("2024-03-01T00:00:00")
    # hot user: bursts straddling midnights (forces boundary merges)
    hot_ts = base + (np.arange(hot) * 900 + rng.integers(0, 600, hot)
                     ).astype("timedelta64[s]")
    cold_ts = base + rng.integers(0, 86400 * 30, size=n - hot
                                  ).astype("timedelta64[s]")
    ts = np.concatenate([hot_ts, cold_ts])
    d = tmp_path / "skew"
    d.mkdir()
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "value": pa.array(np.ones(n)),
    }), str(d / "events.parquet"))
    n_ord = 300
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, 40, n_ord), pa.int64()),
        "o_orderdate": pa.array(
            (base + rng.integers(0, 86400 * 30, n_ord)
             .astype("timedelta64[s]")).astype("datetime64[us]")),
    }), str(d / "orders.parquet"))

    from scraper_ray.pipelines.temporal import (
        q_asof_join, q_asof_join_salted, q_sessions, q_sessions_salted,
    )

    assert _canon(q_sessions_salted(str(d)).to_pandas()) == \
        _canon(q_sessions(str(d)).to_pandas())
    assert _canon(q_asof_join_salted(str(d)).to_pandas()) == \
        _canon(q_asof_join(str(d)).to_pandas())
