"""Driver-style correctness harness: run every ``queries()`` entry and
compare against ``oracle_sql()`` via DuckDB (row count + schema-name set
+ order-insensitive value hash), the way the driver's gate does.

Usage: python tools/check_oracles.py [--json OUT.json] [sf_dir] [name ...]

``--json`` additionally persists the per-query results in the driver's
CORRECTNESS_r{N}.json shape, so a full registry run at final HEAD can
ship with the repo (the driver gate samples a subset; the artifact
reconciles the full-set claim without a re-run).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    assert isinstance(res, pd.DataFrame)
    return res


def value_hash(df) -> str:
    import hashlib

    import pandas as pd

    df = df[sorted(df.columns)].copy()
    # canonicalize dtypes: ints -> int64, floats -> repr at 12 sig digits;
    # nulls (None/NaN/pd.NA) all canonicalize to the same token so a
    # nullable-int NULL equals a SQL NULL but NOT a float NaN literal
    def fmt_num(x):
        if pd.isna(x):
            return "null"
        return f"{float(x):.12g}"

    for c in df.columns:
        if pd.api.types.is_numeric_dtype(df[c]):
            df[c] = df[c].map(fmt_num)
        else:
            df[c] = df[c].map(
                lambda x: "null" if (not isinstance(x, (list, tuple, dict))
                                     and pd.isna(x) is True) else str(x))
    rows = sorted(tuple(r) for r in df.itertuples(index=False, name=None))
    return hashlib.sha1(repr(rows).encode()).hexdigest()[:16]


def main() -> int:
    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as e

    argv = list(sys.argv[1:])
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    qs, oracles = e.queries(), e.oracle_sql()

    # these oracles embed gate-tier fixtures/constants (sequential-crawl
    # parquets, IVF centroids) — always compare them at the gate tier,
    # exactly like tests/test_pipelines.py
    from scraper_ray.pipelines.crawl_queries import _ORACLE_TIER, PINNED_QUERIES

    pinned = "/root/testdata/" + _ORACLE_TIER
    pinned_qs = PINNED_QUERIES

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    n_pass = n_fail = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(pinned if name in pinned_qs else sf))
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False,
                             "err": f"{type(ex).__name__}: {ex}"}
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(mine)} cols={sorted(mine.columns)}"
                  f" [rows-only] {dt:.1f}s")
            results[name] = {"rows_only": True, "spark_rows": len(mine),
                             "err": None}
            n_pass += 1
            continue
        try:
            orc = con.execute(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL raised {ex}")
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "err": f"oracle: {ex}"}
            n_fail += 1
            continue
        ok_rows = len(mine) == len(orc)
        ok_cols = sorted(mine.columns) == sorted(orc.columns)
        ok_hash = ok_rows and ok_cols and value_hash(mine) == value_hash(orc)
        results[name] = {"rows_match": ok_rows, "schema_match": ok_cols,
                         "hash_match": ok_hash, "spark_rows": len(mine),
                         "oracle_rows": len(orc), "sec": round(dt, 2),
                         "err": None}
        if ok_hash:
            print(f"PASS {name}: rows={len(mine)} {dt:.1f}s")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows {len(mine)} vs {len(orc)}, "
                  f"cols_match={ok_cols} hash_match={ok_hash}")
            if ok_cols and ok_rows:
                cols = sorted(mine.columns)
                m = mine[cols].sort_values(cols).reset_index(drop=True)
                o = orc[cols].sort_values(cols).reset_index(drop=True)
                diff = (m.astype(str) != o.astype(str)).any(axis=0)
                print("  differing cols:", list(diff[diff].index))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf, "n_pass": n_pass, "n_fail": n_fail,
                       "queries": results}, f, indent=1)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    rc = main()
    import ray

    ray.shutdown()
    sys.exit(rc)
