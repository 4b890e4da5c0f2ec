#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run Verify's
parquet dumps against the DuckDB oracle SQL and diff them.

Usage: oracle_check.py <sf_dir> <verify_out_dir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify everything so dtype differences don't mask value equality
    def cell(v):
        import numpy as np
        if v is None or v is np.ma.masked:
            return "<null>"
        # DuckDB lists with NULL elements surface as numpy MaskedArray
        if isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0 \
                or isinstance(v, np.ma.MaskedArray):
            return "[" + ",".join(cell(x) for x in v) + "]"
        if v != v:
            return "<null>"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    return df.map(cell)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            fail += 1
            continue
        try:
            got = canon(con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {str(e)[:120]}")
            fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            fail += 1
            continue
        # dtype parity: the driver's hash may distinguish int32/int64 etc.
        raw_got = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        raw_want = con.sql(sql).df()
        dt_diff = [(c, str(raw_got[c].dtype), str(raw_want[c].dtype))
                   for c in raw_got.columns
                   if str(raw_got[c].dtype) != str(raw_want[c].dtype)]
        if dt_diff:
            print(f"WARN {name}: dtype mismatch {dt_diff}")
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            fail += 1
            continue
        neq = (got.values != want.values)
        if neq.any():
            import numpy as np
            r, c = np.argwhere(neq)[0]
            print(f"FAIL {name}: first diff row {r} col {got.columns[c]}: "
                  f"spark={got.iloc[r, c]!r} oracle={want.iloc[r, c]!r}")
            fail += 1
            continue
        ok += 1
        print(f"OK   {name} ({len(got)} rows)")
    print(f"\n{ok} ok, {fail} fail, "
          f"{len(json.load(open(f'{out_dir}/oracle_sql.json')))} total with oracle")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
