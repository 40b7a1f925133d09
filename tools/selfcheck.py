#!/usr/bin/env python3
"""Local pre-flight mimic of the driver's correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [--json OUT.json]

Reads each <outDir>/<name> parquet written by graft.Verify, runs the
matching oracle_sql.json entry in DuckDB over <sfDir>'s tables, sorts
columns by name + rows by all columns, and diffs values.

With --json, additionally writes a driver-shaped per-query map
{name: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err}} so each round carries a committed correctness board even if the
driver's own CORRECTNESS_r{N}.json artifact goes dark (it shipped empty
in round 13).
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: selfcheck.py <sfDir> <outDir> [--json OUT.json]")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    if len(argv) != 2:
        sys.exit("usage: selfcheck.py <sfDir> <outDir> [--json OUT.json]")
    sf_dir, out_dir = argv[0], argv[1]
    board = {}

    def record(name, rows_match, schema_match, hash_match,
               spark_rows=None, oracle_rows=None, err=None, mode="oracle"):
        # err stays null on every success; rows-only successes carry
        # mode='rows_only' instead (r14 advice: a consumer treating
        # err != null as failure must not misclassify them)
        board[name] = {"rows_match": rows_match, "schema_match": schema_match,
                       "hash_match": hash_match, "spark_rows": spark_rows,
                       "oracle_rows": oracle_rows, "err": err, "mode": mode}

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = os.environ.get("SPARK_GRAFT_ONLY", "")
    if only:
        keep = set(only.split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            record(name, False, False, False, err=f"no spark output: {str(e)[:200]}")
            failures += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {str(e)[:200]}")
            record(name, False, False, False, spark_rows=len(got),
                   err=f"oracle error: {str(e)[:200]}")
            failures += 1
            continue
        got, exp = canon(got), canon(exp)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            record(name, len(got) == len(exp), False, False,
                   spark_rows=len(got), oracle_rows=len(exp),
                   err=f"columns {list(got.columns)} vs {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            record(name, False, True, False, spark_rows=len(got),
                   oracle_rows=len(exp), err="row count mismatch")
            failures += 1
            continue
        mismatch = None
        ga, ea = got.to_numpy(), exp.to_numpy()
        for i in range(len(got)):
            for j in range(len(got.columns)):
                if not cells_equal(ga[i][j], ea[i][j]):
                    mismatch = (i, got.columns[j], ga[i][j], ea[i][j])
                    break
            if mismatch:
                break
        if mismatch:
            i, c, g, e = mismatch
            print(f"FAIL {name}: row {i} col {c}: spark={g!r} oracle={e!r}")
            record(name, True, True, False, spark_rows=len(got),
                   oracle_rows=len(exp),
                   err=f"row {i} col {c}: spark={g!r} oracle={e!r}")
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
            record(name, True, True, True, spark_rows=len(got),
                   oracle_rows=len(exp))
    rows_only = set()
    import glob
    for p in glob.glob(f"{out_dir}/*"):
        n = os.path.basename(p)
        # with SPARK_GRAFT_ONLY set, outputs outside the filter are not
        # rows-only queries — they're just not under check this run
        if only and n not in keep:
            continue
        if os.path.isdir(p) and n not in oracle:
            try:
                cnt = len(pd.read_parquet(p))
                if cnt == 0:
                    # a rows-only query that returns nothing is
                    # indistinguishable from a broken one — fail it
                    print(f"FAIL {n}: rows-only query returned 0 rows")
                    record(n, False, None, None, spark_rows=0,
                           err="rows-only query returned 0 rows",
                           mode="rows_only")
                    failures += 1
                else:
                    print(f"ROWS {n}: {cnt} rows (no oracle)")
                    record(n, True, None, None, spark_rows=cnt,
                           mode="rows_only")
            except Exception as e:
                print(f"FAIL {n}: unreadable rows-only output ({e})")
                record(n, False, None, None,
                       err=f"unreadable rows-only output: {str(e)[:200]}",
                       mode="rows_only")
                failures += 1
    if json_out:
        with open(json_out, "w") as f:
            json.dump({k: board[k] for k in sorted(board)}, f, indent=1)
            f.write("\n")
        print(f"wrote {json_out} ({len(board)} queries)")
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
