#!/usr/bin/env python3
"""Local dev-loop mimic of the driver's correctness gate:
runs Verify's parquet dumps against DuckDB oracles on the same sf dir.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir> [jsonOut]
         [--only name1,name2]

With jsonOut, also writes a driver-style CORRECTNESS artifact:
{name: {rows_match, schema_match, hash_match}} — hash_match here means
"every value equal under the driver's column-sort + row-sort compare"
(this script checks values directly instead of hashing them).
"""
import json
import sys
import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), na_position="first",
                        ignore_index=True, kind="mergesort")
    return df


def main(sf_dir: str, out_dir: str, json_out: str = None,
         only: set = None) -> int:
    report = {}
    con = duckdb.connect()
    # spill OUTSIDE the repo: duckdb's default temp dir is cwd/.tmp, and a
    # big oracle once left a 63 GB spill there (one file even got staged
    # by a concurrent `git add -A`)
    con.execute("PRAGMA temp_directory='/tmp/duckdb_spill'")
    # r13: an explicit limit below the 80%-of-RAM default makes big
    # oracles SPILL instead of dying with "failed to allocate block"
    # when anything else holds memory; insertion-order preservation is
    # pure buffering cost here (every compare re-sorts anyway).
    # r14 (ADVICE): derive the limit from the host instead of a
    # hard-coded 64GB — min(DUCKDB_MEM_GB if set, half of physical RAM,
    # 64) so a smaller host never gets a limit ABOVE its own 80% default
    mem_gb = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") // (1 << 30)
    limit = min(int(os.environ.get("DUCKDB_MEM_GB", 64)), max(1, mem_gb // 2), 64)
    con.execute(f"SET memory_limit='{limit}GB'")
    con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        # driver testdata is one file per table; ScaleUp replicas are
        # Spark-written directories of part files — glob those
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "err": str(e)[:300]}
            n_fail += 1
            continue
        s, d = normalize(spark_df), normalize(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}")
            report[name] = {"rows_match": len(s) == len(d),
                            "schema_match": False, "hash_match": False}
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}")
            report[name] = {"rows_match": False, "schema_match": True,
                            "hash_match": False}
            n_fail += 1
            continue
        mismatches = []
        for c in s.columns:
            a, b = s[c], d[c]
            try:
                # dtype-strict, like the driver's hash: one side float and
                # the other integer/Decimal/object is a FAIL even when the
                # values coincide (this exact leniency let the r8
                # HUGEINT->float64 oracle leaks ship red — VERDICT r8 #2)
                fa = pd.api.types.is_float_dtype(a)
                fb = pd.api.types.is_float_dtype(b)
                if fa != fb:
                    mismatches.append(
                        (c, f"dtype disagreement: {a.dtype} vs {b.dtype} "
                            "(driver hash is dtype-strict)"))
                    continue
                if fa and fb:
                    af = a.astype(float)
                    bf = b.astype(float)
                    bad = ~((af == bf) | (af.isna() & bf.isna()))
                else:
                    aa = a.astype(str).where(~a.isna(), "<NA>")
                    bb = b.astype(str).where(~b.isna(), "<NA>")
                    bad = aa != bb
            except Exception as e:
                mismatches.append((c, f"compare error {e}"))
                continue
            if bad.any():
                i = bad.idxmax()
                mismatches.append((c, f"{int(bad.sum())} diffs, first@{i}: "
                                      f"{a[i]!r} vs {b[i]!r} (dtypes {a.dtype}/{b.dtype})"))
        if mismatches:
            print(f"FAIL {name}: {mismatches}")
            report[name] = {"rows_match": True, "schema_match": True,
                            "hash_match": False,
                            "detail": str(mismatches)[:300]}
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            report[name] = {"rows_match": True, "schema_match": True,
                            "hash_match": True}
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2:]
    sys.exit(main(argv[0], argv[1],
                  argv[2] if len(argv) > 2 else None, only))
