#!/usr/bin/env python3
"""Merge the r13 sf1 sweep's base report with its quiet re-check patches
into the committed CORRECTNESS_SF1 artifact.

The base sweep's long-lived DuckDB connection OOM-failed an 86-query
stretch (container vm.max_map_count exhaustion under concurrent load —
see NOTES_r13); those queries were re-checked on quiet, serial runs with
the raised map count. Later patches win per query; every value still
comes from the same dump tree (one git tree state per query — the two
queries whose code changed mid-round, decontaminate_scrub and
dedup_simhash_pairs, had their dumps regenerated on the final tree
before patch1 ran).

Usage: merge_sf1_artifact.py out.json base.json patch1.json [patch2...]
"""
import json
import sys


def main(out: str, paths: list) -> None:
    merged = {}
    for p in paths:
        try:
            merged.update(json.load(open(p)))
        except FileNotFoundError:
            print(f"skip missing {p}")
    n_pass = sum(1 for v in merged.values()
                 if v.get("rows_match") and v.get("schema_match")
                 and v.get("hash_match"))
    print(f"{len(merged)} queries, {n_pass} all-green")
    with open(out, "w") as f:
        json.dump(merged, f, indent=2, sort_keys=True)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
