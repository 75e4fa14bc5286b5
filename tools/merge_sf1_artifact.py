#!/usr/bin/env python3
"""Merge an sf1 sweep's base report with its quiet re-check patches into
the committed CORRECTNESS_SF1 artifact, and gate the close-out on the
committed artifact actually REFLECTING the patches (VERDICT r13 #2: the
r13 close-out committed the unmerged base while PLANS.md claimed the
patched state — nothing failed when artifact green-count != claimed
green-count; now something does).

Usage:
  merge_sf1_artifact.py out.json base.json patch1.json [patch2 ...]
      [--adjudicate adj.json]   # {query: "PLANS.md#anchor"} — stamps an
                                # "adjudicated" field on those rows so a
                                # green-counter can tell designed deltas
                                # from failures
      [--check committed.json]  # FAIL (exit 2) if any row red in the
                                # committed artifact is green in the
                                # merge — i.e. the committed file is
                                # STALE relative to the patches

Later patches win per query; every value must come from the same git
tree state per query (regenerate dumps for queries whose code changed
mid-round before patching).
"""
import json
import sys


def is_green(v):
    return bool(v.get("rows_match") and v.get("schema_match")
                and v.get("hash_match"))


def main(argv):
    adj_path = check_path = None
    paths = []
    i = 0
    while i < len(argv):
        if argv[i] == "--adjudicate":
            adj_path = argv[i + 1]
            i += 2
        elif argv[i] == "--check":
            check_path = argv[i + 1]
            i += 2
        else:
            paths.append(argv[i])
            i += 1
    out, srcs = paths[0], paths[1:]
    merged = {}
    for p in srcs:
        try:
            merged.update(json.load(open(p)))
        except FileNotFoundError:
            print(f"skip missing {p}")
    if adj_path:
        for name, anchor in json.load(open(adj_path)).items():
            if name in merged:
                merged[name]["adjudicated"] = anchor
    n_pass = sum(1 for v in merged.values() if is_green(v))
    n_adj = sum(1 for v in merged.values()
                if not is_green(v) and "adjudicated" in v)
    n_red = len(merged) - n_pass - n_adj
    print(f"{len(merged)} queries, {n_pass} all-green, "
          f"{n_adj} adjudicated, {n_red} unexplained red")
    with open(out, "w") as f:
        json.dump(merged, f, indent=2, sort_keys=True)
    if check_path:
        committed = json.load(open(check_path))
        stale = sorted(k for k, v in committed.items()
                       if not is_green(v) and k in merged
                       and is_green(merged[k]))
        # ADVICE r14: also fail the reverse direction — a committed row
        # that is GREEN while the merged patches say red is an
        # over-claiming artifact, the more dangerous failure mode
        over = sorted(k for k, v in committed.items()
                      if is_green(v) and k in merged
                      and not is_green(merged[k]))
        if stale:
            print(f"STALE COMMITTED ARTIFACT: {len(stale)} rows red in "
                  f"{check_path} but green after merge:")
            for k in stale:
                print(f"  {k}")
            print("close-out must commit the MERGED artifact; the prose "
                  "green-count must match the committed green-count")
        if over:
            print(f"OVER-CLAIMING COMMITTED ARTIFACT: {len(over)} rows "
                  f"green in {check_path} but red after merge:")
            for k in over:
                print(f"  {k}")
        if stale or over:
            return 2
        print(f"{check_path} is consistent with the merge "
              f"({sum(1 for v in committed.values() if is_green(v))} green)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
