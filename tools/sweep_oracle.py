#!/usr/bin/env python3
"""Full-tree sf1 oracle sweep with per-query process isolation.

VERDICT r13 #3: the sf1 gate needs ONE clean sweep on ONE checker
configuration with zero infra-class errors. r13's failures were all
long-lived-process resource accumulation (one DuckDB connection serving
438 sf1 oracles OOM-killed an 86-query stretch; the re-checks died of
thread exhaustion). This driver runs check_correctness.py — identical
configuration every time — in ONE SUBPROCESS PER QUERY, so each oracle
gets a fresh connection and a crash of any kind marks that query and
never takes down the sweep. Results merge into one artifact;
--adjudicate stamps designed-delta rows (same semantics as
merge_sf1_artifact.py).

Usage: sweep_oracle.py <sfDir> <verifyOutDir> <out.json>
         [--adjudicate adj.json] [--timeout SECS (default 5400)]
         [--resume prior.json]

--resume seeds the report from a prior (same-tree!) artifact and skips
every query already all-green there — recovery for a multi-hour sweep
that died partway. Non-green prior rows re-run.
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def main(argv):
    adj_path = None
    resume_path = None
    timeout = 5400
    pos = []
    i = 0
    while i < len(argv):
        if argv[i] == "--adjudicate":
            adj_path = argv[i + 1]
            i += 2
        elif argv[i] == "--timeout":
            timeout = int(argv[i + 1])
            i += 2
        elif argv[i] == "--resume":
            resume_path = argv[i + 1]
            i += 2
        else:
            pos.append(argv[i])
            i += 1
    sf_dir, out_dir, out_json = pos
    names = sorted(json.load(open(f"{out_dir}/oracle_sql.json")))
    report = {}
    skip = set()
    if resume_path:
        prior = json.load(open(resume_path))
        for k, v in prior.items():
            if k in names and v.get("rows_match") and v.get("schema_match") \
               and v.get("hash_match"):
                report[k] = v
                skip.add(k)
        print(f"resume: {len(skip)} green rows carried from {resume_path}")
    t_start = time.time()
    for n, name in enumerate(names):
        if name in skip:
            continue
        tmp = f"{out_json}.one.{name}.json"
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(HERE, "check_correctness.py"),
                 sf_dir, out_dir, tmp, "--only", name],
                capture_output=True, text=True, timeout=timeout)
            # ADVICE r14: a checker killed mid json.dump leaves a
            # truncated tmp file — treat it as checker-died for THIS
            # query instead of letting JSONDecodeError abort the sweep
            try:
                one = json.load(open(tmp)) if os.path.exists(tmp) else {}
            except (ValueError, json.JSONDecodeError):
                one = {}
            if name in one:
                report[name] = one[name]
            else:
                tail = (r.stdout + r.stderr)[-250:]
                report[name] = {"rows_match": False, "schema_match": False,
                                "hash_match": False,
                                "err": f"checker died rc={r.returncode}: {tail}"}
        except subprocess.TimeoutExpired:
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False,
                            "err": f"oracle timeout after {timeout}s"}
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
        v = report[name]
        ok = v.get("rows_match") and v.get("schema_match") and v.get("hash_match")
        print(f"[{n + 1}/{len(names)}] {'PASS' if ok else 'FAIL'} {name} "
              f"({time.time() - t0:.1f}s, total {time.time() - t_start:.0f}s)",
              flush=True)
        # checkpoint after every query so a dead sweep is resumable by eye
        with open(out_json, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
    if adj_path:
        for name, anchor in json.load(open(adj_path)).items():
            if name in report:
                report[name]["adjudicated"] = anchor
        with open(out_json, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
    n_pass = sum(1 for v in report.values()
                 if v.get("rows_match") and v.get("schema_match")
                 and v.get("hash_match"))
    n_adj = sum(1 for v in report.values()
                if "adjudicated" in v and not (
                    v.get("rows_match") and v.get("schema_match")
                    and v.get("hash_match")))
    n_infra = sum(1 for v in report.values() if "err" in v)
    print(f"\n{len(report)} queries, {n_pass} all-green, {n_adj} adjudicated, "
          f"{len(report) - n_pass - n_adj} unexplained red, "
          f"{n_infra} infra-class err")
    return 0 if n_pass + n_adj == len(report) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
