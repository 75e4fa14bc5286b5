#!/bin/bash
# Round close-out gate (VERDICT r13 #2 + #7): run before the final
# snapshot commit. Fails when
#   1. the round's NOTES file still contains placeholder sections (the
#      r13 stale-artifact miss went unnoticed because NOTES §6/§7 were
#      never filled), or
#   2. a committed sf1 artifact is STALE relative to re-check patch
#      files (delegates to merge_sf1_artifact.py --check), or
#   3. the committed sf1 artifact has unexplained red rows (neither
#      green nor adjudication-stamped) — print them for the notes.
#
# Usage: tools/closeout_check.sh <round> [sf1_artifact [patch1 ...]]
set -euo pipefail
cd "$(dirname "$0")/.."
N=${1:?usage: closeout_check.sh <round> [sf1_artifact [patches...]]}
fail=0

if grep -nE "\(filled in at close-out\)|\(quantified at close-out|\(results below — written after" "NOTES_r${N}.md"; then
  echo "FAIL: NOTES_r${N}.md still has placeholder sections"
  fail=1
else
  echo "ok: NOTES_r${N}.md has no placeholders"
fi

if [ $# -ge 2 ]; then
  art=$2; shift 2
  if [ $# -ge 1 ]; then
    python3 tools/merge_sf1_artifact.py /tmp/closeout_merge.json \
      "$art" "$@" --check "$art" || fail=1
  else
    # ADVICE r14: make the gap visible — without patch files the
    # stale/over-claim artifact check cannot run
    echo "staleness check SKIPPED (no patches given)"
  fi
  python3 - "$art" <<'EOF' || fail=1
import json, sys
d = json.load(open(sys.argv[1]))
bad = sorted(k for k, v in d.items()
             if not (v.get("rows_match") and v.get("schema_match")
                     and v.get("hash_match"))
             and "adjudicated" not in v)
if bad:
    print(f"FAIL: {len(bad)} unexplained red rows in {sys.argv[1]}:")
    for k in bad:
        print(f"  {k}: {str(d[k].get('err', d[k].get('detail', '')))[:100]}")
    sys.exit(1)
print(f"ok: {sys.argv[1]} — every non-green row is adjudicated")
EOF
fi

exit $fail
