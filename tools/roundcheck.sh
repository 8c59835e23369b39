#!/usr/bin/env bash
# One-shot full gate (README "The full gate" table, mechanized):
#   tools/roundcheck.sh [prev_bench_json]
# Runs: sbt test -> Verify @ sf0.01 -> selfcheck -> flagship smoke ->
# Bench @ sf0.1 -> bench_diff vs the previous round's BENCH json.
# Artifacts land in /tmp/roundcheck/: tests.log, verify.log, bench.json.
# Exit non-zero on the first failing step.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/roundcheck
mkdir -p "$OUT"
PREV_BENCH="${1:-$(ls BENCH_r*.json 2>/dev/null | sort | tail -1)}"

step() { echo "== [$(date +%H:%M:%S)] $1"; }

step "1/6 sbt test"
sbt -batch test >"$OUT/tests.log" 2>&1
rc=$?
grep -E "Tests: |Suites: " "$OUT/tests.log" | tail -2
[ $rc -ne 0 ] && { echo "FAIL: sbt test (see $OUT/tests.log)"; exit 1; }

step "2/6 correctness dump (Verify @ sf0.01)"
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT/verify" \
  >"$OUT/verify.log" 2>&1
rc=$?
cat "$OUT/verify/verify_errors.json" 2>/dev/null; echo
[ $rc -ne 0 ] && { echo "FAIL: Verify exited $rc (see $OUT/verify.log)"; exit 1; }

step "3/6 oracle compare (selfcheck)"
python3 tools/selfcheck.py /root/testdata/sf0.01 "$OUT/verify" | tail -1
rc=${PIPESTATUS[0]}
[ $rc -ne 0 ] && { echo "FAIL: selfcheck"; exit 1; }

step "4/6 flagship smoke"
rows=$(SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 sbt -batch "runMain graft.SmokeEntry" 2>/dev/null \
  | grep -o 'ENTRY_ROWS=[0-9]*' | cut -d= -f2)
echo "ENTRY_ROWS=$rows"
[ -z "$rows" ] || [ "$rows" -le 0 ] && { echo "FAIL: flagship smoke"; exit 1; }

step "5/6 bench @ sf0.1"
# Loadavg gate (r15 ADVICE #8): a bench taken on a loaded host is 1.5x
# noise and costs a judge adjudication pass. Wait for the 1-min loadavg
# to drop below 3 (up to 5 min); if it never does, still bench but tag
# the artifact so downstream readers know not to treat it as canonical.
LOADED=0
for i in 1 2 3 4 5; do
  LA=$(cut -d' ' -f1 /proc/loadavg)
  awk -v la="$LA" 'BEGIN{exit !(la < 3.0)}' && { LOADED=0; break; }
  LOADED=1
  echo "  loadavg $LA >= 3.0 — waiting 60s before bench (attempt $i/5)"
  sleep 60
done
[ "$LOADED" = 1 ] && echo "  WARNING: benching on loaded host (loadavg $LA) — artifact is advisory only"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>"$OUT/bench.err" | grep '"metric"' >"$OUT/bench.json"
[ -s "$OUT/bench.json" ] || { echo "FAIL: bench produced no JSON"; exit 1; }
if [ "$LOADED" = 1 ]; then
  # The tag is the whole point of the gate: an untagged loaded-host bench
  # reads as canonical downstream. If tagging fails, the artifact must
  # not be published at all.
  python3 - "$OUT/bench.json" <<'PY' || { echo "FAIL: could not tag loaded-host bench — artifact withheld"; rm -f "$OUT/bench.json"; exit 1; }
import json,sys
p=sys.argv[1]
with open(p) as f:
    lines=[json.loads(l) for l in f if l.strip()]
assert len(lines)==1, f"expected exactly one bench JSON line, got {len(lines)}"
d=lines[0]; d["loaded_host"]=True
with open(p,"w") as f:
    f.write(json.dumps(d))
PY
fi
head -c 200 "$OUT/bench.json"; echo
# ADOPTION GATE (r18 advice #7): a run whose OWN in-JVM probe tagged
# loaded_host=true (Bench samples loadavg at JVM start, which the
# pre-bench wait above cannot fully guarantee) must never be adopted
# as the round's canonical BENCH artifact. One retry after a fresh
# idle wait; if the host never goes idle, fail the step loudly rather
# than publish a noisy canonical number.
if python3 -c 'import json,sys; sys.exit(0 if json.load(open(sys.argv[1])).get("loaded_host") else 1)' "$OUT/bench.json"; then
  echo "  bench self-tagged loaded_host=true — retrying once after idle wait"
  for i in 1 2 3 4 5; do
    LA=$(cut -d' ' -f1 /proc/loadavg)
    awk -v la="$LA" 'BEGIN{exit !(la < 3.0)}' && break
    sleep 60
  done
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" 2>>"$OUT/bench.err" | grep '"metric"' >"$OUT/bench.json"
  if python3 -c 'import json,sys; sys.exit(0 if json.load(open(sys.argv[1])).get("loaded_host") else 1)' "$OUT/bench.json"; then
    mv "$OUT/bench.json" "$OUT/bench.loaded.json"
    echo "FAIL: bench still loaded_host=true after retry — artifact kept"
    echo "      as $OUT/bench.loaded.json (advisory only), NOT adoptable"
    exit 1
  fi
  head -c 200 "$OUT/bench.json"; echo
fi

step "6/6 bench diff vs ${PREV_BENCH:-<none>}"
if [ -n "${PREV_BENCH:-}" ] && [ -f "$PREV_BENCH" ]; then
  python3 tools/bench_diff.py "$PREV_BENCH" "$OUT/bench.json"
  # regressions are reported but not fatal here — judge them with the
  # noise guidance in BASELINE.md (re-measure standalone before believing)
fi
echo "== roundcheck complete; artifacts in $OUT"
