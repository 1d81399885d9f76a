#!/bin/bash
# Controlled bench protocol (SCALE.md discipline): N quiet-window runs at
# sf0.1 on the final tree; capture the one-line JSON ledger + the stderr
# '[bench full names]' line per run. Do NOT run other sbt commands while
# this loops — sbt serializes on a project lock and pollutes timings.
#
# GATE (r20 verdict ask #4): the script REFUSES a dirty source tree (the
# closing protocol must postdate the final code commit), records the HEAD
# sha it measured, and after the loop runs graft.ProtocolGate, which
# FAILS (rc 1) when any QUIET-LAUNCH run has a row beyond 2.5x its
# committed BenchProtocol floor — a regression must stop the round, not
# just flag the artifact.
set -u
N="${1:-6}"
OUT="${2:-/tmp/bench_protocol_r21}"
if [ -n "$(git -C "$(dirname "$0")/.." status --porcelain -- src build.sbt project)" ]; then
  echo "REFUSING: uncommitted src/build changes — commit first; the"
  echo "closing protocol must measure a committed tree." >&2
  exit 2
fi
mkdir -p "$OUT"
git -C "$(dirname "$0")/.." rev-parse HEAD > "$OUT/head.sha"
date -u +%FT%TZ > "$OUT/started_at"
for i in $(seq 1 "$N"); do
  LAUNCH="$(cut -d' ' -f1 /proc/loadavg)"
  echo "$LAUNCH" > "$OUT/run$i.launchload"
  echo "=== run $i ($(date +%H:%M:%S), launch loadavg $LAUNCH) ==="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
    >"$OUT/run$i.stdout" 2>"$OUT/run$i.stderr"
  grep -h '^{"metric"' "$OUT/run$i.stdout" | python3 -c '
import json,sys
d=json.loads(sys.stdin.readline())
print("total", d["value"], "s tiers", d.get("tiers"), "loadavg",
      d.get("loadavg"), "noisy", d.get("noisy"),
      "errors", len(d.get("errors", [])))'
done
sbt -batch "runMain graft.ProtocolGate $OUT" | grep -E "^run|^PROTOCOL"
exit "${PIPESTATUS[0]}"
