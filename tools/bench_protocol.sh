#!/bin/bash
# Controlled bench protocol (SCALE.md discipline): N quiet-window runs at
# sf0.1 on the final tree; capture the one-line JSON ledger + the stderr
# '[bench full names]' line per run. Do NOT run other sbt commands while
# this loops — sbt serializes on a project lock and pollutes timings.
N="${1:-6}"
OUT="${2:-/tmp/bench_protocol_r16}"
mkdir -p "$OUT"
for i in $(seq 1 "$N"); do
  echo "=== run $i ($(date +%H:%M:%S), loadavg $(cut -d' ' -f1 /proc/loadavg)) ==="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
    >"$OUT/run$i.stdout" 2>"$OUT/run$i.stderr"
  grep -h '^{"metric"' "$OUT/run$i.stdout" | python3 -c '
import json,sys
d=json.loads(sys.stdin.readline())
print("total", d["value"], "s tiers", d.get("tiers"), "loadavg",
      d.get("loadavg"), "noisy", d.get("noisy"),
      "errors", len(d.get("errors", [])))'
done
