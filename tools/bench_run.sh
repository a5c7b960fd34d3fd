#!/bin/bash
# One pinned bench run with /proc/stat steal sampling (VERDICT r18 item 6:
# steal sampled on EVERY run including the pin). Usage: bench_run.sh N
# Writes /tmp/bench_r20_runN.json and /tmp/steal_r20_runN.log.
set -u
N="${1:?run number}"
OUT="/tmp/bench_r20_run${N}.json"
STEAL="/tmp/steal_r20_run${N}.log"
LOG="/tmp/bench_r20_run${N}.out"
cd /root/repo
# Stale artifacts from an earlier run with the same N would feed the summary
# below misleading totals (r19 ADVICE item 2) — clear them first.
rm -f "$OUT" "$STEAL" "$LOG"
# steal sampler: 5 s cadence, (steal, total) jiffies deltas
(
  prev_steal=0; prev_total=0
  while :; do
    read -r _ u n sys idle io irq sirq st _ < /proc/stat
    total=$((u + n + sys + idle + io + irq + sirq + st))
    if [ "$prev_total" -ne 0 ]; then
      ds=$((st - prev_steal)); dt=$((total - prev_total))
      echo "$(date +%s) steal_jiffies=$ds total_jiffies=$dt pct=$(python3 -c "print(f'{100*$ds/max(1,$dt):.3f}')")"
    fi
    prev_steal=$st; prev_total=$total
    sleep 5
  done
) >> "$STEAL" &
SAMPLER=$!
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT="$OUT" \
  sbt -batch "runMain graft.Bench" > "$LOG" 2>&1
RC=$?
kill "$SAMPLER" 2>/dev/null
echo "bench run $N exit=$RC out=$OUT"
if [ "$RC" -ne 0 ]; then
  echo "sbt failed (rc=$RC) — skipping JSON summary"; exit "$RC"
fi
python3 - "$OUT" <<'EOF'
import json, sys
try:
    d = json.load(open(sys.argv[1]))
    print(f"total={d['value']:.1f}s n={len(d['queries'])} errors={d.get('errors')}")
except Exception as e:
    print("PARSE FAIL:", e)
EOF
