#!/bin/bash
# Quiet-window scaling hunter: poll loadavg, fire ONE interleaved
# scaling round (bench.py --scaling, 2-core + 8-core spark-submit
# children, each rep load-gated) only when the host is calm, log one
# JSON line per attempt. Best docs/s per config ACROSS attempts is the
# code's number — a burst that hits one attempt penalizes both configs
# of that attempt equally and is visible in its all_reps load columns.
OUT=${1:-/root/repo/bench_data/scaling_hunt_r4.jsonl}
MAX=${2:-8}
n=0
while [ "$n" -lt "$MAX" ]; do
  read l1 l5 _ < /proc/loadavg
  ok=$(python3 -c "print(1 if float('$l1')<0.7 and float('$l5')<1.5 else 0)")
  if [ "$ok" = "1" ]; then
    n=$((n+1))
    start_load=$(cat /proc/loadavg)
    line=$(SPARK_GRAFT_SUBMIT=1 SPARK_GRAFT_SCALE_PAIR=2,8 \
      SPARK_GRAFT_BENCH_DOCS=240000 SPARK_GRAFT_SCALING_ROUNDS=1 \
      timeout 900 python bench.py --scaling 2>/dev/null | tail -1)
    line=$(python3 - "$line" <<'PYEOF'
import json, sys
s = sys.argv[1] if len(sys.argv) > 1 else ""
try:
    json.loads(s)
    print(s)
except Exception:
    print("null")
PYEOF
)
    end_load=$(cat /proc/loadavg)
    echo "{\"attempt\": $n, \"load_start\": \"$start_load\", \"load_end\": \"$end_load\", \"result\": $line}" >> "$OUT"
    sleep 60
  else
    sleep 45
  fi
done
