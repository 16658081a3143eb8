#!/bin/bash
# Quiet-window bench hunter: poll loadavg, fire bench.py only when the
# host is calm, log one JSON line per attempt. Best-of across attempts
# is the code's number (see BENCH.md "measurement discipline").
OUT=${1:-/root/repo/bench_data/bench_hunt_r4.jsonl}
MAX=${2:-10}
n=0
while [ "$n" -lt "$MAX" ]; do
  read l1 l5 _ < /proc/loadavg
  ok=$(python3 -c "print(1 if float('$l1')<0.7 and float('$l5')<1.5 else 0)")
  if [ "$ok" = "1" ]; then
    n=$((n+1))
    start_load=$(cat /proc/loadavg)
    line=$(timeout 590 python bench.py 2>/dev/null | tail -1)
    # validate before interpolating into the JSONL record — a warning or
    # traceback as the last stdout line must become null, not corrupt
    # the log (ADVICE r3)
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
