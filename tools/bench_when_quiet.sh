#!/bin/bash
# Watch host load and run the sf0.1 bench only inside a quiet window.
# The host has bursty external contention (see README bench methodology):
# artifacts captured during a burst self-flag "contended":true and are
# useless for regression tracking. This loop waits for load1 AND load5
# below the threshold, runs Bench INTO A SCRATCH PATH, and promotes the
# artifact to bench_out.json ONLY if it came out uncontended — a noisy
# host cannot overwrite the committed artifact by construction (the r8
# notes/artifact contradiction is impossible now, r8 verdict item 7).
set -u
cd /root/repo
THRESH=${THRESH:-1.2}
MAX_ATTEMPTS=${MAX_ATTEMPTS:-5}
attempt=0
while [ $attempt -lt $MAX_ATTEMPTS ]; do
  read l1 l5 _ < /proc/loadavg
  ok=$(awk -v a="$l1" -v b="$l5" -v t="$THRESH" 'BEGIN{print (a<t && b<t) ? 1 : 0}')
  if [ "$ok" != "1" ]; then
    echo "$(date +%H:%M:%S) load $l1/$l5 >= $THRESH — waiting"
    sleep 120
    continue
  fi
  attempt=$((attempt+1))
  scratch=/tmp/bench_attempt_$attempt.json
  echo "$(date +%H:%M:%S) quiet (load $l1/$l5) — bench attempt $attempt"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_OUT=$scratch \
    timeout 2400 sbt -batch "runMain graft.Bench" > /tmp/bench_quiet_$attempt.log 2>&1
  # promotion bar (r14): the spread-based contended flag misses steady
  # theft that inflates every sample equally — require the DIRECT
  # evidence too: total hypervisor steal across all queries below
  # STEAL_BUDGET_MS (default 3000 ms over a ~45 s run = <7% theft).
  if python3 -c "
import json, sys
d = json.load(open('$scratch'))
steal = sum(d.get('steal_ms', {}).values())
ok = (not d['contended']) and d['failed_count'] == 0 \
    and steal <= ${STEAL_BUDGET_MS:-3000}
print(f'contended={d[\"contended\"]} failed={d[\"failed_count\"]} steal_ms={steal}')
sys.exit(0 if ok else 1)"; then
    cp "$scratch" bench_out.json
    echo "$(date +%H:%M:%S) SUCCESS: uncontended artifact promoted to bench_out.json (attempt $attempt)"
    exit 0
  fi
  echo "$(date +%H:%M:%S) attempt $attempt came out contended or incomplete — kept OLD bench_out.json, retrying"
  sleep 60
done
echo "giving up after $MAX_ATTEMPTS attempts; bench_out.json still holds the last PROMOTED (uncontended) artifact"
exit 1
