#!/bin/bash
# Profile one bench query: runs Bench restricted to $1 with Spark event
# logging on, then prints a per-job time breakdown from the event log.
# Usage: tools/profile_query.sh <query_name> [iters]
set -eu
cd /root/repo
Q=$1
ITERS=${2:-1}
EVDIR=/tmp/spark-events-$Q
rm -rf "$EVDIR"; mkdir -p "$EVDIR"
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
SPARK_GRAFT_BENCH_ONLY=$Q \
SPARK_GRAFT_BENCH_ITERS=$ITERS \
SPARK_GRAFT_BENCH_OUT=/tmp/bench_profile_$Q.json \
SPARK_GRAFT_JAVA_OPTS="-Dspark.eventLog.enabled=true -Dspark.eventLog.compress=false -Dspark.eventLog.rolling.enabled=false -Dspark.eventLog.dir=file://$EVDIR" \
  sbt -batch "runMain graft.Bench" > /tmp/profile_$Q.log 2>&1
python3 tools/parse_eventlog.py "$EVDIR" "$Q"
