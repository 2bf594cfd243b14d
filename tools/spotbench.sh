#!/bin/bash
# Fresh-session per-query spot bench — the session-drift attributor.
#
# The driver's BENCH_r{N}.json times all 187 queries in ONE JVM, so a
# query's in-pack number carries whatever the 186 neighbours left
# behind (JIT state, GC pressure, accumulated artifacts, state-store
# handles). The r15 verdict measured the carried streaming/DML families
# ~+25% in-pack vs r14 with NO plan change in the diff; this tool
# separates "the query got slower" from "the pack got heavier" by
# running each named query in its OWN fresh JVM (warmup + measured
# pass, same Bench harness, SPARK_GRAFT_ONLY filter) and printing one
# JSON line per query for diffing against the in-pack numbers.
#
# Usage: tools/spotbench.sh [sfDir] [q1,q2,...]
#   default queries: the r15 drift suspects (q52/q70/q75/q86/q96)
set -e
cd /root/repo
# loadavg gate (r16 verdict ask #6): numbers from a loaded box are
# artifacts, not measurements — warn up front; the convention is that
# README/COVERAGE never quote a run that started above loadavg 2.
LOAD=$(cut -d' ' -f1 /proc/loadavg)
if awk "BEGIN{exit !($LOAD > 2.0)}"; then
  echo "[spotbench] WARNING: loadavg $LOAD > 2 at start — re-run on a quiet box before quoting" >&2
fi
SF=${1:-/root/testdata/sf0.1}
QUERIES=${2:-q52_dedup_minhash,q70_stream_tumbling,q75_stream_join,q86_mor_dml,q96_keyless_dml}
JAR=target/scala-2.13/icebergrestcatalogspark_2.13-0.1.0.jar
[ -f "$JAR" ] || { sbt -batch package > /tmp/sbt_package.log 2>&1; }
IFS=',' read -ra QS <<< "$QUERIES"
for q in "${QS[@]}"; do
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_ONLY="$q" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT="/tmp/spotbench_$q.json" \
  /opt/spark/bin/spark-submit \
    --driver-memory "${SPARK_DRIVER_MEM:-8g}" \
    --conf spark.ui.enabled=false \
    --conf spark.sql.session.timeZone=UTC \
    --class graft.Bench "$JAR" 2>/dev/null | grep '"metric"' \
    | sed "s/^/{\"spot\":\"$q\"} /"
done
