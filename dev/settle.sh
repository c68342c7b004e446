#!/bin/bash
# Per-key quiet-window settle runner.
#
# Round-11 finding (dev/BENCH_NOTES.md): this guest's host intermittently
# stalls the clockevent path — sustained full-box runs start healthy and
# then collapse into kernel-time storms that loadavg never shows, so one
# long bench JVM cannot produce a trustworthy line. Instead: run each key
# in its OWN short JVM and accept the sample only if that JVM's warm
# sentinel (median-of-3 q6, measured at start) and whole-run steal%% both
# read healthy; otherwise wait and retry. The next key's warm sentinel
# also brackets the previous key's run window.
#
# Usage: dev/settle.sh k1,k2,... [outdir]   (env: SPARK_GRAFT_SF_DIR, N, CPUS)
set -u
cd "$(dirname "$0")/.."
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
N=${SPARK_GRAFT_BENCH_N:-3}
CPUS=${SPARK_GRAFT_CPUS:-32}
KEYS=${1:?usage: settle.sh k1,k2,... [outdir]}
OUT=${2:-/tmp/graft_settle}
WARM_MAX=${WARM_MAX:-0.45}
STEAL_MAX=${STEAL_MAX:-1.0}
TRIES=${TRIES:-6}
mkdir -p "$OUT"
CP="target/scala-2.13/classes:src/main/resources:/opt/spark/jars/*"
AO=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  AO="$AO --add-opens java.base/$p=ALL-UNNAMED"
done
for k in ${KEYS//,/ }; do
  for try in $(seq 1 "$TRIES"); do
    SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_BENCH_N=$N \
    SPARK_GRAFT_BENCH_ONLY=$k \
      timeout 1200 java $AO -Xmx24g -Dspark.ui.enabled=false \
        -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench \
        > "$OUT/$k.$try.out" 2> "$OUT/$k.$try.err"
    # the compact line is the LAST stderr line; pull warm + steal from it
    compact=$(grep '^{"metric"' "$OUT/$k.$try.err" | tail -1)
    warm=$(sed -n 's/.*"warm":\([0-9.]*\).*/\1/p' <<<"$compact")
    steal=$(sed -n 's/.*"steal":\([0-9.-]*\).*/\1/p' <<<"$compact")
    if [ -n "$warm" ] && \
       awk -v w="$warm" -v s="${steal:-99}" -v wm="$WARM_MAX" -v sm="$STEAL_MAX" \
           'BEGIN{exit !(w<=wm && s<=sm)}'; then
      echo "ACCEPT $k try=$try warm=$warm steal=$steal $compact"
      break
    fi
    echo "RETRY  $k try=$try warm=${warm:-?} steal=${steal:-?} (box not quiet)"
    [ "$try" -lt "$TRIES" ] && sleep 90
  done
done
