#!/bin/bash
# Per-node SQL-metric breakdown of one registry key (r16 verdict #7:
# BreakdownMain promoted to a maintained dev tool). Prints the
# human-readable metric tree and, when OUT_JSON is set (default
# dev/breakdown_last.jsonl), writes one JSON line per plan node for
# mechanical diffing of residue adjudications.
#
# Usage: dev/breakdown.sh <key> [sfDir] [warmRuns]
#   env: OUT_JSON=<path> (set empty to skip the JSON dump)
set -eu
cd "$(dirname "$0")/.."
KEY=${1:?usage: breakdown.sh <key> [sfDir] [warmRuns]}
SF=${2:-dev/sf10}
WARM=${3:-1}
OUT_JSON=${OUT_JSON-dev/breakdown_last.jsonl}
CP="target/scala-2.13/classes:target/scala-2.13/test-classes:src/main/resources:/opt/spark/jars/*"
AO=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  AO="$AO --add-opens java.base/$p=ALL-UNNAMED"
done
# only export the env var when OUT_JSON is non-empty — an exported
# empty value would make BreakdownMain's Files.write(Paths.get(""))
# throw after the tree prints instead of skipping (r17 advice)
env ${OUT_JSON:+SPARK_GRAFT_BREAKDOWN_JSON="$OUT_JSON"} java $AO -Xmx24g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.BreakdownMain "$SF" "$KEY" "$WARM"
