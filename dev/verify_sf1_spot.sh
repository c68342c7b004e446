#!/bin/bash
# Round-15 directive #7: one-shot sf1 correctness spot-check of the most
# plan-complex keys — ties, overflow, and boundary behavior a 10k-row
# sf0.01 corpus cannot exercise (LIMIT-cutoff tiebreaks over real tie
# populations, HAVING scalar subqueries, NOT-IN null semantics, window
# ties, interval adjacency). Runs graft.Verify at dev/sf1, retargets the
# q_full oracles' corpus paths from sf0.01 to sf1 (same rewrite
# graft.Bench's duckdb baseline applies), then replays every oracle in
# DuckDB via dev/compare.py. NOT part of the shipped library.
#
# Excluded by design: dedup_components (its oracle is a recursive
# replay that DNF'd at 10 min on sf1 — dev/BENCH_NOTES.md round 14).
set -eu
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/graft_verify_sf1}
KEYS=${SPOT_KEYS:-q2_full_min_cost_supplier,q3_full_shipping_priority,q10_full_returned_items,q11_full_important_stock,q14_full_promo_revenue,q15_full_top_supplier,q16_full_parts_supplier_cnt,q17_full_small_qty_revenue,q18_full_large_orders,q20_full_excess_suppliers,q21_full_waiting_suppliers,q22_full_global_sales,op_topk_per_group,op_percentiles,op_window_rank,op_minmax_by,op_skyline,op_merge_intervals,op_scd2_intervals,op_streaks}
rm -rf "$OUT"
CP="target/scala-2.13/classes:src/main/resources:/opt/spark/jars/*"
AO=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  AO="$AO --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_ONLY=$KEYS SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} java $AO \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx16g -cp "$CP" graft.Verify dev/sf1 "$OUT"
sed -i 's|dev/tpch_full/sf0.01/|dev/tpch_full/sf1/|g' "$OUT/oracle_sql.json"
python3 dev/compare.py dev/sf1 "$OUT" | grep -v MISSING
