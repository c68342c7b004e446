#!/bin/bash
# Cheap box-weather probe: %steal over a WINDOW-second sample of
# /proc/stat plus the 1-min loadavg — run before launching a settle or
# a bench attempt so stormy windows are skipped without burning a JVM
# boot on a doomed try. Exit 0 = quiet (steal below STEAL_MAX and load
# below LOAD_MAX), 1 = loaded.
set -u
WINDOW=${WINDOW:-20}
STEAL_MAX=${STEAL_MAX:-0.5}
LOAD_MAX=${LOAD_MAX:-2.0}
read -r _ u1 n1 s1 i1 w1 irq1 sirq1 st1 _ < /proc/stat
sleep "$WINDOW"
read -r _ u2 n2 s2 i2 w2 irq2 sirq2 st2 _ < /proc/stat
T1=$((u1+n1+s1+i1+w1+irq1+sirq1+st1)); T2=$((u2+n2+s2+i2+w2+irq2+sirq2+st2))
LOAD=$(cut -d' ' -f1 /proc/loadavg)
STEAL=$(awk -v a="$st1" -v b="$st2" -v t1="$T1" -v t2="$T2" \
  'BEGIN{printf "%.2f", (b-a)*100.0/(t2-t1)}')
echo "steal=${STEAL}% load=${LOAD} (window ${WINDOW}s)"
awk -v s="$STEAL" -v l="$LOAD" -v sm="$STEAL_MAX" -v lm="$LOAD_MAX" \
  'BEGIN{exit !(s<=sm && l<=lm)}'
