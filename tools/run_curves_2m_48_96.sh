#!/bin/bash
# Per-tier QPS-vs-recall curves over the round-10 2M x 128d (48,96)
# 200k-train bucketed layout written by tools/run_soak_2m_48_96.sh —
# the degree-lever rung. Kernel + pq tiers sweep the reference's FULL
# 56-point L_pq grid (run_roargraph_search_test.sh:13 — 10..2000),
# median-of-3 timing; pq knobs identical to the round-9 (32,48) curves
# (m=32 -> 4-d subspaces, refine 300) so the two CSVs are directly
# comparable: the tier's value proposition is that over a navigable
# graph it crosses 0.85 recall at LOW L (VERDICT r9 task 6). 18 GiB
# heap: the in-RAM kernel holds 1 GiB vectors + ~0.77 GiB adjacency
# at degree cap 2x the (32,48) layout's.
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_CPUS=16 java -Xmx18g $OPENS -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64 \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.TierCurves --warehouse target/soak2m/warehouse --db graft_soak_2m_48_96 \
  --dim 128 --centers 16 --noise 1.5 --evalQ 200 --shuffle 128 --reps 3 \
  --lSweep 10,15,20,25,30,35,40,45,50,55,60,65,70,75,80,85,90,95,100,110,120,130,140,150,160,170,180,190,200,220,240,260,280,300,350,400,450,500,550,600,650,700,750,800,900,1000,1100,1200,1300,1400,1500,1600,1700,1800,1900 \
  --lTail 2000 \
  --pqM 32 --pqRefine 300 \
  --tiers kernel,pq,bsp --bspGrid 100:128,300:128,1000:512 \
  --out results/curves_48_96_2m.csv "$@"
