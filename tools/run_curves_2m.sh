#!/bin/bash
# Per-tier QPS-vs-recall curves over the persisted 2M x 128d (32,48)
# bucketed layout written by tools/run_soak_2m.sh --mPjbp 32 --lPjpq 48.
# The kernel and pq tiers sweep the reference's FULL 56-point L_pq grid
# (run_roargraph_search_test.sh:13 — 10..2000) so the curve is sampled
# exactly where the reference samples it; the in-RAM index at
# 2M x 128d (~1 GiB vectors + adjacency) needs the 12 GiB heap. The pq
# tier at this rung holds 32 MiB of codes against 1 GiB raw — the
# memory trade the PQ-beam serving tier exists to make.
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_CPUS=16 java -Xmx12g $OPENS -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64 \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.TierCurves --warehouse target/soak2m/warehouse --db graft_soak_2m \
  --dim 128 --centers 16 --noise 1.5 --evalQ 200 --shuffle 128 \
  --lSweep 10,15,20,25,30,35,40,45,50,55,60,65,70,75,80,85,90,95,100,110,120,130,140,150,160,170,180,190,200,220,240,260,280,300,350,400,450,500,550,600,650,700,750,800,900,1000,1100,1200,1300,1400,1500,1600,1700,1800,1900 \
  --lTail 2000 \
  --mPjbp 32 --lPjpq 48 --trainQ 40000 \
  --tiers kernel,pq,sharded,bsp --bspGrid 100:128,300:128,1000:512 \
  --out results/curves_32_48_2m.csv "$@"
