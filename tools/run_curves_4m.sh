#!/bin/bash
# Per-tier QPS-vs-recall curves over the persisted 4M x 200d (24,32)
# bucketed layout written by tools/run_soak_4m.sh — the largest rung.
# The kernel and pq tiers sweep the reference's FULL 56-point L_pq grid
# (run_roargraph_search_test.sh:13 — 10..2000), so the curve shape is
# sampled exactly where the reference samples it, tail included; the
# in-RAM index at 4M x 200d (~3.3 GiB vectors + ~1.3 GiB adjacency)
# needs the 20 GiB heap. The bsp grid is trimmed to points a 4M rung's
# wall budget affords (each bsp point is a multi-round distributed job
# over 4M nodes).
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_CPUS=16 java -Xmx20g $OPENS -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64 \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.TierCurves --warehouse target/soak4m/warehouse --db graft_soak_4m \
  --dim 200 --centers 16 --noise 1.5 --evalQ 200 --shuffle 128 \
  --lSweep 10,15,20,25,30,35,40,45,50,55,60,65,70,75,80,85,90,95,100,110,120,130,140,150,160,170,180,190,200,220,240,260,280,300,350,400,450,500,550,600,650,700,750,800,900,1000,1100,1200,1300,1400,1500,1600,1700,1800,1900 \
  --lTail 2000 \
  --mPjbp 24 --lPjpq 32 --trainQ 50000 \
  --tiers kernel,pq,bsp --bspGrid 100:128,300:128 \
  --out results/curves_24_32_4m.csv "$@"
