#!/bin/bash
# Per-tier QPS-vs-recall curves over the persisted 4M x 200d (24,32)
# bucketed layout written by tools/run_soak_4m.sh — the largest rung.
# Kernel tier includes the reference's sweep tail (l=500/1000/2000 —
# run_roargraph_search_test.sh:13 sweeps to 2000); the in-RAM index at
# 4M x 200d (~3.3 GiB vectors + ~1.3 GiB adjacency) needs the 20 GiB
# heap. The bsp grid is trimmed to points a 4M rung's wall budget
# affords (each bsp point is a multi-round distributed job over 4M
# nodes); the kernel tail pins the curve's diminishing-returns region.
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_CPUS=16 java -Xmx20g $OPENS -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64 \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.TierCurves --warehouse target/soak4m/warehouse --db graft_soak_4m \
  --dim 200 --centers 16 --noise 1.5 --evalQ 200 --shuffle 128 \
  --lSweep 10,20,30,40,50,75,100,150,200,300 --lTail 500,1000,2000 \
  --mPjbp 24 --lPjpq 32 --trainQ 50000 \
  --tiers kernel,pq,bsp --bspGrid 100:128,300:128 \
  --out results/curves_24_32_4m.csv "$@"
