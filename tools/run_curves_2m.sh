#!/bin/bash
# Per-tier QPS-vs-recall curves over the persisted 2M x 128d (32,48)
# bucketed layout written by tools/run_soak_2m.sh --mPjbp 32 --lPjpq 48.
# Kernel tier includes the reference's sweep tail (l=500/1000/2000 —
# run_roargraph_search_test.sh:13 sweeps to 2000); the in-RAM index at
# 2M x 128d (~1 GiB vectors + adjacency) needs the 12 GiB heap.
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_CPUS=16 java -Xmx12g $OPENS -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64 \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.TierCurves --warehouse target/soak2m/warehouse --db graft_soak_2m \
  --dim 128 --centers 16 --noise 1.5 --evalQ 200 --shuffle 128 \
  --lSweep 10,20,30,40,50,75,100,150,200,300 --lTail 500,1000,2000 \
  --mPjbp 32 --lPjpq 48 --trainQ 40000 \
  --out results/curves_32_48_2m.csv "$@"
