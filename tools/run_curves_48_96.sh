#!/bin/bash
# Reproduces results/curves_48_96_1m.csv: per-tier QPS-vs-recall sweep
# (kernel / 3-shard / BSP) over the bucketed layout run_soak_48_96.sh
# persisted. ~35 min on 16 threads.
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_CPUS=16 java -Xmx8g $OPENS -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64 \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.TierCurves --warehouse target/soak/warehouse --db graft_soak_48_96 \
  --evalQ 200 --dim 64 --centers 16 --noise 1.5 --trainQ 200000 \
  --mPjbp 48 --lPjpq 96 --shuffle 128 \
  --tiers kernel,sharded,bsp --out target/curves_48_96.csv
