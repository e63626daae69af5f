#!/bin/bash
# Reproduces the SCALE.md round-7 headline run: 1M x 64d distributed
# (48,96) build + bucketed save + BSP search (recall@10 0.9305 at
# l=300/128 seeds). ~70 min on 16 threads / 8 GiB heap. Re-run search
# knobs cheaply afterwards with --searchOnly (see ScaleSoak scaladoc).
set -x
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_CPUS=16 java -Xmx8g $OPENS -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64 \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.ScaleSoak --n 1000000 --trainQ 200000 --mSq 32 --mPjbp 48 --lPjpq 96 \
  --fw 4 --p2b 12 --shuffle 128 --seeds 128 --l 300 --tier dist \
  --out target/soak --db graft_soak_48_96
