#!/bin/bash
# Reproduces the SCALE.md 2M x 128d beyond-broadcast soak rung
# (corpus + 100k-train kNN + distributed (32,48) build + BSP search)
# on 16 threads / 6 GiB heap. (24,32) knobs: the (32,48) attempt completed
# phase2-selfsearch but exhausted single-box scratch disk in the
# supply-merge shuffle — see SCALE.md 2M section.
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_CPUS=16 java -Xmx6g $OPENS -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64 \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.ScaleSoak --n 2000000 --dim 128 --trainQ 100000 --mSq 32 --mPjbp 24 --lPjpq 32 \
  --fw 4 --p2b 16 --shuffle 128 --seeds 128 --l 300 --tier dist \
  --out target/soak2m --db graft_soak_2m
