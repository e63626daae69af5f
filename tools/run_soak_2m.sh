#!/bin/bash
# Reproduces the SCALE.md 2M x 128d beyond-broadcast soak rung
# (corpus + 100k-train kNN + distributed build + BSP search) on
# 16 threads / 6 GiB heap. Default knobs below are (24,32) — the
# attempt-2 configuration that completed end-to-end. Append overrides
# to run other knobs (later --key wins), e.g. the (32,48) quality rung
# whose first attempt exhausted single-box scratch before the per-batch
# supply-pool fix:
#   tools/run_soak_2m.sh --mPjbp 32 --lPjpq 48
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_CPUS=16 java -Xmx6g $OPENS -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64 \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.ScaleSoak --n 2000000 --dim 128 --trainQ 100000 --mSq 32 --mPjbp 24 --lPjpq 32 \
  --fw 4 --p2b 16 --shuffle 128 --seeds 128 --l 300 --tier dist \
  --out target/soak2m --db graft_soak_2m "$@"
