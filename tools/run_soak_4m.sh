#!/bin/bash
# 4M x 200d soak rung — one step toward the reference's 10M x 200d
# primary regime (prepare_data.sh:22-28): doubles n AND moves to the
# reference's own non-power-of-two dim over the 2M x 128d rung
# (3.1x the vector bytes). Exercises the per-batch supply-pool path at
# a scale whose un-batched supply-merge scratch (n*lPjpq*vecBytes =
# 4M*32*800B ~ 100 GB) provably cannot fit this box.
#
# Train is 50k (1.25%) rather than the 2M rung's 5%: the full 100k-train
# kNN prefix alone costs ~3.2 h at 16 threads (measured extrapolation
# from the 2M rung's 3649 s at n*trainQ*dim scaling) and does not fit a
# round's wall clock; the rung's evidence targets are scratch/dataflow
# behavior, not recall (the navigability table in SCALE.md predicts the
# quality penalty of a 1.25% train ratio).
#   tools/run_soak_4m.sh            # (24,32) default
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_CPUS=16 java -Xmx10g $OPENS -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64 \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.ScaleSoak --n 4000000 --dim 200 --trainQ 50000 --mSq 32 --mPjbp 24 --lPjpq 32 \
  --fw 4 --p2b 16 --shuffle 128 --seeds 128 --l 300 --tier dist \
  --out target/soak4m --db graft_soak_4m "$@"
