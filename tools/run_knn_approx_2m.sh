#!/bin/bash
# Measures the approximate train-kNN prefix (KnnJoin.ivfApprox) against
# the exact prefix at the 2M x 128d rung (VERDICT r8 #5): same corpus,
# same 200k train set, same box. ScaleSoak --knnOnly writes the approx
# lists next to the exact ones and prints {"knn_agreement":...} (mean
# top-32 overlap vs the exact file) when the exact prefix exists.
# Speedup = the exact run's "train->base kNN written in X s" line vs
# this run's. nlist 2048 ~ sqrt(n); nprobe 256 probes 12.5% of lists
# (an ~8x flop cut on the scan; routing adds one nlist*dim map pass).
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_CPUS=16 java -Xmx12g $OPENS -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64 \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.ScaleSoak --n 2000000 --dim 128 --trainQ 200000 --mSq 32 \
  --trainKnn approx --nlist 2048 --nprobe 256 --knnOnly \
  --shuffle 128 --tier dist --out target/soak2m --db graft_soak_2m "$@"
