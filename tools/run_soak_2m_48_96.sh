#!/bin/bash
# Round-10 headline rung: 2M x 128d at (48,96)-class knobs with 200k
# train (10%) — the DEGREE lever measured past 1M (round 9 showed the
# |train| lever saturates at 0.6330 at (32,48)/10%). Uses the
# IVF-approximate train-kNN prefix (nlist 2048, nprobe 256 = 12.5%
# probe, measured 1.0000 agreement at this exact rung) so the prefix
# costs ~1300 s instead of ~5000 s exact. Heap 16g (pools and beams are
# 2x the (32,48) run's, which peaked 8117 MiB at its 8 GiB cap); mrb 32
# halves the per-slice supply-merge scratch vs the default p2b=16.
# 24 threads (vs the earlier rungs' 16): the (48,96) self-search is
# ~2-3x the (32,48) wall at the same threads; per-task heap stays above
# the round-9 run's (16g/24 = 683 MiB/task vs 8g/16 = 512).
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_CPUS=24 java -Xmx16g $OPENS -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64 \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.ScaleSoak --n 2000000 --dim 128 --trainQ 200000 --mSq 32 \
  --mPjbp 48 --lPjpq 96 --trainKnn approx --nlist 2048 --nprobe 256 \
  --fw 4 --p2b 16 --mrb 32 --shuffle 128 --seeds 128 --l 300 --tier dist \
  --out target/soak2m --db graft_soak_2m_48_96 "$@"
