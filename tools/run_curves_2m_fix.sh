#!/bin/bash
# Re-measure the two GC-corrupted kernel points of the committed 2M
# (48,96) curve (ADVICE r10 low 1: l=300 16.8 QPS, l=800 7.5 QPS vs
# ~40-54 at the neighboring points — full-GC spans that median-of-3
# could not hide at 18g). 22g heap per SCALE.md's own prescription
# (20-24g for curve rigs whose in-RAM index approaches heap scale),
# --reps 5 for a sturdier median. Kernel tier only: recall/cmps/hops
# are deterministic and already correct in the CSV; only the two QPS
# cells are re-measured, then spliced into results/curves_48_96_2m.csv
# (the splice is recorded in SCALE.md). MUST run on an otherwise idle
# box — QPS under CPU contention is the round-10 contamination lesson.
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_CPUS=16 java -Xmx22g $OPENS -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64 \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.TierCurves --warehouse target/soak2m/warehouse --db graft_soak_2m_48_96 \
  --dim 128 --centers 16 --noise 1.5 --evalQ 200 --shuffle 128 --reps 5 \
  --lSweep 300,800 --lTail "" \
  --tiers kernel \
  --out results/curves_48_96_2m_fix.csv "$@"
