#!/bin/bash
# Per-tier QPS-vs-recall curves over the 10M x 200d (48,96) 500k-train
# bucketed layout written by tools/run_build_10m.sh — the reference's
# PRIMARY regime (prepare_data.sh:22-28). Kernel + pq tiers sweep the
# reference's FULL 56-point L_pq grid (run_roargraph_search_test.sh:13
# — 10..2000), median-of-3 timing.
#
# Sizing (VERDICT r11 task 3): 10M x 200d raw vectors ~ 8 GB + adjacency
# at degree cap 144 ~ 5.8 GB -> the in-RAM kernel tier needs the 24 GiB
# heap; the pq tier's codes are ~320 MB (m=50 4-d subspaces at 200d,
# pqM 50) — the 16-25x resident-set cut this tier exists for, and the
# regime where the 4M measurement predicts 3-8x QPS separation over the
# raw kernel once the raw index outgrows cache. pqRefine 300 matches the
# 2M curve knobs for comparability. bsp grid trimmed: each bsp point is
# a multi-round distributed job over 10M nodes.
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
CP_DIR="${GRAFT_CLASSES:-target/scala-2.13/classes}"
SPARK_GRAFT_CPUS=16 java -Xmx24g $OPENS -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64 \
  -cp "$CP_DIR:/opt/spark/jars/*" \
  graft.tools.TierCurves --warehouse target/soak10m/warehouse --db graft_soak_10m_48_96 \
  --dim 200 --centers 16 --noise 1.5 --evalQ 200 --shuffle 128 --reps 3 \
  --lSweep 10,15,20,25,30,35,40,45,50,55,60,65,70,75,80,85,90,95,100,110,120,130,140,150,160,170,180,190,200,220,240,260,280,300,350,400,450,500,550,600,650,700,750,800,900,1000,1100,1200,1300,1400,1500,1600,1700,1800,1900 \
  --lTail 2000 \
  --pqM 50 --pqRefine 300 --trainQ 500000 \
  --tiers kernel,pq --bspGrid 300:128 \
  --out results/curves_48_96_10m.csv "$@"
