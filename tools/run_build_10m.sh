#!/bin/bash
# 10M x 200d distributed build — the reference's PRIMARY regime
# (prepare_data.sh:22-28, run_roargraph_test.sh:9-10) at the knob class
# both quality levers were measured to saturate at on the 2M rung
# ((48,96) degree, SCALE.md; train at the reference's 5% ratio = the
# 500k-query approx prefix run_prefix_10m.sh writes — the build picks
# that artifact up by path identity and never recomputes it).
#
# This build CANNOT fit one measurement window (~16 h of phase-2 at 24
# threads, extrapolated from the 2M rung's 7355.6 s x5 n x1.56 dim), so
# it runs CHECKPOINTED (--buildCp auto): phase-1 projection, each of the
# 64 phase-2 self-search batches (~15 min each — the preemption
# granularity), and the merged adjacency persist under
# <knn-artifact-path>.build_cp_m48_l96 (auto keys the dir off the FULL
# kNN-input identity — corpus, train, prefix knobs — so a knob change
# can never silently reuse stale stages); kill it at any wall boundary and relaunch
# this script to resume after the last completed stage. FINGERPRINT
# guards knob identity across resumes.
#
# Sizing vs the measured 2M (48,96) rung:
#   p2b 192 -> ~52k-node slices, matching the banked round-12
#              checkpoint's FINGERPRINT (p2b=192) so a BARE relaunch of
#              this script resumes it (VERDICT r12 "what's wrong" 1).
#              MEASURED correction (round 12,
#              build_10m_r12.log): at p2b 64 the first batch's BSP
#              rounds spilled ~12-15 GB PER ROUND and the shuffle-file
#              cleaner (driver-GC-driven, periodicGC 60s) lagged the
#              ~60 s round cadence, so live spill crossed the box's
#              ~60 GB free disk 4-5 rounds in -> ENOSPC killed the JVM
#              (this box's real writable pool is ~94 GB, not df's
#              252 GB). Halving the slice halves per-round spill;
#              with ~70 GB free that is >2x headroom at the observed
#              growth rate. MUST stay fixed across resumes (slicing is
#              part of the checkpoint fingerprint).
#   mrb 256 -> keeps per-slice supply-merge scratch at the 2M rung's
#              measured 34.7 GB peak (volume scales x7.8 = 5x n x1.56
#              dim; 256/32 = 8x more slices).
#   heap 26g, 24 threads: 2M peaked 16201 MiB under 16g; the persist()
#   of 10M x 200d base (~8 GB) plus per-batch state needs the headroom
#   VERDICT r10 prescribed (20-24g) — 26g adds GC margin for the curve
#   rig's known full-GC artifact mode.
#   --agreeSample 1000: exact-kNN spot check of the approx prefix (the
#   full exact twin is unaffordable at this regime) — the committable
#   agreement evidence, ~5 min.
# Single-writer guard (VERDICT r11 "what's wrong" 2): same lock as
# run_prefix_10m.sh — the build reads the prefix artifact and both
# write under target/soak10m, so neither may run while the other does.
LOCK=target/soak10m/.writer.lock
mkdir -p target/soak10m
# Atomic acquisition (noclobber): the create IS the probe, so two
# launches racing the same window cannot both acquire (ADVICE r12).
# Stale-PID fallback only runs when the create fails.
if ! ( set -C; echo $$ > "$LOCK" ) 2>/dev/null; then
  if kill -0 "$(cat "$LOCK" 2>/dev/null)" 2>/dev/null; then
    echo "REFUSING to launch: PID $(cat "$LOCK") already owns target/soak10m" >&2
    echo "(kill it or delete $LOCK if stale)" >&2
    exit 1
  fi
  rm -f "$LOCK"
  if ! ( set -C; echo $$ > "$LOCK" ) 2>/dev/null; then
    echo "REFUSING to launch: lost the lock race on $LOCK" >&2
    exit 1
  fi
fi
trap 'rm -f "$LOCK"' EXIT
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
CP_DIR="${GRAFT_CLASSES:-target/scala-2.13/classes}"
SPARK_GRAFT_CPUS=24 java -Xmx26g $OPENS -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64 \
  -Xlog:gc*:file=target/soak10m/gc_build.log:time,uptime:filecount=2,filesize=50m \
  -cp "$CP_DIR:/opt/spark/jars/*" \
  graft.tools.ScaleSoak --n 10000000 --dim 200 --trainQ 500000 --mSq 32 \
  --mPjbp 48 --lPjpq 96 --trainKnn approx --nlist 4096 --nprobe 512 \
  --agreeSample 1000 --buildCp auto \
  --fw 4 --p2b 192 --mrb 256 --shuffle 256 --seeds 128 --l 1000 --tier dist \
  --out target/soak10m --db graft_soak_10m_48_96 "$@"
