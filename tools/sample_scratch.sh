#!/bin/bash
# Samples per-job Spark scratch (spark.local.dir) every 30 s so peak
# scratch is MEASURED per run, not inferred from a whole-box df that
# conflates concurrent jobs. Usage:
#   tools/sample_scratch.sh OUT_LOG DIR [DIR...]
out="$1"; shift
while true; do
  line="$(date +%s)"
  for d in "$@"; do
    if [ -d "$d" ]; then
      line="$line $d=$(du -sm "$d" 2>/dev/null | cut -f1)MiB"
    else
      line="$line $d=absent"
    fi
  done
  echo "$line" >> "$out"
  sleep 30
done
