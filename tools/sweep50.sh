#!/bin/bash
# 50x family sweep (round-18 verdict #5, extended to s_/m_ in round 19):
# every registry row of the given families at sf5.0, N full passes
# (min-of-passes estimator across pass artifacts — contention only ever
# inflates), steal-stamped by Bench itself. Run SOLO in a measured quiet
# window.
# Usage: tools/sweep50.sh <sfdir> <outprefix> [passes] [families]
#   families: an egrep alternation of family prefixes, default 'd|t'
#   (round-18 d_/t_ sweep); 's|m' runs the similarity + multimodal rows.
set -euo pipefail
SFDIR=${1:?sfdir}; OUT=${2:?outprefix}; PASSES=${3:-3}; FAM=${4:-d|t}
ROWS=$(grep -rhoE "GraftQuery\(\"($FAM)_[a-z0-9_]+\"" \
  /root/repo/src/main/scala/graft/operators/ | \
  sed 's/GraftQuery("//;s/"//' | sort -u | paste -sd,)
echo "rows: $(echo "$ROWS" | tr ',' '\n' | wc -l)"
for p in $(seq 1 "$PASSES"); do
  d=$(mktemp -d)
  # the same JDK17 add-opens sbt injects — Arrow-backed rows (substrait,
  # flight) throw spurious "Memory was leaked by query" without them
  AO=""
  for m in java.lang java.lang.invoke java.lang.reflect java.io java.net \
      java.nio java.util java.util.concurrent java.util.concurrent.atomic \
      sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
    AO="$AO --add-opens java.base/$m=ALL-UNNAMED"
  done
  # Throughput collector, NOT the JDK-default G1: measured on the m_
  # family at sf5.0, G1's young evacuation degrades 13-30x under the
  # multi-threaded allocation burst of per-asset codec kernels (pauses
  # up to 3.8 s on a <4 GB live set; 9.3 ms/doc at 4 threads vs 0.53
  # ms/doc under ParallelGC, same code). Batch analytics wants the
  # throughput collector anyway - a real cluster would set the same.
  (cd "$d" && SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ONLY="$ROWS" \
    java $AO -XX:+UseParallelGC -Xmx32g \
    -cp "/root/repo/target/scala-2.13/strakespark_2.13-0.1.0.jar:/opt/spark/jars/*" \
    graft.Bench >"$OUT.pass$p.json" 2>/dev/null)
  cp "$d/bench_results.json" "$OUT.pass$p.full.json"
  rm -rf "$d"
  echo "pass $p done: $(tail -c 120 "$OUT.pass$p.json")"
done
