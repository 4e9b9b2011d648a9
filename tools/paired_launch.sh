#!/bin/bash
# Paired same-window A/B bench launcher (graft.tools.PairedBench).
#
# usage: paired_launch.sh <classesA> <labelA> <classesB> <labelB> <syncdir> <outjson>
#
#   classesA/classesB  compiled classes dir (or jar) per side; side A is
#                      conventionally the CURRENT tree
#                      (target/scala-2.13/classes), side B the old build
#   labelA/labelB      human-pinned side identity, e.g. "r19-final@80b519e".
#                      A clean rebuild of an old commit cannot reproduce the
#                      fingerprint its original incremental build recorded
#                      (synthetic class names depend on compile history), so
#                      the LABEL, not the fp, anchors an old side to its commit
#   syncdir            fresh dir for the marker-file protocol (recreated here;
#                      PairedBench itself refuses a dir with stale markers)
#   outjson            merged paired record, e.g. /root/repo/PAIRED_BENCH.json
#
# Old-side preparation (from a fresh clone):
#   git worktree add .worktrees/<label> <commit>
#   (cd .worktrees/<label> && sbt -batch compile)
#   then classesB = .worktrees/<label>/target/scala-2.13/classes
#
# The old side runs PairedBench (a class that may not exist in the old
# build) by classpath precedence: OLD classes first, current classes
# appended — every class present in the old build loads old, only the
# harness classes load new. PairedBench re-derives each side's code
# fingerprint from the classloader's own resolution of
# graft/SparkEntry.class, so the mixed classpath fingerprints the build
# that actually serves.
#
# Knobs (env): SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
# SPARK_GRAFT_CPUS (32), SPARK_GRAFT_PAIR_REPS (2, keep-min),
# SPARK_GRAFT_ONLY (comma-separated query subset — applied to BOTH sides).
set -u
CA="$1"; LA="$2"; CB="$3"; LB="$4"; SYNC="$5"; OUT="$6"
NEW="$(cd "$(dirname "$0")/.." && pwd)/target/scala-2.13/classes"
SPARK="/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
rm -rf "$SYNC"; mkdir -p "$SYNC"
export SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
export SPARK_GRAFT_PAIR_REPS=${SPARK_GRAFT_PAIR_REPS:-2}
SPARK_GRAFT_PAIR_LABEL="$LB" java $OPENS -Xmx8g -Dspark.ui.enabled=false \
  -cp "$CB:$NEW:$SPARK" graft.tools.PairedBench b "$SYNC" > "$SYNC/log-b.txt" 2>&1 &
BPID=$!
SPARK_GRAFT_PAIR_LABEL="$LA" java $OPENS -Xmx8g -Dspark.ui.enabled=false \
  -cp "$CA:$NEW:$SPARK" graft.tools.PairedBench a "$SYNC" "$OUT" > "$SYNC/log-a.txt" 2>&1 &
APID=$!
wait $APID; RA=$?
wait $BPID; RB=$?
echo "exit a=$RA b=$RB  (logs: $SYNC/log-{a,b}.txt)"
exit $(( RA > RB ? RA : RB ))
