#!/bin/bash
# A/B bench runner (round 16 drift attribution): runs graft.Bench from an
# already-compiled tree with the exact driver JVM options build.sbt's
# javaOptions inject, and appends the full-precision stderr JSON line
# ("metric":"total_full", all per-query seconds) to OUT, tagged with the
# tree path. Running plain `java` instead of `sbt runMain` keeps sbt's
# compile/launch CPU out of the measurement window and lets the main repo
# be edited while a pinned-commit bench runs.
# usage: ab_bench.sh TREE_DIR OUT_JSONL
set -e
TREE="$1"; OUT="$2"
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
cd "$TREE"
TMP=$(mktemp)
trap 'rm -f "$TMP"' EXIT
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
java $ADDOPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
  2> "$TMP" > /dev/null
# a run that produced no total_full line must FAIL, not silently append
# nothing — the A/B comparison would otherwise count a no-op run as done
if ! grep -q '"metric":"total_full"' "$TMP"; then
  echo "ab_bench.sh: no total_full line from $TREE (bench crashed or renamed the metric)" >&2
  exit 1
fi
grep '"metric":"total_full"' "$TMP" | sed "s#^#{\"tree\":\"$TREE\",\"line\":#; s#\$#}#" >> "$OUT"
