#!/usr/bin/env bash
# Per-key docs-ladder runner (VERDICT r15 #3 / r16 #4): one Bench JVM
# per key under a wall cap, so one quadratic row is bounded AND named
# instead of eating the rung. Results merge via collect_ladder.py into
# artifacts/bench_docs_<rung>_perkey_r<N>.json.
#
# JVM flags mirror build.sbt's fork options (16g heap, /dev/shm
# scratch, jdk17 add-opens) so per-key numbers are comparable with the
# sbt-forked bench series; classes come straight from target/ to skip
# ~15 s of sbt startup per key.
#
# Usage: tools/run_docs_ladder.sh <rung> <sfDir> <cap_sec> <key...>
set -u
RUNG=$1; DIR=$2; CAP=$3; shift 3
mkdir -p /tmp/ladder
CP="target/scala-2.13/classes:$(echo /opt/spark/jars/*.jar | tr ' ' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for k in "$@"; do
  out=/tmp/ladder/${RUNG}_${k}.json
  rm -f "$out" "$out.timeout" "$out.contaminated" "$out.refused"
  # settle: the PREVIOUS key's 32-thread run leaves a trailing 1-min
  # load average that would trip Bench's busy-start guard (cpus/8 = 4)
  # and refuse the artifact — wait for the box to look idle again
  for i in $(seq 1 30); do
    awk '{exit !($1 < 3.5)}' /proc/loadavg && break
    sleep 10
  done
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=$DIR SPARK_GRAFT_BENCH_ONLY=$k SPARK_GRAFT_BENCH_OUT=$out \
    timeout "$CAP" java $OPENS -Xmx16g -Djava.io.tmpdir=/dev/shm \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "$CP" graft.Bench > /tmp/ladder/${RUNG}_${k}.log 2>&1
  rc=$?
  if [ $rc -eq 124 ]; then
    printf '{"key": "%s", "timeout_sec": %s}\n' "$k" "$CAP" > "$out.timeout"
    echo "[ladder] $RUNG $k TIMEOUT ${CAP}s"
  elif [ $rc -eq 3 ]; then
    # Bench REFUSED the artifact (contaminated) and wrote the full
    # diagnosis to $out.contaminated itself — surface it here and let
    # collect_ladder.py fold it into contaminated_keys (ADVICE r17:
    # before this, a refused key silently vanished from the rung)
    echo "[ladder] $RUNG $k REFUSED (contaminated) — see $out.contaminated"
  elif [ $rc -ne 0 ] && [ ! -f "$out" ]; then
    # crash before Bench could write anything (OOM, JVM error): leave
    # a marker so the key stays visible in the merged artifact
    printf '{"key": "%s", "rc": %s}\n' "$k" "$rc" > "$out.refused"
    echo "[ladder] $RUNG $k FAILED rc=$rc (no artifact) — marker written"
  else
    t=$(python3 -c "import json;d=json.load(open('$out'));print(round(d['value'],2))" 2>/dev/null)
    echo "[ladder] $RUNG $k rc=$rc ${t:-?} s"
  fi
done
