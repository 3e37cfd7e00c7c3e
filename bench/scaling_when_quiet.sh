#!/bin/bash
# Waits for a quiet host window (1-min load below threshold), then runs one
# N-vs-4N cluster-scaling pair; repeats until `pairs` good pairs are captured
# or the deadline passes. Appends everything to bench/scaling_runs.jsonl.
set -u
cd "$(dirname "$0")/.."
ROWS=${1:-3000000}
PAIRS=${2:-3}
THRESH=${3:-2.5}
DEADLINE_MIN=${4:-150}
LOG=bench/scaling_runs.jsonl
export SPARK_HOME=/opt/spark
JAR=target/scala-2.13/xmqspark_2.13-0.1.0.jar
# ActiveProcessorCount: each executor JVM must size its GC/JIT thread pools
# to ITS core share, not the 32 host CPUs (8 executors x 23 default GC
# threads is a thread storm that breaks 4N scaling)
COMMON=(--conf spark.locality.wait=0s --driver-memory 3g
  --conf "spark.executor.extraJavaOptions=-XX:ActiveProcessorCount=3 -XX:+UseParallelGC"
  --driver-java-options "-XX:ActiveProcessorCount=4")

done_pairs=0
end=$(( $(date +%s) + DEADLINE_MIN * 60 ))
while [ "$done_pairs" -lt "$PAIRS" ] && [ "$(date +%s)" -lt "$end" ]; do
  load=$(cut -d' ' -f1 /proc/loadavg)
  if python3 -c "import sys; sys.exit(0 if float('$load') < $THRESH else 1)"; then
    echo "{\"event\":\"window\",\"load1\":$load,\"ts\":\"$(date -u +%H:%M:%S)\"}" >> "$LOG"
    a=$(timeout 900 "$SPARK_HOME/bin/spark-submit" --master 'local-cluster[2,3,6144]' "${COMMON[@]}" \
      --class graft.bench.ClusterScalingBench "$JAR" "$ROWS" 3 6 2>/dev/null | grep cluster_scaling)
    b=$(timeout 900 "$SPARK_HOME/bin/spark-submit" --master 'local-cluster[8,3,6144]' "${COMMON[@]}" \
      --class graft.bench.ClusterScalingBench "$JAR" "$ROWS" 3 24 2>/dev/null | grep cluster_scaling)
    post=$(cut -d' ' -f1 /proc/loadavg)
    echo "$a" >> "$LOG"
    echo "$b" >> "$LOG"
    echo "{\"event\":\"window_end\",\"load1_after\":$post}" >> "$LOG"
    if [ -n "$a" ] && [ -n "$b" ]; then done_pairs=$((done_pairs+1)); fi
  else
    sleep 45
  fi
done
echo "{\"event\":\"done\",\"pairs\":$done_pairs}" >> "$LOG"
