#!/bin/bash
# Multi-JVM N vs 4N scaling series (north_rule gate): alternating
# local-cluster[2,3,*] and [8,3,*] spark-submit runs (separate executor JVMs),
# with a pure-CPU calibration burn per window so the ambient host load of this
# SHARED sandbox is visible next to each measurement.
# Usage: bench/cluster_scaling.sh [rows] [pairs]
set -u
cd "$(dirname "$0")/.."
ROWS=${1:-3000000}
PAIRS=${2:-3}
JAR=target/scala-2.13/xmqspark_2.13-0.1.0.jar
export SPARK_HOME=/opt/spark
# locality.wait=0: cached partitions are executor-local; never stall a free
# core 3s waiting for the "right" executor on a single-host cluster
# ActiveProcessorCount: each executor JVM must size its GC/JIT thread pools
# to ITS core share, not the 32 host CPUs (8 executors x 23 default GC
# threads is a thread storm that breaks 4N scaling)
COMMON=(--conf spark.locality.wait=0s --driver-memory 3g
  --conf "spark.executor.extraJavaOptions=-XX:ActiveProcessorCount=3 -XX:+UseParallelGC"
  --driver-java-options "-XX:ActiveProcessorCount=4")

calibrate() {
  python3 - <<'EOF'
import multiprocessing, time, json
def burn(_):
    t = time.time(); x = 0
    while time.time() - t < 1.5: x += 1
    return x
with multiprocessing.Pool(6) as p: c6 = sum(p.map(burn, range(6)))
with multiprocessing.Pool(24) as p: c24 = sum(p.map(burn, range(24)))
print(json.dumps({"calib_ratio_24_over_6": round(c24 / c6, 3),
                  "load1": open('/proc/loadavg').read().split()[0]}))
EOF
}

echo "=== cluster scaling series rows=$ROWS pairs=$PAIRS $(date -u +%H:%M:%S) ==="
for i in $(seq 1 "$PAIRS"); do
  calibrate
  timeout 500 "$SPARK_HOME/bin/spark-submit" --master 'local-cluster[2,3,6144]' "${COMMON[@]}" \
    --class graft.bench.ClusterScalingBench "$JAR" "$ROWS" 4 6 2>/dev/null | grep cluster_scaling
  timeout 500 "$SPARK_HOME/bin/spark-submit" --master 'local-cluster[8,3,6144]' "${COMMON[@]}" \
    --class graft.bench.ClusterScalingBench "$JAR" "$ROWS" 4 24 2>/dev/null | grep cluster_scaling
done
calibrate
