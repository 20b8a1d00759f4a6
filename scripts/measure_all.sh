#!/usr/bin/env bash
# Strictly-serialized scaling measurement: one run at a time, idle machine.
# Emits one JSON line per run to $OUT (default /tmp/measure_all.jsonl).
set -u
cd "$(dirname "$0")/.."
OUT="${OUT:-/tmp/measure_all.jsonl}"
EDGES="${EDGES:-/tmp/hpr_scaling_edges.parquet}"
: > "$OUT"

# wait for any stragglers
sleep 5
while pgrep -f "scaling_job.py" > /dev/null; do sleep 5; done

# raw JVM codegen probe at each level (hardware ceiling)
for n in 2 8 32; do
  timeout 300 python - <<EOF >> "$OUT" 2>/dev/null
import time, json
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[$n]").appName("probe")
    .config("spark.ui.enabled","false").config("spark.driver.memory","16g").getOrCreate())
spark.range(10**6).select(F.max(F.xxhash64("id"))).first()
t0=time.monotonic()
spark.range(2*10**9, numPartitions=64).select(F.max(F.xxhash64(F.col("id"), F.col("id"), F.col("id")))).first()
print(json.dumps({"kind":"raw_jvm","cores":$n,"wall_s":round(time.monotonic()-t0,2)}))
spark.stop()
EOF
done

for run in "2 spmv" "8 spmv" "32 spmv" "2 join" "8 join" "32 join"; do
  set -- $run
  timeout 590 python scripts/scaling_job.py --cores "$1" --strategy "$2" \
      --edges "$EDGES" --n-vertices 4000000 2>/dev/null \
    | grep -a '^{' >> "$OUT"
done
echo DONE >> "$OUT"
