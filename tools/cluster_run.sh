#!/bin/bash
# Real-cluster-shaped smoke run: package the engine as a zip, stand up a
# 2-executor Spark STANDALONE cluster on this box (1 master + 2 workers,
# separate JVM processes — the closest this sandbox gets to multi-node),
# and spark-submit the headline pipeline with --py-files engine.zip.
# Records the result in BENCH/CLUSTER.md.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
SPARK=/opt/spark
unset SPARK_NO_DAEMONIZE  # daemonized start scripts; even an empty value forces foreground
WORK=/tmp/spark-cluster-smoke
rm -rf "$WORK"; mkdir -p "$WORK"

cd "$REPO"
zip -qr "$WORK/engine.zip" pyhydroqc_spark

# token input: generated once with a plain local session (test data, not
# part of the timed run)
python - "$WORK/tokens" <<'EOF'
import sys
from pyhydroqc_spark.session import get_spark
from pyhydroqc_spark.datagen import gen_token_table
spark = get_spark("gen", cores=8, shuffle_partitions=8)
pdf = gen_token_table(n_series=500, n_tok=16_000, seed=42)
df = spark.createDataFrame(pdf, "doc_id string, tokens array<int>, n_tok int, source string")
df.repartition(64, "doc_id").write.mode("overwrite").parquet(sys.argv[1])
spark.stop()
EOF

export SPARK_MASTER_HOST=127.0.0.1
export SPARK_LOG_DIR="$WORK/logs"
export SPARK_WORKER_DIR="$WORK/worker"
export SPARK_PID_DIR="$WORK/pids"

"$SPARK/sbin/start-master.sh" --port 7077 --webui-port 8090
sleep 3
# two workers = two separate executor JVMs, 8 cores / 16g each
SPARK_WORKER_WEBUI_PORT=8091 "$SPARK/sbin/start-worker.sh" spark://127.0.0.1:7077 \
  --cores 8 --memory 16g --port 7191
SPARK_WORKER_WEBUI_PORT=8092 SPARK_IDENT_STRING=w2 "$SPARK/sbin/start-worker.sh" \
  spark://127.0.0.1:7077 --cores 8 --memory 16g --port 7192
sleep 4

trap '"$SPARK/sbin/stop-worker.sh" || true; SPARK_IDENT_STRING=w2 "$SPARK/sbin/stop-worker.sh" || true; "$SPARK/sbin/stop-master.sh" || true' EXIT

"$SPARK/bin/spark-submit" \
  --master spark://127.0.0.1:7077 \
  --py-files "$WORK/engine.zip" \
  --conf spark.executor.cores=8 \
  --conf spark.executor.memory=12g \
  --conf spark.sql.shuffle.partitions=16 \
  --conf spark.sql.files.maxPartitionBytes=4m \
  --conf spark.sql.files.openCostInBytes=4m \
  "$REPO/tools/cluster_job.py" "$WORK/tokens" | tee "$WORK/result.json"

RESULT=$(grep '^{' "$WORK/result.json" | tail -1)
{
  echo "# BENCH/CLUSTER — standalone-cluster packaged run"
  echo
  echo "The north rule's invocation shape, run for real on this box:"
  echo '```'
  echo "zip -r engine.zip pyhydroqc_spark"
  echo "spark-submit --master spark://127.0.0.1:7077 --py-files engine.zip \\"
  echo "  tools/cluster_job.py <token-parquet-dir>"
  echo '```'
  echo "Cluster: 1 standalone master + 2 workers (separate JVMs, 8 cores /"
  echo "16 GiB each) — executors import the engine ONLY from the shipped"
  echo "zip (no repo checkout on the executor path)."
  echo
  echo "Result (8M-point token table, headline fused_tokens_to_cells,"
  echo "min-of-1 after a warmup pass):"
  echo '```json'
  echo "$RESULT"
  echo '```'
} > "$REPO/BENCH/CLUSTER.md"
echo "wrote BENCH/CLUSTER.md"
