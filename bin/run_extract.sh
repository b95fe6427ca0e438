#!/usr/bin/env bash
# Launch the extraction job via spark-submit (the production surface).
#
#   bin/run_extract.sh <master> <input> <out> [extra ExtractMain args...]
#
# Examples (the north rule's two-cluster-size comparison is just two
# invocations with different --master/executor topology):
#   bin/run_extract.sh 'local[8]'  synth:100000 /tmp/extract_n  --run-id n
#   bin/run_extract.sh 'local[32]' synth:100000 /tmp/extract_4n --run-id 4n
# On a real cluster:
#   bin/run_extract.sh yarn s3://corpus/pages /data/extracted \
#     --buckets 4096 --partitions 8192 --resume
set -euo pipefail
cd "$(dirname "$0")/.."
MASTER=$1; INPUT=$2; OUT=$3; shift 3

JAR=target/scala-2.13/pdf_extractorspark_2.13-0.1.0.jar
[ -f "$JAR" ] || sbt -batch package

exec /opt/spark/bin/spark-submit \
  --master "$MASTER" \
  --class graft.spark.ExtractMain \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-32}" \
  --conf spark.sql.session.timeZone=UTC \
  "$JAR" \
  --input "$INPUT" --out "$OUT" "$@"
