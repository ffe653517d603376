#!/usr/bin/env bash
# Build kapra_spark.zip for spark-submit --py-files shipping
# (BASELINE.json north_rule: "shipped via spark-submit --py-files").
#
#   tools/package.sh [out.zip]
#   spark-submit --py-files kapra_spark.zip -m kapra_spark.cli \
#       kapra 16 6 6 1 s3://bucket/tokens_table out/ results/
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-kapra_spark.zip}"
rm -f "$OUT"
zip -qr "$OUT" kapra_spark -x "*__pycache__*"
unzip -l "$OUT" | tail -2
echo "wrote $OUT"
