#!/usr/bin/env bash
# Package the engine for multi-executor clusters (north_rule:
# "run via spark-submit --py-files on a multi-executor cluster").
#
#   ./scripts/package.sh                  # builds dist/hexspark.zip
#   spark-submit --master <cluster> \
#       --py-files dist/hexspark.zip \
#       --conf spark.sql.adaptive.enabled=true \
#       --conf spark.sql.adaptive.skewJoin.enabled=true \
#       your_job.py
#
# Only `master` differs from local runs — hexspark.session.get_spark
# reads HEXSPARK_MASTER / applies the same tuned confs everywhere.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/hexspark.zip
zip -qr dist/hexspark.zip hexspark -x '*__pycache__*'
echo "built dist/hexspark.zip ($(du -h dist/hexspark.zip | cut -f1))"
