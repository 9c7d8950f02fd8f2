#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north_rule ship shape).
#
#   scripts/make_pyfiles_zip.sh            # -> dist/pears_fruit_fly_spark.zip
#   spark-submit --py-files dist/pears_fruit_fly_spark.zip \
#       scripts/build_index_job.py --pages ... --vocab ... --index ...
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/pears_fruit_fly_spark.zip
zip -qr dist/pears_fruit_fly_spark.zip pears_fruit_fly_spark \
    -x '*__pycache__*' -x '*.pyc'
echo "wrote dist/pears_fruit_fly_spark.zip"
unzip -l dist/pears_fruit_fly_spark.zip | tail -2
