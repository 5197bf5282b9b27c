#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit deployments.
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f dist/approximate_pagerank_public_spark.zip
mkdir -p dist
zip -qr dist/approximate_pagerank_public_spark.zip approximate_pagerank_public_spark \
    -x '*__pycache__*'
echo "dist/approximate_pagerank_public_spark.zip"
