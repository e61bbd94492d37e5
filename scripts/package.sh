#!/bin/sh
# Build the --py-files artifact for spark-submit.
set -eu
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/ai_knowledge_graph_spark.zip
# Source-only zip; executors import the package from it directly.
find ai_knowledge_graph_spark -name '*.py' | zip -q dist/ai_knowledge_graph_spark.zip -@
echo "dist/ai_knowledge_graph_spark.zip"
unzip -l dist/ai_knowledge_graph_spark.zip | tail -2
