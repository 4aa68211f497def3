#!/usr/bin/env bash
# Build the spark-submit --py-files archive (B9 replacement: the reference's
# ssh deploy scripts become one zip + spark-submit).
#
#   scripts/package.sh [out.zip]
#   spark-submit --py-files sparkgraph.zip --master <cluster> \
#       $(python -c 'import sparkgraph.cli as m; print(m.__file__)') pagerank --input ...
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-sparkgraph.zip}"
rm -f "$OUT"
zip -qr "$OUT" sparkgraph -x 'sparkgraph/__pycache__/*' -x '*/__pycache__/*'
echo "$OUT"
unzip -l "$OUT" | tail -2
