#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (BASELINE.json:6 launch
# mode):  ./tools/make_pyfiles.sh [out.zip]
set -euo pipefail
out="${1:-engine.zip}"
cd "$(dirname "$0")/.."
rm -f "$out"
zip -qr "$out" tsclust_spark tsclust_compat -x '*__pycache__*'
echo "wrote $out"
echo "launch: spark-submit --py-files $out jobs/rollup.py --input <path> --output <dir>"
