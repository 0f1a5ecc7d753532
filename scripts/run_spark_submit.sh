#!/usr/bin/env bash
# Package the engine and run the flagship job exactly the way a cluster
# would: spark-submit --py-files <zip>. Locally master=local[N].
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CPUS="${SPARK_GRAFT_CPUS:-8}"
SF_DIR="${1:-/root/testdata/sf0.001}"
OUT_DIR="${2:-$(mktemp -d)/flagship_out}"

cd "$REPO"
ZIP="$(mktemp -d)/unmixing_spark.zip"
python -c "
import shutil, zipfile, os
with zipfile.ZipFile('$ZIP', 'w') as z:
    for root, _, files in os.walk('unmixing_spark'):
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
"
exec spark-submit \
  --master "local[$CPUS]" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.ui.enabled=false \
  --py-files "$ZIP" \
  scripts/submit_flagship.py "$SF_DIR" "$OUT_DIR"
