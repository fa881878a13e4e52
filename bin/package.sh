#!/bin/sh
# Build dist/mahout_spark.zip for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/mahout_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/mahout_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("mahout_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("dist/mahout_spark.zip written")
EOF
