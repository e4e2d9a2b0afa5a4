#!/bin/sh
# Package the engine for spark-submit --py-files (north_rule launch path).
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/bowspark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/bowspark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("barkingowl_spark"):
        for f in files:
            if f.endswith(".py"):
                z.write(os.path.join(root, f))
    for root, _dirs, files in os.walk("fixtures"):
        for f in files:
            if f.endswith(".py"):
                z.write(os.path.join(root, f))
print("wrote dist/bowspark.zip")
EOF
