#!/bin/sh
# Build the --py-files artifact for spark-submit deployment.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/schema_matching_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/schema_matching_spark.zip", "w",
                     zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("schema_matching_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/schema_matching_spark.zip")
EOF
