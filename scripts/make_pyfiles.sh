#!/bin/sh
# Package libpdf_spark for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/libpdf_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/libpdf_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("libpdf_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/libpdf_spark.zip")
EOF
