#!/bin/sh
# Package libgeodesk_spark for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
rm -f libgeodesk_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("libgeodesk_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("libgeodesk_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote libgeodesk_spark.zip")
EOF
