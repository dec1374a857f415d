#!/bin/sh
# Build the --py-files artifact: dist/searchengine_spark.zip
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/searchengine_spark.zip
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/searchengine_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("searchengine_spark/**/*.py")):
        z.write(p, p.as_posix())
print("wrote dist/searchengine_spark.zip")
EOF
