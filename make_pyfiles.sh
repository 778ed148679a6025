#!/bin/sh
# Build the --py-files artifact for spark-submit (north rule: "ships as a
# spark-submit --py-files package").
#
#   sh make_pyfiles.sh            -> dist/sparkolumnar.zip
#   spark-submit --py-files dist/sparkolumnar.zip \
#       sparkolumnar/jobs/encode_job.py --input ... --output ...
set -e
cd "$(dirname "$0")"
mkdir -p dist
rm -f dist/sparkolumnar.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/sparkolumnar.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("sparkolumnar"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/sparkolumnar.zip")
EOF
