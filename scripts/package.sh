#!/bin/bash
# Package the engine for spark-submit --py-files deployment.
#
#   scripts/package.sh                 -> dist/getl_spark.zip
#   spark-submit --py-files dist/getl_spark.zip \
#       --master yarn --deploy-mode cluster \
#       cli.py tail --events s3://bucket/log --warehouse s3://bucket/wh
#
# (cli.py is a 2-line shim because spark-submit wants a file, not -m:
#  `from getl_spark.__main__ import main; main()`)
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/getl_spark.zip
zip -qr dist/getl_spark.zip getl_spark -x '*__pycache__*'
cat > dist/cli.py <<'EOF'
import sys
from getl_spark.__main__ import main
sys.exit(main())
EOF
echo "dist/getl_spark.zip + dist/cli.py ready"
unzip -l dist/getl_spark.zip | tail -2
