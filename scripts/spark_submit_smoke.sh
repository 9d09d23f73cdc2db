#!/usr/bin/env bash
# Smoke-test the cluster packaging path: the engine is shipped as a --py-files
# zip (NOT importable from the cwd), exactly as it would be to a real
# multi-executor cluster; only the master differs (local[4] here).
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT

(cd "$REPO" && zip -qr "$WORK/frontier.zip" frontier -x 'frontier/__pycache__/*')
cp "$REPO/scripts/submit_crawl.py" "$WORK/"

cd "$WORK"  # ensure imports come from the zip, not the repo checkout
spark-submit --master 'local[4]' \
  --conf spark.sql.shuffle.partitions=4 \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.ui.enabled=false \
  --py-files "$WORK/frontier.zip" \
  "$WORK/submit_crawl.py" \
  --n-hosts 4 --output "$WORK/plan" "$@"

echo "plan files:" && ls "$WORK/plan" | head -3
