#!/usr/bin/env bash
# One-command reproducible correctness sweep (VERDICT r8 #3).
#
#   tools/check_correctness.sh [sf_dir] [out_json]
#
# Defaults reproduce the committed sf1 artifact:
#   tools/check_correctness.sh            # testdata/sf1 -> CORRECTNESS_sf1.json
#   tools/check_correctness.sh /root/testdata/sf0.01 /tmp/c.json
#
# Runs graft.Verify (fresh JVM — cold paths included) over every
# declared key, then tools/oracle_check.py compares each result against
# DuckDB running the paired oracle SQL on the same parquet, and writes
# the per-key artifact in the driver's CORRECTNESS_r{N}.json shape.
# Exit nonzero on any mismatch. Regenerate the fixture first if absent:
#   sbt -batch "runMain graft.tools.GenData testdata/sf1"
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR=${1:-testdata/sf1}
OUT_JSON=${2:-CORRECTNESS_sf1.json}
VERIFY_OUT=$(mktemp -d /tmp/graft_verify.XXXXXX)
trap 'rm -rf "$VERIFY_OUT"' EXIT

[ -e "$SF_DIR/documents.parquet" ] || {
  echo "fixture missing: $SF_DIR (run: sbt -batch \"runMain graft.tools.GenData $SF_DIR\")" >&2
  exit 2
}

sbt -batch "runMain graft.Verify $SF_DIR $VERIFY_OUT"
python3 tools/oracle_check.py "$VERIFY_OUT" "$SF_DIR" --json "$OUT_JSON"
