#!/usr/bin/env bash
# Round gate: diff freshly-recorded benchmark artifacts against the
# committed (previous-round) versions and FAIL on significant
# regressions.  Analogue of the reference's compare_benchmarks.py CI use
# (ref: /root/reference/scripts/compare_benchmarks.py + benchmark_runner
# report flow).
#
# Usage:
#   scripts/check_regressions.sh NEW_DIR [THRESHOLD]
#     NEW_DIR     directory holding freshly-recorded *_TPU.json /
#                 TPCC_CPU.json artifacts (same filenames as the repo root)
#     THRESHOLD   relative slowdown treated as a regression (default 0.25;
#                 TPU-tunnel timings are noisy — see CLAUDE.md RTT facts)
#
# Exit: nonzero if ANY artifact regressed.
set -u
cd "$(dirname "$0")/.."

NEW_DIR=${1:?usage: check_regressions.sh NEW_DIR [THRESHOLD]}
THRESHOLD=${2:-0.25}

ARTIFACTS=(TPCH22_TPU.json TPCH22_SF1_TPU.json SSB_TPU.json TPCDS_TPU.json
           TPCC_CPU.json JOB_CPU.json)
fail=0
checked=0
for a in "${ARTIFACTS[@]}"; do
    old="./$a"
    new="$NEW_DIR/$a"
    [ -f "$old" ] || continue
    [ -f "$new" ] || continue
    echo "== $a (threshold ${THRESHOLD})"
    if ! python scripts/compare_benchmarks.py "$old" "$new" \
            --threshold "$THRESHOLD" --fail-on-regression; then
        fail=1
    fi
    checked=$((checked + 1))
done
if [ "$checked" -eq 0 ]; then
    echo "no artifact pairs found under $NEW_DIR" >&2
    exit 2
fi
exit $fail
