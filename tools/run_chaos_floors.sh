#!/bin/sh
# Run tools/chaos_floor.py over every golden case that carries a
# max_bad allowance (tests/golden_cases.py), cheapest first, appending
# one JSON line per case to the output file. Partial sweeps are useful:
# each line stands alone. Usage: sh tools/run_chaos_floors.sh [out.jsonl]
OUT=${1:-chaos_floors.jsonl}
cd "$(dirname "$0")/.." || exit 1
for case in \
    test_cyl_heating \
    test_dielectric_charge_cyl_v2 \
    test_dielectric_charge_2d \
    test_dielectric_neg_2d \
    test_3d \
    test_2d_pos_electrode \
    test_2d_neg_electrode \
    test_2d_pos_electrode_photoi \
    test_2d_neg_electrode_photoi \
    test_cyl_2pulse \
; do
    echo "=== $case $(date -u +%H:%M:%S)" >&2
    python tools/chaos_floor.py "$case" 2>>"$OUT.err" \
        | grep '^{' >> "$OUT"   # keep only the JSON result line
                                # (the sim prints progress to stdout)
done
