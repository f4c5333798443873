#!/usr/bin/env bash
# Regenerate regression goldens by running the framework on the test
# configs (update_regression_test_results.sh analog). Usage:
#   tools/update_regression_results.sh <out_dir>
set -eu
OUT=${1:-regression_out}
cd "$(dirname "$0")/.."
run() { # cfg ndim datafile [extra...]
  local cfg=$1 nd=$2 data=$3; shift 3
  local name
  name=$(basename "$cfg" .cfg)
  echo "== $name"
  python -m afivo_streamer_tpu "$cfg" -ndim="$nd" \
    -input_data%file="$data" -output%name="$OUT/$name" "$@"
}
T1=/root/reference/programs/standard_1d/tests
T2=/root/reference/programs/standard_2d/tests
T3=/root/reference/programs/standard_3d/tests
TD=/root/reference/programs/dielectric_2d/tests
run $T1/test_1d.cfg 1 $T1/td_air_siglo_swarm.txt
run $T1/test_1d_chemistry.cfg 1 $T1/air_chemistry_Baohong_reactions.txt
run $T2/test_cyl.cfg 2 $T2/td_air_siglo_swarm.txt
run $T2/test_2d.cfg 2 $T2/td_air_siglo_swarm.txt
run $T2/test_2d_photoi.cfg 2 $T2/td_air_siglo_swarm.txt
run $T2/test_cyl_chem.cfg 2 $T2/air_chemistry_v1.txt
run $T2/test_cyl_ion_motion.cfg 2 $T2/air_chemistry_v1.txt
run $T2/test_cyl_ion_motion_v2.cfg 2 $T2/air_chemistry_v1.txt
run $T2/test_2d_photoi_chem.cfg 2 $T2/air_chemistry_v1.txt
run $T2/test_cyl_photoi_chem.cfg 2 $T2/air_chemistry_v1.txt
run $T3/test_3d.cfg 3 $T3/td_air_siglo_swarm.txt
run $TD/test_dielectric_charge_2d.cfg 2 $TD/td_air_siglo_swarm.txt \
  -user%module=programs/dielectric_2d/user.py
echo "done -> $OUT"
