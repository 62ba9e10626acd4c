#!/bin/bash
# Equivalent of the reference's evaluate_cnn.sh.
# Default sweeps the grids the PUBLISHED results files were generated
# with (reverse-derived; see evals/cnn.py); pass --grid committed for
# the reference repo's committed-script settings.
# Usage: scripts/evaluate_cnn.sh [--val-dir DIR] [--checkpoint CKPT]
#        [-a ARCH] [--grid published|committed]
set -e
python -m tq_tpu.evals.cnn -a "${ARCH:-resnet18}" -b 64 "$@"
