#!/bin/bash
# Equivalent of the reference's evaluate_cnn.sh.
# Usage: scripts/evaluate_cnn.sh [--val-dir DIR] [--checkpoint CKPT] [-a ARCH]
set -e
python -m tq_tpu.evals.cnn -a "${ARCH:-resnet18}" -b 64 "$@"
