#!/bin/bash
# RTN W4 baseline (no calibration; reference's AWQ-less starting point).
# The scales-only variant (ablations/no_rotation.sh) is the AWQ-like baseline.
MODEL=${1:?usage: rtn.sh <model_dir> [out_dir]}
OUT=${2:-output/$(basename "$MODEL")-rtn-w4}
python experiments/baselines/rtn_baseline.py --model "$MODEL" --output "$OUT" \
  --n-bits 4 --group-size 128
python -m paroquant_tpu.cli.evaluate --model "$OUT" --seqlen 2048 --seed 0
