#!/bin/bash
# Hadamard-rotation W4 baseline (QuaRot/SpinQuant-style, no training):
# each 128-channel group is mixed by the Hadamard-equivalent butterfly
# (7 stages at theta=pi/4) before RTN quantization. The learned-rotation
# ParoQuant optimizer should beat this; RTN should lose to it on
# outlier-heavy weights.
MODEL=${1:?usage: hadamard.sh <model_dir> [out_dir]}
OUT=${2:-output/$(basename "$MODEL")-hadamard-w4}
python experiments/baselines/rtn_baseline.py --model "$MODEL" --output "$OUT" \
  --n-bits 4 --group-size 128 --hadamard
python -m paroquant_tpu.cli.evaluate --model "$OUT" --seqlen 2048 --seed 0
