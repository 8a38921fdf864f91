#!/bin/bash
# Canonical W4 recipe (reference experiments/optimize/4bit.sh):
# stage 1 channel_scales+angles @5e-2, stage 2 weight@1e-5 + quantizer@1e-6,
# 5+5 epochs, gs=128, 4-bit, K=8 rotations,
# calib = wikitext2+c4+redpajama 2048x2048 tokens, val split, seed 0.
MODEL=${1:?usage: 4bit.sh <model_dir> [output_dir]}
OUT=${2:-output/$(basename "$MODEL")-w4}
python -m paroquant_tpu.cli.optimize \
  --model "$MODEL" --output "$OUT" \
  --datasets wikitext2 c4 redpajama \
  --train-size 2048 --seqlen 2048 --batch-size 8 \
  --params "channel_scales:0.05,angles:0.05" "weight:1e-5,quantizer:1e-6" \
  --epochs 5 5 \
  --n-bits 4 --group-size 128 --num-rotations 8 --pair-mode random \
  --seed 0 --resume --save-checkpoint
