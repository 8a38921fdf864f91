#!/bin/bash
# MoE W4 recipe (reference experiments/optimize/4bit_moe.sh): 10+10 epochs.
MODEL=${1:?usage: 4bit_moe.sh <model_dir> [output_dir]}
OUT=${2:-output/$(basename "$MODEL")-w4}
python -m paroquant_tpu.cli.optimize \
  --model "$MODEL" --output "$OUT" \
  --datasets wikitext2 c4 redpajama \
  --train-size 2048 --seqlen 2048 --batch-size 8 \
  --params "channel_scales:0.05,angles:0.05" "weight:1e-5,quantizer:1e-6" \
  --epochs 10 10 \
  --n-bits 4 --group-size 128 --num-rotations 8 --pair-mode random \
  --seed 0 --resume --save-checkpoint
