#!/bin/bash
# channel-scales-only ablation (reference ablations/scaling_only.sh:
# one stage, channel_scales@5e-2, K=1 so rotation stays identity-adjacent
# and angles are never trained).
MODEL=${1:?model}; OUT=${2:-output/ablation-scaling-only}
python -m paroquant_tpu.cli.optimize --model "$MODEL" --output "$OUT" \
  --datasets wikitext2 c4 redpajama --train-size 2048 --seqlen 2048 --batch-size 8 \
  --params "channel_scales:0.05" --epochs 10 \
  --n-bits 4 --group-size 128 --num-rotations 1 --seed 0 --resume
