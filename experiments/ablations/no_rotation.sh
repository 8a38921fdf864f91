#!/bin/bash
# scales-only ablation (reference ablations/no_rotation.sh: K=1, angles frozen)
MODEL=${1:?model}; OUT=${2:-output/ablation-no-rotation}
python -m paroquant_tpu.cli.optimize --model "$MODEL" --output "$OUT" \
  --datasets wikitext2 c4 redpajama --train-size 2048 --seqlen 2048 --batch-size 8 \
  --params "channel_scales:0.05" "weight:1e-5,quantizer:1e-6" --epochs 5 5 \
  --num-rotations 1 --resume
