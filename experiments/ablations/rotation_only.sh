#!/bin/bash
# rotation-only ablation (reference ablations/rotation_only.sh)
MODEL=${1:?model}; OUT=${2:-output/ablation-rotation-only}
python -m paroquant_tpu.cli.optimize --model "$MODEL" --output "$OUT" \
  --datasets wikitext2 c4 redpajama --train-size 2048 --seqlen 2048 --batch-size 8 \
  --params "angles:0.05" "weight:1e-5,quantizer:1e-6" --epochs 5 5 --resume
