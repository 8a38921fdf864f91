#!/bin/bash
# no-fine-tune ablation (reference ablations/no_ft.sh: single stage of
# channel_scales+angles, no weight/quantizer fine-tune stage).
MODEL=${1:?model}; OUT=${2:-output/ablation-no-ft}
python -m paroquant_tpu.cli.optimize --model "$MODEL" --output "$OUT" \
  --datasets wikitext2 c4 redpajama --train-size 2048 --seqlen 2048 --batch-size 8 \
  --params "channel_scales:0.05,angles:0.05" --epochs 10 \
  --n-bits 4 --group-size 128 --num-rotations 8 --seed 0 --resume
