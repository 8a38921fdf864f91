#!/bin/bash
# no-channel-scaling ablation (reference ablations/no_scaling.sh: stage 1
# trains angles only @5e-2, stage 2 weight+quantizer fine-tune; channel
# scales stay 1).
MODEL=${1:?model}; OUT=${2:-output/ablation-no-scaling}
python -m paroquant_tpu.cli.optimize --model "$MODEL" --output "$OUT" \
  --datasets wikitext2 c4 redpajama --train-size 2048 --seqlen 2048 --batch-size 8 \
  --params "angles:0.05" "weight:1e-5,quantizer:1e-6" --epochs 10 10 \
  --n-bits 4 --group-size 128 --num-rotations 8 --seed 0 --resume
