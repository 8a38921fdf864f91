#!/bin/bash
# calibration-dataset ablation (reference ablations/redpajama.sh: calibrate
# on RedPajama only instead of the wikitext2+c4+redpajama mixture).
MODEL=${1:?model}; OUT=${2:-output/ablation-redpajama}
python -m paroquant_tpu.cli.optimize --model "$MODEL" --output "$OUT" \
  --datasets redpajama --train-size 2048 --seqlen 2048 --batch-size 8 \
  --params "channel_scales:0.05,angles:0.05" "weight:1e-5,quantizer:1e-6" --epochs 10 10 \
  --n-bits 4 --group-size 128 --num-rotations 8 --seed 0 --resume
