#!/bin/bash
# K ablation (reference ablations: num_rotations in {1,2,4})
MODEL=${1:?model}
for K in 1 2 4; do
  python -m paroquant_tpu.cli.optimize --model "$MODEL" \
    --output "output/ablation-k$K" \
    --datasets wikitext2 c4 redpajama --train-size 2048 --seqlen 2048 --batch-size 8 \
    --params "channel_scales:0.05,angles:0.05" "weight:1e-5,quantizer:1e-6" \
    --epochs 5 5 --num-rotations $K --resume
done
