#!/bin/bash
# butterfly (TPU-native, default) vs reference-style random independent pairs
MODEL=${1:?model}
for MODE in butterfly random; do
  python -m paroquant_tpu.cli.optimize --model "$MODEL" \
    --output "output/ablation-pairs-$MODE" \
    --datasets wikitext2 c4 redpajama --train-size 2048 --seqlen 2048 --batch-size 8 \
    --params "channel_scales:0.05,angles:0.05" "weight:1e-5,quantizer:1e-6" \
    --epochs 5 5 --pair-mode $MODE --resume
done
