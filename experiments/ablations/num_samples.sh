#!/bin/bash
# calibration-set-size ablation (reference ablations/num_samples.sh:
# canonical recipe at 128 and 512 calibration sequences vs the 2048 default).
MODEL=${1:?model}; OUTBASE=${2:-output/ablation-samples}
for size in 128 512; do
  python -m paroquant_tpu.cli.optimize --model "$MODEL" --output "$OUTBASE-$size" \
    --datasets wikitext2 c4 redpajama --train-size "$size" --seqlen 2048 --batch-size 8 \
    --params "channel_scales:0.05,angles:0.05" "weight:1e-5,quantizer:1e-6" --epochs 10 10 \
    --n-bits 4 --group-size 128 --num-rotations 8 --seed 0 --resume
done
