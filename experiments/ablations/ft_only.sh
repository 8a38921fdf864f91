#!/bin/bash
# fine-tune-only ablation (reference ablations/ft_only.sh: skip the
# rotation/scale search entirely, one stage of weight+quantizer training
# on top of RTN init).
MODEL=${1:?model}; OUT=${2:-output/ablation-ft-only}
python -m paroquant_tpu.cli.optimize --model "$MODEL" --output "$OUT" \
  --datasets wikitext2 c4 redpajama --train-size 2048 --seqlen 2048 --batch-size 8 \
  --params "weight:1e-5,quantizer:1e-6" --epochs 10 \
  --n-bits 4 --group-size 128 --num-rotations 8 --seed 0 --resume
