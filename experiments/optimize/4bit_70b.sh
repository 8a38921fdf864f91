#!/bin/bash
# 70B-class W4 recipe (reference experiments/optimize/4bit_70b.sh): halved
# learning rates (2.5e-2 / 5e-6 / 5e-7), 10+10 epochs, 1024 calibration
# sequences, smaller batch. The reference shards the activation cache 16
# ways; here layer-granular host paging in optim/calibrate.py plays that
# role and --device tpu + the data-axis mesh shards the calibration step.
MODEL=${1:?usage: 4bit_70b.sh <model_dir> [output_dir]}
OUT=${2:-output/$(basename "$MODEL")-w4}
python -m paroquant_tpu.cli.optimize \
  --model "$MODEL" --output "$OUT" \
  --datasets wikitext2 c4 redpajama \
  --train-size 1024 --seqlen 2048 --batch-size 8 \
  --params "channel_scales:0.025,angles:0.025" "weight:5e-6,quantizer:5e-7" \
  --epochs 10 10 \
  --n-bits 4 --group-size 128 --num-rotations 8 --pair-mode random \
  --seed 0 --resume --save-checkpoint
