#!/bin/bash
# FP16/BF16 dense baseline PPL (reference experiments/baselines/fp16.sh):
# evaluate the unquantized checkpoint with the same protocol.
MODEL=${1:?usage: fp16.sh <model_dir> [seqlen]}
SEQLEN=${2:-2048}
python -m paroquant_tpu.cli.evaluate --model "$MODEL" --seqlen "$SEQLEN" --seed 0
