#!/bin/bash
# GPTQ W4 baseline (Hessian-compensated RTN; in-framework second-order anchor).
# Canonical protocol data: wikitext2+c4+redpajama 128x2048 (use
# --datasets file:<path> or synthetic on air-gapped boxes).
MODEL=${1:?usage: gptq.sh <model_dir> [out_dir]}
OUT=${2:-output/$(basename "$MODEL")-gptq-w4}
python experiments/baselines/gptq_baseline.py --model "$MODEL" --output "$OUT" \
  --datasets wikitext2,c4,redpajama --n-samples 128 --seqlen 2048 \
  --n-bits 4 --group-size 128
python -m paroquant_tpu.cli.evaluate --model "$OUT" --seqlen 2048 --seed 0
