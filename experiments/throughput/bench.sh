#!/bin/bash
# Decode throughput (reference experiments/throughput/bench.sh — including the
# prefill/decode flags the reference CLI silently dropped)
MODEL=${1:?model}
python -m paroquant_tpu.cli.benchmark --model "$MODEL" \
  --prefill-len 256 --decode-len 512 --warmup 2 --runs 5
