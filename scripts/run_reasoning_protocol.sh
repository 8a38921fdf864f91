#!/bin/bash
# Reasoning protocol drive (VERDICT r3 item 6): calibrate a real ParoQuant
# W4 checkpoint at 0.6B geometry (short recipe — the protocol-scale recipe
# is the round-3 ladder; here the checkpoint only needs to be REAL, i.e.
# learned rotations + packed W4 served through the engine), then run the
# reference reasoning protocol (temp 0.6, top_p 0.95, seeds 42/0/1,
# generation budget 8k on this box's memory) against the serve endpoint on
# synthetic tasks. Proves harness + long-generation serving, not accuracy
# (weights are random — zero-egress box).
#
# Reference: experiments/tasks/reasoning/ inference.py:63-72 (32k budget,
# sampling params), reasoning.py (extractive-match metric).
set -e
cd "$(dirname "$0")/.."

CKPT=${CKPT:-/tmp/paro_r4_reasoning}
PORT=${PORT:-8012}
GEN=${GEN:-8192}

if [ ! -f "$CKPT/model/config.json" ]; then
  python -m paroquant_tpu.cli.optimize \
    --model preset:qwen3-0.6b --output "$CKPT" \
    --datasets synthetic --train-size 32 --val-size 8 --seqlen 256 \
    --batch-size 8 --epochs 1 1 --act-dtype bfloat16 \
    --device tpu --save-checkpoint
fi
python scripts/make_byte_tokenizer.py "$CKPT/model"

python -m paroquant_tpu.cli.serve --model "$CKPT/model" --port "$PORT" \
  --max-batch 9 --max-len $((GEN + 256)) --decode-burst 32 \
  --kv-quant int8 --device tpu &
SERVE_PID=$!
trap 'kill $SERVE_PID 2>/dev/null || true' EXIT

for i in $(seq 1 120); do
  sleep 5
  curl -s "http://127.0.0.1:$PORT/v1/models" >/dev/null 2>&1 && break
done

python experiments/tasks/reasoning_eval.py \
  --endpoint "http://127.0.0.1:$PORT" --synthetic \
  --max-tokens "$GEN" --concurrency 9 \
  | tee experiments/tasks/reasoning_protocol_r4.json

kill $SERVE_PID 2>/dev/null || true
wait $SERVE_PID 2>/dev/null || true
