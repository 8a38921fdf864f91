#!/bin/bash
# Round-4 remaining measurement campaign (VERDICT r3 items 3 and 6), run
# SERIALIZED because the box has one TPU chip. Designed to be launched
# detached (setsid nohup) so a builder-session restart doesn't kill the
# long arms; progress + results land in files that the next session
# commits. A lockfile guards against a second copy / a bench colliding.
set -u
cd "$(dirname "$0")/.."
LOCK=experiments/CAMPAIGN_RUNNING
LOG=experiments/campaign_r4.log

if [ -f "$LOCK" ] && kill -0 "$(cat "$LOCK")" 2>/dev/null; then
  echo "campaign already running (pid $(cat "$LOCK"))" >&2
  exit 1
fi
echo $$ > "$LOCK"
trap 'rm -f "$LOCK"' EXIT

log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

# --- 1. MoE-geometry protocol ladder arm (VERDICT item 3b) ---------------
# Same 524k calibration tokens / 5+5 epochs / outlier-scale 8 as the
# round-3 qwen3-0.6b protocol run, on the tiny-moe preset: exercises
# pseudo_moe shared rotations + GPTQ-MoE (shared Hessian) end to end.
log "MoE protocol ladder: start"
python -u experiments/baselines/quality_ladder.py \
  --model preset:tiny-moe --datasets synthetic \
  --n-samples 512 --seqlen 1024 --epochs 5 --outlier-scale 8 \
  --act-dtype bfloat16 --resident-gb 8 --device tpu \
  --arms rtn,hadamard,gptq,quarot,paroquant,paroquant_gptq \
  --out experiments/baselines/ladder_protocol.jsonl >> "$LOG" 2>&1
log "MoE protocol ladder: done ($?)"

# --- 2. Reasoning protocol drive (VERDICT item 6) ------------------------
log "reasoning protocol: start"
bash scripts/run_reasoning_protocol.sh >> "$LOG" 2>&1
log "reasoning protocol: done ($?)"

# --- 3. paroquant_gptq protocol arm at 0.6B (VERDICT item 3a, ~2h) -------
# The GPTQ-init arm was added to the ladder AFTER the round-3 protocol run;
# this publishes it on the same model/data/recipe so the round-3 table and
# this row compose into one ladder.
log "paroquant_gptq protocol arm: start"
python -u experiments/baselines/quality_ladder.py \
  --model preset:qwen3-0.6b --datasets synthetic \
  --n-samples 512 --seqlen 1024 --epochs 5 --outlier-scale 8 \
  --act-dtype bfloat16 --resident-gb 8 --device tpu \
  --arms paroquant_gptq \
  --out experiments/baselines/ladder_protocol.jsonl >> "$LOG" 2>&1
log "paroquant_gptq protocol arm: done ($?)"
log "campaign complete"
