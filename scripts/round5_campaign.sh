#!/bin/bash
# Round-5 chip campaign (VERDICT r4 items 1, 2-tail, 8). Waits for the
# round-4 campaign's lock to clear (its paroquant_gptq arm is still on the
# chip at round-5 start), then runs the queue SERIALIZED on the one chip.
# Each item COMMITS its own artifacts on completion (VERDICT r4 item 9: a
# snapshot boundary must never strand results again).
set -u
cd "$(dirname "$0")/.."
LOCK=experiments/CAMPAIGN_RUNNING
LOG=experiments/campaign_r5.log

log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

# --- 0. wait for the round-4 campaign (same lockfile protocol) -----------
while [ -f "$LOCK" ] && kill -0 "$(cat "$LOCK")" 2>/dev/null; do
  sleep 60
done
# atomic acquire (noclobber): closes the wait->write race when two queued
# campaigns see the lock clear in the same window (round-5 self-review)
rm -f "$LOCK"
if ! (set -C; echo $$ > "$LOCK") 2>/dev/null; then
  echo "lost the lock race" >&2; exit 1
fi
trap 'rm -f "$LOCK"' EXIT
log "round-5 campaign: chip free, starting"

commit() {  # commit <msg> <paths...>
  local msg="$1"; shift
  git add "$@" 2>> "$LOG" && git commit -q -m "$msg" >> "$LOG" 2>&1 \
    && log "committed: $msg" || log "commit skipped ($msg)"
}

# --- 1. round-4 campaign tail artifacts (paroquant_gptq 0.6B arm) --------
commit "round-4 campaign artifacts: 0.6B paroquant_gptq protocol arm + campaign log" \
  experiments/campaign_r4.log experiments/baselines/ladder_protocol.jsonl

# --- 2. batched-decode accounting at 7B B=32 (VERDICT r4 item 1) ---------
log "decode accounting: start"
python -u scripts/bench_decode_accounting.py --batch 32 --tokens 64 128 \
  > experiments/decode_accounting_r5.json 2>> "$LOG"
log "decode accounting: done ($?)"
commit "B=32 7B decode accounting: per-bucket device profile (scan-only trace)" \
  experiments/decode_accounting_r5.json

# --- 3. bench_7b B=8/32 re-record after the two round-4 fixes ------------
# (M-tile sizing e61f159 + attention-cast f68b4fd, both landed unvalidated)
log "bench_7b re-record: start"
python -u scripts/bench_7b.py --batch 1 8 32 --quant-mode fused w4a8 xla \
  > experiments/bench_7b_r5.txt 2>> "$LOG"
log "bench_7b re-record: done ($?)"
commit "bench_7b B=1/8/32 re-record (post M-tile + attention-cast fixes), fused+w4a8 interleaved" \
  experiments/bench_7b_r5.txt

# --- 4. W4A8 protocol-scale quality row (VERDICT r4 item 8) --------------
# paroquant + paroquant_w4a8 on the 0.6B protocol recipe: the a8 arm
# re-evaluates the SAME learned checkpoint with a8 rounding on all tokens.
log "w4a8 protocol ladder arm: start"
python -u experiments/baselines/quality_ladder.py \
  --model preset:qwen3-0.6b --datasets synthetic \
  --n-samples 512 --seqlen 1024 --epochs 5 --outlier-scale 8 \
  --act-dtype bfloat16 --resident-gb 8 --device tpu \
  --arms paroquant,paroquant_w4a8 \
  --out experiments/baselines/ladder_protocol.jsonl >> "$LOG" 2>&1
log "w4a8 protocol ladder arm: done ($?)"
commit "protocol-scale W4A8 quality ladder row (a8 sim on the learned 0.6B checkpoint)" \
  experiments/baselines/ladder_protocol.jsonl

log "round-5 campaign complete"
commit "round-5 campaign log" experiments/campaign_r5.log
