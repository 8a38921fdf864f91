#!/bin/bash
# Round-5b: silicon A/B of the head-major KV-cache layout (queued behind
# the round-5 campaign's ladder arm). Commits each artifact on completion.
set -u
cd "$(dirname "$0")/.."
LOCK=experiments/CAMPAIGN_RUNNING
LOG=experiments/campaign_r5.log

log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

while [ -f "$LOCK" ] && kill -0 "$(cat "$LOCK")" 2>/dev/null; do
  sleep 60
done
# atomic acquire (noclobber closes the TOCTOU window)
rm -f "$LOCK"
if ! (set -C; echo $$ > "$LOCK") 2>/dev/null; then
  echo "lost the lock race" >&2; exit 1
fi
trap 'rm -f "$LOCK"' EXIT
log "round-5b layout A/B: chip free, starting"

commit() {
  local msg="$1"; shift
  git add "$@" 2>> "$LOG" && git commit -q -m "$msg" >> "$LOG" 2>&1 \
    && log "committed: $msg" || log "commit skipped ($msg)"
}

# 1. 7B decode, post-layout (plus the B=16 arm for the a8 M-cut)
log "bench_7b head-major: start"
python -u scripts/bench_7b.py --batch 1 8 16 32 --quant-mode fused w4a8 \
  > experiments/bench_7b_r5_headmajor.txt 2>> "$LOG"
log "bench_7b head-major: done ($?)"
commit "7B decode A/B on the head-major KV cache (B=1/8/16/32, fused+w4a8)" \
  experiments/bench_7b_r5_headmajor.txt

# 2. B=32 accounting, post-layout (kv buckets should collapse)
log "accounting head-major: start"
python -u scripts/bench_decode_accounting.py --batch 32 --tokens 128 \
  > experiments/decode_accounting_r5_headmajor.json 2>> "$LOG"
log "accounting head-major: done ($?)"
commit "B=32 decode accounting on the head-major KV cache" \
  experiments/decode_accounting_r5_headmajor.json

# 3. 0.6B headline, post-layout
log "bench.py head-major: start"
python -u bench.py > experiments/bench_headline_r5.json 2>> "$LOG"
log "bench.py head-major: done ($?)"
commit "0.6B headline on the head-major KV cache" \
  experiments/bench_headline_r5.json

log "round-5b complete"
commit "round-5 campaign log (layout A/B)" experiments/campaign_r5.log
