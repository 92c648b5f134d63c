#!/bin/bash
# Round-4 hardware campaign: run every TPU-gated measurement the moment the
# tunnel returns. Safe/measurement steps first; the ml=512 bisect (which
# crashed a TPU worker in round 3) runs LAST so a repeat crash cannot cost
# us the bench artifacts.
#
# Usage: bash tools/hw_campaign.sh [--now]
#   default: poll /tmp/tpu_status (written by the watcher) until UP
#   --now:   skip the wait and start immediately
#
# Output: /tmp/hw_campaign/{NN_name.log,summary.txt}; exit code 0 if every
# step ran (individual step failures are recorded, not fatal).

set -u
cd "$(dirname "$0")/.."
OUT=/tmp/hw_campaign
mkdir -p "$OUT"
SUMMARY="$OUT/summary.txt"

if [ "${1:-}" != "--now" ]; then
  echo "$(date -u +%FT%TZ) waiting for TPU (poll /tmp/tpu_status)" | tee -a "$SUMMARY"
  while [ "$(cat /tmp/tpu_status 2>/dev/null)" != "UP" ]; do
    # Belt and braces: probe directly too, in case the watcher died.
    if timeout 120 python -c "import jax; assert jax.default_backend()=='tpu'" 2>/dev/null; then
      echo UP > /tmp/tpu_status
      break
    fi
    sleep 120
  done
fi
echo "$(date -u +%FT%TZ) TPU UP — campaign start" | tee -a "$SUMMARY"

step() {
  local name="$1" tmo="$2"; shift 2
  local log="$OUT/${name}.log"
  echo "$(date -u +%FT%TZ) START $name: $*" | tee -a "$SUMMARY"
  timeout "$tmo" "$@" >"$log" 2>&1
  local rc=$?
  echo "$(date -u +%FT%TZ) DONE  $name rc=$rc (log: $log)" | tee -a "$SUMMARY"
  tail -3 "$log" | sed 's/^/    /' >> "$SUMMARY"
  return $rc
}

# 1. Kernel parity smoke (fast; also warms the compilation cache).
step 01_smoke 900 python tests/tpu_smoke_runner.py

# 2. The bench itself — the round's headline numbers.
step 02_bench 1800 python bench.py

# 3. SVGP steps/sec datapoint (VERDICT r3 item 7).
step 03_svgp 900 python tools/svgp_bench.py

# 4. Mirror-bucketing A/B (VERDICT r3 item 6): padded vs bucketed backward.
step 04_mirror_ab 1800 python tools/kernel_lab.py base bwd_mirror_padded

# 5. Single-chip N=1e7 qn datapoint (round-3 claim to re-verify on hw).
step 05_large_n 1800 python tools/large_n_singlechip.py 10000000 200 3

# 6. RISKY LAST: the ml=512 hardware bisect. May crash the TPU worker;
#    everything above is already on disk if it does.
step 06_bisect 2400 python tools/qn_ml512_bisect.py

echo "$(date -u +%FT%TZ) campaign complete" | tee -a "$SUMMARY"
