#!/bin/bash
# Round-3 phase 4 (after the pika rerun releases the chip):
#   1. kernel parity re-check at HEAD (new trainer/save code in the tree)
#   2. instrumented warm spot3 via the single-process pipeline driver
#      (LASR_PHASE_TIMERS=1 -> per-epoch exec/scal/img/tb/save split)
#   3. flow-net v2 retrain + validation (evidence artifact)
#   4. bench.py sanity print
# Wall-clocks append to log/matrix_walltime.jsonl.
cd /root/repo
mkdir -p log results

record() { echo "{\"run\": \"$1\", \"wall_s\": $2, \"rc\": $3}" >> log/matrix_walltime.jsonl; }

s=$SECONDS
timeout 1200 python exp/tpu_kernel_check.py > /tmp/r3-kernel2.log 2>&1
record kernel_r3b $((SECONDS - s)) $?

s=$SECONDS
LASR_PHASE_TIMERS=1 timeout 3600 bash exp/time_spot3_warm.sh spot3warm2 \
  > /tmp/r3-warm2.log 2>&1
record spot3warm2 $((SECONDS - s)) $?

s=$SECONDS
( set -e
  timeout 5400 python scripts/train_flow.py --iters 6000 --device tpu
) > /tmp/r3-flownet3.log 2>&1
record flownet2 $((SECONDS - s)) $?

s=$SECONDS
timeout 1800 python bench.py > /tmp/r3-bench.log 2>&1
record bench_r3 $((SECONDS - s)) $?

echo R3-QUEUE4-DONE
