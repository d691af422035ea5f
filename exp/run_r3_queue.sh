#!/bin/bash
# Round-3 TPU queue: waits for the running matrix (pika) to release the
# chip, then reruns the benchmark matrix with flow-chain camera init and
# the parity-fixed kernel.  Records wall-clocks to log/matrix_walltime.jsonl
# with distinct run names so round-2 artifacts are preserved.
cd /root/repo
mkdir -p log results

record() { echo "{\"run\": \"$1\", \"wall_s\": $2, \"rc\": $3}" >> log/matrix_walltime.jsonl; }

# wait for any prior matrix run to release the TPU
while pgrep -f "run_matrix.sh" > /dev/null 2>&1; do sleep 60; done
sleep 30

# 0) hardware kernel parity at HEAD (gates everything)
timeout 600 python exp/tpu_kernel_check.py > /tmp/r3-kernel.log 2>&1
echo "kernel: $(tail -1 /tmp/r3-kernel.log)"

# 1) spot3 re-confirmation with the current kernel (~20 min)
s=$SECONDS
( set -e
  bash exp/run_spot3.sh spot3r3
) > /tmp/r3-spot3.log 2>&1
record spot3r3 $((SECONDS - s)) $?

# 2) dog15 full schedule with flow-chain camera init (~2h)
s=$SECONDS
( set -e
  bash scripts/dog15.sh dogc
  bash scripts/extract.sh dogc-4 dog15 36 2560
  python scripts/eval_mesh.py --testdir log/dogc-4 \
    --gtdir database/DAVIS/Meshes/Full-Resolution/syn-dog-15 | tail -2
) > /tmp/r3-dog15.log 2>&1
record dog15c $((SECONDS - s)) $?

# 3) camel full schedule with flow-chain camera init (~2h)
s=$SECONDS
( set -e
  bash scripts/template.sh camel2
  bash scripts/extract.sh camel2-5 camel 36 2880
  bash scripts/render_result.sh log/camel2-5
  python scripts/eval_mesh.py --testdir log/camel2-5 \
    --gtdir database/gt-camel | tail -2
  python scripts/eval_badja.py --testdir log/camel2-5 --seqname camel-syn
) > /tmp/r3-camel.log 2>&1
record camel2 $((SECONDS - s)) $?

# 4) warm-cache spot3 timing artifact (~15 min)
s=$SECONDS
bash exp/time_spot3_warm.sh > /tmp/r3-warm.log 2>&1
record spot3warm $((SECONDS - s)) $?

echo R3-QUEUE-DONE
