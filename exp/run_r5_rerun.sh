#!/bin/bash
# Round-5 chip queue: re-run every flow_chain benchmark at HEAD with the
# loop-closure camera chains + re-anchored masks (commit 8fb4138).
#  1. pika e2e (the round's target: close to family parity)
#  2. syn-dog-15 re-validation (published number depends on flow_chain)
#  3. camel re-validation (same; waits for the CPU DIS flow regen)
cd /root/repo
mkdir -p log results

record() { echo "{\"run\": \"$1\", \"wall_s\": $2, \"rc\": $3}" >> log/matrix_walltime.jsonl; }

# 1. pika with closure chains + re-anchored masks
s=$SECONDS
( set -e
  python preprocess/auto_gen.py --seqname pika --backend flownet \
    --flow_threshold 0.05 --force
  python preprocess/auto_gen.py --seqname pika --backend flownet \
    --flow_threshold 0 --out pika --force
  timeout 10000 bash scripts/template.sh pika pika5b
  bash scripts/extract.sh pika5b-5 pika 36 2880
  python scripts/eval_mesh.py --testdir log/pika5b-5 \
    --gtdir database/gt-pika | tail -2
  python scripts/eval_badja.py --testdir log/pika5b-5 --seqname pika-syn
) > /tmp/r5-pikab.log 2>&1
record pika5b $((SECONDS - s)) $?
tail -3 /tmp/r5-pikab.log

# 2. dog15 re-validation
s=$SECONDS
( set -e
  timeout 10000 bash scripts/dog15.sh dog15r5 log
  bash scripts/extract.sh dog15r5-4 dog15 36 2560
  python scripts/eval_mesh.py --testdir log/dog15r5-4 \
    --gtdir database/DAVIS/Meshes/Full-Resolution/syn-dog-15 | tail -2
  python scripts/eval_badja.py --testdir log/dog15r5-4 --seqname dog15-syn
) > /tmp/r5-dog15.log 2>&1
record dog15r5 $((SECONDS - s)) $?
tail -3 /tmp/r5-dog15.log

# 3. camel re-validation (needs the DIS flow regen to have finished)
for i in $(seq 60); do
  [ -f database/DAVIS/FlowFW/Full-Resolution/camel/flo-00024.pfm ] && break
  sleep 30
done
s=$SECONDS
( set -e
  timeout 10000 bash scripts/template.sh camel camel5
  bash scripts/extract.sh camel5-5 camel 36 2880
  python scripts/eval_mesh.py --testdir log/camel5-5 \
    --gtdir database/gt-camel | tail -2
  python scripts/eval_badja.py --testdir log/camel5-5 --seqname camel-syn
) > /tmp/r5-camel.log 2>&1
record camel5 $((SECONDS - s)) $?
tail -3 /tmp/r5-camel.log

echo R5-RERUN-DONE
