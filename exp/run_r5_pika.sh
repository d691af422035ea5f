#!/bin/bash
# Round-5 critical path (VERDICT r4 tasks 1 + 3):
#  1. pika e2e rerun with the bidirectional 0.967-IoU masks, two-scale
#     flownet flow, and the 16-hypothesis stage-0 default
#  2. warm spot3 timing x2 with compact wire dtypes -> typical-wall gate
cd /root/repo
mkdir -p log results

record() { echo "{\"run\": \"$1\", \"wall_s\": $2, \"rc\": $3}" >> log/matrix_walltime.jsonl; }

# 1. pika: regen flow from the committed bidir masks, full 6-stage run
s=$SECONDS
( set -e
  python preprocess/auto_gen.py --seqname pika --backend flownet \
    --flow_threshold 0.05 --force
  python preprocess/auto_gen.py --seqname pika --backend flownet \
    --flow_threshold 0 --out pika --force
  timeout 14000 bash scripts/template.sh pika pika5
  bash scripts/extract.sh pika5-5 pika 36 2880
  python scripts/eval_mesh.py --testdir log/pika5-5 \
    --gtdir database/gt-pika | tail -2
  python scripts/eval_badja.py --testdir log/pika5-5 --seqname pika-syn
) > /tmp/r5-pika.log 2>&1
record pika5 $((SECONDS - s)) $?

# 2. warm spot3 timing, twice, for a typical (not best) number
for i in 1 2; do
  s=$SECONDS
  LASR_PHASE_TIMERS=1 timeout 3600 bash exp/time_spot3_warm.sh spot3warm5$i \
    > /tmp/r5-warm$i.log 2>&1
  record spot3warm5$i $((SECONDS - s)) $?
done

echo R5-PIKA-DONE
