#!/bin/bash
# Round-3 phase 3: warm spot3 timing, flow-net v2 retrain (+validation),
# then optionally the pika rerun when SKIP_PIKA is unset.
cd /root/repo
mkdir -p log results

record() { echo "{\"run\": \"$1\", \"wall_s\": $2, \"rc\": $3}" >> log/matrix_walltime.jsonl; }

# warm-cache spot3 timing artifact (~15 min)
s=$SECONDS
timeout 3600 bash exp/time_spot3_warm.sh > /tmp/r3-warm.log 2>&1
record spot3warm $((SECONDS - s)) $?

if [ -z "$SKIP_PIKA" ]; then
  s=$SECONDS
  ( set -e
    good=$(python -c "
import json
try:
    v = json.load(open('results/flownet_val.json'))['mean_epe_mask']
    print('yes' if v < 12.0 else 'no')
except Exception:
    print('no')")
    if [ "$good" = yes ]; then
      python preprocess/auto_gen.py --seqname pika --backend flownet
      python preprocess/auto_gen.py --seqname pika --backend flownet --out pika --force
    fi
    timeout 12000 bash scripts/template.sh pika pika2
    bash scripts/extract.sh pika2-5 pika 36 2880
    bash scripts/render_result.sh log/pika2-5
    python scripts/eval_mesh.py --testdir log/pika2-5 \
      --gtdir database/gt-pika | tail -2
    python scripts/eval_badja.py --testdir log/pika2-5 --seqname pika-syn
  ) > /tmp/r3-pika.log 2>&1
  record pika2 $((SECONDS - s)) $?
fi

# flow-net v2 retrain on the existing generated shards (runs last: its
# validation is an evidence artifact, not a benchmark number)
s=$SECONDS
( set -e
  timeout 5400 python scripts/train_flow.py --iters 6000 --device tpu
) > /tmp/r3-flownet2.log 2>&1
record flownet2 $((SECONDS - s)) $?

echo R3-QUEUE3-DONE
