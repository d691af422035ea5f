#!/bin/bash
# Round-3 TPU queue: waits for the running matrix (pika) to release the
# chip, then: kernel parity check, in-framework flow-net training, spot3
# re-confirmation, dog15 + camel with flow-chain camera init (camel also
# with flow-net flow if it validates), warm timing, and a pika rerun.
# Wall-clocks append to log/matrix_walltime.jsonl under round-3 names.
cd /root/repo
mkdir -p log results

record() { echo "{\"run\": \"$1\", \"wall_s\": $2, \"rc\": $3}" >> log/matrix_walltime.jsonl; }

# 1) in-framework flow net: generate pairs on the chip, train, validate
s=$SECONDS
( set -e
  timeout 3600 python scripts/gen_flow_data.py --n 1600 --device tpu
  timeout 2400 python scripts/train_flow.py --iters 4000 --device tpu
) > /tmp/r3-flownet.log 2>&1
record flownet $((SECONDS - s)) $?

# 3) dog15 full schedule with flow-chain camera init (~2h)
s=$SECONDS
( set -e
  timeout 12000 bash scripts/dog15.sh dogc
  bash scripts/extract.sh dogc-4 dog15 36 2560
  python scripts/eval_mesh.py --testdir log/dogc-4 \
    --gtdir database/DAVIS/Meshes/Full-Resolution/syn-dog-15 | tail -2
) > /tmp/r3-dog15.log 2>&1
record dog15c $((SECONDS - s)) $?

# 4) camel: regenerate flow with the flow net when it beats DIS, then the
# full template schedule with flow-chain init (~2h)
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
    echo "flownet validated - regenerating camel flow"
    python preprocess/auto_gen.py --seqname camel --backend flownet
    python preprocess/auto_gen.py --seqname camel --backend flownet --out camel --force
  fi
  timeout 14000 bash scripts/template.sh camel camel2
  bash scripts/extract.sh camel2-5 camel 36 2880
  bash scripts/render_result.sh log/camel2-5
  python scripts/eval_mesh.py --testdir log/camel2-5 \
    --gtdir database/gt-camel | tail -2
  python scripts/eval_badja.py --testdir log/camel2-5 --seqname camel-syn
) > /tmp/r3-camel.log 2>&1
record camel2 $((SECONDS - s)) $?

# 5) warm-cache spot3 timing artifact (~15 min)
s=$SECONDS
timeout 3600 bash exp/time_spot3_warm.sh > /tmp/r3-warm.log 2>&1
record spot3warm $((SECONDS - s)) $?

# 6) pika rerun with flow-chain init (+flow-net flow when validated)
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
  timeout 14000 bash scripts/template.sh pika pika2
  bash scripts/extract.sh pika2-5 pika 36 2880
  bash scripts/render_result.sh log/pika2-5
  python scripts/eval_mesh.py --testdir log/pika2-5 \
    --gtdir database/gt-pika | tail -2
  python scripts/make_badja_syn.py --seqname pika
  python scripts/eval_badja.py --testdir log/pika2-5 --seqname pika-syn
) > /tmp/r3-pika.log 2>&1
record pika2 $((SECONDS - s)) $?

echo R3-QUEUE-DONE
