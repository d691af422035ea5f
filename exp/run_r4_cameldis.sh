#!/bin/bash
# Camel at HEAD with the DIS flow backend: A/B against the flownet run
# (camel4) and re-validate the round-3 published recipe under this round's
# code changes.
cd /root/repo
record() { echo "{\"run\": \"$1\", \"wall_s\": $2, \"rc\": $3}" >> log/matrix_walltime.jsonl; }
s=$SECONDS
( set -e
  python preprocess/auto_gen.py --seqname camel --backend dis \
    --flow_threshold 0.05 --force
  python preprocess/auto_gen.py --seqname camel --backend dis \
    --flow_threshold 0 --out camel --force
  timeout 10000 bash scripts/template.sh camel camelr4d
  bash scripts/extract.sh camelr4d-5 camel 36 2880
  python scripts/eval_mesh.py --testdir log/camelr4d-5 \
    --gtdir database/gt-camel | tail -2
  python scripts/eval_badja.py --testdir log/camelr4d-5 --seqname camel-syn
) > /tmp/r4-cameldis.log 2>&1
record camelr4d $((SECONDS - s)) $?
echo CAMELDIS-DONE
