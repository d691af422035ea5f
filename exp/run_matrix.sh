#!/bin/bash
# Run the full BASELINE.json benchmark matrix sequentially on the chip,
# recording per-config wall-clock to log/matrix_walltime.jsonl.
# Usage: bash exp/run_matrix.sh [configs...]   (default: all)
cd /root/repo
mkdir -p log
configs=${@:-gtcam dog15 camel pika}

record() { echo "{\"run\": \"$1\", \"wall_s\": $2, \"rc\": $3}" >> log/matrix_walltime.jsonl; }

for c in $configs; do
  s=$SECONDS
  case $c in
    gtcam)
      ( set -e
        bash scripts/spot3-gtcam.sh gtfix
        bash scripts/extract.sh gtfix-1 spot3 1 1600
        python scripts/eval_mesh.py --testdir log/gtfix-1 \
          --gtdir database/DAVIS/Meshes/Full-Resolution/syn-spot3f | tail -2
      ) > /tmp/matrix-gtcam.log 2>&1 ;;
    dog15)
      ( set -e
        bash scripts/dog15.sh dogf
        bash scripts/extract.sh dogf-4 dog15 36 2560
        python scripts/eval_mesh.py --testdir log/dogf-4 \
          --gtdir database/DAVIS/Meshes/Full-Resolution/syn-dog-15 | tail -2
      ) > /tmp/matrix-dog15.log 2>&1 ;;
    camel)
      ( set -e
        bash scripts/template.sh camel
        bash scripts/extract.sh camel-5 camel 36 2880
        bash scripts/render_result.sh log/camel-5
        python scripts/eval_mesh.py --testdir log/camel-5 \
          --gtdir database/gt-camel | tail -2
        python scripts/eval_badja.py --testdir log/camel-5 --seqname camel-syn
      ) > /tmp/matrix-camel.log 2>&1 ;;
    pika)
      ( set -e
        [ -d database/DAVIS/JPEGImages/Full-Resolution/pika ] || bash exp/make_pika.sh
        bash scripts/template.sh pika
        bash scripts/extract.sh pika-5 pika 36 2880
        bash scripts/render_result.sh log/pika-5
        python scripts/eval_mesh.py --testdir log/pika-5 \
          --gtdir database/gt-pika | tail -2
        python scripts/make_badja_syn.py --seqname pika
        python scripts/eval_badja.py --testdir log/pika-5 --seqname pika-syn
      ) > /tmp/matrix-pika.log 2>&1 ;;
  esac
  record $c $((SECONDS - s)) $?
done
echo MATRIX-DONE
