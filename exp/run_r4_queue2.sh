#!/bin/bash
# Round-4 queue part 2: pika + camel with the retrained flow net
# (part 1 — mask IoU, spot3 reruns, warm timing — completed in
# exp/run_r4_queue.sh; its pika attempt crashed on stale filtered-set
# leftovers, fixed in preprocess/auto_gen.py since).
cd /root/repo
mkdir -p log results

record() { echo "{\"run\": \"$1\", \"wall_s\": $2, \"rc\": $3}" >> log/matrix_walltime.jsonl; }

for seq in pika camel; do
  s=$SECONDS
  ( set -e
    python preprocess/auto_gen.py --seqname $seq --backend flownet \
      --flow_threshold 0.05 --force
    python preprocess/auto_gen.py --seqname $seq --backend flownet \
      --flow_threshold 0 --out $seq --force
    timeout 14000 bash scripts/template.sh $seq ${seq}4
    bash scripts/extract.sh ${seq}4-5 $seq 36 2880
    python scripts/eval_mesh.py --testdir log/${seq}4-5 \
      --gtdir database/gt-$seq | tail -2
    python scripts/eval_badja.py --testdir log/${seq}4-5 --seqname $seq-syn
  ) > /tmp/r4-$seq.log 2>&1
  record ${seq}4 $((SECONDS - s)) $?
done
bash scripts/render_result.sh log/pika4-5 >> /tmp/r4-pika.log 2>&1

echo R4-QUEUE2-DONE
