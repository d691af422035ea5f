#!/bin/bash
# Round-5 chip queue part 2 (after exp/run_r5_pika.sh):
#  1. spot3 at HEAD, three seeds with the 16-hypothesis stage-0 default —
#     regenerates the seed artifact trail (run dirs were wiped at round
#     start; the 3e7d57a spread existed only in the commit message)
#  2. records per-seed eval JSONs to results/spot3_seed<k>_eval_mesh.json
cd /root/repo
mkdir -p log results

record() { echo "{\"run\": \"$1\", \"wall_s\": $2, \"rc\": $3}" >> log/matrix_walltime.jsonl; }

for seed in 0 1 2; do
  s=$SECONDS
  ( set -e
    SEED=$seed LASR_PHASE_TIMERS=1 bash scripts/spot3.sh spot3r5s$seed log
    bash scripts/extract.sh spot3r5s$seed-1 spot3 26 1600
    python scripts/eval_mesh.py --testdir log/spot3r5s$seed-1 \
      --gtdir database/DAVIS/Meshes/Full-Resolution/syn-spot3f | tail -2
    cp log/spot3r5s$seed-1/eval_mesh.json \
       results/spot3_seed${seed}_eval_mesh.json
  ) > /tmp/r5-spot3s$seed.log 2>&1
  record spot3r5s$seed $((SECONDS - s)) $?
  tail -2 /tmp/r5-spot3s$seed.log
done

echo R5-SEEDS-DONE
