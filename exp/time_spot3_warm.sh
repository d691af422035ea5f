#!/bin/bash
# Warm-cache spot3 wall-clock: run the full self-supervised pipeline with
# compile caches hot and record per-phase timings machine-readably to
# results/spot3_warm.json (surfaced by bench.py `extra`).
#
# Uses the single-process multi-stage driver (pipeline.py): one process
# start, one video preprocessing + device upload shared by both stages.
set -e
cd /root/repo
name=${1:-spot3warm}

t0=$SECONDS
python pipeline.py \
  --stage "--name=$name-0 --checkpoint_dir log --only_mean_sym --nouse_gtpose --subdivide 3 --n_bones 21 --n_hypo 8 --num_epochs 5 --dataname spot3 --batch_size 1 --opt_tex yes" \
  --stage "--name=$name-1 --checkpoint_dir log --nosymmetric --nouse_gtpose --subdivide 3 --n_bones 26 --n_faces 1600 --n_hypo 1 --num_epochs 10 --model_path log/$name-0/pred_net_latest.npz --dataname spot3 --batch_size 1 --opt_tex yes" \
  --timing_out /tmp/${name}_walls.json
t2=$SECONDS
bash scripts/extract.sh $name-1 spot3 26 1600
t3=$SECONDS
python scripts/eval_mesh.py --testdir log/$name-1 \
  --gtdir database/DAVIS/Meshes/Full-Resolution/syn-spot3f | tail -2
t4=$SECONDS

python - <<EOF
import json
walls = json.load(open("/tmp/${name}_walls.json"))
json.dump({
    "spot3_warm_stage0_s": walls["$name-0"],
    "spot3_warm_stage1_s": walls["$name-1"],
    "spot3_warm_extract_s": $((t3 - t2)),
    "spot3_warm_eval_s": $((t4 - t3)),
    "spot3_warm_total_s": $((t4 - t0)),
}, open("results/spot3_warm.json", "w"), indent=1)
print(open("results/spot3_warm.json").read())
EOF
