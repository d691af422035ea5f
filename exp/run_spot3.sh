#!/bin/bash
# exp/run_spot3.sh <runname> [extra stage-0 flags...]
set -e
cd /root/repo
name=$1; shift
extra="$@"
python optimize.py --name=$name-0 --checkpoint_dir log --only_mean_sym --nouse_gtpose --subdivide 3 --n_bones 21 --n_hypo 8 --num_epochs 5 --dataname spot3 --batch_size 1 --opt_tex yes $extra
python optimize.py --name=$name-1 --checkpoint_dir log --nosymmetric --nouse_gtpose --subdivide 3 --n_bones 26 --n_faces 1600 --n_hypo 1 --num_epochs 10 --model_path log/$name-0/pred_net_latest.npz --dataname spot3 --batch_size 1 --opt_tex yes
bash scripts/extract.sh $name-1 spot3 26 1600
python scripts/eval_mesh.py --testdir log/$name-1 --gtdir database/DAVIS/Meshes/Full-Resolution/syn-spot3f | tail -3
