#!/bin/bash
# Coarse-to-fine schedule with frozen GT cameras (parity with
# ref:scripts/spot3-gtcam.sh): stage 0 fits shape/texture with GT pose,
# stage 1 refines with learned cameras on a remeshed topology.
# Runs through the single-process multi-stage driver (pipeline.py).
set -e
logname=${1:-spot3-gtcam}
checkpoint_dir=${2:-log}
dataname=spot3
nepoch=10

python pipeline.py \
  --stage "--name=$logname-0 --checkpoint_dir $checkpoint_dir --nosymmetric --nouse_gtpose --subdivide 3 --n_bones 1 --n_hypo 1 --num_epochs 5 --dataname $dataname --batch_size 1 --opt_tex yes --use_gtpose" \
  --stage "--name=$logname-1 --checkpoint_dir $checkpoint_dir --nosymmetric --nouse_gtpose --subdivide 3 --n_bones 1 --n_faces 1600 --n_hypo 1 --num_epochs $nepoch --model_path $checkpoint_dir/$logname-0/pred_net_latest.npz --dataname $dataname --batch_size 1 --opt_tex yes"
