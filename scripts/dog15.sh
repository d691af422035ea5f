#!/bin/bash
# Five-stage schedule for the syn-dog-15 sequence (parity with
# ref:scripts/dog15.sh): 21->36 bones, 1280->2560 faces, batch 3.
# Runs through the single-process multi-stage driver (pipeline.py): one
# process start, one preprocessing + device upload + in-memory compile
# cache shared by all five stages.
set -e
logname=${1:-dog15}
checkpoint_dir=${2:-log}
dataname=dog15
nepoch=10
batchsize=3

python pipeline.py \
  --stage "--name=$logname-0 --checkpoint_dir $checkpoint_dir --only_mean_sym --nouse_gtpose --subdivide 3 --n_bones 21 --n_hypo 16 --num_epochs 20 --dataname $dataname --batch_size $batchsize --opt_tex yes --cam_init flow_chain" \
  --stage "--name=$logname-1 --checkpoint_dir $checkpoint_dir --nosymmetric --nouse_gtpose --subdivide 3 --n_bones 26 --n_faces 1600 --n_hypo 1 --num_epochs $nepoch --model_path $checkpoint_dir/$logname-0/pred_net_latest.npz --dataname $dataname --batch_size $batchsize --opt_tex yes --cam_init flow_chain" \
  --stage "--name=$logname-2 --checkpoint_dir $checkpoint_dir --nosymmetric --nouse_gtpose --subdivide 3 --n_bones 31 --n_faces 1920 --n_hypo 1 --num_epochs $nepoch --model_path $checkpoint_dir/$logname-1/pred_net_latest.npz --dataname $dataname --batch_size $batchsize --opt_tex yes --cam_init flow_chain" \
  --stage "--name=$logname-3 --checkpoint_dir $checkpoint_dir --nosymmetric --nouse_gtpose --subdivide 3 --n_bones 31 --n_faces 2240 --n_hypo 1 --num_epochs $nepoch --model_path $checkpoint_dir/$logname-2/pred_net_latest.npz --dataname $dataname --batch_size $batchsize --opt_tex yes --cam_init flow_chain" \
  --stage "--name=$logname-4 --checkpoint_dir $checkpoint_dir --nosymmetric --nouse_gtpose --subdivide 3 --n_bones 36 --n_faces 2560 --n_hypo 1 --num_epochs $nepoch --model_path $checkpoint_dir/$logname-3/pred_net_latest.npz --dataname $dataname --batch_size $batchsize --opt_tex yes --cam_init flow_chain"
