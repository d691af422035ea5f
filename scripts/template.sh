#!/bin/bash
# Six-stage coarse-to-fine schedule for real videos (parity with
# ref:scripts/template.sh): progressive bone growth + remeshing; the final
# stage switches to the unsubsampled sequence with a sharper rasterizer.
#
# Runs through the single-process multi-stage driver (pipeline.py): the
# preprocessed video + device arrays are shared across the five r$seqname
# stages (the final $seqname stage re-preprocesses once), and XLA programs
# stay in the in-memory compile cache — chained optimize.py processes paid
# 77-456 s of startup per stage through the tunnel (round-3 phase data).
set -e
seqname=$1
logname=${2:-$1}
checkpoint_dir=${CHECKPOINT_DIR:-log}
nepoch=10
batchsize=2
ngpu=${NGPU:-1}

dataname=r${seqname}
python pipeline.py \
  --stage "--name=$logname-0 --checkpoint_dir $checkpoint_dir --only_mean_sym --nouse_gtpose --subdivide 3 --n_bones 21 --n_hypo 16 --num_epochs 20 --dataname $dataname --ngpu $ngpu --batch_size $batchsize --opt_tex yes --cam_init flow_chain" \
  --stage "--name=$logname-1 --checkpoint_dir $checkpoint_dir --nosymmetric --nouse_gtpose --subdivide 3 --n_bones 26 --n_faces 1600 --n_hypo 1 --num_epochs $nepoch --model_path $checkpoint_dir/$logname-0/pred_net_latest.npz --dataname $dataname --ngpu $ngpu --batch_size $batchsize --opt_tex yes --cam_init flow_chain" \
  --stage "--name=$logname-2 --checkpoint_dir $checkpoint_dir --nosymmetric --nouse_gtpose --subdivide 3 --n_bones 31 --n_faces 1920 --n_hypo 1 --num_epochs $nepoch --model_path $checkpoint_dir/$logname-1/pred_net_latest.npz --dataname $dataname --ngpu $ngpu --batch_size $batchsize --opt_tex yes --cam_init flow_chain" \
  --stage "--name=$logname-3 --checkpoint_dir $checkpoint_dir --nosymmetric --nouse_gtpose --subdivide 3 --n_bones 31 --n_faces 2240 --n_hypo 1 --num_epochs $nepoch --model_path $checkpoint_dir/$logname-2/pred_net_latest.npz --dataname $dataname --ngpu $ngpu --batch_size $batchsize --opt_tex yes --cam_init flow_chain" \
  --stage "--name=$logname-4 --checkpoint_dir $checkpoint_dir --nosymmetric --nouse_gtpose --subdivide 3 --n_bones 36 --n_faces 2560 --n_hypo 1 --num_epochs $nepoch --model_path $checkpoint_dir/$logname-3/pred_net_latest.npz --dataname $dataname --ngpu $ngpu --batch_size $batchsize --opt_tex yes --cam_init flow_chain" \
  --stage "--name=$logname-5 --checkpoint_dir $checkpoint_dir --nosymmetric --nouse_gtpose --subdivide 3 --n_bones 36 --n_faces 2880 --n_hypo 1 --num_epochs $nepoch --model_path $checkpoint_dir/$logname-4/pred_net_latest.npz --dataname ${seqname} --ngpu $ngpu --batch_size $batchsize --opt_tex yes --sigval 1e-5 --cam_init flow_chain"
