#!/bin/bash
# Full self-supervised schedule (parity with ref:scripts/spot3.sh).
# Runs through the single-process multi-stage driver (pipeline.py): one
# process start, one video preprocessing + device upload + in-memory
# compile cache shared by both stages (chained optimize.py processes paid
# 77-456 s of startup per stage through the tunnel, round-3 phase data).
set -e
logname=${1:-spot3}
checkpoint_dir=${2:-log}
dataname=spot3
nepoch=10
seed=${SEED:-0}   # the run is deterministic given the seed (measured:
                  # two same-seed runs reproduce chamfer to 4 decimals)
nhypo=${NHYPO:-16} # stage-0 camera hypotheses.  16 (the reference's
                  # stage-0 default, ref:scripts/template.sh:25) halves the
                  # seed spread vs 8: the weights-free camera search is the
                  # stochastic part, and more draws tame its worst seed.

python pipeline.py \
  --stage "--name=$logname-0 --checkpoint_dir $checkpoint_dir --only_mean_sym --nouse_gtpose --subdivide 3 --n_bones 21 --n_hypo $nhypo --num_epochs 5 --dataname $dataname --batch_size 1 --opt_tex yes --seed $seed" \
  --stage "--name=$logname-1 --checkpoint_dir $checkpoint_dir --nosymmetric --nouse_gtpose --subdivide 3 --n_bones 26 --n_faces 1600 --n_hypo 1 --num_epochs $nepoch --model_path $checkpoint_dir/$logname-0/pred_net_latest.npz --dataname $dataname --batch_size 1 --opt_tex yes --seed $seed"
