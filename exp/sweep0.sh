#!/bin/bash
# Stage-0 camera-search sweep on spot3: frame_code_norm x flow_rampup.
# All configs share one compiled epoch program (annealing knobs are traced
# runtime scalars).  Reports per-hypothesis relative-rotation error vs GT
# via scripts/diag_hypo.py.
set -e
cd /root/repo
epochs=${EPOCHS:-5}
for norm in 24 64 128; do
  for ramp in 0 3; do
    name=sw-n$norm-r$ramp
    if [ ! -f log/$name-0/pred_net_latest.npz ]; then
      python optimize.py --name=$name-0 --checkpoint_dir log --only_mean_sym \
        --nouse_gtpose --subdivide 3 --n_bones 21 --n_hypo 8 \
        --num_epochs $epochs --dataname spot3 --batch_size 1 --opt_tex yes \
        --frame_code --frame_code_norm $norm --flow_rampup $ramp \
        2>&1 | grep -a "epoch\|warning" | tail -3
    fi
    echo "=== $name ==="
    python scripts/diag_hypo.py --logdir log/$name-0 --dataname spot3 \
      2>/dev/null | tail -3
  done
done
