#!/bin/bash
# Basin-stability diagnostic: teach the camera heads the GT cameras first
# (use_gtpose trains heads via the 0.2*cam-consistency loss), then release
# them (nouse_gtpose) and measure whether the true-camera basin HOLDS.
#   holds  -> spot3 failure is pure search (fix with init diversity /
#             annealing / restarts);
#   drifts -> the energy itself prefers wrong cameras (parity bug).
set -e
cd /root/repo
name=${1:-oracle}
python optimize.py --name=$name-A --checkpoint_dir log --only_mean_sym \
  --use_gtpose --subdivide 3 --n_bones 21 --n_hypo 1 --num_epochs 3 \
  --dataname spot3 --batch_size 1 --opt_tex yes --frame_code
python optimize.py --name=$name-B --checkpoint_dir log --only_mean_sym \
  --nouse_gtpose --subdivide 3 --n_bones 21 --n_hypo 1 --num_epochs 5 \
  --model_path log/$name-A/pred_net_latest.npz \
  --dataname spot3 --batch_size 1 --opt_tex yes --frame_code
for d in $name-A $name-B; do
  echo "=== $d ==="
  python scripts/diag_hypo.py --logdir log/$d --dataname spot3 --n_hypo 1 \
    2>/dev/null | tail -4
done
