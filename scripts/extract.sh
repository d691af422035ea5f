#!/bin/bash
# Mesh extraction for a finished run (parity with ref:scripts/extract.sh).
set -e
logname=$1
dataname=$2
nbones=${3:-1}
nfaces=${4:-1600}
python extract.py --name=$logname --checkpoint_dir log --dataname $dataname --n_bones $nbones --n_faces $nfaces --nosymmetric
