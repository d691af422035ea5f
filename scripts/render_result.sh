#!/bin/bash
# Turntable gif of extracted meshes (parity with ref:scripts/render_result.sh).
set -e
testdir=$1
python render_vis.py --testdir $testdir --outpath $testdir/result.gif
