#!/bin/bash
# Flow-preprocessing driver (parity with ref:preprocess/auto_gen.sh):
#   1. flow on frames with sufficient motion -> filtered r<seq> dataset
#   2. flow on the full sequence -> <seq> FlowFW/FlowBW
# Usage: bash preprocess/auto_gen.sh <seqname> [backend]
#   backend: dis (default, no pretrained weights) | vcn (needs
#   lasr_vcn/vcn_rob.pth, converted via lasr_tpu.models.vcn)
set -e
seqname=$1
backend=${2:-dis}
loadmodel=""
if [ "$backend" = vcn ]; then loadmodel="--loadmodel lasr_vcn/vcn_rob.pth"; fi

# run flow on frames with sufficient motion -> r<seq>
python preprocess/auto_gen.py --seqname $seqname --backend $backend \
  $loadmodel --flow_threshold 0.05

# run flow on the full seq (no frame skipping) -> <seq>
python preprocess/auto_gen.py --seqname $seqname --backend $backend \
  $loadmodel --flow_threshold 0 --out $seqname
