#!/bin/bash
# Build the "camel" raw-video benchmark sequence fully in-repo:
# render an articulated synthetic video, keep ONLY the raw JPEG frames
# (GT masks/flow/cameras discarded), then run the weights-free real-video
# preprocessing path on the pixels alone:
#   raw frames -> propagate masks -> DIS flow (filtered r<seq> + full <seq>)
# After this, `bash scripts/template.sh camel` runs the full coarse-to-fine
# schedule exactly like the reference's DAVIS-camel recipe.
set -e
cd /root/repo
root=database/DAVIS

python scripts/render_syn.py --outdir camel-tmp --model dog --nframes 26

# strip everything but the raw frames; keep GT meshes aside for offline eval
mkdir -p database/gt-camel
cp $root/Meshes/Full-Resolution/camel-tmp/*.obj database/gt-camel/ 2>/dev/null || true
rm -rf $root/Annotations/Full-Resolution/camel-tmp \
       $root/FlowFW/Full-Resolution/camel-tmp \
       $root/FlowBW/Full-Resolution/camel-tmp \
       $root/Camera/Full-Resolution/camel-tmp \
       $root/Meshes/Full-Resolution/camel-tmp

python preprocess/mask.py camel --masksrc propagate-bidir
bash preprocess/auto_gen.sh camel
echo "camel sequence ready: run 'bash scripts/template.sh camel'"
