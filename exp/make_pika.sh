#!/bin/bash
# Build the "pika" raw-VIDEO benchmark fully in-repo: render an articulated
# synthetic sequence, encode it to an mp4 (discarding every GT byproduct),
# then run the reference's raw-video recipe (ref:README.md:76-90) with
# in-repo substitutes:
#   mp4 -> video2frames (ffmpeg equiv) -> mask.py (PointRend equiv)
#       -> auto_gen.sh (VCN-flow equiv) -> scripts/template.sh pika
# GT meshes are kept aside in database/gt-pika for offline eval only.
set -e
cd /root/repo
root=database/DAVIS

python scripts/render_syn.py --outdir pika-src --model dog --nframes 31

# encode raw frames to a video, then delete every rendered artifact
mkdir -p database/raw database/gt-pika
cp $root/Meshes/Full-Resolution/pika-src/*.obj database/gt-pika/ 2>/dev/null || true
python - <<'EOF'
import cv2, glob
frames = sorted(glob.glob("database/DAVIS/JPEGImages/Full-Resolution/pika-src/*.jpg"))
img = cv2.imread(frames[0]); h, w = img.shape[:2]
vw = cv2.VideoWriter("database/raw/pika.mp4", cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h))
assert vw.isOpened()
for f in frames:
    vw.write(cv2.imread(f))
vw.release()
print(f"database/raw/pika.mp4: {len(frames)} frames {w}x{h}")
EOF
for sub in JPEGImages Annotations FlowFW FlowBW Camera Meshes; do
  rm -rf $root/$sub/Full-Resolution/pika-src
done

# the reference's pipeline, ffmpeg/PointRend/VCN replaced in-repo
python preprocess/video2frames.py pika database/raw/pika.mp4 --fps 10
python preprocess/mask.py pika --masksrc propagate-bidir
bash preprocess/auto_gen.sh pika
echo "pika sequence ready: run 'bash scripts/template.sh pika'"
