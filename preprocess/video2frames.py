"""Extract JPEG frames from a raw video into the DAVIS staging layout.

Replaces the reference's ffmpeg invocation (ref:README.md:78-79:
``ffmpeg -ss <skip> -i <video> -vf fps=<fps> .../<seq>-tmp/%05d.jpg``)
with an OpenCV decoder so the raw-video path needs no external binary.

Usage:
    python preprocess/video2frames.py <seqname> <video> [--fps 10]
        [--skip-seconds 0] [--max-frames N]

Writes ``database/DAVIS/JPEGImages/Full-Resolution/<seqname>-tmp/%05d.jpg``;
follow with ``python preprocess/mask.py <seqname> ...`` and
``bash preprocess/auto_gen.sh <seqname>`` exactly as for ffmpeg output.
"""

from __future__ import annotations

import argparse
import os

import cv2


def extract_frames(video: str, outdir: str, fps: float = 10.0,
                   skip_seconds: float = 0.0, max_frames: int = 0) -> int:
    cap = cv2.VideoCapture(video)
    if not cap.isOpened():
        raise SystemExit(f"cannot open video: {video}")
    src_fps = cap.get(cv2.CAP_PROP_FPS) or fps
    os.makedirs(outdir, exist_ok=True)

    # Emit one frame each time source time crosses the next 1/fps boundary,
    # matching ffmpeg's -vf fps resampling.
    n_out = 0
    n_src = 0
    next_t = skip_seconds
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        t = n_src / src_fps
        n_src += 1
        if t + 1e-9 < next_t:
            continue
        cv2.imwrite(os.path.join(outdir, "%05d.jpg" % n_out), frame,
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        n_out += 1
        next_t = skip_seconds + n_out / fps
        if max_frames and n_out >= max_frames:
            break
    cap.release()
    return n_out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("seqname")
    p.add_argument("video")
    p.add_argument("--fps", type=float, default=10.0)
    p.add_argument("--skip-seconds", type=float, default=0.0)
    p.add_argument("--max-frames", type=int, default=0)
    args = p.parse_args()

    outdir = os.path.join("database", "DAVIS", "JPEGImages",
                          "Full-Resolution", args.seqname + "-tmp")
    n = extract_frames(args.video, outdir, args.fps, args.skip_seconds,
                       args.max_frames)
    print(f"{args.seqname}: extracted {n} frames -> {outdir}")


if __name__ == "__main__":
    main()
