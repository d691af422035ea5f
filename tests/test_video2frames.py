"""video2frames: mp4 -> fps-resampled DAVIS staging frames (ffmpeg equiv)."""

import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "preprocess"))
from video2frames import extract_frames


def _make_video(path, n, fps=10, size=64):
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                         (size, size))
    assert vw.isOpened()
    for i in range(n):
        img = np.full((size, size, 3), i * 8 % 255, np.uint8)
        cv2.putText(img, str(i), (4, 40), cv2.FONT_HERSHEY_SIMPLEX, 1,
                    (255, 255, 255), 2)
        vw.write(img)
    vw.release()


def test_fps_resample_and_skip(tmp_path):
    vid = str(tmp_path / "v.mp4")
    _make_video(vid, 20, fps=10)
    out = str(tmp_path / "frames")
    # fps 5 from a 10fps source -> every 2nd frame; skip 0.4s -> start at src
    # frame 4
    n = extract_frames(vid, out, fps=5, skip_seconds=0.4)
    assert n == 8
    files = sorted(os.listdir(out))
    assert files[0] == "00000.jpg" and len(files) == 8
    # background gray level of output k should match source frame 4 + 2k
    for k in (0, 3, 7):
        img = cv2.imread(os.path.join(out, f"{k:05d}.jpg"))
        src_idx = 4 + 2 * k
        corner = int(img[60:, 60:].mean())
        assert abs(corner - (src_idx * 8 % 255)) < 12, (k, corner, src_idx)


def test_max_frames(tmp_path):
    vid = str(tmp_path / "v.mp4")
    _make_video(vid, 12, fps=10)
    out = str(tmp_path / "frames")
    assert extract_frames(vid, out, fps=10, max_frames=5) == 5
