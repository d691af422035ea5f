"""Per-frame mesh extraction + visualization (parity-shaped with
ref:extract.py): writes pred%d.ply / bone%d.ply / gauss%d.ply, cam%d.txt
(RT rows + [fl, fl, px, py]), skin.npy, and 4-view png panels."""

from __future__ import annotations

import glob
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax

# Extraction is an offline few-seconds-of-compute inference pass; it runs on
# the host CPU backend by default (pass --device tpu to opt in).  Training
# (optimize.py) keeps the accelerator; a per-frame inference program gains
# nothing from it and a flaky tunneled transport can stall a whole
# extract -> eval pipeline.
if "--device" in sys.argv:
    _dev = sys.argv[sys.argv.index("--device") + 1]
else:
    _dev = next((a.split("=", 1)[1] for a in sys.argv
                 if a.startswith("--device=")), "cpu")
if _dev == "cpu":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import cv2
import numpy as np
from absl import app, flags

from lasr_tpu.config import LasrConfig, SequenceConfig
from lasr_tpu.models.predictor import MeshPredictor, preprocess_image
from lasr_tpu.utils.ply import write_ply

flags.DEFINE_string("name", "exp_name", "Experiment Name")
flags.DEFINE_string("checkpoint_dir", "log", "checkpoint root")
flags.DEFINE_string("model_path", "", "explicit checkpoint path")
flags.DEFINE_string("dataname", "spot3", "sequence config name")
flags.DEFINE_integer("img_size", 256, "image size")
flags.DEFINE_integer("nz_feat", 200, "feature size")
flags.DEFINE_integer("subdivide", 3, "icosphere subdivisions")
flags.DEFINE_integer("n_bones", 1, "bones")
flags.DEFINE_integer("n_hypo", 1, "hypotheses")
flags.DEFINE_boolean("symmetric", False, "symmetric parametrization")
flags.DEFINE_string("n_faces", "1280", "faces")
flags.DEFINE_string("opt_tex", "yes", "texture")
flags.DEFINE_string("device", "cpu", "jax backend for inference: cpu | tpu")
FLAGS = flags.FLAGS

CITYLABS = None


def main(_):
    from lasr_tpu.ops.geometry import pinhole_project  # noqa: F401
    cfg = LasrConfig(
        name=FLAGS.name, checkpoint_dir=FLAGS.checkpoint_dir,
        dataname=FLAGS.dataname, img_size=FLAGS.img_size,
        nz_feat=FLAGS.nz_feat, subdivide=FLAGS.subdivide,
        n_bones=FLAGS.n_bones, n_hypo=FLAGS.n_hypo,
        symmetric=FLAGS.symmetric, n_faces=int(FLAGS.n_faces),
        opt_tex=FLAGS.opt_tex == "yes")
    seq = SequenceConfig.load_name(cfg.dataname)
    predictor = MeshPredictor(cfg, model_path=FLAGS.model_path or None)
    save_dir = cfg.save_dir
    os.makedirs(save_dir, exist_ok=True)

    for i, ipath in enumerate(sorted(glob.glob(os.path.join(seq.datapath, "*")))):
        if (i % seq.dframe != seq.init_frame % seq.dframe or i < seq.init_frame
                or (seq.end_frame >= 0 and i >= seq.end_frame)):
            continue
        img, alp, img_black, pp = preprocess_image(ipath, cfg.img_size)
        out = predictor.predict(img, alp, pp, frameid=i)
        print(f"frame {i}: focal {out['cam_pred'][0, 0]:.2f} "
              f"depth {out['depth']:.2f}")

        colors = (255 * out["tex"]).astype(np.uint8)
        write_ply(f"{save_dir}/pred{i}.ply", out["verts"],
                  predictor.faces, colors)
        write_ply(f"{save_dir}/vp2pred{i}.ply", out["verts_vp2"],
                  predictor.faces, colors)
        write_ply(f"{save_dir}/vp3pred{i}.ply", out["verts_vp3"],
                  predictor.faces, colors)
        if "bones_3d" in out:
            write_ply(f"{save_dir}/bone{i}.ply", out["bones_3d"],
                      np.zeros((0, 3), np.int64))
            write_ply(f"{save_dir}/gauss{i}.ply", out["gauss_verts"],
                      out["gauss_faces"])
            np.save(f"{save_dir}/skin.npy", out["skin"])

        # camera file: identity RT (verts are already in camera frame) +
        # intrinsics row, as in ref:extract.py:125-130
        rt = np.concatenate([np.eye(3), np.zeros((3, 1))], -1)
        k = np.array([[out["uncrop_scale"], out["uncrop_scale"],
                       out["uncrop_pp"][0], out["uncrop_pp"][1]]])
        np.savetxt(f"{save_dir}/cam{i}.txt", np.concatenate([rt, k], 0))

        # 4-view panel
        def chw2bgr(x):
            return (255 * np.clip(x[:3].transpose(1, 2, 0), 0, 1)
                    ).astype(np.uint8)[:, :, ::-1]

        inp = (255 * img_black.transpose(1, 2, 0)).astype(np.uint8)[:, :, ::-1]
        mask = out["mask_pred"]
        overlay = inp.copy()
        overlay[..., 2] = np.maximum(overlay[..., 2],
                                     (128 * mask).astype(np.uint8))
        panel = np.concatenate(
            [overlay, chw2bgr(out["texture_render"]),
             chw2bgr(out["texture_vp2"]), chw2bgr(out["texture_vp3"])], 1)
        cv2.imwrite(f"{save_dir}/render-{os.path.basename(ipath).split('.')[0]}.png",
                    panel)


if __name__ == "__main__":
    app.run(main)
