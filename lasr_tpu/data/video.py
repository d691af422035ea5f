"""Video frame-pair dataset (host preprocessing -> device-resident arrays).

Behavioral port of ref:dataloader/vidbase.py:52-231 and ref:dataloader/vid.py
(pair lists, crop/resize, flow re-warping to crop space, distance transforms)
— restructured TPU-style: videos are tiny (3–80 frames), so every unique
(frame, direction) pair is preprocessed once and materialized as stacked
arrays; an epoch is a shuffled index schedule over the replicated pair list
and batches are pure device gathers.  No per-step host dataloader.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

import cv2
import numpy as np
from scipy.ndimage import binary_dilation, binary_erosion, distance_transform_edt

from ..config import LasrConfig, SequenceConfig
from .pfm import read_pfm

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def compute_dt(mask: np.ndarray, iters: int = 10) -> np.ndarray:
    """Distance transform of a mask (ref:third_party/ext_utils/image.py:117-125)."""
    m = mask.copy()
    if iters > 1:
        m = binary_dilation(m, iterations=iters)
    return (distance_transform_edt(1 - (m > 0)) / max(mask.shape)).astype(np.float32)


def sample_contour(mask: np.ndarray, n_points: int = 1000,
                   seed: int = 0) -> np.ndarray:
    """1000 jittered contour points (x, y) — cv2-based equivalent of
    ref:third_party/ext_utils/image.py:140-202 (skimage unavailable)."""
    m = (mask > 0).astype(np.uint8)
    contours, _ = cv2.findContours(m, cv2.RETR_LIST, cv2.CHAIN_APPROX_NONE)
    if not contours:
        return np.zeros((n_points, 2), np.float32)
    pts = np.concatenate([c[:, 0] for c in contours], 0)  # (x, y)
    offsets = np.array([[0, 0], [0, 1], [0, 2], [0, -1], [0, -2], [1, 0],
                        [2, 0], [-1, 0], [-2, 0], [-1, -1], [-2, -2], [1, 1],
                        [2, 2], [-1, 1], [-2, 2], [1, -1], [2, -2]])
    all_pts = np.concatenate([np.clip(pts + o, 0, mask.shape[0] - 1)
                              for o in offsets], 0)
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(all_pts), size=n_points,
                     replace=len(all_pts) < n_points)
    return all_pts[idx].astype(np.float32)


@dataclass
class FrameEntry:
    img: np.ndarray        # [3, S, S] rgb in [0, 1], bg = complement color
    mask: np.ndarray       # [S, S] {0, 1}
    flow: np.ndarray       # [3, S, S] crop-space NDC flow + validity
    occ: np.ndarray        # [S, S]
    cam: np.ndarray        # [7] fl, tx, ty, qw, qx, qy, qz
    depth: float
    pp: np.ndarray         # [2] crop offset (pixels in original image)
    dts: np.ndarray        # [S, S]
    ddts: np.ndarray       # [S, S]
    contour: np.ndarray    # [1000, 2]


class VideoDataset:
    """All unique frame pairs of one sequence, preprocessed and stacked."""

    def __init__(self, cfg: LasrConfig, configs_dir: str = "configs",
                 capdata: int | None = None):
        self.cfg = cfg
        seq = SequenceConfig.load_name(cfg.dataname, configs_dir)
        self.seq = seq
        imglist = sorted(glob.glob(os.path.join(seq.datapath, "*")))
        if seq.end_frame > 0:
            imglist = imglist[: seq.end_frame]
        if not imglist:
            raise FileNotFoundError(f"no frames under {seq.datapath}")
        self.imglist = imglist
        self.video_length = (len(imglist) - seq.init_frame) // seq.dframe
        seqname = os.path.basename(os.path.dirname(imglist[0]))

        def sub(path, a, b):
            return path.replace(a, b)

        if cfg.sil_path == "none":
            self.masklist = [sub(sub(i, "JPEGImages", "Annotations"),
                                 ".jpg", ".png") for i in imglist]
        else:
            self.masklist = [os.path.join(cfg.sil_path, seqname,
                                          os.path.basename(i)).replace(".jpg", ".png")
                             for i in imglist]
        self.camlist = [sub(sub(i, "JPEGImages", "Camera"), ".jpg", ".txt")
                        for i in imglist]
        dframe = seq.dframe
        flowdir = seqname if dframe == 1 else f"{seqname}_{dframe:02d}"

        def flowpath(i, fw):
            p = sub(imglist[i], "JPEGImages", "FlowFW" if fw else "FlowBW")
            p = p.replace(".jpg", ".pfm").replace(".png", ".pfm")
            return p.replace(f"{seqname}/", f"{flowdir}/flo-")

        self.flowfw = [flowpath(i, True) for i in range(len(imglist))]
        self.flowbw = [flowpath(i, False) for i in range(len(imglist))]

        # pair lists (ref:dataloader/vid.py:66-80)
        n = len(imglist) - dframe
        base = list(range(n)) + [i + dframe for i in range(n)]
        direct = [1] * n + [0] * n
        base = (base[:n][seq.init_frame::dframe]
                + base[n:][seq.init_frame::dframe])
        direct = (direct[:n][seq.init_frame::dframe]
                  + direct[n:][seq.init_frame::dframe])
        base = [base[0]] + base + [base[-1]]
        direct = [direct[0]] + direct + [direct[-1]]
        self.pair_list = list(zip(base, direct))          # replicated schedule
        uniq = sorted(set(self.pair_list))
        self.unique_pairs = uniq
        self._uid = {p: i for i, p in enumerate(uniq)}
        self.dframe = dframe
        self.can_frame = seq.can_frame

        self._materialize()

    # ------------------------------------------------------------------
    def _load_frame_pair(self, im0: int, direct: int):
        """Port of ref:dataloader/vidbase.py:52-231 for one (frame, frame')."""
        S = self.cfg.img_size
        dframe = self.dframe
        im1 = im0 + dframe if direct == 1 else im0 - dframe

        def read_img(i):
            img = cv2.imread(self.imglist[i])[:, :, ::-1] / 255.0
            return img

        def read_mask(i, erosion_iters):
            img_shape = cv2.imread(self.imglist[i]).shape[:2]
            m = cv2.imread(self.masklist[i], 0)
            if m.shape[:2] != img_shape:
                m = cv2.resize(m, img_shape[::-1], interpolation=cv2.INTER_NEAREST)
                m = binary_erosion(m, iterations=erosion_iters)
            return m[:, :, None]

        img, imgn = read_img(im0), read_img(im1)
        orig_shape = np.asarray(img.shape[:2])[::-1].copy()  # (w, h)
        mask = read_mask(im0, 2)
        maskn = read_mask(im1, 1)

        # complement background color (ref :79-82)
        color = 1 - img[mask[:, :, 0].astype(bool)].mean(0)[None, None]
        colorn = 1 - imgn[maskn[:, :, 0].astype(bool)].mean(0)[None, None]
        img = img * (mask > 0) + color * (1 - (mask > 0))
        imgn = imgn * (maskn > 0) + colorn * (1 - (maskn > 0))

        if direct == 1:
            fpath, fpathn = self.flowfw[im0], self.flowbw[im0 + dframe]
        else:
            fpath, fpathn = self.flowbw[im0], self.flowfw[im0 - dframe]
        flow = read_pfm(fpath)[0].astype(np.float32)
        flown = read_pfm(fpathn)[0].astype(np.float32)
        occ = read_pfm(fpath.replace("flo-", "occ-"))[0].astype(np.float32)
        occn = read_pfm(fpathn.replace("flo-", "occ-"))[0].astype(np.float32)

        def crop_geom(m):
            ys, xs = np.where(m[:, :, 0] > 0)
            center = ((xs.max() + xs.min()) // 2, (ys.max() + ys.min()) // 2)
            length = int(1.2 * max((xs.max() - xs.min()) // 2,
                                   (ys.max() - ys.min()) // 2))
            return center, length

        center, length = crop_geom(mask)
        centern, lengthn = crop_geom(maskn)

        def crop(imgs_, center, length, border):
            x0, y0 = np.meshgrid(range(2 * length), range(2 * length))
            x0 = (x0 + center[0] - length).astype(np.float32)
            y0 = (y0 + center[1] - length).astype(np.float32)
            return [cv2.remap(a, x0, y0, interpolation=interp,
                              borderValue=bv)
                    for a, interp, bv in imgs_]

        img, mask, flow, occ = crop(
            [(img, cv2.INTER_LINEAR, tuple(color[0, 0])),
             (mask.astype(np.float64), cv2.INTER_NEAREST, 0.0),
             (flow, cv2.INTER_LINEAR, 0.0),
             (occ, cv2.INTER_LINEAR, 0.0)], center, length, color)
        imgn, maskn, flown, occn = crop(
            [(imgn, cv2.INTER_LINEAR, tuple(colorn[0, 0])),
             (maskn.astype(np.float64), cv2.INTER_NEAREST, 0.0),
             (flown, cv2.INTER_LINEAR, 0.0),
             (occn, cv2.INTER_LINEAR, 0.0)], centern, lengthn, colorn)

        alp = 2 * length / S
        alpn = 2 * lengthn / S

        def rs(a, interp=cv2.INTER_LINEAR):
            return cv2.resize(a, (S, S), interpolation=interp)

        img, imgn = rs(img), rs(imgn)
        mask = rs(mask, cv2.INTER_NEAREST)
        maskn = rs(maskn, cv2.INTER_NEAREST)
        flow, flown, occ, occn = rs(flow), rs(flown), rs(occ), rs(occn)

        # re-express flow in the two crops' joint NDC space (ref :141-159)
        bx, by = np.meshgrid(range(S), range(S))
        flow[:, :, 0] += (center[0] - length) - (centern[0] - lengthn) + bx * (alp - alpn)
        flow[:, :, 1] += (center[1] - length) - (centern[1] - lengthn) + by * (alp - alpn)
        flow /= alpn
        flow[:, :, 0] = 2 * flow[:, :, 0] / S
        flow[:, :, 1] = 2 * flow[:, :, 1] / S
        flow[:, :, 2] = np.logical_and(flow[:, :, 2] != 0, occ < 10)

        flown[:, :, 0] += (centern[0] - lengthn) - (center[0] - length) + bx * (alpn - alp)
        flown[:, :, 1] += (centern[1] - lengthn) - (center[1] - length) + by * (alpn - alp)
        flown /= alp
        flown[:, :, 0] = 2 * flown[:, :, 0] / S
        flown[:, :, 1] = 2 * flown[:, :, 1] / S
        flown[:, :, 2] = np.logical_and(flown[:, :, 2] != 0, occn < 10)

        cam = np.array([1.0, 0, 0, 1, 0, 0, 0], np.float32)
        camn = cam.copy()
        depth = depthn = 0.0
        if os.path.exists(self.camlist[im0]):
            c0 = np.loadtxt(self.camlist[im0]).astype(np.float32)
            c1 = np.loadtxt(self.camlist[im1]).astype(np.float32)
            cam[:], camn[:] = c0[:-1], c1[:-1]
            depth, depthn = float(c0[-1]), float(c1[-1])
        cam[0], camn[0] = 1.0 / alp, 1.0 / alpn

        pp = np.array([center[0] - length, center[1] - length], np.float32)
        ppn = np.array([centern[0] - lengthn, centern[1] - lengthn], np.float32)

        def entry(img, mask, flow, occ, cam, depth, pp, seed):
            mask = (mask > 0).astype(np.float32)
            return FrameEntry(
                img=np.transpose(img, (2, 0, 1)).astype(np.float32),
                mask=mask,
                flow=np.transpose(flow, (2, 0, 1)).astype(np.float32),
                occ=occ.astype(np.float32),
                cam=cam, depth=depth, pp=pp,
                dts=compute_dt(mask, iters=0),
                ddts=compute_dt(mask, iters=10),
                contour=sample_contour(mask, seed=seed),
            )

        return (entry(img, mask, flow, occ, cam, depth, pp, im0),
                entry(imgn, maskn, flown, occn, camn, depthn, ppn, im1),
                orig_shape, im0, im1)

    # ------------------------------------------------------------------
    def _materialize(self):
        fields = ["img", "mask", "flow", "occ", "cam", "depth", "pp",
                  "dts", "ddts", "contour"]
        stacks = {f: [] for f in fields}
        meta = {"shape": [], "id0": [], "id1": [], "is_canonical": []}
        for (im0, direct) in self.unique_pairs:
            e0, e1, shape, i0, i1 = self._load_frame_pair(im0, direct)
            for f in fields:
                stacks[f].append(np.stack([getattr(e0, f), getattr(e1, f)]))
            meta["shape"].append(shape)
            meta["id0"].append(i0)
            meta["id1"].append(i1)
            meta["is_canonical"].append(
                [self.can_frame == i0, self.can_frame == i1])
        self.arrays = {f: np.stack(v).astype(np.float32)
                       for f, v in stacks.items()}          # [NP, 2, ...]
        self.meta = {k: np.asarray(v) for k, v in meta.items()}

    # ------------------------------------------------------------------
    def epoch_schedule(self, rng: np.random.RandomState,
                       batch_size: int, ndev: int = 1) -> np.ndarray:
        """Shuffled pair-id schedule [steps, ndev*batch] (ref: 200-step
        replication, dataloader/vid.py:78-80, drop_last)."""
        steps = getattr(self.cfg, "epoch_steps", 200)
        per_epoch = batch_size * ndev * steps
        fac = max(per_epoch // len(self.pair_list), 1)
        ids = np.asarray([self._uid[p] for p in self.pair_list] * fac)
        rng.shuffle(ids)
        n_step = len(ids) // (batch_size * ndev)
        return ids[: n_step * batch_size * ndev].reshape(n_step,
                                                         batch_size * ndev)

    # ------------------------------------------------------------------
    def device_arrays(self):
        """Batch-ready arrays, ImageNet-normalized input stream included."""
        a = self.arrays
        img = a["img"]                                  # [NP, 2, 3, S, S]
        input_imgs = ((img.transpose(0, 1, 3, 4, 2) - IMAGENET_MEAN)
                      / IMAGENET_STD).transpose(0, 1, 4, 2, 3)
        shape = self.meta["shape"].astype(np.float32)   # [NP, 2] (w, h)
        frameid = np.stack([self.meta["id0"], self.meta["id1"]],
                           1).astype(np.int32)          # [NP, 2]
        return {
            "frameid": frameid,
            "input_imgs": input_imgs,
            "imgs": img,
            "masks": a["mask"],
            "cams": a["cam"],
            "depth_gt": a["depth"],
            "flow": a["flow"],
            "occ": a["occ"],
            "ddts_barrier": a["ddts"],
            "pp": a["pp"],
            "oriimg_shape": shape,
        }

    def device_arrays_compact(self):
        """Upload-minimal layout: per-frame data deduplicated by frame id.

        The per-(pair, slot) layout stores every frame once per pair it
        appears in (~3.7x duplication on a 15-frame video) plus a second
        ImageNet-normalized copy of the image stream — 176 MB for dog15.
        Crops are a function of the frame alone (verified bit-identical
        across pairs), so images/masks/DTs/cams are stored once per frame
        and gathered by frame id on device; normalization also moves on
        device.  Matters on a bandwidth-limited (tunneled) host->device
        link where the initial upload gates the first optimization step.

        Dtypes are compact on the wire: images uint8, masks bool, flow /
        occ / DT-barrier float16 (flow is NDC-scale ~[-2, 2] and estimated
        to ~6-12 px at best, DT is mask-normalized [0, 1.4], occ is clipped
        [-10, 100] — f16's ~1e-3 relative step is far below every signal's
        noise floor).  `gather_batch` restores float32 in-program, so the
        training computation is unchanged up to the one-time quantization.
        occ's exact-zero "outside the crop" sentinel is preserved under the
        cast (nonzero values that would flush to 0 are snapped to the
        smallest f16 subnormal)."""
        a = self.arrays
        frameid = np.stack([self.meta["id0"], self.meta["id1"]],
                           1).astype(np.int32)          # [NP, 2]
        nf = int(frameid.max()) + 1
        # first (pair, slot) occurrence of each frame id
        first = {}
        for p in range(frameid.shape[0]):
            for s in range(2):
                first.setdefault(int(frameid[p, s]), (p, s))
        sel = [first[f] for f in range(nf)]
        ps = np.asarray([p for p, _ in sel])
        ss = np.asarray([s for _, s in sel])
        shape = self.meta["shape"].astype(np.float32)
        occ16 = a["occ"].astype(np.float16)
        tiny = np.float16(6e-8)                         # smallest subnormal
        occ16 = np.where((a["occ"] != 0) & (occ16 == 0), tiny, occ16)
        return {
            "frameid": frameid,
            "f_imgs": np.clip(np.rint(a["img"][ps, ss] * 255), 0,
                              255).astype(np.uint8),    # [NF, 3, S, S]
            "f_masks": a["mask"][ps, ss] > 0,           # [NF, S, S] bool
            "f_cams": a["cam"][ps, ss],
            "f_depth": a["depth"][ps, ss],
            "f_ddts": a["ddts"][ps, ss].astype(np.float16),
            "f_pp": a["pp"][ps, ss],
            "flow": a["flow"].astype(np.float16),
            "occ": occ16,
            "oriimg_shape": shape,
        }


def decode_device_arrays(dev_arrays: dict) -> dict:
    """Wire dtypes -> compute dtypes, once, on device.

    The compact layout ships uint8 images / f16 flow-occ-DT / bool masks to
    minimize host->device transfer; this expands them to the float32 the
    training program consumes.  Decoding OUTSIDE the scan matters: resident
    sub-word arrays made the per-step batch gathers run as HBM-saturating
    async DMA, stalling the rasterizer custom-calls for +40 ms/step."""
    import jax.numpy as jnp
    out = {}
    for k, v in dev_arrays.items():
        v = jnp.asarray(v)
        if v.dtype == jnp.uint8:
            v = v.astype(jnp.float32) / 255.0
        elif v.dtype != jnp.float32 and k != "frameid":
            v = v.astype(jnp.float32)
        out[k] = v
    return out


def gather_batch(dev_arrays: dict, pair_ids) -> dict:
    """Select pairs and lay out [2b, ...] = frame0 block | frame1 block
    (jit-friendly; pair_ids may be traced).  Accepts both the legacy
    per-(pair, slot) layout and the compact per-frame layout of
    `device_arrays_compact` (detected by the "f_imgs" key); the returned
    batch dict is identical either way."""
    import jax.numpy as jnp
    if "f_imgs" not in dev_arrays:
        out = {}
        for k, v in dev_arrays.items():
            sel = jnp.asarray(v)[pair_ids]              # [b, 2, ...]
            if k == "oriimg_shape":
                out[k] = jnp.concatenate([sel, sel], 0)  # same for both frames
            else:
                out[k] = jnp.concatenate([sel[:, 0], sel[:, 1]], 0)
        return out

    fid = jnp.asarray(dev_arrays["frameid"])[pair_ids]  # [b, 2]
    fids = jnp.concatenate([fid[:, 0], fid[:, 1]], 0)   # [2b]

    def f32(x):                 # restore compute dtype after a compact gather
        if x.dtype == jnp.uint8:
            return x.astype(jnp.float32) / 255.0
        if x.dtype != jnp.float32:
            return x.astype(jnp.float32)
        return x

    img = f32(jnp.asarray(dev_arrays["f_imgs"])[fids])  # [2b, 3, S, S]
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32).reshape(3, 1, 1)
    std = jnp.asarray(IMAGENET_STD, jnp.float32).reshape(3, 1, 1)
    out = {
        "frameid": fids,
        "imgs": img,
        "input_imgs": (img - mean) / std,
        "masks": f32(jnp.asarray(dev_arrays["f_masks"])[fids]),
        "cams": jnp.asarray(dev_arrays["f_cams"])[fids],
        "depth_gt": jnp.asarray(dev_arrays["f_depth"])[fids],
        "ddts_barrier": f32(jnp.asarray(dev_arrays["f_ddts"])[fids]),
        "pp": jnp.asarray(dev_arrays["f_pp"])[fids],
    }
    for k in ("flow", "occ"):
        sel = jnp.asarray(dev_arrays[k])[pair_ids]
        out[k] = f32(jnp.concatenate([sel[:, 0], sel[:, 1]], 0))
    sel = jnp.asarray(dev_arrays["oriimg_shape"])[pair_ids]
    out["oriimg_shape"] = jnp.concatenate([sel, sel], 0)
    return out
