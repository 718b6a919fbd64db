"""SCARED-format sequence loader.

Loads the directory layout the reference consumes
(``scene/pose_optimizer.py:355-470``):

  <root>/input/<scene>_<data>_frame_<id>.png        RGB frames
  <root>/poses/<scene>_<data>/frame_<id>.json       {"camera-pose": 4x4,
                                                     "camera-calibration":
                                                     {"KL": 3x3}}
  <root>/flow/flow_fw_<name>.npz / flow_bw_<name>.npz  RAFT flow ('pred')
  <root>/monodep/depth_<name>.npz                      mono disparity ('pred')

Reference preprocessing preserved:
- mono depth = 1 / disparity, min-max normalized into [0.5, 1.5]
  (``scene/pose_optimizer.py:406-407``)
- intrinsics rescaled from the 1280x1024 calibration resolution to the
  image size (``:413-414``)
- test split: every ``sample_rate``-th frame offset by ``sample_rate/2``
  (``:416-419``)
- frames grouped into subsequences by the <data> index for pose evaluation
  (``:430-438``).

Everything is loaded into host numpy and shipped to device as big arrays
(the dataset is small enough for HBM; the training loops index it with
dynamic slicing inside jit).
"""

from __future__ import annotations

import glob
import json
import os
from typing import NamedTuple

import numpy as np

from ..core.camera import Camera

CALIB_W, CALIB_H = 1280, 1024


class VideoSequence(NamedTuple):
    cam: Camera
    colors: np.ndarray        # (T, 3, H, W) float32 [0, 1]
    flows_fw: np.ndarray      # (T-1, 2, H, W)
    flows_bw: np.ndarray      # (T-1, 2, H, W)
    monodeps: np.ndarray      # (T, H, W) normalized depth prior
    gt_poses: dict            # data_ind -> (Tk, 4, 4)
    boundaries: list          # subsequence frame boundaries, len = #seqs+1
    i_train: np.ndarray
    i_test: np.ndarray
    image_names: list

    @property
    def num_frames(self) -> int:
        return self.colors.shape[0]


def _frame_key(path: str):
    import re
    m = re.search(r"(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else 0


def load_scared(root: str, frame_start: int = 0, frame_end: int = -1,
                sample_rate: int = 8,
                cache: str | None = "auto",
                depth_prior: str = "normalized") -> VideoSequence:
    """Load a SCARED-layout sequence.

    cache: "auto" (default) uses the native fsio mmap cache
    (``io/native.py`` / ``cpp/fsio.cpp``) — the first load parses the raw
    PNG/json/npz tree and writes ``<root>/.fsio_cache_*.fsc``; later loads
    mmap it with background page prefetch (the multi-sequence streaming
    path; the reference re-parses raw files every run,
    ``scene/pose_optimizer.py:355-470``). ``None`` disables caching.

    depth_prior: "normalized" (default, reference parity) remaps each
    frame's 1/disparity to [0.5, 1.5] by a per-frame min-max affine
    (``scene/pose_optimizer.py:406-407``) — correct for monocular
    networks whose output has arbitrary per-frame scale/shift, but it
    applies a per-frame PROJECTIVE warp to any geometry derived from the
    prior (the frame-0 point-cloud init), which is measurably the
    dominant full-scale quality/tracking limiter on data whose depth IS
    metric (BASELINE.md round-4 attribution). "metric" keeps 1/disparity
    as-is for metric-depth sources (stereo nets, ToF, synthetic GT).
    """
    assert depth_prior in ("normalized", "metric"), depth_prior
    if cache == "auto":
        from ..io import native
        if native.available():
            tag = f"{frame_start}_{frame_end}_{sample_rate}"
            if depth_prior != "normalized":
                tag += f"_{depth_prior}"
            cpath = os.path.join(root, f".fsio_cache_{tag}.fsc")
            if os.path.exists(cpath):
                try:
                    return native.read_sequence_cache(cpath)
                except Exception:
                    os.remove(cpath)  # stale/corrupt: rebuild below
            seq = load_scared(root, frame_start, frame_end, sample_rate,
                              cache=None, depth_prior=depth_prior)
            try:
                native.write_sequence_cache(cpath, seq)
            except OSError:
                pass  # read-only dataset dir: run uncached
            return seq

    from PIL import Image

    rgb_paths = sorted(
        glob.glob(os.path.join(root, "input", "*.png"))
        + glob.glob(os.path.join(root, "input", "*.jpeg"))
        + glob.glob(os.path.join(root, "input", "*.jpg")))
    if not rgb_paths:
        raise FileNotFoundError(f"no frames under {root}/input")
    if frame_end != -1:
        rgb_paths = rgb_paths[frame_start:frame_end]

    W, H = Image.open(rgb_paths[0]).size
    colors, flows_fw, flows_bw, monodeps = [], [], [], []
    gt_poses: dict[str, list] = {}
    intrinsic = None
    n = len(rgb_paths)

    for i, p in enumerate(rgb_paths):
        name = os.path.basename(p)
        parts = name.split("_")
        scene_ind, data_ind = parts[0], parts[1]
        img_name = parts[3].split(".")[0]
        stem = name.split(".")[0]

        pose_path = os.path.join(root, "poses", f"{scene_ind}_{data_ind}",
                                 f"frame_{img_name}.json")
        with open(pose_path) as f:
            meta = json.load(f)
        gt_poses.setdefault(data_ind, []).append(
            np.array(meta["camera-pose"], np.float64))
        intrinsic = np.array(meta["camera-calibration"]["KL"], np.float64)

        img = np.asarray(Image.open(p), np.float32) / 255.0
        colors.append(img.transpose(2, 0, 1))

        if i < n - 1:
            flows_fw.append(np.load(
                os.path.join(root, f"flow/flow_fw_{stem}.npz"))["pred"])
            flows_bw.append(np.load(
                os.path.join(root, f"flow/flow_bw_{stem}.npz"))["pred"])

        disp = np.load(os.path.join(root,
                                    f"monodep/depth_{stem}.npz"))["pred"]
        dep = 1.0 / np.clip(disp, 1e-6, 1e6)
        if depth_prior == "normalized":
            dep = (dep - dep.min()) / max(dep.max() - dep.min(),
                                          1e-12) + 0.5
        monodeps.append(dep.astype(np.float32))

    intrinsic = intrinsic.copy()
    intrinsic[0, :] *= W / CALIB_W
    intrinsic[1, :] *= H / CALIB_H
    cam = Camera.from_K(intrinsic, height=H, width=W)

    all_idx = np.arange(n)
    i_test = all_idx[sample_rate // 2::sample_rate]
    i_train = np.array([i for i in all_idx if i not in set(i_test.tolist())])

    boundaries = [0]
    for key in gt_poses:
        gt_poses[key] = np.stack(gt_poses[key])
        boundaries.append(boundaries[-1] + len(gt_poses[key]))

    flows_fw = (np.stack(flows_fw) if flows_fw
                else np.zeros((0, 2, H, W), np.float32))
    flows_bw = (np.stack(flows_bw) if flows_bw
                else np.zeros((0, 2, H, W), np.float32))
    return VideoSequence(
        cam=cam, colors=np.stack(colors).astype(np.float32),
        flows_fw=flows_fw.astype(np.float32),
        flows_bw=flows_bw.astype(np.float32),
        monodeps=np.stack(monodeps), gt_poses=gt_poses,
        boundaries=boundaries, i_train=i_train, i_test=i_test,
        image_names=[os.path.basename(p) for p in rgb_paths])


def save_synthetic_as_scared(scene, root: str, scene_ind: str = "d1",
                             data_ind: str = "k0"):
    """Write a synthetic scene to disk in the SCARED layout (test fixture
    generator — lets the loader tests run without the gated dataset)."""
    from PIL import Image

    os.makedirs(os.path.join(root, "input"), exist_ok=True)
    os.makedirs(os.path.join(root, "flow"), exist_ok=True)
    os.makedirs(os.path.join(root, "monodep"), exist_ok=True)
    pose_dir = os.path.join(root, "poses", f"{scene_ind}_{data_ind}")
    os.makedirs(pose_dir, exist_ok=True)

    cam = scene.cam
    K = np.asarray(cam.intrinsic_matrix(), np.float64)
    K_calib = K.copy()
    K_calib[0, :] *= CALIB_W / cam.width
    K_calib[1, :] *= CALIB_H / cam.height

    T = scene.colors.shape[0]
    for t in range(T):
        name = f"{scene_ind}_{data_ind}_frame_{t:06d}"
        img = (np.asarray(scene.colors[t]).transpose(1, 2, 0)
               * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, "input",
                                               f"{name}.png"))
        with open(os.path.join(pose_dir, f"frame_{t:06d}.json"), "w") as f:
            json.dump({"camera-pose":
                       np.asarray(scene.gt_w2c[t]).tolist(),
                       "camera-calibration": {"KL": K_calib.tolist()}}, f)
        # disparity such that 1/disp reproduces the normalized depth prior
        disp = 1.0 / np.maximum(np.asarray(scene.depths[t]), 1e-6)
        np.savez(os.path.join(root, "monodep", f"depth_{name}.npz"),
                 pred=disp)
        if t < T - 1:
            np.savez(os.path.join(root, "flow", f"flow_fw_{name}.npz"),
                     pred=np.asarray(scene.flows_fw[t]))
            np.savez(os.path.join(root, "flow", f"flow_bw_{name}.npz"),
                     pred=-np.asarray(scene.flows_fw[t]))
