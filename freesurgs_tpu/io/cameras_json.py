"""cameras.json export for external 3DGS viewers.

Equivalent of the reference's ``save_json_file`` /
``nopose_camera_to_JSON`` (``scene/pose_optimizer.py:579-592``): one record
per frame with position, rotation, focal lengths and image size in the
format the graphdeco SIBR / web viewers read.
"""

from __future__ import annotations

import json

import numpy as np

from ..core.camera import Camera
from ..core.transforms import invert_se3


def cameras_to_json(w2cs, cam: Camera, names=None) -> list[dict]:
    out = []
    for i, w2c in enumerate(np.asarray(w2cs)):
        c2w = np.asarray(invert_se3(w2c))
        out.append({
            "id": i,
            "img_name": names[i] if names else f"frame_{i:06d}",
            "width": cam.width, "height": cam.height,
            "position": c2w[:3, 3].tolist(),
            "rotation": c2w[:3, :3].tolist(),
            "fx": cam.fx, "fy": cam.fy,
        })
    return out


def save_cameras_json(path: str, w2cs, cam: Camera, names=None):
    with open(path, "w") as f:
        json.dump(cameras_to_json(w2cs, cam, names), f)
