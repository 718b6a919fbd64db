"""Interactive web viewer (viser), gated on availability.

TPU-native equivalent of the reference's viser/nerfview viewer
(``vis/viewer.py``, ``train.py:124-152 render_fn``; the SIBR socket bridge
``gaussian_renderer/network_gui.py`` is dead code in the reference and is
covered by this web path). Renders the current Gaussian field from the
client camera through ``render``; the training loop cooperates through
``lock`` and the pause flag, mirroring ``train.py:227-231``.

If ``viser`` is not installed, ``GSViewer.create`` returns None and
training proceeds headless.
"""

from __future__ import annotations

import threading

import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera
from ..ops.render import render


def viser_available() -> bool:
    try:
        import viser  # noqa: F401
        return True
    except ImportError:
        return False


class GSViewer:
    """Minimal training-time viewer: free camera orbit + live renders."""

    def __init__(self, server, get_field, get_pose, cam: Camera,
                 impl: str | None = None, max_instances: int = 0,
                 damping: float = 0.1):
        import viser

        self.server = server
        self.get_field = get_field
        self.get_pose = get_pose
        self.cam = cam
        self.impl = impl
        self.max_instances = max_instances
        self.damping = damping  # reference dampens mouse deltas x0.1
        self.lock = threading.Lock()
        self.paused = False
        self._init_c2w = None

        with server.gui.add_folder("Training"):
            pause_btn = server.gui.add_button("Pause/Resume")
            self.status = server.gui.add_text("status", initial_value="run")

        @pause_btn.on_click
        def _(_):
            self.paused = not self.paused
            self.status.value = "paused" if self.paused else "run"

        server.scene.add_camera_frustum("/camera", fov=cam.fov_y,
                                        aspect=cam.width / cam.height,
                                        scale=0.05)

        @server.on_client_connect
        def _(client: "viser.ClientHandle"):
            @client.camera.on_update
            def _(_):
                self.update_render(client)

    @classmethod
    def create(cls, port: int, *args, **kw):
        if not viser_available():
            return None
        import viser
        server = viser.ViserServer(port=port, verbose=False)
        return cls(server, *args, **kw)

    def _client_w2c(self, client) -> jnp.ndarray:
        """Dampened relative pose from the client camera (reference
        ``render_fn``, ``train.py:139-148``)."""
        import viser.transforms as vtf
        R = vtf.SO3(np.asarray(client.camera.wxyz)).as_matrix()
        t = np.asarray(client.camera.position)
        c2w = np.eye(4)
        c2w[:3, :3], c2w[:3, 3] = R, t
        if self._init_c2w is None:
            self._init_c2w = c2w.copy()
        delta = np.linalg.inv(self._init_c2w) @ c2w
        w2c = np.eye(4)
        w2c[:3, :3] = delta[:3, :3].T
        w2c[:3, 3] = -self.damping * (delta[:3, :3].T @ delta[:3, 3])
        return jnp.asarray(w2c, jnp.float32)

    def update_render(self, client):
        with self.lock:
            f = self.get_field()
            w2c = self._client_w2c(client) @ self.get_pose()
            out = render(f.means, f.quats, f.log_scales, f.logit_opacity,
                         f.sh, w2c, self.cam, active=f.active,
                         impl=self.impl, max_instances=self.max_instances)
            img = np.clip(np.asarray(out["render"]), 0, 1)
        client.scene.set_background_image(
            (np.transpose(img, (1, 2, 0)) * 255).astype(np.uint8))

    def report(self, rays_per_sec: float | None = None,
               frame: int | None = None):
        """Training-loop heartbeat (reference reports rays/s to the viewer
        each step, ``train.py:281-285``)."""
        if self.paused:
            return
        bits = []
        if frame is not None:
            bits.append(f"frame {frame}")
        if rays_per_sec is not None and rays_per_sec == rays_per_sec:
            bits.append(f"{rays_per_sec / 1e6:.2f} Mrays/s")
        self.status.value = " | ".join(bits) or "run"

    def wait_if_paused(self):
        import time
        while self.paused:
            time.sleep(0.1)
