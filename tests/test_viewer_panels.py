"""Viewer GUI panels exercised headless against a stub viser server.

Covers the reference's Time/playback panel (``vis/viewer.py:13-63``,
``vis/playback_panel.py``) and the Render tab's keyframe->path->export
chain (``vis/render_panel.py:527+``) as wired into GSViewer, without a
real viser installation: the stub implements the exact GUI surface the
viewer uses (add_folder / add_button / add_slider / add_text,
set_background_image) and records every interaction.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from freesurgs_tpu.core.camera import Camera
from freesurgs_tpu.models.gaussians import from_pointcloud
from freesurgs_tpu.viz.viewer import GSViewer


class _Elem:
    def __init__(self, value=None):
        self.value = value
        self._cbs = []

    def on_click(self, fn):
        self._cbs.append(fn)
        return fn

    def on_update(self, fn):
        self._cbs.append(fn)
        return fn

    def click(self, event=None):
        for fn in self._cbs:
            fn(event)


class _Gui:
    def __init__(self):
        self.elems = {}

    class _Folder:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def add_folder(self, name):
        return self._Folder()

    def add_button(self, label):
        e = _Elem()
        self.elems[label] = e
        return e

    def add_slider(self, label, min, max, step, initial_value):
        e = _Elem(value=initial_value)
        e.min, e.max = min, max
        self.elems[label] = e
        return e

    def add_text(self, label, initial_value=""):
        e = _Elem(value=initial_value)
        self.elems[label] = e
        return e


class _Scene:
    def __init__(self):
        self.backgrounds = []

    def add_camera_frustum(self, *a, **k):
        pass

    def set_background_image(self, img):
        self.backgrounds.append(np.asarray(img))


class _ClientCam:
    wxyz = np.array([1.0, 0.0, 0.0, 0.0])
    position = np.zeros(3)

    def on_update(self, fn):
        return fn


class _Client:
    def __init__(self):
        self.scene = _Scene()
        self.camera = _ClientCam()


class _Server:
    def __init__(self):
        self.gui = _Gui()
        self.scene = _Scene()
        self._connect_cbs = []

    def on_client_connect(self, fn):
        self._connect_cbs.append(fn)
        return fn

    def connect(self):
        c = _Client()
        for fn in self._connect_cbs:
            fn(c)
        return c


@pytest.fixture
def small_setup(tmp_path):
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32) * 0.3
                      + np.array([0, 0, 2.0], np.float32))
    cols = jnp.asarray(rng.uniform(size=(40, 3)).astype(np.float32))
    field = from_pointcloud(pts, cols, 2.0, max_sh_degree=0, capacity=64)
    cam = Camera(height=16, width=24, fx=20.0, fy=20.0, cx=12.0, cy=8.0)
    poses = [np.eye(4, dtype=np.float32) for _ in range(5)]
    for i, p in enumerate(poses):
        p[0, 3] = 0.02 * i
    server = _Server()
    viewer = GSViewer(
        server, get_field=lambda: field,
        get_pose=lambda: jnp.eye(4),
        cam=cam, impl="oracle",
        get_frame_pose=lambda t: poses[t], num_frames=5,
        export_dir=str(tmp_path / "render_path"),
        start_playback_thread=False)
    return server, viewer


def test_playback_panel(small_setup):
    server, viewer = small_setup
    client = server.connect()

    # frame slider renders the selected frame's optimized pose
    slider = server.gui.elems["frame"]
    slider.value = 3
    slider.click()
    assert len(client.scene.backgrounds) == 1
    assert client.scene.backgrounds[0].shape == (16, 24, 3)

    # play/pause toggles; ticks advance the slider with wraparound
    server.gui.elems["Play/Pause playback"].click()
    assert viewer.playing
    for _ in range(3):
        viewer.playback_tick()
    assert int(slider.value) == (3 + 3) % 5
    assert len(client.scene.backgrounds) == 4
    server.gui.elems["Play/Pause playback"].click()
    assert not viewer.playing


def test_render_tab_keyframes_and_export(small_setup):
    server, viewer = small_setup
    client = server.connect()

    add = server.gui.elems["Add camera keyframe"]
    add.click()                                   # falls back to any client
    client.camera.position = np.array([0.3, 0.0, 0.0])
    add.click()   # moved client -> dampened translation delta
    # second keyframe differs (dampened translation delta)
    assert server.gui.elems["keyframes"].value == "2"
    assert not np.allclose(viewer._keyframes[0], viewer._keyframes[1])

    before = len(client.scene.backgrounds)
    server.gui.elems["Preview path"].click()
    assert len(client.scene.backgrounds) > before  # path frames rendered

    server.gui.elems["Export path frames"].click()
    out = viewer.export_dir
    files = sorted(os.listdir(out))
    assert len(files) == 10 and files[0].endswith(".png")
    assert "exported" in server.gui.elems["keyframes"].value


def test_render_tab_needs_two_keyframes(small_setup):
    server, viewer = small_setup
    server.connect()
    server.gui.elems["Preview path"].click()
    assert "need" in server.gui.elems["keyframes"].value


def test_pause_and_report(small_setup):
    _, viewer = small_setup
    viewer.report(rays_per_sec=3.2e6, frame=2)
    assert "3.20 Mrays/s" in viewer.status.value
    viewer.paused = True
    viewer.report(rays_per_sec=1.0e6, frame=3)   # ignored while paused
    assert "frame 2" in viewer.status.value
