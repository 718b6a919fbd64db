"""Data producers (scripts/produce_inputs.py backends): raw frames ->
flow/ + monodep/ npz in the exact layout load_scared consumes (the
reference has no producers; layout contract at scene/pose_optimizer.py:
396-414)."""

import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np

from freesurgs_tpu.data.flow_hs import hs_flow, parallax_disparity
from freesurgs_tpu.data.scared import load_scared, save_synthetic_as_scared
from freesurgs_tpu.data.synthetic import make_scene

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scene():
    return make_scene(num_frames=3, n_gaussians=400, height=64, width=96,
                      seed=11)


def test_hs_flow_matches_analytic():
    scene = _scene()
    fw = hs_flow(scene.colors[0], scene.colors[1], levels=4)
    gt = scene.flows_fw[0]
    # score where the image has gradient signal (textureless pixels are
    # underdetermined for any pure-photometric method)
    g = np.asarray(scene.colors[0]).mean(0)
    gx, gy = np.gradient(g)
    textured = np.hypot(gx, gy) > 0.01
    epe = np.hypot(*(np.asarray(fw - gt)))
    med = float(np.median(epe[textured]))
    gt_mag = float(np.median(np.hypot(*np.asarray(gt))[textured]))
    assert med < max(0.5, 0.5 * gt_mag), (med, gt_mag)


def test_parallax_disparity_orders_depth():
    scene = _scene()
    disp = parallax_disparity(jnp.asarray(scene.flows_fw[0]),
                              jnp.asarray(-scene.flows_fw[0]))
    assert np.all(np.asarray(disp) > 0)
    assert disp.shape == scene.depths[0].shape
    # The proxy must actually ORDER depth — a constant output would pass
    # the positivity check above. Its premise (residual-after-median
    # parallax ~ inverse depth) holds for translation-dominant motion
    # with a one-sided inverse-depth distribution (the endoscope-sweep
    # regime it targets; the synthetic scene above is rotation-dominant,
    # where no pure-parallax proxy can order depth). Build that regime
    # analytically: background plane + foreground bump, pure lateral
    # translation plus a constant rotation-like flow offset.
    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    bump = np.exp(-(((xx - w / 2) / 8.0) ** 2 + ((yy - h / 2) / 6.0) ** 2))
    z = 3.0 - 2.0 * bump                     # bg 3.0, foreground to 1.0
    inv_z = 1.0 / z
    t_flow = 60.0 * 0.05 * inv_z             # fx * tx / z
    flow_fw = np.stack([t_flow + 0.7, np.zeros_like(t_flow) - 0.3])
    dispa = np.asarray(parallax_disparity(jnp.asarray(flow_fw),
                                          jnp.asarray(-flow_fw))).ravel()

    def ranks(x):
        r = np.empty_like(x)
        r[np.argsort(x)] = np.arange(x.size)
        return r

    rho = float(np.corrcoef(ranks(dispa), ranks(inv_z.ravel()))[0, 1])
    assert rho > 0.6, f"disparity proxy does not order depth (rho={rho:.3f})"


def test_producer_script_roundtrip(tmp_path):
    """End-to-end: frames-only dir -> produce_inputs.py -> load_scared."""
    root = str(tmp_path / "seq")
    scene = _scene()
    save_synthetic_as_scared(scene, root)
    # wipe the precomputed flow/monodep: the producer must recreate them
    for sub in ("flow", "monodep"):
        for f in os.listdir(os.path.join(root, sub)):
            os.remove(os.path.join(root, sub, f))
    env = dict(os.environ, PYTHONPATH=REPO)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "produce_inputs.py"),
         "--root", root, "--levels", "4"],
        check=True, env=env, timeout=600)
    seq = load_scared(root, cache=None)
    t, _, h, w = seq.colors.shape
    assert seq.flows_fw.shape == (t - 1, 2, h, w)
    assert seq.flows_bw.shape == (t - 1, 2, h, w)
    assert seq.monodeps.shape == (t, h, w)
    assert np.isfinite(seq.monodeps).all()
    # loader normalization contract: monodep in [0.5, 1.5]
    assert seq.monodeps.min() >= 0.5 - 1e-5
    assert seq.monodeps.max() <= 1.5 + 1e-5
