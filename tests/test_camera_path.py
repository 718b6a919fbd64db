import numpy as np

from freesurgs_tpu.core.transforms import build_w2c
from freesurgs_tpu.viz.camera_path import (ellipse_orbit, interpolate_path,
                                           render_path)


def make_keyposes(n=4):
    import jax.numpy as jnp
    poses = []
    for i in range(n):
        q = jnp.asarray([1.0, 0.02 * i, -0.01 * i, 0.0])
        t = jnp.asarray([0.05 * i, 0.01 * i, 0.02 * i])
        poses.append(np.asarray(build_w2c(q, t)))
    return np.stack(poses)


def test_interpolate_path_hits_keyposes():
    keys = make_keyposes()
    path = interpolate_path(keys, frames_per_segment=5)
    assert path.shape == (15, 4, 4)
    np.testing.assert_allclose(path[0], keys[0], atol=1e-5)
    np.testing.assert_allclose(path[5], keys[1], atol=1e-5)
    # rotations stay orthonormal
    for w in path:
        np.testing.assert_allclose(w[:3, :3] @ w[:3, :3].T, np.eye(3),
                                   atol=1e-5)


def test_ellipse_orbit_valid_poses():
    keys = make_keyposes(6)
    orbit = ellipse_orbit(keys, num_frames=12)
    assert orbit.shape == (12, 4, 4)
    for w in orbit:
        np.testing.assert_allclose(w[:3, :3] @ w[:3, :3].T, np.eye(3),
                                   atol=1e-5)
        np.testing.assert_allclose(w[3], [0, 0, 0, 1], atol=0)


def test_render_path(tmp_path, rng):
    import os

    from freesurgs_tpu.data.synthetic import make_scene
    from tests.test_training_steps import field_from_scene
    scene = make_scene(num_frames=3, n_gaussians=100, height=24, width=32)
    field = field_from_scene(scene, cap=256)
    path = interpolate_path(np.asarray(scene.gt_w2c), frames_per_segment=2)
    frames = render_path(field, path[:3], scene.cam, str(tmp_path),
                         impl="pallas_interpret", max_instances=2048)
    assert len(frames) == 3
    assert len(os.listdir(tmp_path)) == 3
