import jax.numpy as jnp
import numpy as np

from freesurgs_tpu.data.scared import load_scared, save_synthetic_as_scared
from freesurgs_tpu.data.synthetic import make_scene
from freesurgs_tpu.io.checkpoint import restore_checkpoint, save_checkpoint
from freesurgs_tpu.io.ply import field_to_ply, ply_to_field
from freesurgs_tpu.models.gaussians import from_pointcloud
from freesurgs_tpu.train.optim import adam_init


def test_scared_roundtrip(tmp_path):
    scene = make_scene(num_frames=4, n_gaussians=100, height=32, width=48)
    save_synthetic_as_scared(scene, str(tmp_path))
    seq = load_scared(str(tmp_path))
    assert seq.num_frames == 4
    assert seq.colors.shape == (4, 3, 32, 48)
    assert seq.flows_fw.shape == (3, 2, 32, 48)
    assert seq.monodeps.shape == (4, 32, 48)
    # test split: every 8th offset 4 -> no test frames among only 4
    assert len(seq.i_test) == 0 and len(seq.i_train) == 4
    # intrinsics rescaled back to image size
    np.testing.assert_allclose(seq.cam.fx, scene.cam.fx, rtol=1e-6)
    # colors round trip through PNG (8-bit)
    np.testing.assert_allclose(seq.colors[0], np.asarray(scene.colors[0]),
                               atol=1.5 / 255)
    # monodep normalization lands in [0.5, 1.5]
    assert 0.49 <= seq.monodeps.min() and seq.monodeps.max() <= 1.51
    assert "k0" in seq.gt_poses and seq.gt_poses["k0"].shape == (4, 4, 4)


def test_scared_split_longer(tmp_path):
    scene = make_scene(num_frames=10, n_gaussians=60, height=16, width=16)
    save_synthetic_as_scared(scene, str(tmp_path))
    seq = load_scared(str(tmp_path))
    assert list(seq.i_test) == [4]
    assert len(seq.i_train) == 9


def test_ply_roundtrip(tmp_path, rng):
    pts = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
    cols = jnp.asarray(rng.uniform(size=(50, 3)).astype(np.float32))
    f = from_pointcloud(pts, cols, 2.0, max_sh_degree=2, capacity=64)
    path = str(tmp_path / "cloud.ply")
    field_to_ply(f, path)
    g = ply_to_field(path, max_sh_degree=2)
    assert int(g.num_active) == 50
    np.testing.assert_allclose(np.asarray(g.means[:50]),
                               np.asarray(f.means[:50]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g.sh_dc[:50]),
                               np.asarray(f.sh_dc[:50]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g.quats[:50]),
                               np.asarray(f.quats[:50]), atol=1e-6)


def test_checkpoint_roundtrip(tmp_path, rng):
    pts = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32))
    cols = jnp.asarray(rng.uniform(size=(20, 3)).astype(np.float32))
    f = from_pointcloud(pts, cols, 2.0, max_sh_degree=1, capacity=32)
    opt = adam_init(f.param_dict())
    state = {"params": f.param_dict(), "mu": opt.mu,
             "active": f.active}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, step=123)
    restored, step = restore_checkpoint(path, template=state)
    assert step == 123
    np.testing.assert_allclose(np.asarray(restored["params"]["means"]),
                               np.asarray(f.means))
    assert np.asarray(restored["active"]).sum() == 20
