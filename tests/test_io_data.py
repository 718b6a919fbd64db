import os

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


def test_scared_metric_depth_prior(tmp_path):
    """depth_prior="metric" keeps 1/disparity unchanged (true depth here,
    since save_synthetic_as_scared writes disp = 1/true_depth), while the
    default applies the reference's per-frame [0.5, 1.5] affine remap."""
    scene = make_scene(num_frames=4, n_gaussians=100, height=32, width=48)
    save_synthetic_as_scared(scene, str(tmp_path))
    seq_m = load_scared(str(tmp_path), depth_prior="metric")
    np.testing.assert_allclose(seq_m.monodeps, np.asarray(scene.depths),
                               rtol=1e-5)
    seq_n = load_scared(str(tmp_path))
    assert 0.49 <= seq_n.monodeps.min() and seq_n.monodeps.max() <= 1.51
    # the two modes must not share an fsio cache entry
    assert abs(float(seq_m.monodeps.max())
               - float(seq_n.monodeps.max())) > 1e-3


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


def test_latest_checkpoint(tmp_path):
    from freesurgs_tpu.io.checkpoint import latest_checkpoint
    d = str(tmp_path)
    assert latest_checkpoint(d) is None
    os.makedirs(os.path.join(d, "ckpt_progressive"))
    assert latest_checkpoint(d).endswith("ckpt_progressive")
    os.makedirs(os.path.join(d, "ckpt_0005000"))
    os.makedirs(os.path.join(d, "ckpt_0010000"))
    assert latest_checkpoint(d).endswith("ckpt_0010000")
    os.makedirs(os.path.join(d, "ckpt_final"))
    assert latest_checkpoint(d).endswith("ckpt_final")


def test_checkpoint_mesh_sharded_roundtrip(tmp_path, rng):
    """Mesh-aware checkpointing (ROADMAP item 14): a state sharded over
    the mesh data axis saves per-shard (no host gather of the full array)
    and restores WITH its NamedSharding from a sharded template; a fresh
    process may also restore the same checkpoint unsharded (numpy
    template), and vice versa."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs).reshape(4, 2), ("data", "tiles"))
    sharding = NamedSharding(mesh, P("data"))

    big = jnp.asarray(rng.normal(size=(8, 16, 3)).astype(np.float32))
    small = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    empty = jnp.zeros((8, 0, 3), jnp.float32)
    state = {"gauss": jax.device_put(big, sharding),
             "pose": jax.device_put(small, NamedSharding(mesh, P())),
             "sh_rest": empty}
    path = str(tmp_path / "ckpt_sharded")
    save_checkpoint(path, state, step=7)

    # sharded template -> restored arrays carry the same sharding
    restored, step = restore_checkpoint(path, template=state)
    assert step == 7
    assert restored["gauss"].sharding == sharding
    np.testing.assert_allclose(np.asarray(restored["gauss"]),
                               np.asarray(big))
    np.testing.assert_allclose(np.asarray(restored["pose"]),
                               np.asarray(small))
    assert restored["sh_rest"].shape == (8, 0, 3)

    # plain host template -> same values, no mesh needed
    host_tmpl = jax.tree.map(np.asarray, state)
    restored2, _ = restore_checkpoint(path, template=host_tmpl)
    np.testing.assert_allclose(np.asarray(restored2["gauss"]),
                               np.asarray(big))

    # and a host-saved checkpoint restores into a sharded template
    path2 = str(tmp_path / "ckpt_host")
    save_checkpoint(path2, host_tmpl, step=9)
    restored3, step3 = restore_checkpoint(path2, template=state)
    assert step3 == 9 and restored3["gauss"].sharding == sharding
    np.testing.assert_allclose(np.asarray(restored3["gauss"]),
                               np.asarray(big))


def test_scared_fsio_cache(tmp_path):
    """cache="auto": first load builds the fsio mmap cache, second load
    reads it back bit-identically (VideoSequence round-trip through the
    native FSC1 format)."""
    import glob
    import os

    from freesurgs_tpu.io import native

    if not native.available():
        import pytest
        pytest.skip("no native toolchain")
    scene = make_scene(num_frames=5, n_gaussians=80, height=24, width=32)
    save_synthetic_as_scared(scene, str(tmp_path))
    seq0 = load_scared(str(tmp_path), cache=None)
    seq1 = load_scared(str(tmp_path))           # builds cache
    caches = glob.glob(os.path.join(str(tmp_path), ".fsio_cache_*.fsc"))
    assert len(caches) == 1
    seq2 = load_scared(str(tmp_path))           # reads cache
    for a, b in ((seq1, seq0), (seq2, seq0)):
        np.testing.assert_array_equal(a.colors, b.colors)
        np.testing.assert_array_equal(a.flows_fw, b.flows_fw)
        np.testing.assert_array_equal(a.flows_bw, b.flows_bw)
        np.testing.assert_array_equal(a.monodeps, b.monodeps)
        np.testing.assert_array_equal(a.i_train, b.i_train)
        np.testing.assert_array_equal(a.i_test, b.i_test)
        assert a.boundaries == b.boundaries
        assert a.image_names == b.image_names
        assert set(a.gt_poses) == set(b.gt_poses)
        for k in a.gt_poses:
            np.testing.assert_allclose(a.gt_poses[k], b.gt_poses[k],
                                       atol=1e-6)
        np.testing.assert_allclose(a.cam.fx, b.cam.fx, rtol=1e-6)
        assert (a.cam.height, a.cam.width) == (b.cam.height, b.cam.width)
