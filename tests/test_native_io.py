import numpy as np
import pytest

from freesurgs_tpu.io import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_cache_roundtrip(tmp_path, rng):
    path = str(tmp_path / "seq.fsc")
    w = native.CacheWriter(path)
    a = rng.normal(size=(3, 16, 20)).astype(np.float32)
    b = rng.integers(0, 255, (8, 8)).astype(np.uint8)
    c = rng.integers(-5, 5, (7,)).astype(np.int32)
    w.add("color/000000", a)
    w.add("mask", b)
    w.add("ints", c)
    w.close()

    r = native.CacheReader(path)
    assert len(r) == 3
    np.testing.assert_array_equal(r.read("color/000000"), a)
    np.testing.assert_array_equal(r.read("mask"), b)
    np.testing.assert_array_equal(r.read("ints"), c)
    assert r.stat("color/000000")[0] == (3, 16, 20)
    r.prefetch("color/000000")  # no crash
    with pytest.raises(KeyError):
        r.read("missing")
    r.close()


def test_ply_codec_roundtrip(tmp_path, rng):
    path = str(tmp_path / "cloud.ply")
    data = rng.normal(size=(30, 5)).astype(np.float32)
    names = ["x", "y", "z", "opacity", "scale_0"]
    native.ply_write(path, data, names)
    out, names2 = native.ply_read(path)
    assert names2 == names
    np.testing.assert_array_equal(out, data)


def test_ply_interop_with_python_codec(tmp_path, rng):
    """The C++ codec must read PLYs written by the python codec and
    vice versa."""
    import jax.numpy as jnp

    from freesurgs_tpu.io.ply import field_to_ply, load_ply_arrays
    from freesurgs_tpu.models.gaussians import from_pointcloud

    pts = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32))
    cols = jnp.asarray(rng.uniform(size=(20, 3)).astype(np.float32))
    f = from_pointcloud(pts, cols, 2.0, max_sh_degree=1, capacity=32)
    py_path = str(tmp_path / "py.ply")
    field_to_ply(f, py_path)

    data, names = native.ply_read(py_path)
    assert data.shape[0] == 20
    ix = names.index("x")
    np.testing.assert_allclose(data[:, ix], np.asarray(f.means[:20, 0]),
                               atol=1e-6)

    cpp_path = str(tmp_path / "cpp.ply")
    native.ply_write(cpp_path, data, names)
    cols2 = load_ply_arrays(cpp_path)
    np.testing.assert_allclose(cols2["x"], data[:, ix], atol=1e-6)


def test_sequence_cache(tmp_path):
    from freesurgs_tpu.data.synthetic import make_scene
    scene = make_scene(num_frames=3, n_gaussians=100, height=16, width=16)
    path = str(tmp_path / "scene.fsc")
    native.write_sequence_cache(path, scene)
    r = native.CacheReader(path)
    np.testing.assert_allclose(r.read("color/000001"),
                               np.asarray(scene.colors[1]), atol=1e-7)
    np.testing.assert_allclose(r.read("flowfw/000000"),
                               np.asarray(scene.flows_fw[0]), atol=1e-7)
    assert r.read("meta/num_frames")[0] == 3
    r.close()
