import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from freesurgs_tpu.core import transforms as tf


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_to_rotmat_matches_scipy(rng):
    q = random_quats(rng, 32)
    R = np.asarray(tf.quat_to_rotmat(jnp.asarray(q)))
    # scipy uses (x, y, z, w)
    R_ref = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-6)


def test_quat_to_rotmat_unnormalized_input(rng):
    q = rng.normal(size=(8, 4)) * 3.0
    R = np.asarray(tf.quat_to_rotmat(jnp.asarray(q)))
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    R_ref = Rotation.from_quat(qn[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-6)


def test_rotmat_quat_roundtrip(rng):
    q = random_quats(rng, 64)
    q = np.where(q[:, :1] < 0, -q, q)
    R = tf.quat_to_rotmat(jnp.asarray(q))
    q2 = np.asarray(tf.rotmat_to_quat(R))
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_build_w2c_and_inverse(rng):
    q = random_quats(rng, 1)[0]
    t = rng.normal(size=3)
    T = np.asarray(tf.build_w2c(jnp.asarray(q), jnp.asarray(t)))
    assert T.shape == (4, 4)
    np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=0)
    Tinv = np.asarray(tf.invert_se3(jnp.asarray(T)))
    np.testing.assert_allclose(Tinv @ T, np.eye(4), atol=1e-6)


def test_transform_points_matches_homogeneous(rng):
    q = random_quats(rng, 1)[0]
    t = rng.normal(size=3)
    T = np.asarray(tf.build_w2c(jnp.asarray(q), jnp.asarray(t)))
    pts = rng.normal(size=(17, 3))
    out = np.asarray(tf.transform_points(jnp.asarray(T), jnp.asarray(pts)))
    ref = (T @ np.concatenate([pts, np.ones((17, 1))], -1).T).T[:, :3]
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_pose_gradients_flow(rng):
    """SE(3) gradients must flow through quat normalize + matmul
    (the load-bearing property from SURVEY.md section 1)."""
    pts = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    target = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)

    def loss(q, t):
        T = tf.build_w2c(q, t)
        return jnp.sum((tf.transform_points(T, pts) - target) ** 2)

    q0 = jnp.asarray([1.0, 0.1, -0.2, 0.05])
    t0 = jnp.asarray([0.1, 0.2, 0.3])
    gq, gt = jax.grad(loss, argnums=(0, 1))(q0, t0)
    assert np.all(np.isfinite(gq)) and np.all(np.isfinite(gt))
    # finite-difference check
    eps = 1e-3
    for i in range(4):
        qp = q0.at[i].add(eps)
        qm = q0.at[i].add(-eps)
        fd = (loss(qp, t0) - loss(qm, t0)) / (2 * eps)
        np.testing.assert_allclose(gq[i], fd, rtol=1e-2, atol=1e-3)


def test_essential_fundamental(rng):
    # Two cameras observing the same world points satisfy x2^T F x1 = 0.
    q1 = random_quats(rng, 1)[0]
    q2 = random_quats(rng, 1)[0]
    w2c1 = tf.build_w2c(jnp.asarray(q1), jnp.asarray([0.0, 0.0, 0.0]))
    w2c2 = tf.build_w2c(jnp.asarray(q2), jnp.asarray([0.1, -0.05, 0.02]))
    K = jnp.asarray([[100.0, 0, 32.0], [0, 100.0, 24.0], [0, 0, 1.0]])
    E = tf.essential_from_poses(w2c1, w2c2)
    F = tf.fundamental_from_essential(E, K, K)

    pts_w = rng.normal(size=(50, 3)) + np.array([0, 0, 5.0])
    p1 = np.asarray(tf.transform_points(w2c1, jnp.asarray(pts_w)))
    p2 = np.asarray(tf.transform_points(w2c2, jnp.asarray(pts_w)))
    x1 = (np.asarray(K) @ (p1 / p1[:, 2:]).T).T
    x2 = (np.asarray(K) @ (p2 / p2[:, 2:]).T).T
    resid = np.abs(np.einsum("ni,ij,nj->n", x2, np.asarray(F), x1))
    scale = np.abs(np.asarray(F)).max()
    assert np.max(resid) / max(scale, 1e-9) < 1e-3
