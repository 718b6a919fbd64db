"""Binary PLY export/import of the Gaussian cloud (3DGS-standard layout).

Compatible with the reference's ``save_ply`` / ``load_ply`` attribute
naming (``scene/gaussian_model.py:419-499``): x y z nx ny nz f_dc_*
f_rest_* opacity scale_* rot_*, little-endian float32 — loadable by the
usual 3DGS viewers. Pure numpy (no plyfile dependency).

Note: the reference writes the opacity property as "_opacity" when saving
but reads "opacity" when loading (a latent reference bug); we write the
ecosystem-standard "opacity" and accept both on load.
"""

from __future__ import annotations

import numpy as np

from ..models.gaussians import GaussianField


def field_to_ply(field: GaussianField, path: str):
    act = np.asarray(field.active)
    xyz = np.asarray(field.means)[act]
    n = xyz.shape[0]
    dc = np.asarray(field.sh_dc)[act]
    rest = np.asarray(field.sh_rest)[act]
    # explicit widths: reshape(n, -1) is ill-defined when n == 0 (a fully
    # pruned field must still export a valid, empty PLY)
    f_dc = dc.transpose(0, 2, 1).reshape(n, dc.shape[1] * 3)
    f_rest = rest.transpose(0, 2, 1).reshape(n, rest.shape[1] * 3)
    opac = np.asarray(field.logit_opacity)[act][:, None]
    scale = np.asarray(field.log_scales)[act]
    rot = np.asarray(field.quats)[act]

    names = (["x", "y", "z", "nx", "ny", "nz"]
             + [f"f_dc_{i}" for i in range(f_dc.shape[1])]
             + [f"f_rest_{i}" for i in range(f_rest.shape[1])]
             + ["opacity"]
             + [f"scale_{i}" for i in range(scale.shape[1])]
             + [f"rot_{i}" for i in range(rot.shape[1])])
    data = np.concatenate(
        [xyz, np.zeros_like(xyz), f_dc, f_rest, opac, scale, rot],
        axis=1).astype("<f4")

    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}"]
    header += [f"property float {nm}" for nm in names]
    header += ["end_header"]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(data.tobytes())


def _parse_header(f):
    props = []
    n = 0
    while True:
        line = f.readline().decode("ascii").strip()
        if line.startswith("element vertex"):
            n = int(line.split()[-1])
        elif line.startswith("property float"):
            props.append(line.split()[-1])
        elif line == "end_header":
            return n, props


def load_ply_arrays(path: str) -> dict[str, np.ndarray]:
    """Read a float32 binary PLY into a dict of named columns."""
    with open(path, "rb") as f:
        magic = f.readline().strip()
        assert magic == b"ply", "not a PLY file"
        fmt = f.readline().strip()
        assert b"binary_little_endian" in fmt, "only binary PLY supported"
        n, props = _parse_header(f)
        raw = np.frombuffer(f.read(n * len(props) * 4), "<f4")
    cols = raw.reshape(n, len(props))
    return {p: cols[:, i].copy() for i, p in enumerate(props)}


def ply_to_field(path: str, max_sh_degree: int = 3,
                 capacity: int | None = None) -> GaussianField:
    import jax.numpy as jnp

    from ..models.gaussians import GaussianField

    cols = load_ply_arrays(path)
    n = cols["x"].shape[0]
    k = (max_sh_degree + 1) ** 2
    xyz = np.stack([cols["x"], cols["y"], cols["z"]], -1)
    sh_dc = np.stack([cols[f"f_dc_{i}"] for i in range(3)], -1)[:, None, :]
    n_rest = 3 * (k - 1)
    if n_rest and f"f_rest_{n_rest - 1}" in cols:
        rest = np.stack([cols[f"f_rest_{i}"] for i in range(n_rest)], -1)
        sh_rest = rest.reshape(n, 3, k - 1).transpose(0, 2, 1)
    else:
        sh_rest = np.zeros((n, k - 1, 3), np.float32)
    opac = cols.get("opacity", cols.get("_opacity"))
    scale = np.stack([cols[f"scale_{i}"] for i in range(3)], -1)
    rot = np.stack([cols[f"rot_{i}"] for i in range(4)], -1)

    cap = capacity or n

    def pad(x):
        out = np.zeros((cap,) + x.shape[1:], np.float32)
        out[:n] = x
        return jnp.asarray(out)

    quats = np.zeros((cap, 4), np.float32)
    quats[:, 0] = 1.0
    quats[:n] = rot
    return GaussianField(
        means=pad(xyz), quats=jnp.asarray(quats), log_scales=pad(scale),
        logit_opacity=pad(opac), sh_dc=pad(sh_dc), sh_rest=pad(sh_rest),
        active=jnp.asarray(np.arange(cap) < n),
        max_radii2d=jnp.zeros((cap,), jnp.float32),
        grad_accum=jnp.zeros((cap,), jnp.float32),
        grad_denom=jnp.zeros((cap,), jnp.float32),
        scene_radius=jnp.asarray(1.0, jnp.float32),
        max_sh_degree=max_sh_degree)
