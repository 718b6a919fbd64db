"""ctypes bindings for libfsio (the native C++ runtime I/O layer).

The library is built on demand from ``cpp/fsio.cpp`` (g++, no external
deps). All entry points degrade gracefully: ``available()`` is False when
no compiler is present, and pure-python fallbacks exist for everything
(``io/ply.py``; the dataset cache is an optimization, not a requirement).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "cpp")

_DTYPES = {0: np.float32, 1: np.uint8, 2: np.int32}
_DTYPE_IDS = {np.dtype(np.float32): 0, np.dtype(np.uint8): 1,
              np.dtype(np.int32): 2}


@lru_cache(maxsize=1)
def _lib():
    so = os.path.abspath(os.path.join(_CPP_DIR, "libfsio.so"))
    src = os.path.abspath(os.path.join(_CPP_DIR, "fsio.cpp"))
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        subprocess.run(["make", "-C", os.path.dirname(src)], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(so)
    lib.fsio_writer_open.restype = ctypes.c_void_p
    lib.fsio_writer_open.argtypes = [ctypes.c_char_p]
    lib.fsio_writer_add.restype = ctypes.c_int
    lib.fsio_writer_add.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p,
        ctypes.c_uint64, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint64)]
    lib.fsio_writer_close.argtypes = [ctypes.c_void_p]
    lib.fsio_open.restype = ctypes.c_void_p
    lib.fsio_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.fsio_close.argtypes = [ctypes.c_void_p]
    lib.fsio_num_entries.argtypes = [ctypes.c_void_p]
    lib.fsio_stat.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint64)]
    lib.fsio_read.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                              ctypes.c_void_p]
    lib.fsio_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.fsio_ply_write.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_uint64,
        ctypes.c_uint32, ctypes.c_char_p]
    lib.fsio_ply_header.restype = ctypes.c_long
    lib.fsio_ply_header.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_char_p, ctypes.c_uint64]
    lib.fsio_ply_read.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_float),
        ctypes.c_uint64, ctypes.c_uint32]
    return lib


def available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False


# ------------------------------------------------------------ cache writer

class CacheWriter:
    def __init__(self, path: str):
        self._lib = _lib()
        self._h = self._lib.fsio_writer_open(path.encode())
        if not self._h:
            raise OSError(f"cannot open {path}")

    def add(self, name: str, arr: np.ndarray):
        arr = np.ascontiguousarray(arr)
        dtype_id = _DTYPE_IDS[arr.dtype]
        shape = (ctypes.c_uint64 * 4)(*([*arr.shape, 0, 0, 0, 0][:4]))
        rc = self._lib.fsio_writer_add(
            self._h, name.encode(), arr.ctypes.data_as(ctypes.c_void_p),
            arr.nbytes, dtype_id, arr.ndim, shape)
        if rc != 0:
            raise OSError(f"write failed for {name}")

    def close(self):
        self._lib.fsio_writer_close(self._h)
        self._h = None


class CacheReader:
    """mmap-backed reader with background page prefetching."""

    def __init__(self, path: str, prefetch_threads: int = 2):
        self._lib = _lib()
        self._h = self._lib.fsio_open(path.encode(), prefetch_threads)
        if not self._h:
            raise OSError(f"cannot open cache {path}")

    def __len__(self):
        return self._lib.fsio_num_entries(self._h)

    def stat(self, name: str):
        shape = (ctypes.c_uint64 * 4)()
        ndim = ctypes.c_uint32()
        dtype = ctypes.c_uint32()
        nbytes = ctypes.c_uint64()
        rc = self._lib.fsio_stat(self._h, name.encode(), shape,
                                 ctypes.byref(ndim), ctypes.byref(dtype),
                                 ctypes.byref(nbytes))
        if rc != 0:
            raise KeyError(name)
        return (tuple(shape[i] for i in range(ndim.value)),
                _DTYPES[dtype.value], nbytes.value)

    def read(self, name: str) -> np.ndarray:
        shape, dtype, nbytes = self.stat(name)
        out = np.empty(shape, dtype)
        rc = self._lib.fsio_read(self._h, name.encode(),
                                 out.ctypes.data_as(ctypes.c_void_p))
        if rc != 0:
            raise KeyError(name)
        return out

    def prefetch(self, name: str):
        self._lib.fsio_prefetch(self._h, name.encode())

    def close(self):
        if self._h:
            self._lib.fsio_close(self._h)
            self._h = None


# --------------------------------------------------------------- PLY codec

def ply_write(path: str, data: np.ndarray, names: list[str]):
    data = np.ascontiguousarray(data, np.float32)
    n, p = data.shape
    assert len(names) == p
    rc = _lib().fsio_ply_write(
        path.encode(), data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, p, "\n".join(names).encode())
    if rc != 0:
        raise OSError(f"ply write failed: {path}")


def ply_read(path: str):
    """Returns (data (N, P) f32, names list)."""
    lib = _lib()
    n = ctypes.c_uint64()
    p = ctypes.c_uint32()
    buf = ctypes.create_string_buffer(1 << 16)
    hdr = lib.fsio_ply_header(path.encode(), ctypes.byref(n),
                              ctypes.byref(p), buf, len(buf))
    if hdr < 0:
        raise OSError(f"bad ply header: {path}")
    out = np.empty((n.value, p.value), np.float32)
    rc = lib.fsio_ply_read(path.encode(), hdr,
                           out.ctypes.data_as(
                               ctypes.POINTER(ctypes.c_float)),
                           n.value, p.value)
    if rc != 0:
        raise OSError(f"ply read failed: {path}")
    return out, buf.value.decode().split("\n")


# ------------------------------------------------- sequence cache helpers

def write_sequence_cache(path: str, seq):
    """Pack a VideoSequence into the FSC1 cache format.

    Per-frame entries (so a streaming reader can prefetch frame t+1 while
    frame t uploads) plus the sequence metadata the SCARED loader needs to
    reconstruct the full ``VideoSequence`` without touching the raw
    PNG/json/npz tree again (``data/scared.py``; reference loads raw files
    every run, ``scene/pose_optimizer.py:355-470``).
    """
    w = CacheWriter(path)
    t = seq.colors.shape[0]
    for i in range(t):
        w.add(f"color/{i:06d}", np.asarray(seq.colors[i], np.float32))
        w.add(f"monodep/{i:06d}", np.asarray(seq.monodeps[i], np.float32))
        if i < t - 1:
            w.add(f"flowfw/{i:06d}", np.asarray(seq.flows_fw[i],
                                                np.float32))
            if getattr(seq, "flows_bw", None) is not None \
                    and len(seq.flows_bw) > i:
                w.add(f"flowbw/{i:06d}", np.asarray(seq.flows_bw[i],
                                                    np.float32))
    w.add("meta/num_frames", np.asarray([t], np.int32))
    if hasattr(seq, "cam"):
        w.add("meta/intrinsic",
              np.asarray(seq.cam.intrinsic_matrix(), np.float32))
        w.add("meta/hw", np.asarray([seq.cam.height, seq.cam.width],
                                    np.int32))
    for attr in ("i_train", "i_test"):
        if getattr(seq, attr, None) is not None:
            w.add(f"meta/{attr}", np.asarray(getattr(seq, attr), np.int32))
    if getattr(seq, "boundaries", None):
        w.add("meta/boundaries", np.asarray(seq.boundaries, np.int32))
    gt_poses = getattr(seq, "gt_poses", None) or {}
    if gt_poses:
        w.add("meta/gtpose_keys",
              np.frombuffer("\n".join(gt_poses).encode(), np.uint8).copy())
        for key, poses in gt_poses.items():
            w.add(f"gtpose/{key}", np.asarray(poses, np.float32))
    names = getattr(seq, "image_names", None)
    if names:
        w.add("meta/image_names",
              np.frombuffer("\n".join(names).encode(), np.uint8).copy())
    w.close()


def read_sequence_cache(path: str, prefetch_threads: int = 2):
    """Load a full VideoSequence back from an FSC1 cache (mmap reads with
    one-frame-ahead prefetch). Returns ``data/scared.VideoSequence``."""
    from ..core.camera import Camera
    from ..data.scared import VideoSequence

    r = CacheReader(path, prefetch_threads)
    try:
        t = int(r.read("meta/num_frames")[0])
        h, w_ = (int(x) for x in r.read("meta/hw"))
        K = r.read("meta/intrinsic").astype(np.float64)

        def read_stack(prefix, count):
            out = []
            for i in range(count):
                if i + 1 < count:
                    r.prefetch(f"{prefix}/{i + 1:06d}")
                out.append(r.read(f"{prefix}/{i:06d}"))
            return (np.stack(out) if out
                    else np.zeros((0, 2, h, w_), np.float32))

        colors = read_stack("color", t)
        monodeps = read_stack("monodep", t)
        flows_fw = read_stack("flowfw", t - 1)
        try:
            flows_bw = read_stack("flowbw", t - 1)
        except KeyError:
            flows_bw = -flows_fw
        gt_poses = {}
        boundaries = [0]
        try:
            boundaries = r.read("meta/boundaries").tolist()
        except KeyError:
            pass
        try:
            keys = r.read("meta/gtpose_keys").tobytes().decode().split("\n")
        except KeyError:
            keys = []
        for key in keys:
            gt_poses[key] = r.read(f"gtpose/{key}").astype(np.float64)
        try:
            names_raw = r.read("meta/image_names").tobytes().decode()
            image_names = names_raw.split("\n")
        except KeyError:
            image_names = [f"frame_{i:06d}" for i in range(t)]
        return VideoSequence(
            cam=Camera.from_K(K, height=h, width=w_),
            colors=colors, flows_fw=flows_fw, flows_bw=flows_bw,
            monodeps=monodeps, gt_poses=gt_poses, boundaries=boundaries,
            i_train=r.read("meta/i_train"), i_test=r.read("meta/i_test"),
            image_names=image_names)
    finally:
        r.close()
