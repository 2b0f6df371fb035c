"""ctypes bindings for the native C++ loader core (`native/loader.cc`).

The native library supplies the host-side hot path of the data pipelines —
JPEG/PNG decode + antialiased resize + crop + normalize + pad, executed by a
C++ thread pool writing into caller-owned float32 buffers. Python falls back
to the PIL implementations in `clipself_tpu.data.transforms` when the shared
library has not been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libclipself_loader.so"
_lib = None


def build_native(quiet: bool = True) -> bool:
    """Compile the shared library in-tree. Returns success."""
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=quiet,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        # build from source on first use — the library is NOT shipped as a
        # binary (only native/loader.cc + Makefile are versioned)
        if not build_native():
            return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.csl_pool_create.restype = ctypes.c_void_p
    lib.csl_pool_create.argtypes = [ctypes.c_int]
    lib.csl_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.csl_pool_wait.restype = ctypes.c_int
    lib.csl_pool_wait.argtypes = [ctypes.c_void_p]
    lib.csl_pool_wait_status.restype = ctypes.c_int
    lib.csl_pool_wait_status.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int,
    ]
    lib.csl_decode.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.csl_decode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.csl_free.argtypes = [ctypes.c_void_p]
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.csl_submit_distill_item.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, f32p, f32p, f32p, f32p,
    ]
    lib.csl_submit_resize_pad.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, f32p, f32p, f32p, f32p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode(path: str) -> Optional[np.ndarray]:
    """Decode an image file to an RGB uint8 [H, W, 3] array."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    buf = lib.csl_decode(path.encode(), ctypes.byref(w), ctypes.byref(h))
    if not buf:
        return None
    try:
        arr = np.ctypeslib.as_array(buf, shape=(h.value, w.value, 3)).copy()
    finally:
        lib.csl_free(buf)
    return arr


class NativePool:
    """Thread-pool wrapper: submit decode/transform jobs, then wait().

    Buffers passed to submit_* must stay alive until wait() returns.
    """

    def __init__(self, num_threads: Optional[int] = None):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native loader not built; run `make -C native` or build_native()"
            )
        self._lib = lib
        n = num_threads or max(os.cpu_count() or 1, 1)
        self._pool = lib.csl_pool_create(n)
        # strong refs to every output buffer with in-flight jobs: the C++
        # side writes through raw pointers, so the arrays must outlive the
        # jobs even if the submitting iterator is abandoned
        self._refs = []

    def submit_distill_item(
        self,
        path: str,
        det_out: np.ndarray,
        crops_out: np.ndarray,
        crop_boxes: np.ndarray,
        mean: np.ndarray,
        std: np.ndarray,
    ):
        """det_out: [S, S, 3] f32; crops_out: [M, s, s, 3] f32;
        crop_boxes: [K, 4] xyxy in original pixel coords, K <= M (rows of
        crops_out beyond K are left untouched — callers pre-zero them)."""
        m = int(crop_boxes.shape[0])
        if m > crops_out.shape[0]:
            raise ValueError(
                f"{m} crop boxes but only {crops_out.shape[0]} output rows"
            )
        if not crops_out.flags["C_CONTIGUOUS"]:
            # reshape(-1) of a strided view would hand the C++ job a
            # TEMPORARY COPY: results lost and freed memory written
            raise ValueError("crops_out must be C-contiguous")
        crops_flat = crops_out.reshape(-1)
        self._lib.csl_submit_distill_item(
            self._pool, path.encode(), det_out.shape[0], crops_out.shape[1], m,
            np.ascontiguousarray(crop_boxes, np.float32),
            np.ascontiguousarray(mean, np.float32),
            np.ascontiguousarray(std, np.float32),
            det_out, crops_flat,
        )
        self._refs.append((det_out, crops_flat))

    def submit_resize_pad(
        self, path: str, out: np.ndarray, scale_out: np.ndarray,
        mean: np.ndarray, std: np.ndarray,
    ):
        self._lib.csl_submit_resize_pad(
            self._pool, path.encode(), out.shape[0],
            np.ascontiguousarray(mean, np.float32),
            np.ascontiguousarray(std, np.float32),
            out, scale_out,
        )
        self._refs.append((out, scale_out))

    def wait(self) -> int:
        """Block until all submitted jobs finish; returns the error count."""
        n = self._lib.csl_pool_wait(self._pool)
        self._refs.clear()
        return n

    def wait_status(self, num_jobs: int) -> np.ndarray:
        """Block until all jobs finish; returns a [num_jobs] uint8 array of
        per-job success flags (1 ok, 0 failed) in submission order.

        If the pool's job count disagrees with `num_jobs` (e.g. stale jobs
        from an abandoned iterator on a reused pool), every flag reports
        failure — misaligned flags must force the safe fallback, never mark
        a bad row ok."""
        out = np.zeros(max(num_jobs, 1), np.uint8)
        n = self._lib.csl_pool_wait_status(self._pool, out, out.shape[0])
        self._refs.clear()
        if n != num_jobs:
            return np.zeros(num_jobs, np.uint8)
        return out[:num_jobs]

    def close(self):
        if self._pool:
            # destroy joins the workers (in-flight jobs finish, queued jobs
            # are discarded) — only then may the buffer refs be released
            self._lib.csl_pool_destroy(self._pool)
            self._pool = None
            self._refs.clear()

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
