"""ctypes binding for the native loader core (native/loader_core.cpp).

Builds the shared library on first use (g++ + system libjpeg, see
native/build.sh) and degrades gracefully: `available()` is False when
the toolchain or libjpeg is missing, and callers fall back to the cv2
path (the reference's decode route, utils/datasets.py:686-705).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

LOGGER = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SO = _NATIVE_DIR / "libetloader.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True

        def _stale():
            if not _SO.exists():
                return True
            src = _NATIVE_DIR / "loader_core.cpp"
            try:  # rebuild when the source outdates the published .so
                return src.stat().st_mtime > _SO.stat().st_mtime
            except OSError:
                return False

        if _stale():
            # serialize first-use builds ACROSS processes (forked loader
            # workers all hit this path at once): flock a sidecar lockfile,
            # re-check under the lock, and rely on build.sh's atomic rename
            # so a concurrent dlopen never sees a half-written .so
            try:
                import fcntl

                with open(_NATIVE_DIR / ".build.lock", "w") as lockf:
                    fcntl.flock(lockf, fcntl.LOCK_EX)
                    if _stale():
                        subprocess.run(
                            ["sh", str(_NATIVE_DIR / "build.sh")],
                            check=True, capture_output=True, text=True,
                            timeout=120,
                        )
            except Exception as e:  # no g++/libjpeg -> cv2 fallback
                LOGGER.debug("native loader build failed: %s", e)
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError as e:
            LOGGER.debug("native loader dlopen failed: %s", e)
            return None
        lib.et_load_letterbox_batch.restype = ctypes.c_int
        lib.et_load_letterbox_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        lib.et_load_image.restype = ctypes.c_int
        lib.et_load_image.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_letterbox_batch(paths: Sequence[str], img_size: int,
                         pad_value: int = 114, threads: int = 0):
    """Decode+letterbox a batch of JPEGs natively.

    Returns (images (n, s, s, 3) u8 BGR — cv2.imread convention, flipped
    to RGB at collate like the cv2 path —, hw0 (n, 2) native dims,
    ratio_pad (n, 4) [rh, rw, dw, dh], ok (n,) bool). Raises RuntimeError
    if the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable (g++/libjpeg missing)")
    n = len(paths)
    images = np.empty((n, img_size, img_size, 3), np.uint8)
    hw0 = np.zeros((n, 2), np.int32)
    ratio_pad = np.zeros((n, 4), np.float32)
    ok = np.zeros((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    threads = threads or min(n, os.cpu_count() or 1)
    lib.et_load_letterbox_batch(
        arr, n,
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img_size, pad_value,
        hw0.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ratio_pad.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        threads,
    )
    return images, hw0, ratio_pad, ok.astype(bool)


def load_image(path: str, img_size: int):
    """Single-image native decode+resize matching LoadImagesAndLabels
    .load_image semantics: longer side -> img_size, INTER_LINEAR, BGR.

    Returns (img (h, w, 3) u8 BGR, (h0, w0)) or None on failure.
    """
    lib = _load()
    if lib is None:
        return None
    buf = np.empty((img_size, img_size, 3), np.uint8)
    h0w0 = np.zeros((2,), np.int32)
    hw = np.zeros((2,), np.int32)
    rc = lib.et_load_image(
        os.fsencode(path),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img_size,
        h0w0.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if not rc:
        return None
    h, w = int(hw[0]), int(hw[1])
    # C side writes compact rows (stride == new_w)
    img = buf.reshape(-1)[: h * w * 3].reshape(h, w, 3).copy()
    return img, (int(h0w0[0]), int(h0w0[1]))
