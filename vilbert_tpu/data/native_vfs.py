"""ctypes binding for the native VFR reader (native/vfs).

``NativeVrfFeatureStore`` is a drop-in FeatureStore backed by the C++ mmap
reader with a background prefetch pool; identical results to the Python
``VrfFeatureStore``. Falls back gracefully if the shared library isn't built
(``make -C native/vfs``), and builds it on demand when a toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

from vilbert_tpu.data.feature_store import RegionFeatures

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "vfs",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libvfs.so")


class _VfsRecord(ctypes.Structure):
    _fields_ = [
        ("num_boxes", ctypes.c_uint32),
        ("image_h", ctypes.c_uint32),
        ("image_w", ctypes.c_uint32),
        ("has_target", ctypes.c_uint8),
        ("features", ctypes.POINTER(ctypes.c_float)),
        ("boxes", ctypes.POINTER(ctypes.c_float)),
        ("target", ctypes.POINTER(ctypes.c_float)),
    ]


def _build_library() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "libvfs.so"],
            check=True, capture_output=True,
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


_lib = None


def load_library(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        if not (build_if_missing and _build_library()):
            return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.vfs_open.restype = ctypes.c_void_p
    lib.vfs_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.vfs_close.argtypes = [ctypes.c_void_p]
    lib.vfs_num_records.restype = ctypes.c_uint64
    lib.vfs_num_records.argtypes = [ctypes.c_void_p]
    lib.vfs_feature_dim.restype = ctypes.c_uint64
    lib.vfs_feature_dim.argtypes = [ctypes.c_void_p]
    lib.vfs_target_dim.restype = ctypes.c_uint64
    lib.vfs_target_dim.argtypes = [ctypes.c_void_p]
    lib.vfs_keys.restype = ctypes.POINTER(ctypes.c_char_p)
    lib.vfs_keys.argtypes = [ctypes.c_void_p]
    lib.vfs_get.restype = ctypes.c_int
    lib.vfs_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                            ctypes.POINTER(_VfsRecord)]
    lib.vfs_prefetch.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_char_p), ctypes.c_int]
    _lib = lib
    return lib


def native_available() -> bool:
    return load_library() is not None


class NativeVrfFeatureStore:
    """FeatureStore over the C++ reader; zero-copy numpy views into the mmap."""

    def __init__(self, path: str, prefetch_threads: int = 2):
        lib = load_library()
        if lib is None:
            raise RuntimeError(
                "native vfs library unavailable; run `make -C native/vfs` "
                "or use the Python VrfFeatureStore"
            )
        self._lib = lib
        self._handle = lib.vfs_open(path.encode(), prefetch_threads)
        if not self._handle:
            raise IOError(f"failed to open VFR file {path}")
        self.feature_dim = int(lib.vfs_feature_dim(self._handle))
        self.target_dim = int(lib.vfs_target_dim(self._handle))
        n = int(lib.vfs_num_records(self._handle))
        key_arr = lib.vfs_keys(self._handle)
        self._keys = [key_arr[i].decode() for i in range(n)]

    def get(self, image_id: str) -> RegionFeatures:
        rec = _VfsRecord()
        rc = self._lib.vfs_get(self._handle, str(image_id).encode(),
                               ctypes.byref(rec))
        if rc != 0:
            raise KeyError(image_id)
        n = rec.num_boxes
        feats = np.ctypeslib.as_array(rec.features, (n, self.feature_dim))
        boxes = np.ctypeslib.as_array(rec.boxes, (n, 4))
        target = None
        if rec.has_target:
            target = np.ctypeslib.as_array(rec.target, (n, self.target_dim))
        return RegionFeatures(feats, boxes, int(rec.image_h), int(rec.image_w),
                              target)

    def prefetch(self, keys: Sequence[str]) -> None:
        arr = (ctypes.c_char_p * len(keys))(
            *[str(k).encode() for k in keys]
        )
        self._lib.vfs_prefetch(self._handle, arr, len(keys))

    def keys(self) -> List[str]:
        return list(self._keys)

    def close(self) -> None:
        if self._handle:
            self._lib.vfs_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
