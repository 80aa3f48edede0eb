"""ctypes bindings for the native data-path library (native/tdr_dataio.cc).

Auto-builds with `make -C native` on first import if g++ is available;
callers fall back to the numpy implementations when the library is absent
(`native_available()`).
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess

import numpy as np

_LIB = None
_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))), "native")
_SO = osp.join(_NATIVE_DIR, "libtdr_dataio.so")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not osp.exists(_SO):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.u8_to_f32.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                              ctypes.POINTER(ctypes.c_float),
                              ctypes.c_int64]
    lib.crop_f32.argtypes = [ctypes.POINTER(ctypes.c_float),
                             ctypes.POINTER(ctypes.c_float)] + \
        [ctypes.c_int] * 7
    lib.augment_f32.argtypes = [ctypes.POINTER(ctypes.c_float),
                                ctypes.POINTER(ctypes.c_float)] + \
        [ctypes.c_int] * 4
    lib.add_gaussian_noise.argtypes = [ctypes.POINTER(ctypes.c_float),
                                       ctypes.POINTER(ctypes.c_float),
                                       ctypes.c_int64, ctypes.c_float,
                                       ctypes.c_uint64]
    lib.batch_prepare.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int]
    if hasattr(lib, "crc32c"):  # absent in pre-round-3 cached builds
        lib.crc32c.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                               ctypes.c_int64]
        lib.crc32c.restype = ctypes.c_uint32
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def crc32c_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "crc32c")


def crc32c(data: bytes) -> int:
    """crc32c (Castagnoli) of a byte string via the native slice-by-8 path."""
    lib = _load()
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    return int(lib.crc32c(buf, len(data)))


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def u8_to_f32(src: np.ndarray) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(src, np.uint8)
    dst = np.empty(src.shape, np.float32)
    lib.u8_to_f32(src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                  _fptr(dst), src.size)
    return dst


def augment_f32(src: np.ndarray, mode: int) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(src, np.float32)
    h, w, c = src.shape
    swap = mode in (2, 3, 6, 7)
    dst = np.empty((w, h, c) if swap else (h, w, c), np.float32)
    lib.augment_f32(_fptr(src), _fptr(dst), h, w, c, mode)
    return dst


def add_gaussian_noise(src: np.ndarray, sigma: float, seed: int) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(src, np.float32)
    dst = np.empty_like(src)
    lib.add_gaussian_noise(_fptr(src), _fptr(dst), src.size, sigma, seed)
    return dst


def batch_prepare(images: list[np.ndarray], crops: list[tuple],
                  patch: int, modes: list[int], n_threads: int = 4):
    """images: uint8 HWC; crops: (top, left) per image; returns stacked
    (N, patch, patch, C) float32 after crop+augment."""
    lib = _load()
    n = len(images)
    c = images[0].shape[2]
    srcs = (ctypes.POINTER(ctypes.c_uint8) * n)()
    dsts = (ctypes.POINTER(ctypes.c_float) * n)()
    params = np.empty((n, 8), np.int32)
    outs = []
    keep = []
    for i, img in enumerate(images):
        img = np.ascontiguousarray(img, np.uint8)
        keep.append(img)
        srcs[i] = img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        out = np.empty((patch, patch, c), np.float32)
        outs.append(out)
        dsts[i] = _fptr(out)
        h, w, _ = img.shape
        params[i] = (h, w, c, crops[i][0], crops[i][1], patch, patch,
                     modes[i])
    lib.batch_prepare(srcs, dsts,
                      params.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                      n, n_threads)
    return np.stack(outs)


# ---------------------------------------------------------------------------
# native image decode (libtdr_decode.so: libpng/libjpeg, threaded)
# ---------------------------------------------------------------------------

_DEC = None
_DEC_SO = osp.join(_NATIVE_DIR, "libtdr_decode.so")


def _load_decode():
    global _DEC
    if _DEC is not None:
        return _DEC
    if not osp.exists(_DEC_SO):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_DEC_SO)
    except OSError:
        return None
    lib.tdr_probe.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.c_int)]
    lib.tdr_decode.argtypes = [ctypes.c_char_p,
                               ctypes.POINTER(ctypes.c_uint8),
                               ctypes.c_int, ctypes.c_int]
    lib.tdr_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int]
    _DEC = lib
    return lib


def decode_available() -> bool:
    return _load_decode() is not None


def decode_rgb(path: str) -> np.ndarray:
    """Decode a PNG/JPEG to (H, W, 3) uint8 RGB via the native library."""
    lib = _load_decode()
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.tdr_probe(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        raise FileNotFoundError(path)
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.tdr_decode(path.encode(),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                        h.value, w.value)
    if rc != 0:
        raise IOError(f"decode failed ({rc}): {path}")
    return out


def decode_batch_rgb(paths: list[str], n_threads: int = 4) -> list[np.ndarray]:
    """Threaded native decode of a path list -> list of HWC uint8 RGB."""
    lib = _load_decode()
    n = len(paths)
    dims = np.empty((n, 2), np.int32)
    outs = []
    for i, p in enumerate(paths):
        h = ctypes.c_int()
        w = ctypes.c_int()
        if lib.tdr_probe(p.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
            raise FileNotFoundError(p)
        dims[i] = (h.value, w.value)
        outs.append(np.empty((h.value, w.value, 3), np.uint8))
    cpaths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    dsts = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[o.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for o in outs])
    rc = lib.tdr_decode_batch(
        cpaths, dsts, dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n, n_threads)
    if rc != 0:
        raise IOError(f"batch decode failed ({rc})")
    return outs
