"""ctypes bindings for the native host library (native/mimm_host.cpp).

Auto-builds ``libmimm_host.so`` with g++ on first use if missing; all
entry points gracefully return None/False when the native library is
unavailable so the numpy path (transforms.py) remains the fallback.
ctypes calls release the GIL — the Loader's decode threads scale across
cores instead of serializing in Python.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmimm_host.so")

_lock = threading.Lock()
_lib = None
_tried = False

_D = ctypes.POINTER(ctypes.c_double)
_F = ctypes.POINTER(ctypes.c_float)
_U8 = ctypes.POINTER(ctypes.c_uint8)
_U16 = ctypes.POINTER(ctypes.c_uint16)
_I32 = ctypes.POINTER(ctypes.c_int32)
_I64 = ctypes.c_int64


_MARKER_PATH = _LIB_PATH + ".buildhost"


def _host_isa_id() -> str:
    """Fingerprint of this host's ISA and the C++ source: the .so is
    compiled -march=native, so a binary copied/synced from a different CPU
    could SIGILL mid-training (uncatchable), and a stale .so built from
    older source would silently miss fixes — get_lib rebuilds on either
    mismatch."""
    import hashlib
    import platform
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    src_digest = ""
    try:
        with open(os.path.join(_NATIVE_DIR, "mimm_host.cpp"), "rb") as f:
            src_digest = hashlib.md5(f.read()).hexdigest()
    except OSError:
        pass
    return hashlib.md5(
        f"{platform.machine()}|{flags}|{src_digest}".encode()).hexdigest()


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "mimm_host.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(["g++", "-O3", "-march=native", "-fPIC", "-shared",
                        "-o", _LIB_PATH, src], check=True,
                       capture_output=True, timeout=120)
        with open(_MARKER_PATH, "w") as f:
            f.write(_host_isa_id())
        return True
    except Exception as e:  # no g++, sandboxed, etc. — fall back to numpy
        logger.warning("native build failed (%s); using numpy host ops", e)
        return False


def _needs_rebuild() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    try:
        with open(_MARKER_PATH) as f:
            return f.read().strip() != _host_isa_id()
    except OSError:
        return True  # no marker: unknown build host — don't risk SIGILL


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if _needs_rebuild() and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.warning("could not load %s: %s", _LIB_PATH, e)
            return None
        if not (hasattr(lib, "affine_crop_raw_u8")
                and hasattr(lib, "mimm_wp_create")):
            # Stale .so from before the raw-transfer/wordpiece symbols —
            # rebuild once.
            # NOTE: dlopen caches by path, so re-CDLL'ing the same file can
            # return the already-mapped old image; if the symbols are still
            # missing, fall back to the numpy path for this process (the
            # next process picks up the fresh build).
            if not _build():
                return None
            lib = ctypes.CDLL(_LIB_PATH)
            if not (hasattr(lib, "affine_crop_raw_u8")
                    and hasattr(lib, "mimm_wp_create")):
                logger.warning("rebuilt %s but this process still maps the "
                               "old image; using numpy host ops", _LIB_PATH)
                return None
        lib.affine_crop_norm_u8.argtypes = [_U8, _I64, _I64, _D, _I64, _I64, _I64, _F]
        lib.affine_crop_norm_u16.argtypes = [_U16, _I64, _I64, _D, _I64, _I64, _I64, _F]
        lib.center_crop_norm_u8.argtypes = [_U8, _I64, _I64, _I64, _I64, _I64, _F]
        lib.center_crop_norm_u16.argtypes = [_U16, _I64, _I64, _I64, _I64, _I64, _F]
        lib.affine_crop_raw_u8.argtypes = [_U8, _I64, _I64, _D, _I64, _I64, _I64, _U8]
        lib.affine_crop_raw_u16.argtypes = [_U16, _I64, _I64, _D, _I64, _I64, _I64, _U16]
        if hasattr(lib, "affine_crop_raw_u8_win"):
            lib.affine_crop_norm_u8_win.argtypes = \
                [_U8, _I64, _I64, _D, _I64, _I64, _I64, _I64, _I64, _F]
            lib.affine_crop_norm_u16_win.argtypes = \
                [_U16, _I64, _I64, _D, _I64, _I64, _I64, _I64, _I64, _F]
            lib.affine_crop_raw_u8_win.argtypes = \
                [_U8, _I64, _I64, _D, _I64, _I64, _I64, _I64, _I64, _U8]
            lib.affine_crop_raw_u16_win.argtypes = \
                [_U16, _I64, _I64, _D, _I64, _I64, _I64, _I64, _I64, _U16]
        lib.center_crop_raw_u8.argtypes = [_U8, _I64, _I64, _I64, _I64, _I64, _U8]
        lib.center_crop_raw_u16.argtypes = [_U16, _I64, _I64, _I64, _I64, _I64, _U16]
        lib.mimm_wp_create.restype = ctypes.c_void_p
        lib.mimm_wp_create.argtypes = [ctypes.c_char_p]
        lib.mimm_wp_destroy.argtypes = [ctypes.c_void_p]
        lib.mimm_wp_encode.restype = _I64
        lib.mimm_wp_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p, _I64,
                                       ctypes.c_int, _I32, _I64]
        _lib = lib
        return _lib


def affine_crop_norm(img: np.ndarray, matrix, top: int, left: int,
                     out_size: int) -> Optional[np.ndarray]:
    """Fused affine+crop+max-normalize; None if the native lib is absent.
    ``matrix``: the 6-tuple from transforms._inverse_affine_matrix."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img)
    if img.dtype == np.uint8:
        fn, ptr = lib.affine_crop_norm_u8, img.ctypes.data_as(_U8)
    elif img.dtype == np.uint16:
        fn, ptr = lib.affine_crop_norm_u16, img.ctypes.data_as(_U16)
    else:
        return None
    out = np.empty((out_size, out_size), np.float32)
    m = (ctypes.c_double * 6)(*matrix)
    fn(ptr, img.shape[0], img.shape[1], m, top, left, out_size,
       out.ctypes.data_as(_F))
    return out


def affine_crop_raw(img: np.ndarray, matrix, top: int, left: int,
                    out_size: int) -> Optional[np.ndarray]:
    """Affine+crop WITHOUT normalization, returning the source dtype
    (uint8/uint16) — the compact host->device transfer path (the jitted
    step performs the identical f32 cast + max-normalize on device,
    mimm_tpu/ops/image_norm.py)."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img)
    if img.dtype == np.uint8:
        fn, ptr_t = lib.affine_crop_raw_u8, _U8
    elif img.dtype == np.uint16:
        fn, ptr_t = lib.affine_crop_raw_u16, _U16
    else:
        return None
    out = np.empty((out_size, out_size), img.dtype)
    m = (ctypes.c_double * 6)(*matrix)
    fn(img.ctypes.data_as(ptr_t), img.shape[0], img.shape[1], m, top, left,
       out_size, out.ctypes.data_as(ptr_t))
    return out


def affine_crop_win(img: np.ndarray, matrix, top: int, left: int,
                    src_oy: int, src_ox: int, out_size: int,
                    raw: bool) -> Optional[np.ndarray]:
    """Windowed affine+crop (decoded-crop cache): ``img`` is a window cut
    from a larger source at origin (src_oy, src_ox); ``matrix``/``top``/
    ``left`` stay in full-image frame.  ``raw=False`` fuses the
    max-normalize.  None if the native lib (or the _win symbols) is
    absent."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "affine_crop_raw_u8_win"):
        return None
    img = np.ascontiguousarray(img)
    if img.dtype == np.uint8:
        fn = lib.affine_crop_raw_u8_win if raw else lib.affine_crop_norm_u8_win
        ptr_t = _U8
    elif img.dtype == np.uint16:
        fn = lib.affine_crop_raw_u16_win if raw \
            else lib.affine_crop_norm_u16_win
        ptr_t = _U16
    else:
        return None
    out = np.empty((out_size, out_size), img.dtype if raw else np.float32)
    m = (ctypes.c_double * 6)(*matrix)
    fn(img.ctypes.data_as(ptr_t), img.shape[0], img.shape[1], m, top, left,
       src_oy, src_ox, out_size,
       out.ctypes.data_as(ptr_t if raw else _F))
    return out


def center_crop_raw(img: np.ndarray, top: int, left: int,
                    out_size: int) -> Optional[np.ndarray]:
    """Center-crop without normalization (eval-path compact transfer)."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img)
    if img.dtype == np.uint8:
        fn, ptr_t = lib.center_crop_raw_u8, _U8
    elif img.dtype == np.uint16:
        fn, ptr_t = lib.center_crop_raw_u16, _U16
    else:
        return None
    out = np.empty((out_size, out_size), img.dtype)
    fn(img.ctypes.data_as(ptr_t), img.shape[0], img.shape[1], top, left,
       out_size, out.ctypes.data_as(ptr_t))
    return out


def center_crop_norm(img: np.ndarray, top: int, left: int,
                     out_size: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img)
    if img.dtype == np.uint8:
        fn, ptr = lib.center_crop_norm_u8, img.ctypes.data_as(_U8)
    elif img.dtype == np.uint16:
        fn, ptr = lib.center_crop_norm_u16, img.ctypes.data_as(_U16)
    else:
        return None
    out = np.empty((out_size, out_size), np.float32)
    fn(ptr, img.shape[0], img.shape[1], top, left, out_size,
       out.ctypes.data_as(_F))
    return out


def wp_create(vocab_path: str) -> Optional[int]:
    """Load ``vocab.txt`` into a native WordPiece handle; None if the
    native library is unavailable.  The handle is read-only after
    creation, so concurrent ``wp_encode`` calls from many threads are
    safe (and run GIL-free)."""
    lib = get_lib()
    if lib is None:
        return None
    return lib.mimm_wp_create(os.fsencode(vocab_path)) or None


def wp_destroy(handle: int) -> None:
    lib = get_lib()
    if lib is not None and handle:
        lib.mimm_wp_destroy(handle)


def wp_encode(handle: int, text: str, do_lower_case: bool = True
              ) -> Optional[list]:
    """Wordpiece ids for ``text`` (no [CLS]/[SEP]), or None when the text
    needs the pure-Python path (non-ASCII bytes — the native encoder only
    implements the ASCII subset of BERT basic tokenization exactly)."""
    lib = get_lib()
    if lib is None or not handle:
        return None
    data = text.encode("utf-8")
    buf = np.empty(len(data) + 8, np.int32)
    n = lib.mimm_wp_encode(handle, data, len(data), int(do_lower_case),
                           buf.ctypes.data_as(_I32), buf.shape[0])
    if n < 0:
        return None  # -1 non-ASCII; -2 cannot happen (ids <= input bytes)
    return buf[:n].tolist()
