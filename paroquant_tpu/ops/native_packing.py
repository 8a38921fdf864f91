"""ctypes bindings to the native packing library (native/paropack.cpp).

Lazy-builds libparopack.so with `make -C native` on first use; every entry
point falls back to the numpy implementation in ops/packing.py if the
toolchain or the build is unavailable, so the native path is a pure
accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger("paroquant_tpu.native")

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _load() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = _NATIVE_DIR / "libparopack.so"
    if not so.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True,
                capture_output=True, timeout=120,
            )
        except Exception as e:
            logger.info("native paropack build unavailable (%s); using numpy", e)
            return None
    try:
        lib = ctypes.CDLL(str(so))
        i64, p_i32, p_u8 = ctypes.c_int64, ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8)
        lib.pack_w4_tpu.argtypes = [p_i32, p_u8, i64, i64, i64]
        lib.unpack_w4_tpu.argtypes = [p_u8, p_i32, i64, i64, i64]
        lib.pack_awq.argtypes = [p_i32, p_i32, i64, i64]
        lib.unpack_awq.argtypes = [p_i32, p_i32, i64, i64]
        lib.lookup_draft.argtypes = [p_i32, i64, i64, i64, p_i32]
        lib.lookup_draft.restype = i64
        _LIB = lib
    except OSError as e:
        logger.info("could not load libparopack.so (%s); using numpy", e)
    return _LIB


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def pack_w4_tpu_native(q: np.ndarray, group_size: int = 128) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    q = np.ascontiguousarray(q, np.int32)
    I, O = q.shape
    out = np.empty((I // 2, O), np.uint8)
    lib.pack_w4_tpu(_i32p(q), _u8p(out), I, O, group_size)
    return out


def unpack_w4_tpu_native(packed: np.ndarray, group_size: int = 128) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed, np.uint8)
    Ih, O = packed.shape
    out = np.empty((Ih * 2, O), np.int32)
    lib.unpack_w4_tpu(_u8p(packed), _i32p(out), Ih * 2, O, group_size)
    return out


def pack_awq_native(vals: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    vals = np.ascontiguousarray(vals, np.int32)
    R, C = vals.shape
    out = np.empty((R, C // 8), np.int32)
    lib.pack_awq(_i32p(vals), _i32p(out), R, C)
    return out


def unpack_awq_native(packed: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed, np.int32)
    R, Cp = packed.shape
    out = np.empty((R, Cp * 8), np.int32)
    lib.unpack_awq(_i32p(packed), _i32p(out), R, Cp)
    return out


def native_lookup_draft(ctx: np.ndarray, max_ngram: int, k: int) -> list[int] | None:
    """C++ prompt-lookup drafting (native/paropack.cpp lookup_draft); None
    when the library is unavailable (caller falls back to the Python scan).
    ctx: int32 [len] token ids."""
    lib = _load()
    if lib is None:
        return None
    ctx = np.ascontiguousarray(ctx, np.int32)
    out = np.empty(k, np.int32)
    n = lib.lookup_draft(
        ctx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(ctx)), ctypes.c_int64(max_ngram),
        ctypes.c_int64(k),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out[:n].tolist()
