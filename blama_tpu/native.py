"""ctypes bridge to the native C++ runtime library (native/blama_native.cpp).

Self-bootstrapping: compiles the library on first use (cached by source hash
under ~/.cache/blama_tpu), so no separate build step is required. All callers
fall back to the numpy implementations when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "blama_native.cpp")
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _build() -> str | None:
    src = os.path.abspath(_SRC)
    if not os.path.isfile(src):
        return None
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")), "blama_tpu"
    )
    os.makedirs(cache_dir, exist_ok=True)
    out = os.path.join(cache_dir, f"blama_native_{digest}.so")
    if os.path.exists(out):
        return out
    for cc in ("c++", "g++", "clang++"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-std=c++17", "-march=native",
                 "-pthread", src, "-o", out + ".tmp"],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(out + ".tmp", out)
            return out
        except (FileNotFoundError, subprocess.CalledProcessError, subprocess.TimeoutExpired):
            continue
    return None


def get_lib() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("BLAMA_NO_NATIVE"):
            return None
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        for name, args in (
            ("blama_dequant_q4k", [u8p, f32p, ctypes.c_int64]),
            ("blama_dequant_q5k", [u8p, f32p, ctypes.c_int64]),
            ("blama_dequant_q6k", [u8p, f32p, ctypes.c_int64]),
            ("blama_dequant_q8_0", [u8p, f32p, ctypes.c_int64]),
            ("blama_dequant_q2k", [u8p, f32p, ctypes.c_int64]),
            ("blama_dequant_q3k", [u8p, f32p, ctypes.c_int64]),
            ("blama_repack_q4k", [u8p, ctypes.c_int64, ctypes.c_int64,
                                  ctypes.c_int64, u8p, f32p, f32p]),
            ("blama_repack_q4k_native", [u8p, ctypes.c_int64, ctypes.c_int64,
                                         ctypes.c_int64, u8p,
                                         ctypes.POINTER(ctypes.c_int32),
                                         ctypes.POINTER(ctypes.c_int32)]),
        ):
            fn = getattr(lib, name, None)
            if fn is None:  # stale cached .so from before the symbol existed
                _LIB = None
                import logging

                logging.getLogger("blama_tpu.native").warning(
                    "native library missing %s; rebuild (make native) — "
                    "falling back to numpy paths", name)
                return None
            fn.argtypes = args
            fn.restype = None
        _LIB = lib
        return _LIB


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


_DEQUANT_FNS = {
    "Q4_K": ("blama_dequant_q4k", 144, 256),
    "Q5_K": ("blama_dequant_q5k", 176, 256),
    "Q6_K": ("blama_dequant_q6k", 210, 256),
    "Q8_0": ("blama_dequant_q8_0", 34, 32),
    "Q2_K": ("blama_dequant_q2k", 84, 256),
    "Q3_K": ("blama_dequant_q3k", 110, 256),
}


def native_dequantize(type_name: str, data: np.ndarray, n_elements: int) -> np.ndarray | None:
    """Threaded C++ dequant; None if unsupported/unavailable."""
    lib = get_lib()
    if lib is None or type_name not in _DEQUANT_FNS:
        return None
    fn_name, block_bytes, block_elems = _DEQUANT_FNS[type_name]
    n_blocks = n_elements // block_elems
    src = np.ascontiguousarray(np.frombuffer(data, dtype=np.uint8, count=n_blocks * block_bytes))
    out = np.empty(n_elements, np.float32)
    getattr(lib, fn_name)(_u8(src), _f32(out), n_blocks)
    return out


def native_repack_q4k(data: np.ndarray, n_rows: int, row_len: int):
    """Threaded C++ Q4_K→TPU-layout repack; None if unavailable.

    Returns (codes u8 [K/2, N_pad], scales f32 [K/32, N_pad],
    mins f32 [K/32, N_pad], n_pad)."""
    lib = get_lib()
    if lib is None:
        return None
    K, N = row_len, n_rows
    n_pad = -(-N // 256) * 256
    src = np.ascontiguousarray(np.frombuffer(data, dtype=np.uint8))
    codes = np.zeros((K // 2, n_pad), np.uint8)
    scales = np.zeros((K // 32, n_pad), np.float32)
    mins = np.zeros((K // 32, n_pad), np.float32)
    lib.blama_repack_q4k(_u8(src), N, K, n_pad, _u8(codes), _f32(scales), _f32(mins))
    return codes, scales, mins, n_pad


def native_repack_q4k_native(data: np.ndarray, n_rows: int, row_len: int):
    """Threaded C++ Q4_K→native-layout (4.5 b/w) repack; None if unavailable.

    Returns (codes u8 [K/2, N_pad], ddm i32 [K/256, N_pad],
    scmn i32 [3*K/256, N_pad], n_pad)."""
    lib = get_lib()
    if lib is None:
        return None
    K, N = row_len, n_rows
    n_pad = -(-N // 256) * 256
    src = np.ascontiguousarray(np.frombuffer(data, dtype=np.uint8))
    codes = np.zeros((K // 2, n_pad), np.uint8)
    ddm = np.zeros((K // 256, n_pad), np.int32)
    scmn = np.zeros((3 * K // 256, n_pad), np.int32)
    lib.blama_repack_q4k_native(
        _u8(src), N, K, n_pad, _u8(codes),
        ddm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        scmn.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return codes, ddm, scmn, n_pad
