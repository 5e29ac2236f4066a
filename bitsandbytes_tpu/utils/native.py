"""ctypes loader for the native host-quantization library (csrc/).

TPU-native analog of the reference's native-library layer
(bitsandbytes/cextension.py + csrc/cpu_ops.cpp): the TPU compute path needs
no FFI (Pallas/XLA), but *host-side* checkpoint quantization is genuinely
CPU work — multi-GB weight conversion at model load — and runs here as an
OpenMP C++ library, compiled on first use with the system toolchain and
loaded via ctypes.  Everything degrades gracefully to the jnp tier if no
compiler is available (the reference's deferred-error philosophy,
cextension.py:171-331, minus the import-time failure modes)."""

from __future__ import annotations

import ctypes
import functools
import logging
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

from ..functional.codebooks import create_dynamic_map, get_4bit_code

logger = logging.getLogger(__name__)

__all__ = ["available", "quantize_4bit_host", "quantize_blockwise_host", "dequantize_4bit_host"]

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "host_quant.cpp")


@functools.lru_cache(maxsize=1)
def _lib() -> Optional[ctypes.CDLL]:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        logger.info("native host_quant.cpp not found; using jnp tier")
        return None
    cache = os.path.join(tempfile.gettempdir(), "bnb_tpu_native")
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, "libbnb_tpu_host.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        for flags in (["-fopenmp"], []):  # fall back to serial if no OpenMP
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", *flags, "-o", so, src]
            try:
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
                break
            except Exception as e:  # noqa: BLE001
                logger.info("native build failed (%s): %s", " ".join(flags), e)
        else:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError as e:
        logger.info("native library load failed: %s", e)
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.bnb_tpu_quantize_4bit_host.argtypes = [
        f32p, ctypes.c_int64, f32p, i32p, ctypes.c_int64, u8p, f32p,
    ]
    lib.bnb_tpu_quantize_blockwise_host.argtypes = [
        f32p, ctypes.c_int64, f32p, ctypes.c_int64, u8p, f32p,
    ]
    lib.bnb_tpu_dequantize_4bit_host.argtypes = [
        u8p, ctypes.c_int64, f32p, f32p, ctypes.c_int64, f32p,
    ]
    lib.bnb_tpu_num_threads.restype = ctypes.c_int
    return lib


def available() -> bool:
    return _lib() is not None


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def quantize_4bit_host(
    W: np.ndarray, blocksize: int = 64, quant_type: str = "nf4"
) -> Tuple[np.ndarray, np.ndarray]:
    """Quantize a float32 numpy weight on the host CPU (OpenMP).

    Returns ``(packed uint8 [n/2], absmax float32 [nblocks])`` —
    bit-identical to ``functional.quantize_4bit``.  Raises RuntimeError if
    the native library is unavailable.
    """
    lib = _lib()
    if lib is None:
        raise RuntimeError("native host quantizer unavailable (no compiler?)")
    x = np.ascontiguousarray(W, np.float32).reshape(-1)
    n = x.size
    if n % 2:
        raise ValueError("element count must be even")
    code = get_4bit_code(quant_type, blocksize)
    order = np.argsort(code, kind="stable").astype(np.int32)
    sorted_code = code[order]
    mids = ((sorted_code[:-1] + sorted_code[1:]) * 0.5).astype(np.float32)
    rank_to_bits = order  # rank -> bit pattern (identity for NF4)
    packed = np.empty(n // 2, np.uint8)
    absmax = np.empty((n + blocksize - 1) // blocksize, np.float32)
    lib.bnb_tpu_quantize_4bit_host(
        _f32p(x),
        n,
        _f32p(mids),
        rank_to_bits.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        blocksize,
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _f32p(absmax),
    )
    return packed, absmax


def quantize_blockwise_host(
    x: np.ndarray, blocksize: int = 256, code: Optional[np.ndarray] = None
) -> Tuple[np.ndarray, np.ndarray]:
    lib = _lib()
    if lib is None:
        raise RuntimeError("native host quantizer unavailable")
    if code is None:
        code = create_dynamic_map()
    xf = np.ascontiguousarray(x, np.float32).reshape(-1)
    mids = ((code[:-1] + code[1:]) * 0.5).astype(np.float32)
    q = np.empty(xf.size, np.uint8)
    absmax = np.empty((xf.size + blocksize - 1) // blocksize, np.float32)
    lib.bnb_tpu_quantize_blockwise_host(
        _f32p(xf), xf.size, _f32p(mids), blocksize,
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _f32p(absmax),
    )
    return q.reshape(np.shape(x)), absmax


def dequantize_4bit_host(
    packed: np.ndarray, absmax: np.ndarray, shape, blocksize: int = 64, quant_type: str = "nf4"
) -> np.ndarray:
    lib = _lib()
    if lib is None:
        raise RuntimeError("native host quantizer unavailable")
    n = int(np.prod(shape))
    code = np.ascontiguousarray(get_4bit_code(quant_type, blocksize), np.float32)
    out = np.empty(n, np.float32)
    p = np.ascontiguousarray(packed, np.uint8).reshape(-1)
    am = np.ascontiguousarray(absmax, np.float32)
    lib.bnb_tpu_dequantize_4bit_host(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, _f32p(code),
        _f32p(am), blocksize, _f32p(out),
    )
    return out.reshape(shape)
