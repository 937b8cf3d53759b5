"""ctypes binding to the native host codecs (csrc/rrs_core.cpp).

Builds on demand with g++ (no pip deps); every entry point has a NumPy
fallback so the framework works without a compiler. The native paths are the
load-time hot loops: GGUF block dequant, TCQ4 tile decode, and the TCQ4
quantizer (FWHT + scale search).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "csrc" / "rrs_core.cpp"
_LIB_PATH = Path(__file__).resolve().parent / "_rrs_core.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile csrc/rrs_core.cpp -> rrs_tpu/_rrs_core.so. Returns success."""
    if _LIB_PATH.exists() and not force:
        if _LIB_PATH.stat().st_mtime >= _SRC.stat().st_mtime:
            return True
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(_LIB_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # pragma: no cover
        print(f"rrs_core build failed: {e}", file=sys.stderr)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("RRS_TPU_NO_NATIVE"):
        return None
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
        if not build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    i64 = ctypes.c_int64
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i8p = ctypes.POINTER(ctypes.c_int8)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    lib.rrs_fwht_rows_f32.argtypes = [f32p, i64, i64]
    lib.rrs_tcq4_decode_tiles.argtypes = [u8p, i64, i64, u8p, f32p]
    lib.rrs_tcq4_quantize.argtypes = [f32p, i64, i64, u8p, i8p, u16p, f32p]
    lib.rrs_dequant_q8_0.argtypes = [u8p, f32p, i64]
    lib.rrs_dequant_q4_k.argtypes = [u8p, f32p, i64]
    lib.rrs_dequant_q6_k.argtypes = [u8p, f32p, i64]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ct)


def fwht_rows(x: np.ndarray) -> np.ndarray:
    """In-place normalized FWHT over the last axis (f32, contiguous)."""
    lib = _load()
    assert lib is not None
    assert x.dtype == np.float32 and x.flags.c_contiguous
    rows = int(np.prod(x.shape[:-1]))
    lib.rrs_fwht_rows_f32(
        _ptr(x, ctypes.POINTER(ctypes.c_float)), rows, x.shape[-1]
    )
    return x


def tcq4_decode_tiles(raw: np.ndarray, n_rows: int, k: int):
    """block_tcq4_tile bytes -> (qs [K/2, N] u8, eff [K/32, N] f32)."""
    lib = _load()
    assert lib is not None
    qs = np.zeros((k // 2, n_rows), np.uint8)
    eff = np.zeros((k // 32, n_rows), np.float32)
    raw = np.ascontiguousarray(raw)
    lib.rrs_tcq4_decode_tiles(
        _ptr(raw, ctypes.POINTER(ctypes.c_uint8)), n_rows, k,
        _ptr(qs, ctypes.POINTER(ctypes.c_uint8)),
        _ptr(eff, ctypes.POINTER(ctypes.c_float)),
    )
    return qs, eff


def tcq4_quantize(w: np.ndarray):
    """f32 [N, K] -> (qs [K/2, N] u8, sc [K/32, N] i8, S [K/256, N] fp16)."""
    lib = _load()
    assert lib is not None
    w = np.ascontiguousarray(w, np.float32)
    n, k = w.shape
    qs = np.zeros((k // 2, n), np.uint8)
    sc = np.zeros((k // 32, n), np.int8)
    S = np.zeros((k // 256, n), np.uint16)
    scratch = np.zeros((k,), np.float32)
    lib.rrs_tcq4_quantize(
        _ptr(w, ctypes.POINTER(ctypes.c_float)), n, k,
        _ptr(qs, ctypes.POINTER(ctypes.c_uint8)),
        _ptr(sc, ctypes.POINTER(ctypes.c_int8)),
        _ptr(S, ctypes.POINTER(ctypes.c_uint16)),
        _ptr(scratch, ctypes.POINTER(ctypes.c_float)),
    )
    return qs, sc, S.view(np.float16)


def dequant(raw: np.ndarray, kind: str, n: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    out = np.empty((n,), np.float32)
    raw = np.ascontiguousarray(raw)
    fn = {
        "q8_0": lib.rrs_dequant_q8_0,
        "q4_k": lib.rrs_dequant_q4_k,
        "q6_k": lib.rrs_dequant_q6_k,
    }[kind]
    fn(_ptr(raw, ctypes.POINTER(ctypes.c_uint8)),
       _ptr(out, ctypes.POINTER(ctypes.c_float)), n)
    return out


_bpe_handles: dict = {}


def bpe_session(vocab_tokens: list, merges: list) -> Optional[int]:
    """Build (or fetch) a native BPE session. Returns a handle or None."""
    lib = _load()
    if lib is None:
        return None
    key = id(vocab_tokens)
    if key in _bpe_handles:
        return _bpe_handles[key]

    def blob(strings):
        enc = [s.encode("utf-8") for s in strings]
        offs = np.zeros(len(enc) + 1, np.int64)
        np.cumsum([len(b) for b in enc], out=offs[1:])
        return b"".join(enc), offs

    vb, vo = blob(vocab_tokens)
    mb, mo = blob(merges or [])
    lib.rrs_bpe_init.restype = ctypes.c_int64
    h = lib.rrs_bpe_init(
        ctypes.c_char_p(vb), vo.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(vocab_tokens)),
        ctypes.c_char_p(mb), mo.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(merges or [])),
    )
    _bpe_handles[key] = int(h)
    return int(h)


def bpe_encode(handle: int, fragment: str) -> Optional[list]:
    """Encode one byte-encoded fragment; None -> caller falls back."""
    lib = _load()
    if lib is None:
        return None
    data = fragment.encode("utf-8")
    out = np.empty(len(data) + 8, np.int32)
    lib.rrs_bpe_encode.restype = ctypes.c_int64
    n = lib.rrs_bpe_encode(
        ctypes.c_int64(handle), ctypes.c_char_p(data),
        ctypes.c_int64(len(data)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(out.shape[0]),
    )
    if n < 0:
        return None
    return out[:n].tolist()
