"""COCO RLE codec — ctypes binding to the native rle.cc, numpy fallback.

The native library is compiled on first use (g++ -O3 -shared) and cached
next to the source. API mirrors what the reference uses from pycocotools
(`maskUtils.decode`, /root/reference/utils/sam_dataset.py:44), plus a
single-pass `id_map` that paints all masks of an SA-1B annotation into the
uint16 ControlNet condition directly.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "rle.cc")
_LIB_PATH = os.path.join(_HERE, "_librle.so")
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _lib_failed
    try:
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 _SRC, "-o", _LIB_PATH],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.rle_decode.restype = ctypes.c_int
        lib.rle_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.rle_id_map.restype = ctypes.c_int
        lib.rle_id_map.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16)]
        lib.rle_encode.restype = ctypes.c_int64
        lib.rle_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64]
        return lib
    except Exception:
        _lib_failed = True
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _lib_failed:
        _lib = _build()
    return _lib


# ---------------------------------------------------------------------------
# numpy reference implementation (fallback + cross-check in tests)
# ---------------------------------------------------------------------------

def _counts_from_string(s: str) -> List[int]:
    cnts: List[int] = []
    m, k = 0, 0
    while m < len(s):
        x, k, more = 0, 0, 1
        while more:
            c = ord(s[m]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = c & 0x20
            m += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(cnts) > 2:
            x += cnts[-2]
        cnts.append(x)
    return cnts


def _counts_to_string(cnts: Sequence[int]) -> str:
    out = []
    for i, x in enumerate(cnts):
        if i > 2:
            x -= cnts[i - 2]
        more = 1
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def decode_numpy(rle: Dict) -> np.ndarray:
    """{'size': [h, w], 'counts': str} -> (h, w) uint8, row-major."""
    h, w = rle["size"]
    counts = _counts_from_string(_as_str(rle["counts"]))
    flat = np.zeros(h * w, np.uint8)
    pos, val = 0, 0
    for run in counts:
        if val:
            flat[pos:pos + run] = 1
        pos += run
        val ^= 1
    return flat.reshape(w, h).T          # column-major layout


def encode_numpy(mask: np.ndarray) -> Dict:
    h, w = mask.shape
    flat = np.asfortranarray(mask.astype(bool)).T.reshape(-1)
    # run lengths starting with background
    changes = np.nonzero(np.diff(flat.astype(np.int8)))[0] + 1
    bounds = np.concatenate([[0], changes, [flat.size]])
    cnts = np.diff(bounds).tolist()
    if flat[0]:
        cnts = [0] + cnts
    return {"size": [h, w], "counts": _counts_to_string(cnts)}


def _as_str(counts) -> str:
    return counts.decode() if isinstance(counts, bytes) else counts


# ---------------------------------------------------------------------------
# public API (native with fallback)
# ---------------------------------------------------------------------------

def decode(rle: Dict) -> np.ndarray:
    """pycocotools-compatible decode -> (h, w) uint8."""
    lib = _get_lib()
    if lib is None:
        return decode_numpy(rle)
    h, w = rle["size"]
    out = np.zeros((h, w), np.uint8)
    rc = lib.rle_decode(
        _as_str(rle["counts"]).encode(), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise ValueError(f"bad RLE (code {rc})")
    return out


def encode(mask: np.ndarray) -> Dict:
    lib = _get_lib()
    if lib is None:
        return encode_numpy(mask)
    h, w = mask.shape
    m = np.ascontiguousarray(mask, np.uint8)
    cap = 6 * h * w + 16
    buf = ctypes.create_string_buffer(cap)
    n = lib.rle_encode(m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                       h, w, buf, cap)
    if n < 0:
        raise ValueError("RLE encode overflow")
    return {"size": [h, w], "counts": buf.value.decode()}


def id_map(rles: Sequence[Dict], h: int, w: int) -> np.ndarray:
    """Paint masks 1..N into one uint16 ID map in a single native pass
    (later masks overwrite earlier — show_anns painting order,
    /root/reference/editany_lora.py:433-440)."""
    lib = _get_lib()
    if lib is None:
        out = np.zeros((h, w), np.uint16)
        for i, r in enumerate(rles):
            out[decode_numpy(r) > 0] = i + 1
        return out
    strs = (ctypes.c_char_p * len(rles))(
        *[_as_str(r["counts"]).encode() for r in rles])
    out = np.zeros((h, w), np.uint16)
    rc = lib.rle_id_map(strs, len(rles), h, w,
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
    if rc != 0:
        raise ValueError(f"bad RLE (code {rc})")
    return out
