"""ctypes bindings for the native maskops library (lazy g++ build).

Falls back gracefully (``lib() is None``) when no compiler is available;
``bonai_tpu.datasets.mask_utils`` uses these as fast paths.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess

import numpy as np

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, "maskops.cpp")
_SO = osp.join(_HERE, "libmaskops.so")
_lib = None
_tried = False


def build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not osp.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            build()
        L = ctypes.CDLL(_SO)
        L.rle_encode.restype = ctypes.c_int
        L.rle_encode.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_void_p]
        L.rle_decode.restype = None
        L.rle_decode.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_int, ctypes.c_void_p]
        L.paste_mask.restype = None
        L.paste_mask.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                 ctypes.c_float, ctypes.c_float,
                                 ctypes.c_float, ctypes.c_float,
                                 ctypes.c_float, ctypes.c_void_p,
                                 ctypes.c_int, ctypes.c_int]
        L.fill_poly.restype = None
        L.fill_poly.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        L.rle_iou.restype = ctypes.c_double
        L.rle_iou.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
                              ctypes.c_int]
        _lib = L
    except Exception:
        _lib = None
    return _lib


def rle_encode_counts(mask):
    L = lib()
    if L is None:
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    buf = np.empty(h * w + 2, np.int32)
    n = L.rle_encode(mask.ctypes.data, h, w, buf.ctypes.data)
    return buf[:n].tolist()


def rle_decode_counts(counts, h, w):
    L = lib()
    if L is None:
        return None
    c = np.ascontiguousarray(counts, np.int32)
    out = np.empty((h, w), np.uint8)
    L.rle_decode(c.ctypes.data, len(c), h, w, out.ctypes.data)
    return out


def paste_mask_native(prob, box, out, thr=0.5):
    L = lib()
    if L is None:
        return False
    prob = np.ascontiguousarray(prob, np.float32)
    s = prob.shape[0]
    h, w = out.shape
    L.paste_mask(prob.ctypes.data, s, float(box[0]), float(box[1]),
                 float(box[2]), float(box[3]), float(thr),
                 out.ctypes.data, h, w)
    return True


def rle_iou_native(counts_a, counts_b):
    L = lib()
    if L is None:
        return None
    a = np.ascontiguousarray(counts_a, np.int32)
    b = np.ascontiguousarray(counts_b, np.int32)
    return float(L.rle_iou(a.ctypes.data, len(a), b.ctypes.data, len(b)))
