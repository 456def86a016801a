"""Mask/RLE utilities (numpy implementation of the pycocotools C core).

The reference depends on pycocotools (C) for RLE encode/decode and mask IoU
(reference: ``mmdet/datasets/coco.py:5-10``, ``mmdet/apis/test.py:59-67``).
This module reimplements the COCO compressed-RLE string format and the
polygon rasterisation the eval pipeline needs.  A C++ drop-in
(``bonai_tpu/native``) accelerates the hot encode path when built.
"""

from __future__ import annotations

import numpy as np


def poly_to_mask(polys, h, w):
    """Rasterise a multi-part polygon (COCO 'segmentation' list of flat
    [x0,y0,x1,y1,...]) into an (h, w) uint8 mask."""
    import cv2
    mask = np.zeros((h, w), np.uint8)
    pts = []
    for p in polys:
        arr = np.asarray(p, np.float64).reshape(-1, 2)
        if arr.shape[0] >= 3:
            pts.append(np.round(arr).astype(np.int32))
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask


# ---------------------------------------------------------------------------
# COCO compressed RLE (the LEB128-like 6-bit char encoding of pycocotools)
# ---------------------------------------------------------------------------

def mask_to_rle_counts(mask):
    """Column-major run lengths starting with a zero-run (COCO order)."""
    try:
        from ..native import rle_encode_counts
        counts = rle_encode_counts(np.asarray(mask, np.uint8))
        if counts is not None:
            return counts
    except Exception:
        pass
    flat = np.asarray(mask, np.uint8).flatten(order="F")
    n = flat.size
    if n == 0:
        return [0]
    change = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    idx = np.concatenate([[0], change, [n]])
    counts = np.diff(idx).tolist()
    if flat[0] == 1:
        counts = [0] + counts
    return counts


def rle_counts_to_mask(counts, h, w):
    try:
        from ..native import rle_decode_counts
        out = rle_decode_counts(counts, h, w)
        if out is not None:
            return out
    except Exception:
        pass
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for c in counts:
        if val:
            flat[pos:pos + c] = 1
        pos += c
        val ^= 1
    return flat.reshape((h, w), order="F")


def counts_to_string(counts):
    """pycocotools rleToString: 6-bit varint with delta coding from the
    3rd element on."""
    s = bytearray()
    for i, cnt in enumerate(counts):
        x = int(cnt)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not ((x == 0 and not (c & 0x10)) or
                        (x == -1 and (c & 0x10)))
            if more:
                c |= 0x20
            s.append(c + 48)
    return s.decode("ascii")


def string_to_counts(s):
    if isinstance(s, str):
        s = s.encode("ascii")
    counts = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def encode_mask(mask):
    """(h, w) binary mask -> COCO compressed RLE dict."""
    h, w = mask.shape
    return {"size": [int(h), int(w)],
            "counts": counts_to_string(mask_to_rle_counts(mask))}


def decode_mask(rle):
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = string_to_counts(counts)
    return rle_counts_to_mask(counts, h, w)


def rle_area(rle):
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = string_to_counts(counts)
    return int(sum(counts[1::2]))


def mask_iou(rles_a, rles_b, iscrowd=None):
    """Pairwise mask IoU.  Fast path: native run-merge on RLE counts
    without decoding; fallback: dense numpy."""
    if iscrowd is None:
        try:
            from ..native import rle_iou_native
            ca = [string_to_counts(r["counts"])
                  if isinstance(r["counts"], (str, bytes)) else r["counts"]
                  for r in rles_a]
            cb = [string_to_counts(r["counts"])
                  if isinstance(r["counts"], (str, bytes)) else r["counts"]
                  for r in rles_b]
            out = np.zeros((len(ca), len(cb)), np.float64)
            ok = True
            for i, a_ in enumerate(ca):
                for j, b_ in enumerate(cb):
                    v = rle_iou_native(a_, b_)
                    if v is None:
                        ok = False
                        break
                    out[i, j] = v
                if not ok:
                    break
            if ok:
                return out
        except Exception:
            pass
    a = [decode_mask(r).astype(bool) for r in rles_a]
    b = [decode_mask(r).astype(bool) for r in rles_b]
    out = np.zeros((len(a), len(b)), np.float64)
    for i, ma in enumerate(a):
        for j, mb in enumerate(b):
            inter = np.logical_and(ma, mb).sum()
            if iscrowd is not None and iscrowd[j]:
                denom = ma.sum()
            else:
                denom = ma.sum() + mb.sum() - inter
            out[i, j] = inter / denom if denom > 0 else 0.0
    return out
