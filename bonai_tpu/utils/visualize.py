"""Detection visualisation.

reference: ``mmdet/models/detectors/base.py:260-343`` (``show_result``)
and the LOFT offset overlay (``mmdet/models/detectors/loft.py:34-108``).
"""

from __future__ import annotations

import numpy as np


def show_result(img, result, class_names=("building",), score_thr=0.3,
                out_file=None, offset_color=(0, 0, 255),
                bbox_color=(0, 255, 0), mask_color=(255, 144, 30)):
    """Draw boxes / masks / roof→footprint offsets on a BGR image.

    ``result`` is the reference-style tuple (bbox_results[,
    segm_results[, offsets]]).
    Returns the drawn image (and writes ``out_file`` when given).
    """
    import cv2
    from ..datasets import mask_utils

    img = np.ascontiguousarray(img).copy()
    if isinstance(result, tuple):
        bbox_r = result[0]
        segm_r = result[1] if len(result) > 1 else None
        offsets = result[2] if len(result) > 2 else None
    else:
        bbox_r, segm_r, offsets = result, None, None

    flat_idx = 0
    for c, dets in enumerate(bbox_r):
        dets = np.asarray(dets, np.float32).reshape(-1, 5)
        for j, det in enumerate(dets):
            score = det[4]
            if score < score_thr:
                flat_idx += 1
                continue
            x1, y1, x2, y2 = det[:4].astype(int)
            cv2.rectangle(img, (x1, y1), (x2, y2), bbox_color, 2)
            label = class_names[c] if c < len(class_names) else str(c)
            cv2.putText(img, f"{label} {score:.2f}", (x1, max(y1 - 3, 0)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, bbox_color, 1)
            if segm_r is not None and j < len(segm_r[c]):
                mask = mask_utils.decode_mask(segm_r[c][j]).astype(bool)
                img[mask] = (0.5 * img[mask]
                             + 0.5 * np.array(mask_color)).astype(np.uint8)
            if offsets is not None and flat_idx < len(offsets):
                ox, oy = offsets[flat_idx]
                cx, cy = int((x1 + x2) / 2), int((y1 + y2) / 2)
                cv2.arrowedLine(img, (cx, cy),
                                (int(cx - ox), int(cy - oy)),
                                offset_color, 2)
            flat_idx += 1
    if out_file:
        cv2.imwrite(out_file, img)
    return img
