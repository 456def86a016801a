"""Inference orchestration (reference: ``mmdet/apis/test.py:15-142``).

Device part runs batched ``simple_test``; host part converts padded device
outputs to the reference's per-image result tuples
``(bbox_results, segm_results, offset_results)`` with RLE-encoded masks
(reference: ``single_gpu_test`` result normalisation ``:53-74``).
"""

from __future__ import annotations

import numpy as np

from ..core.masks import paste_masks_np
from ..datasets import mask_utils


def results_to_host(device_out, metas, num_classes=1, mask_thr=0.5,
                    with_offset=True):
    """Convert one batch of padded device outputs to per-image results.

    Returns a list of tuples per image: (bbox_results, segm_results[,
    offset_results]) in the reference pkl layout — bbox_results is a
    per-class list of (n, 5) float32 arrays; segm_results per-class lists
    of RLE dicts; offsets an (n, 2) float32 array.
    """
    boxes = np.asarray(device_out["det_bboxes"], np.float32)
    scores = np.asarray(device_out["det_scores"], np.float32)
    labels = np.asarray(device_out["det_labels"], np.int32)
    valid = np.asarray(device_out["det_valid"], bool)
    masks = np.asarray(device_out.get("mask_probs")) \
        if "mask_probs" in device_out else None
    offsets = np.asarray(device_out.get("offsets")) \
        if "offsets" in device_out else None

    results = []
    b = boxes.shape[0]
    for i in range(b):
        meta = metas[i] if i < len(metas) else {}
        v = valid[i]
        bx = boxes[i][v]
        sc = scores[i][v]
        lb = labels[i][v]
        bbox_results = []
        segm_results = []
        ori_shape = meta.get("ori_shape") or (1024, 1024)
        oh, ow = int(ori_shape[0]), int(ori_shape[1])
        for c in range(num_classes):
            sel = lb == c
            bbox_results.append(
                np.concatenate([bx[sel], sc[sel, None]], axis=1)
                if sel.any() else np.zeros((0, 5), np.float32))
        if masks is not None:
            mp = masks[i][v]
            for c in range(num_classes):
                sel = lb == c
                rles = []
                if sel.any():
                    pasted = paste_masks_np(mp[sel], bx[sel], oh, ow,
                                            thr=mask_thr)
                    rles = [mask_utils.encode_mask(m) for m in pasted]
                segm_results.append(rles)
        out = [bbox_results]
        if masks is not None:
            out.append(segm_results)
        if with_offset and offsets is not None:
            out.append(offsets[i][v].astype(np.float32))
        results.append(tuple(out) if len(out) > 1 else bbox_results)
    return results


def run_inference(model, variables, loader, eval_step=None, max_images=None,
                  with_offset=True, progress=True):
    """Run the eval loop over a test loader; returns the flat result list
    ordered like the dataset (reference ``single_gpu_test``)."""
    import jax
    if eval_step is None:
        eval_step = jax.jit(lambda v, img, shp, sf: model.apply(
            v, img, shp, sf, method="simple_test"))
    results = []
    seen = 0
    for batch, metas in loader:
        out = eval_step(variables, batch["image"], batch["img_shape"],
                        batch["scale_factor"])
        out = jax.device_get(out)
        results.extend(results_to_host(out, metas, with_offset=with_offset))
        seen += batch["image"].shape[0]
        if progress:
            print(f"\r{seen} images", end="", flush=True)
        if max_images is not None and seen >= max_images:
            break
    if progress:
        print()
    return results
