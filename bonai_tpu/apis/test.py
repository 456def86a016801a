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
    # Mask Scoring R-CNN: per-det mask scores rescore the segm entries
    # (reference mask_scoring_roi_head + segm2json score override)
    mask_scores = np.asarray(device_out.get("mask_scores"), np.float32) \
        if "mask_scores" in device_out else None
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
            ms_i = mask_scores[i][v] if mask_scores is not None else None
            per_class_scores = []
            for c in range(num_classes):
                sel = lb == c
                rles = []
                if sel.any():
                    pasted = paste_masks_np(mp[sel], bx[sel], oh, ow,
                                            thr=mask_thr)
                    rles = [mask_utils.encode_mask(m) for m in pasted]
                segm_results.append(rles)
                if ms_i is not None:
                    per_class_scores.append(ms_i[sel])
        out = [bbox_results]
        if masks is not None:
            out.append((segm_results, per_class_scores)
                       if mask_scores is not None else segm_results)
        if with_offset and offsets is not None:
            out.append(offsets[i][v].astype(np.float32))
        results.append(tuple(out) if len(out) > 1 else bbox_results)
    return results


def flip_device_result(out, img_shape, direction="horizontal"):
    """Flip padded device results back to original orientation
    (reference: ``mmdet/core/post_processing/merge_augs.py`` +
    ``RandomFlip.offset_flip`` semantics for the offset vectors)."""
    import jax.numpy as jnp
    from ..core.boxes import bbox_flip
    boxes = out["det_bboxes"]
    flipped = {k: v for k, v in out.items()}
    flipped["det_bboxes"] = jnp.stack(
        [bbox_flip(boxes[i], img_shape[i], direction)
         for i in range(boxes.shape[0])])
    if "mask_probs" in out:
        axis = 3 if direction == "horizontal" else 2
        flipped["mask_probs"] = jnp.flip(out["mask_probs"], axis=axis)
    if "offsets" in out:
        o = out["offsets"]
        if direction == "horizontal":
            flipped["offsets"] = o * jnp.asarray([-1.0, 1.0])
        else:
            flipped["offsets"] = o * jnp.asarray([1.0, -1.0])
    return flipped


def merge_flip_tta(orig, flipped_back, iou_thr=0.5, max_per_img=None):
    """Detection-level TTA merge: concatenate both views' detections and
    re-run NMS (aug_test analog; the reference merges at proposal level,
    which needs a second RCNN pass — det-level merge is the standard
    cheap TTA and is exact for flip symmetry)."""
    import jax
    import jax.numpy as jnp
    from ..core.nms import batched_nms
    out = {}
    n = orig["det_bboxes"].shape[1]
    max_per_img = max_per_img or n
    for k in orig:
        out[k] = jnp.concatenate([orig[k], flipped_back[k]], axis=1)

    def merge_one(boxes, scores, labels, valid):
        keep = batched_nms(boxes, scores, labels, iou_thr, valid=valid)
        s = jnp.where(keep, scores, 0.0)
        top, idx = jax.lax.top_k(s, max_per_img)
        return idx, top

    b = out["det_bboxes"].shape[0]
    idx, top = jax.vmap(merge_one)(out["det_bboxes"], out["det_scores"],
                                   out["det_labels"], out["det_valid"])
    gather = lambda v: jnp.take_along_axis(
        v, idx.reshape(idx.shape + (1,) * (v.ndim - 2)), axis=1)
    merged = {k: gather(v) for k, v in out.items()}
    merged["det_scores"] = top
    merged["det_valid"] = top > 0
    return merged


def tta_cfg_from_pipeline(dataset):
    """Extract the declared TTA views from a dataset whose test pipeline
    contains ``MultiScaleFlipAug``; falls back to h+v flip at base scale
    (the useful default for BONAI's fixed 1024² tiles)."""
    from ..datasets.pipelines.transforms import MultiScaleFlipAug
    datasets = getattr(dataset, "datasets", [dataset])
    for ds in datasets:
        pipeline = getattr(ds, "pipeline", None)
        for t in getattr(pipeline, "transforms", []):
            if isinstance(t, MultiScaleFlipAug):
                cfg = t.tta_cfg()
                if cfg["flip"] or len(cfg["scales"]) > 1:
                    return cfg
    return dict(scales=[1.0], flip=True,
                flip_directions=["horizontal", "vertical"])


def make_tta_step(model, scales=(1.0,), flip=False,
                  flip_directions=("horizontal",), iou_thr=0.5, jit=True):
    """Build a jitted multi-view (scale x flip) TTA inference step.

    TPU-first redesign of the reference TTA stack
    (``mmdet/datasets/pipelines/test_time_aug.py:9-119`` enumerate views
    host-side as DataContainers; ``mmdet/core/post_processing/
    merge_augs.py:8-117`` + ``two_stage.py:201-211`` merge): here the
    views are generated ON DEVICE inside one compiled step — flips are
    ``jnp.flip``, scales are ``jax.image.resize`` — so the host ships
    each image once and the whole enumerate/run/flip-back/NMS-merge
    graph fuses under jit.  Detections from every view land in the
    original frame (``simple_test`` divides by the view scale factor)
    and are merged det-level with batched NMS.

    NOTE: flip views mirror the whole padded canvas, so boxes are
    un-flipped about ``pad_w / scale_factor``; with padding present the
    flipped content would sit outside ``img_shape``'s clamp region —
    BONAI tiles are size-divisor aligned (1024/32) so the canvas equals
    the valid region.
    """
    import jax
    import jax.numpy as jnp

    def step(variables, image, img_shape, scale_factor):
        views = []
        pad_h = float(image.shape[1])
        pad_w = float(image.shape[2])
        for s in scales:
            if s == 1.0:
                img_s, shape_s, sf_s = image, img_shape, scale_factor
            else:
                nh = max(int(round(pad_h * s / 32)) * 32, 32)
                nw = max(int(round(pad_w * s / 32)) * 32, 32)
                img_s = jax.image.resize(
                    image, (image.shape[0], nh, nw, image.shape[3]),
                    method="bilinear")
                sy, sx = nh / pad_h, nw / pad_w
                shape_s = img_shape * jnp.asarray([sy, sx])
                sf_s = scale_factor * jnp.asarray((sx + sy) / 2.0)
            out = model.apply(variables, img_s, shape_s, sf_s,
                              method="simple_test")
            views.append(out)
            if flip:
                for direction in flip_directions:
                    axis = 2 if direction == "horizontal" else 1
                    out_f = model.apply(variables, jnp.flip(img_s, axis),
                                        shape_s, sf_s, method="simple_test")
                    # results are already in the original frame; un-flip
                    # about the padded canvas extent mapped to that frame
                    if direction == "horizontal":
                        frame = jnp.stack(
                            [jnp.zeros_like(sf_s) + pad_h,
                             pad_w / jnp.broadcast_to(
                                 jnp.asarray(sf_s), img_shape[:, 0].shape)],
                            axis=-1)
                    else:
                        frame = jnp.stack(
                            [pad_h / jnp.broadcast_to(
                                jnp.asarray(sf_s), img_shape[:, 0].shape),
                             jnp.zeros_like(sf_s) + pad_w], axis=-1)
                    views.append(flip_device_result(out_f, frame,
                                                    direction))
        merged = views[0]
        max_per_img = merged["det_bboxes"].shape[1]
        for v in views[1:]:
            merged = merge_flip_tta(merged, v, iou_thr=iou_thr,
                                    max_per_img=max_per_img)
        return merged

    return jax.jit(step) if jit else step


def run_inference(model, variables, loader, eval_step=None, max_images=None,
                  with_offset=True, progress=True, tta=None, mesh=None):
    """Run the eval loop over a test loader; returns the flat result list
    ordered like the dataset (reference ``single_gpu_test`` /
    ``multi_gpu_test``).

    ``tta``: optional dict(scales=[...], flip=bool, flip_directions=[...])
    enabling multi-view test-time augmentation (``aug_test`` analog).
    ``mesh``: optional ``jax.sharding.Mesh`` — the batch is sharded over
    its ``data`` axis and ``simple_test`` runs SPMD (multi-device eval;
    ``jax.device_get`` of the global outputs unshards in batch order).
    """
    import jax
    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(mesh, P("data"))
    if eval_step is None:
        if tta and tta.get("mode", "det") == "proposal":
            # reference-parity proposal-level merge
            # (TwoStageDetector.aug_test == merge_aug_proposals/_bboxes/
            # _masks); one jitted multi-view step
            scales = tuple(tta.get("scales", (1.0,)))
            dirs = (None,)
            if tta.get("flip", False):
                dirs = (None,) + tuple(tta.get("flip_directions",
                                               ("horizontal",)))
            fn = (lambda v, img, shp, sf: model.apply(
                v, img, shp, sf, scales=scales, flip_directions=dirs,
                method="aug_test"))
            eval_step = fn if mesh is not None else jax.jit(fn)
            if mesh is not None:
                from ..engine.train_step import shard_map
                from jax.sharding import PartitionSpec as P
                eval_step = jax.jit(shard_map(
                    eval_step, mesh=mesh,
                    in_specs=(P(), P("data"), P("data"), P("data")),
                    out_specs=P("data")))
        elif tta:
            eval_step = make_tta_step(
                model, scales=tuple(tta.get("scales", (1.0,))),
                flip=bool(tta.get("flip", False)),
                flip_directions=tuple(tta.get("flip_directions",
                                              ("horizontal",))),
                iou_thr=float(tta.get("iou_thr", 0.5)),
                jit=mesh is None)
            if mesh is not None:
                from ..engine.train_step import shard_map
                from jax.sharding import PartitionSpec as P
                eval_step = jax.jit(shard_map(
                    eval_step, mesh=mesh,
                    in_specs=(P(), P("data"), P("data"), P("data")),
                    out_specs=P("data")))
        elif mesh is not None:
            from ..engine.train_step import make_eval_step
            eval_step = make_eval_step(model, mesh=mesh)
        else:
            eval_step = jax.jit(lambda v, img, shp, sf: model.apply(
                v, img, shp, sf, method="simple_test"))
    results = []
    seen = 0
    for batch, metas in loader:
        img, shp, sf = (batch["image"], batch["img_shape"],
                        batch["scale_factor"])
        if sharding is not None:
            img, shp, sf = (jax.device_put(x, sharding)
                            for x in (img, shp, sf))
        out = eval_step(variables, img, shp, sf)
        out = jax.device_get(out)
        results.extend(results_to_host(out, metas, with_offset=with_offset))
        seen += batch["image"].shape[0]
        if progress:
            print(f"\r{seen} images", end="", flush=True)
        if max_images is not None and seen >= max_images:
            break
    if progress:
        print()
    # the loader wrap-pads the final batch; drop the duplicates (the
    # sharded case keeps its local padding — collect_results_shards
    # truncates after the cross-host interleave)
    if getattr(loader, "num_shards", 1) == 1:
        total = len(getattr(loader, "dataset", results))
        if max_images is not None:
            total = min(total, max_images)
        results = results[:total]
    return results
