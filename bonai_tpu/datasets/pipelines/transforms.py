"""Host-side data pipeline (numpy/cv2).

reference: ``mmdet/datasets/pipelines/`` — loading (``loading.py:196-643``),
geometric transforms incl. offset-aware flip/rotate
(``transforms.py:458-466, 1836-2094``), formatting (``formating.py``).
The reference runs these in torch DataLoader worker processes; here they
run in host threads feeding device_put, producing numpy dicts.

Masks travel as *polygons* (lists of (K, 2) float arrays per instance part)
until the final pack stage, so geometric ops are exact and cheap.
"""

from __future__ import annotations

import math

import numpy as np

from ...registry import Registry, build_from_cfg

PIPELINES = Registry("pipeline")


def build_pipeline(cfgs):
    return Compose([build_from_cfg(c, PIPELINES) for c in cfgs])


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, results):
        for t in self.transforms:
            results = t(results)
            if results is None:
                return None
        return results


@PIPELINES.register_module()
class LoadImageFromFile:
    """reference: ``loading.py:12-78`` (loads BGR uint8).

    ``cache_dir``: optional decoded-image cache.  jpeg/png decode is the
    dominant host cost per 1024² tile (~10x the geometric transforms);
    with a cache the first epoch decodes and writes raw uint8 ``.npy``
    files, later epochs read them back at page-cache speed, so the
    loader keeps up with the device at far fewer host cores.
    """

    def __init__(self, to_float32=False, cache_dir=None):
        self.to_float32 = to_float32
        self.cache_dir = cache_dir
        if cache_dir:
            import os
            os.makedirs(cache_dir, exist_ok=True)

    def _read(self, path):
        import cv2
        if not self.cache_dir:
            return cv2.imread(path, cv2.IMREAD_COLOR)
        import hashlib
        import os.path as osp
        key = hashlib.sha1(path.encode()).hexdigest()[:24]
        cpath = osp.join(self.cache_dir, key + ".npy")
        if osp.exists(cpath):
            return np.load(cpath)
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is not None:
            import os
            tmp = cpath[:-4] + f".{os.getpid()}.tmp.npy"
            try:
                np.save(tmp, img)          # atomic publish via rename
                os.replace(tmp, cpath)
            except OSError:
                pass
        return img

    def __call__(self, results):
        import os.path as osp
        path = osp.join(results.get("img_prefix", ""),
                        results["img_info"]["filename"])
        img = self._read(path)
        if img is None:
            raise FileNotFoundError(path)
        if self.to_float32:
            img = img.astype(np.float32)
        results["filename"] = path
        results["img"] = img
        results["img_shape"] = img.shape[:2]
        results["ori_shape"] = img.shape[:2]
        results["scale_factor"] = 1.0
        return results


@PIPELINES.register_module()
class LoadAnnotations:
    """reference: ``loading.py:196-643`` incl. the offset flags
    (``_load_offsets`` ``:441-453``)."""

    # dense offset fields mark unsupervised pixels with these sentinel
    # component values (reference loading.py:564-575, transforms.py:508-537)
    OFFSET_FIELD_IGNORE = (400.0, 500.0)

    def __init__(self, with_bbox=True, with_label=True, with_mask=False,
                 with_offset=False, with_building_height=False,
                 with_angle=False, with_seg=False,
                 with_footprint_bbox=False,
                 with_only_footprint_flag=False,
                 with_edge=False, with_side_face=False,
                 with_offset_field=False, **kwargs):
        self.with_bbox = with_bbox
        self.with_label = with_label
        self.with_mask = with_mask
        self.with_offset = with_offset
        self.with_building_height = with_building_height
        self.with_angle = with_angle
        self.with_footprint_bbox = with_footprint_bbox
        self.with_only_footprint_flag = with_only_footprint_flag
        self.with_edge = with_edge
        self.with_side_face = with_side_face
        self.with_offset_field = with_offset_field

    @staticmethod
    def _polys(segmentation):
        # COCO 'segmentation' is either a polygon list or an RLE dict;
        # RLEs are decoded and contour-traced into polygons so the rest
        # of the pipeline stays polygon-based (exact geometric transforms)
        if isinstance(segmentation, dict):
            from ..mask_utils import decode_mask
            from ...evaluation.bonai_eval import masks_to_polygons
            return masks_to_polygons(decode_mask(segmentation))
        out = []
        for part in segmentation:
            if isinstance(part, dict):
                from ..mask_utils import decode_mask
                from ...evaluation.bonai_eval import masks_to_polygons
                out.extend(masks_to_polygons(decode_mask(part)))
                continue
            arr = np.asarray(part, np.float32).reshape(-1, 2)
            if arr.shape[0] >= 3:
                out.append(arr)
        return out

    def __call__(self, results):
        ann = results["ann_info"]
        if self.with_bbox:
            results["gt_bboxes"] = np.asarray(
                ann["bboxes"], np.float32).reshape(-1, 4)
        if self.with_label:
            results["gt_labels"] = np.asarray(
                ann["labels"], np.int64).reshape(-1)
        if self.with_mask:
            results["gt_masks"] = [self._polys(m) for m in ann["masks"]]
        if self.with_offset:
            results["gt_offsets"] = np.asarray(
                ann["offsets"], np.float32).reshape(-1, 2)
        if self.with_building_height:
            results["gt_building_heights"] = np.asarray(
                ann.get("building_heights", []), np.float32)
        if self.with_angle:
            results["gt_angle"] = np.float32(ann.get("angle", 0.0))
        if self.with_footprint_bbox:
            results["gt_footprint_bboxes"] = np.asarray(
                ann.get("footprint_bboxes", np.zeros((0, 4))),
                np.float32).reshape(-1, 4)
        if self.with_only_footprint_flag:
            results["gt_only_footprint_flag"] = np.float32(
                ann.get("only_footprint_flag", 0.0))
        if self.with_edge:
            self._load_aux_map(results, "edge")
        if self.with_side_face:
            self._load_aux_map(results, "side_face")
        if self.with_offset_field:
            self._load_offset_field(results)
        return results

    @staticmethod
    def _load_aux_map(results, kind):
        """Per-image edge / side-face supervision map (reference
        ``loading.py:500-551``).  Stored once per image as an (H, W)
        array — the reference duplicates it into a BitmapMasks per
        instance purely so mask transforms apply; a single map carries
        identical information and transforms in O(HW), not O(N*HW)."""
        import cv2
        import os.path as osp
        prefix = results.get(f"{kind}_prefix")
        if prefix is None:
            return
        path = osp.join(prefix, results["ann_info"][f"{kind}_map"])
        m = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if m is None:
            raise FileNotFoundError(path)
        key = f"gt_{kind}_maps"
        results[key] = np.squeeze(m)
        results.setdefault(f"{kind}_fields", []).append(key)

    def _load_offset_field(self, results):
        """Dense per-pixel (dx, dy) offset field from ``.npy`` with the
        400/500 ignore sentinels zeroed (reference ``loading.py:554-583``)."""
        import os.path as osp
        prefix = results.get("offset_field_prefix")
        if prefix is None:
            return
        path = osp.join(prefix, results["ann_info"]["offset_field"])
        field = np.load(path).astype(np.float32)
        for c in range(2):
            ignore = np.zeros(field.shape[:2], bool)
            for sentinel in self.OFFSET_FIELD_IGNORE:
                ignore |= field[..., c] == sentinel
            field[..., c][ignore] = 0.0
        results["gt_offset_field"] = field
        results.setdefault("offset_field_fields",
                           []).append("gt_offset_field")
        return results


@PIPELINES.register_module()
class LoadProposals:
    """Precomputed-proposal loader for Fast R-CNN training (reference
    ``loading.py:586-625``): trims ``results['proposals']`` (fed by the
    dataset's ``proposal_file``) to ``num_max_proposals`` and drops a
    score column; downstream Resize/Flip/Rotate transform the boxes
    alongside ``gt_bboxes``."""

    def __init__(self, num_max_proposals=None):
        self.num_max_proposals = num_max_proposals

    def __call__(self, results):
        props = np.asarray(results.get("proposals",
                                       np.zeros((0, 4))), np.float32)
        if props.ndim != 2 or props.shape[1] not in (4, 5):
            raise AssertionError(
                f"proposals should be (N, 4|5), got {props.shape}")
        props = props[:, :4]
        if self.num_max_proposals is not None:
            props = props[:self.num_max_proposals]
        results["proposals"] = props
        if self.num_max_proposals is not None:
            results["_num_max_proposals"] = int(self.num_max_proposals)
        return results


@PIPELINES.register_module()
class Resize:
    """Keep-ratio resize to fit ``img_scale`` (reference
    ``transforms.py:309-341``).  Instance offsets are deliberately NOT
    rescaled, matching the reference (tiles are fixed 1024², scale 1).

    Multi-scale training (reference ``random_select``/``random_sample``,
    ``transforms.py:100-170``): ``img_scale`` may be a list of scales with
    ``multiscale_mode='value'`` (pick one) or ``'range'`` (sample the long
    and short edges uniformly between the two given scales)."""

    def __init__(self, img_scale=None, keep_ratio=True,
                 multiscale_mode="range"):
        if img_scale and isinstance(img_scale[0], (list, tuple)):
            self.img_scales = [tuple(s) for s in img_scale]
            self.img_scale = self.img_scales[0]
        else:
            self.img_scales = None
            self.img_scale = tuple(img_scale) if img_scale else None
        self.keep_ratio = keep_ratio
        self.multiscale_mode = multiscale_mode

    def _sample_scale(self):
        if self.img_scales is None:
            return self.img_scale
        if self.multiscale_mode == "value" or len(self.img_scales) > 2:
            return self.img_scales[
                np.random.randint(len(self.img_scales))]
        (l0, s0), (l1, s1) = [(max(s), min(s)) for s in self.img_scales]
        long_edge = np.random.randint(min(l0, l1), max(l0, l1) + 1)
        short_edge = np.random.randint(min(s0, s1), max(s0, s1) + 1)
        return (long_edge, short_edge)

    def __call__(self, results):
        import cv2
        h, w = results["img"].shape[:2]
        target = results.get("scale", self._sample_scale())
        if target is None:
            return results
        max_long, max_short = max(target), min(target)
        if self.keep_ratio:
            scale = min(max_long / max(h, w), max_short / min(h, w))
            new_w, new_h = int(w * scale + 0.5), int(h * scale + 0.5)
        else:
            new_w, new_h = target
        if (new_h, new_w) != (h, w):
            results["img"] = cv2.resize(results["img"], (new_w, new_h),
                                        interpolation=cv2.INTER_LINEAR)
        w_scale = new_w / w
        h_scale = new_h / h
        results["img_shape"] = (new_h, new_w)
        results["scale_factor"] = np.array(
            [w_scale, h_scale, w_scale, h_scale], np.float32)
        for key in ("gt_bboxes", "gt_footprint_bboxes", "proposals"):
            if key in results and len(results[key]):
                b = results[key] * results["scale_factor"]
                b[:, 0::2] = b[:, 0::2].clip(0, new_w)
                b[:, 1::2] = b[:, 1::2].clip(0, new_h)
                results[key] = b
        if "gt_masks" in results:
            results["gt_masks"] = [
                [p * np.array([w_scale, h_scale], np.float32) for p in inst]
                for inst in results["gt_masks"]]
        # dense aux maps: nearest-neighbour resize (reference
        # transforms.py:272-290 _resize_offset_field; values — offsets in
        # px, edge/side-face classes — must not be interpolated)
        for group in ("edge_fields", "side_face_fields",
                      "offset_field_fields"):
            for key in results.get(group, []):
                results[key] = cv2.resize(
                    results[key], (new_w, new_h),
                    interpolation=cv2.INTER_NEAREST)
        return results


@PIPELINES.register_module()
class RandomFlip:
    """H/V flip with offset-vector flipping (reference
    ``transforms.py:430-537`` — ``offset_flip`` negates x for horizontal,
    y for vertical)."""

    def __init__(self, flip_ratio=0.5, direction="horizontal"):
        self.flip_ratio = flip_ratio
        self.direction = direction

    def __call__(self, results):
        rng = results.setdefault("_rng", np.random.RandomState())
        if "flip" not in results:
            # reference RandomFlip only samples when 'flip' is unset, so
            # MultiScaleFlipAug can pin flip=False at test time
            flip = rng.rand() < self.flip_ratio
            directions = (self.direction if isinstance(self.direction, list)
                          else [self.direction])
            direction = directions[rng.randint(len(directions))]
            results["flip"] = bool(flip)
            results["flip_direction"] = direction if flip else None
        flip = results["flip"]
        direction = results.get("flip_direction") or "horizontal"
        if not flip:
            return results
        h, w = results["img_shape"]
        if direction == "horizontal":
            results["img"] = results["img"][:, ::-1]
        else:
            results["img"] = results["img"][::-1]
        for key in ("gt_bboxes", "gt_footprint_bboxes", "proposals"):
            if key in results and len(results[key]):
                b = results[key].copy()
                if direction == "horizontal":
                    b[:, 0], b[:, 2] = results[key][:, 2] * -1 + w, \
                        results[key][:, 0] * -1 + w
                else:
                    b[:, 1], b[:, 3] = results[key][:, 3] * -1 + h, \
                        results[key][:, 1] * -1 + h
                results[key] = b
        if "gt_masks" in results:
            flipped = []
            for inst in results["gt_masks"]:
                parts = []
                for p in inst:
                    q = p.copy()
                    if direction == "horizontal":
                        q[:, 0] = w - q[:, 0]
                    else:
                        q[:, 1] = h - q[:, 1]
                    parts.append(q)
                flipped.append(parts)
            results["gt_masks"] = flipped
        if "gt_offsets" in results and len(results["gt_offsets"]):
            o = results["gt_offsets"].copy()
            if direction == "horizontal":
                o[:, 0] = -o[:, 0]
            else:
                o[:, 1] = -o[:, 1]
            results["gt_offsets"] = o
        axis = 1 if direction == "horizontal" else 0
        for key in results.get("edge_fields", []):
            results[key] = np.flip(results[key], axis=axis).copy()
        for key in results.get("side_face_fields", []):
            results[key] = np.flip(results[key], axis=axis).copy()
        for key in results.get("offset_field_fields", []):
            # flip the field spatially and negate the mirrored component;
            # sentinel-marked (400/500) pixels stay sentinels (reference
            # transforms.py:508-537 re-marks them as 500 after negation).
            # NOTE deliberate fix: the reference negates components but
            # never spatially flips the field array, leaving it misaligned
            # with the flipped image — every other per-pixel map there IS
            # flipped, so we flip too.
            field = np.flip(results[key], axis=axis).copy()
            comp = 0 if direction == "horizontal" else 1
            ignore = np.zeros(field.shape[:2], bool)
            for s in LoadAnnotations.OFFSET_FIELD_IGNORE:
                ignore |= field[..., comp] == s
            field[..., comp] = -field[..., comp]
            field[..., comp][ignore] = 500.0
            results[key] = field
        return results


@PIPELINES.register_module()
class RandomRotate:
    """Rotation of image/boxes/masks/offsets/dense maps (reference
    ``transforms.py:1836-2094``).

    Multiples of 90° take the exact lossless path (``np.rot90`` +
    integer coordinate remap).  Arbitrary angles follow the reference's
    method: image via warpAffine about the centre (``mmcv.imrotate``
    ``auto_bound=False``), boxes via the 4-corner transform + min/max
    AABB (``bbox_rotate``), polygon masks by transforming their points,
    offsets/offset-fields by adding the angle in polar form
    (``offset_rotate``/``offset_field_rotate``), edge/side-face maps by
    nearest-neighbour warp.  Unlike the reference we keep the box
    transform on the same fixed canvas as the image (the reference's
    ``bbox_rotate`` shifts corners onto an auto-bound canvas the image
    never gets, reference ``transforms.py:1995-1999``).

    ``angles="any"`` draws from 0..359° (reference ``choice`` str path).
    """

    def __init__(self, rotate_ratio=0.5, angles=(90, 180, 270)):
        self.rotate_ratio = rotate_ratio
        if isinstance(angles, str):
            self.angles = list(range(0, 360))
        else:
            self.angles = list(angles)

    @staticmethod
    def _rotate_points(xy, M):
        """Apply a 2x3 affine to (N, 2) points."""
        return xy @ M[:, :2].T + M[:, 2]

    def _rotate_general(self, results, angle):
        import cv2
        h, w = results["img_shape"][:2]
        cx, cy = (w - 1) * 0.5, (h - 1) * 0.5
        M = cv2.getRotationMatrix2D((cx, cy), angle, 1.0)
        results["img"] = cv2.warpAffine(results["img"], M, (w, h),
                                        flags=cv2.INTER_LINEAR)
        results["img_shape"] = results["img"].shape[:2]

        def rot_boxes(b):
            if not len(b):
                return b
            corners = np.stack([b[:, 0], b[:, 1], b[:, 2], b[:, 1],
                                b[:, 2], b[:, 3], b[:, 0], b[:, 3]],
                               -1).reshape(-1, 2)
            r = self._rotate_points(corners, M).reshape(-1, 4, 2)
            out = np.concatenate([r.min(1), r.max(1)],
                                 -1).astype(np.float32)
            out[:, 0::2] = out[:, 0::2].clip(0, w)
            out[:, 1::2] = out[:, 1::2].clip(0, h)
            return out

        for key in ("gt_bboxes", "gt_footprint_bboxes", "proposals"):
            if key in results:
                results[key] = rot_boxes(results[key])
        if "gt_masks" in results:
            results["gt_masks"] = [
                [self._rotate_points(p, M).astype(np.float32) for p in inst]
                for inst in results["gt_masks"]]
        a = math.radians(angle)
        c, s = math.cos(a), math.sin(a)
        if "gt_offsets" in results and len(results["gt_offsets"]):
            o = results["gt_offsets"]
            x, y = o[:, 0], o[:, 1]
            results["gt_offsets"] = np.stack(
                [x * c + y * s, -x * s + y * c], -1).astype(np.float32)
        for key in results.get("edge_fields", []) + \
                results.get("side_face_fields", []):
            results[key] = cv2.warpAffine(results[key], M, (w, h),
                                          flags=cv2.INTER_NEAREST)
        for key in results.get("offset_field_fields", []):
            f = cv2.warpAffine(results[key], M, (w, h),
                               flags=cv2.INTER_NEAREST)
            fx, fy = f[..., 0], f[..., 1]
            results[key] = np.stack(
                [fx * c + fy * s, -fx * s + fy * c], -1).astype(np.float32)
        return results

    def __call__(self, results):
        rng = results.setdefault("_rng", np.random.RandomState())
        if rng.rand() >= self.rotate_ratio:
            return results
        angle = self.angles[rng.randint(len(self.angles))]
        if angle % 90 != 0:
            return self._rotate_general(results, angle)
        k = (angle // 90) % 4
        if k == 0:
            return results
        h, w = results["img_shape"]
        results["img"] = np.ascontiguousarray(
            np.rot90(results["img"], k=k))
        results["img_shape"] = results["img"].shape[:2]

        # rotate point (x, y) by k*90° counterclockwise about image center
        def rotate_xy(x, y, hh, ww):
            for _ in range(k):
                x, y = y, ww - x
                hh, ww = ww, hh
            return x, y

        for key in ("gt_bboxes", "gt_footprint_bboxes", "proposals"):
            if key in results and len(results[key]):
                b = results[key]
                x1, y1 = rotate_xy(b[:, 0].copy(), b[:, 1].copy(), h, w)
                x2, y2 = rotate_xy(b[:, 2].copy(), b[:, 3].copy(), h, w)
                results[key] = np.stack(
                    [np.minimum(x1, x2), np.minimum(y1, y2),
                     np.maximum(x1, x2), np.maximum(y1, y2)], -1)
        if "gt_masks" in results:
            out = []
            for inst in results["gt_masks"]:
                parts = []
                for p in inst:
                    x, y = rotate_xy(p[:, 0].copy(), p[:, 1].copy(), h, w)
                    parts.append(np.stack([x, y], -1))
                out.append(parts)
            results["gt_masks"] = out
        if "gt_offsets" in results and len(results["gt_offsets"]):
            o = results["gt_offsets"]
            a = math.radians(angle)
            c, s = math.cos(a), math.sin(a)
            x, y = o[:, 0], o[:, 1]
            results["gt_offsets"] = np.stack(
                [x * c + y * s, -x * s + y * c], -1).astype(np.float32)
        for key in results.get("edge_fields", []) + \
                results.get("side_face_fields", []):
            results[key] = np.ascontiguousarray(np.rot90(results[key], k=k))
        for key in results.get("offset_field_fields", []):
            f = np.ascontiguousarray(np.rot90(results[key], k=k))
            a = math.radians(angle)
            c, s = math.cos(a), math.sin(a)
            fx, fy = f[..., 0], f[..., 1]
            results[key] = np.stack(
                [fx * c + fy * s, -fx * s + fy * c], -1).astype(np.float32)
        return results


@PIPELINES.register_module()
class RandomCrop:
    """Random crop with box/mask/offset consistency (reference:
    ``transforms.py`` RandomCrop; offsets are translation-invariant)."""

    def __init__(self, crop_size):
        self.crop_size = tuple(crop_size)   # (h, w)

    def __call__(self, results):
        rng = results.setdefault("_rng", np.random.RandomState())
        h, w = results["img_shape"][:2]
        ch, cw = min(self.crop_size[0], h), min(self.crop_size[1], w)
        y0 = rng.randint(0, h - ch + 1)
        x0 = rng.randint(0, w - cw + 1)
        results["img"] = results["img"][y0:y0 + ch, x0:x0 + cw]
        results["img_shape"] = (ch, cw)
        if "gt_bboxes" in results and len(results["gt_bboxes"]):
            b = results["gt_bboxes"] - np.array([x0, y0, x0, y0],
                                                np.float32)
            b[:, 0::2] = b[:, 0::2].clip(0, cw)
            b[:, 1::2] = b[:, 1::2].clip(0, ch)
            keep = ((b[:, 2] > b[:, 0]) & (b[:, 3] > b[:, 1]))
            results["gt_bboxes"] = b[keep]
            for key in ("gt_labels", "gt_offsets"):
                if key in results and len(results[key]):
                    results[key] = results[key][keep]
            if "gt_masks" in results:
                shift = np.array([x0, y0], np.float32)
                results["gt_masks"] = [
                    [p - shift for p in inst]
                    for inst, k in zip(results["gt_masks"], keep) if k]
            if not keep.any():
                return None    # triggers _rand_another retry upstream
        return results


@PIPELINES.register_module()
class Expand:
    """Paste the image onto a larger mean-filled canvas (reference:
    ``transforms.py`` Expand — SSD-style zoom-out)."""

    def __init__(self, mean=(0, 0, 0), ratio_range=(1, 4), prob=0.5):
        self.mean = tuple(mean)
        self.ratio_range = ratio_range
        self.prob = prob

    def __call__(self, results):
        rng = results.setdefault("_rng", np.random.RandomState())
        if rng.rand() >= self.prob:
            return results
        img = results["img"]
        h, w = img.shape[:2]
        ratio = rng.uniform(*self.ratio_range)
        eh, ew = int(h * ratio), int(w * ratio)
        top = rng.randint(0, eh - h + 1)
        left = rng.randint(0, ew - w + 1)
        canvas = np.empty((eh, ew, 3), img.dtype)
        canvas[...] = np.asarray(self.mean, img.dtype)
        canvas[top:top + h, left:left + w] = img
        results["img"] = canvas
        results["img_shape"] = (eh, ew)
        shift4 = np.array([left, top, left, top], np.float32)
        if "gt_bboxes" in results and len(results["gt_bboxes"]):
            results["gt_bboxes"] = results["gt_bboxes"] + shift4
        if "gt_masks" in results:
            shift = np.array([left, top], np.float32)
            results["gt_masks"] = [[p + shift for p in inst]
                                   for inst in results["gt_masks"]]
        return results


@PIPELINES.register_module()
class MinIoURandomCrop:
    """Crop keeping at least ``min_ious`` overlap with some GT boxes
    (reference: ``transforms.py`` MinIoURandomCrop — SSD-style zoom-in)."""

    def __init__(self, min_ious=(0.1, 0.3, 0.5, 0.7, 0.9), min_crop_size=0.3):
        self.min_ious = (1,) + tuple(min_ious) + (0,)
        self.min_crop_size = min_crop_size

    def __call__(self, results):
        rng = results.setdefault("_rng", np.random.RandomState())
        h, w = results["img_shape"][:2]
        boxes = results.get("gt_bboxes", np.zeros((0, 4), np.float32))
        for _ in range(50):
            min_iou = self.min_ious[rng.randint(len(self.min_ious))]
            if min_iou == 1:
                return results
            cw = int(rng.uniform(self.min_crop_size * w, w))
            ch = int(rng.uniform(self.min_crop_size * h, h))
            if ch / max(cw, 1) < 0.5 or ch / max(cw, 1) > 2:
                continue
            left = rng.randint(0, w - cw + 1)
            top = rng.randint(0, h - ch + 1)
            patch = np.array([left, top, left + cw, top + ch], np.float32)
            if len(boxes):
                lt = np.maximum(boxes[:, :2], patch[:2])
                rb = np.minimum(boxes[:, 2:], patch[2:])
                wh = np.clip(rb - lt, 0, None)
                inter = wh[:, 0] * wh[:, 1]
                area = ((boxes[:, 2] - boxes[:, 0])
                        * (boxes[:, 3] - boxes[:, 1]))
                iof = inter / np.maximum(area, 1e-6)
                if iof.max() < min_iou:
                    continue
                ctr = (boxes[:, :2] + boxes[:, 2:]) / 2
                keep = ((ctr[:, 0] > patch[0]) & (ctr[:, 0] < patch[2])
                        & (ctr[:, 1] > patch[1]) & (ctr[:, 1] < patch[3]))
                if not keep.any():
                    continue
            crop = RandomCrop((ch, cw))
            # deterministic placement via a pinned rng
            sub = dict(results)
            sub["_rng"] = _FixedCrop(left, top)
            out = crop(sub)
            if out is not None:
                out["_rng"] = rng
                return out
        return results


class _FixedCrop:
    """rng stub that pins RandomCrop's placement."""

    def __init__(self, x0, y0):
        self.vals = [y0, x0]

    def randint(self, lo, hi=None):
        return self.vals.pop(0) if self.vals else 0


@PIPELINES.register_module()
class SegRescale:
    """Rescale semantic segmentation maps (reference ``transforms.py``
    SegRescale — nearest-neighbour, used by HTC semantic branch)."""

    def __init__(self, scale_factor=1):
        self.scale_factor = scale_factor

    def __call__(self, results):
        if self.scale_factor != 1 and "gt_semantic_seg" in results:
            import cv2
            seg = results["gt_semantic_seg"]
            h, w = seg.shape[:2]
            results["gt_semantic_seg"] = cv2.resize(
                seg, (int(w * self.scale_factor + 0.5),
                      int(h * self.scale_factor + 0.5)),
                interpolation=cv2.INTER_NEAREST)
        return results


@PIPELINES.register_module()
class RandomCenterCropPad:
    """Random center crop with around-padding (reference
    ``transforms.py`` RandomCenterCropPad — CornerNet pipeline).

    Train: output shape = random ratio * crop_size, random center chosen
    away from image borders, mean-filled canvas, boxes filtered by
    center-in-patch.  Test: mean-filled canvas centered on the image with
    ``logical_or``/``size_divisor`` padded shape; records ``border``.
    Masks (polygons) translate with the boxes.
    """

    def __init__(self, crop_size=None, ratios=(0.9, 1.0, 1.1), border=128,
                 mean=(0, 0, 0), std=None, to_rgb=None, test_mode=False,
                 test_pad_mode=("logical_or", 127)):
        self.crop_size = crop_size
        self.ratios = ratios
        self.border = border
        self.mean = list(mean)[::-1] if to_rgb else list(mean)
        self.test_mode = test_mode
        self.test_pad_mode = test_pad_mode

    @staticmethod
    def _get_border(border, size):
        # shrink the border until the center range is non-empty
        # (reference ``_get_border``)
        k = 2 * border / size
        i = 2 ** (np.ceil(np.log2(np.ceil(k))) + (k == int(k)))
        return int(border // i)

    def _paste(self, img, cy, cx, th, tw):
        h, w = img.shape[:2]
        x0, x1 = max(0, cx - tw // 2), min(cx + tw // 2, w)
        y0, y1 = max(0, cy - th // 2), min(cy + th // 2, h)
        canvas = np.empty((th, tw, img.shape[2]), img.dtype)
        canvas[...] = np.asarray(self.mean, img.dtype)
        ccy, ccx = th // 2, tw // 2
        top, bottom = cy - y0, y1 - cy
        left, right = cx - x0, x1 - cx
        canvas[ccy - top:ccy + bottom, ccx - left:ccx + right] = \
            img[y0:y1, x0:x1]
        border = np.array([ccy - top, ccy + bottom, ccx - left,
                           ccx + right], np.float32)
        return canvas, border, (x0, y0, x1, y1), (ccx - left - x0,
                                                  ccy - top - y0)

    def __call__(self, results):
        img = results["img"]
        h, w = img.shape[:2]
        if self.test_mode:
            if self.test_pad_mode[0] == "logical_or":
                th = h | self.test_pad_mode[1]
                tw = w | self.test_pad_mode[1]
            else:
                d = self.test_pad_mode[1]
                th = int(np.ceil(h / d) * d)
                tw = int(np.ceil(w / d) * d)
            canvas, border, _, shift = self._paste(
                img, h // 2, w // 2, th, tw)
            results["img"] = canvas
            results["img_shape"] = (th, tw)
            results["border"] = border
            return results

        rng = results.setdefault("_rng", np.random.RandomState())
        boxes = results.get("gt_bboxes", np.zeros((0, 4), np.float32))
        for _ in range(50):
            scale = self.ratios[rng.randint(len(self.ratios))]
            th = int(self.crop_size[0] * scale)
            tw = int(self.crop_size[1] * scale)
            hb = self._get_border(self.border, h)
            wb = self._get_border(self.border, w)
            cx = rng.randint(wb, max(w - wb, wb + 1))
            cy = rng.randint(hb, max(h - hb, hb + 1))
            canvas, border, patch, shift = self._paste(img, cy, cx, th, tw)
            ctr = (boxes[:, :2] + boxes[:, 2:]) / 2
            keep = ((ctr[:, 0] > patch[0]) & (ctr[:, 1] > patch[1])
                    & (ctr[:, 0] < patch[2]) & (ctr[:, 1] < patch[3]))
            if len(boxes) and not keep.any():
                continue
            results["img"] = canvas
            results["img_shape"] = (th, tw)
            results["border"] = border
            sx, sy = shift
            if len(boxes):
                b = boxes[keep] + np.array([sx, sy, sx, sy], np.float32)
                b[:, 0::2] = b[:, 0::2].clip(0, tw)
                b[:, 1::2] = b[:, 1::2].clip(0, th)
                results["gt_bboxes"] = b
                for key in ("gt_labels", "gt_offsets"):
                    if key in results and len(results[key]):
                        results[key] = results[key][keep]
                if "gt_masks" in results:
                    mshift = np.array([sx, sy], np.float32)
                    results["gt_masks"] = [
                        [p + mshift for p in inst]
                        for inst, k in zip(results["gt_masks"], keep) if k]
            return results
        return results


@PIPELINES.register_module()
class PhotoMetricDistortion:
    """Brightness/contrast/saturation jitter (reference:
    ``transforms.py`` PhotoMetricDistortion, simplified HSV path)."""

    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=18):
        self.brightness_delta = brightness_delta
        self.contrast_range = contrast_range
        self.saturation_range = saturation_range
        self.hue_delta = hue_delta

    def __call__(self, results):
        import cv2
        rng = results.setdefault("_rng", np.random.RandomState())
        img = results["img"].astype(np.float32)
        if rng.randint(2):
            img += rng.uniform(-self.brightness_delta,
                               self.brightness_delta)
        if rng.randint(2):
            img *= rng.uniform(*self.contrast_range)
        hsv = cv2.cvtColor(img.clip(0, 255).astype(np.uint8),
                           cv2.COLOR_BGR2HSV).astype(np.float32)
        if rng.randint(2):
            hsv[..., 1] *= rng.uniform(*self.saturation_range)
        if rng.randint(2):
            hsv[..., 0] = (hsv[..., 0]
                           + rng.uniform(-self.hue_delta,
                                         self.hue_delta)) % 180
        img = cv2.cvtColor(hsv.clip(0, 255).astype(np.uint8),
                           cv2.COLOR_HSV2BGR).astype(np.float32)
        results["img"] = img
        return results


@PIPELINES.register_module()
class OffsetTransform:
    """Rectangle → polar offset conversion (reference:
    ``transforms.py:2098-2129``) for the polar-coder experiments."""

    def __init__(self, transform_flag="xy2la"):
        self.transform_flag = transform_flag

    def __call__(self, results):
        if "gt_offsets" not in results or not len(results["gt_offsets"]):
            return results
        o = results["gt_offsets"]
        if self.transform_flag == "xy2la":
            length = np.hypot(o[:, 0], o[:, 1])
            angle = np.arctan2(o[:, 1], o[:, 0])
            results["gt_offsets"] = np.stack([length, angle],
                                             -1).astype(np.float32)
        elif self.transform_flag == "la2xy":
            x = o[:, 0] * np.cos(o[:, 1])
            y = o[:, 0] * np.sin(o[:, 1])
            results["gt_offsets"] = np.stack([x, y], -1).astype(np.float32)
        else:
            raise ValueError(self.transform_flag)
        return results


@PIPELINES.register_module()
class Normalize:
    """reference: ``transforms.py:660-676`` (BGR→RGB then (x-mean)/std).

    ``device=True`` is the TPU-first mode: the host only performs the
    cheap uint8 channel flip and the float normalisation is fused into
    the compiled step on device (``engine/train_step.py``) — the image
    crosses the host→TPU tunnel as uint8, 4x fewer bytes.
    """

    def __init__(self, mean, std, to_rgb=True, device=False):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_rgb = to_rgb
        self.device = device

    def __call__(self, results):
        img = results["img"]
        if self.to_rgb:
            # materialise the channel flip BEFORE any float math: numpy
            # ufuncs on a negative-stride view run a strided scalar loop
            # (~8x slower on a 1024^2 tile and GIL-holding, which
            # serialised the whole prefetch pool)
            img = np.ascontiguousarray(img[..., ::-1])
        if not self.device:
            img = img.astype(np.float32)
            img -= self.mean
            img /= self.std
        results["img"] = img
        results["img_norm_cfg"] = dict(mean=self.mean, std=self.std,
                                       to_rgb=self.to_rgb,
                                       device=self.device)
        return results


@PIPELINES.register_module()
class Pad:
    """reference: ``transforms.py:617-631``."""

    def __init__(self, size=None, size_divisor=None, pad_val=0):
        self.size = size
        self.size_divisor = size_divisor
        self.pad_val = pad_val

    def __call__(self, results):
        img = results["img"]
        h, w = img.shape[:2]
        if self.size is not None:
            th, tw = self.size
        else:
            d = self.size_divisor
            th, tw = -(-h // d) * d, -(-w // d) * d
        if (th, tw) != (h, w):
            img = np.pad(img, ((0, th - h), (0, tw - w), (0, 0)),
                         constant_values=self.pad_val)
        results["img"] = img
        results["pad_shape"] = (th, tw)
        # pad dense aux maps to the same canvas (reference
        # transforms.py:605-616 _pad_offset_field / seg pad)
        for group in ("edge_fields", "side_face_fields",
                      "offset_field_fields"):
            for key in results.get(group, []):
                m = results[key]
                mh, mw = m.shape[:2]
                if (th, tw) != (mh, mw):
                    pad = [(0, th - mh), (0, tw - mw)]
                    pad += [(0, 0)] * (m.ndim - 2)
                    results[key] = np.pad(m, pad, constant_values=0)
        return results


@PIPELINES.register_module()
class DefaultFormatBundle:
    """No-op marker kept for config parity (tensorisation happens at the
    pack/collate stage; reference ``formating.py:174-261``)."""

    def __call__(self, results):
        return results


@PIPELINES.register_module()
class ImageToTensor:
    def __init__(self, keys=("img",)):
        self.keys = keys

    def __call__(self, results):
        return results


@PIPELINES.register_module()
class Collect:
    """reference: ``formating.py:309-331`` — select keys + meta."""

    DEFAULT_META = ("filename", "ori_shape", "img_shape", "pad_shape",
                    "scale_factor", "flip", "flip_direction")

    def __init__(self, keys, meta_keys=None):
        self.keys = list(keys)
        self.meta_keys = list(meta_keys or self.DEFAULT_META)

    def __call__(self, results):
        out = {}
        for k in self.keys:
            if k in results:
                out[k] = results[k]
            else:
                # reference Collect raises KeyError on a missing key; we
                # warn and drop so optional GT heads degrade loudly but
                # non-fatally (a None here would poison the packed batch)
                import warnings
                warnings.warn(
                    f"Collect: key '{k}' not produced by the pipeline "
                    "(check the LoadAnnotations with_* flags)")
        out["img_metas"] = {m: results.get(m) for m in self.meta_keys}
        # meta values stay top-level too (the pack stage reads img_shape,
        # scale_factor, flip directly)
        for m in self.meta_keys:
            out.setdefault(m, results.get(m))
        for k in ("gt_bboxes", "gt_labels", "gt_masks", "gt_offsets",
                  "gt_footprint_bboxes", "gt_only_footprint_flag",
                  "gt_building_heights", "gt_angle", "gt_edge_maps",
                  "gt_side_face_maps", "gt_offset_field"):
            if k in results and k not in out:
                out[k] = results[k]
        out["img"] = results["img"]
        return out


@PIPELINES.register_module()
class MultiScaleFlipAug:
    """TTA declaration wrapper (reference ``test_time_aug.py:9-119``).

    TPU-first split of responsibilities: the reference enumerates
    (scale x flip) views host-side, yielding one DataContainer per view;
    here the host pipeline runs ONCE at the base scale and the view
    enumeration happens on device inside the compiled TTA step
    (``apis/test.py:make_tta_step`` — flips are ``jnp.flip``, scales are
    ``jax.image.resize``, merge is batched NMS, all fused under one jit).
    This class therefore (a) pins the deterministic base view for the
    host pipeline and (b) exposes the declared views via
    :meth:`tta_cfg` for the CLIs' ``--aug-test``.
    """

    def __init__(self, transforms, img_scale=None, flip=False,
                 flip_direction="horizontal", scale_factors=None):
        self.transforms = build_pipeline(transforms)
        # multiple scales: keep the largest as the base host-side scale,
        # express the others as relative device-side factors
        scales = img_scale if isinstance(img_scale, (list, tuple)) and \
            img_scale and isinstance(img_scale[0], (list, tuple)) \
            else ([img_scale] if img_scale else [])
        self.img_scales = [tuple(s) for s in scales]
        self.img_scale = self.img_scales[0] if self.img_scales else None
        self.flip = flip
        self.flip_direction = (list(flip_direction)
                               if isinstance(flip_direction, (list, tuple))
                               else [flip_direction])
        self.scale_factors = scale_factors

    def tta_cfg(self):
        """Device-side view spec consumed by ``make_tta_step``."""
        if self.scale_factors is not None:
            factors = list(self.scale_factors)
        elif len(self.img_scales) > 1:
            base = max(s[0] * s[1] for s in self.img_scales) ** 0.5
            factors = sorted({round((s[0] * s[1]) ** 0.5 / base, 4)
                              for s in self.img_scales}, reverse=True)
        else:
            factors = [1.0]
        return dict(scales=factors, flip=self.flip,
                    flip_directions=self.flip_direction)

    def __call__(self, results):
        results["scale"] = tuple(self.img_scale) if self.img_scale else None
        # the base view is always unflipped; flip views are generated on
        # device (reference pins flip=False for the first view too)
        results["flip"] = False
        results["flip_direction"] = None
        return self.transforms(results)


@PIPELINES.register_module()
class Pointobb2RBBox:
    """Convert 4-point oriented boxes into regression encodings for the
    rotated-bbox experiments (reference ``transforms.py:1744-1833``):
    ``thetaobb`` -> (xc, yc, w, h, theta) via the minimum-area rect;
    ``hobb`` -> (x1, y1, x2, y2, h) with the canonical first point
    (closest roll to the axis-aligned reference corners);
    ``pointobb`` -> passthrough.
    Operates on every key in ``results['rbbox_fields']``.
    """

    def __init__(self, encoding_method="thetaobb"):
        assert encoding_method in ("thetaobb", "hobb", "pointobb")
        self.encoding_method = encoding_method

    @staticmethod
    def _best_point_sort(pointobb):
        xs, ys = pointobb[0::2], pointobb[1::2]
        ref = np.array([xs.min(), ys.min(), xs.max(), ys.min(),
                        xs.max(), ys.max(), xs.min(), ys.max()])
        rolls = [np.roll(pointobb, k) for k in (0, 2, 4, 6)]
        d = [np.sum((c - ref) ** 2) for c in rolls]
        return rolls[int(np.argmin(d))]

    def __call__(self, results):
        import cv2
        for key in results.get("rbbox_fields", []):
            rb = np.asarray(results[key], np.float32).reshape(-1, 8)
            if self.encoding_method == "thetaobb":
                out = []
                for p in rb:
                    rect = cv2.minAreaRect(
                        np.round(p).astype(np.int64).reshape(4, 2))
                    (x, y), (w, h), theta = rect
                    out.append([x, y, w, h, theta])
                results[key] = np.asarray(out, np.float32).reshape(-1, 5)
            elif self.encoding_method == "hobb":
                out = []
                for p in rb:
                    s = self._best_point_sort(p)
                    h = float(np.hypot(s[6] - s[0], s[7] - s[1]))
                    out.append([s[0], s[1], s[2], s[3], h])
                results[key] = np.asarray(out, np.float32).reshape(-1, 5)
        return results
