"""AutoAugment / Albu / InstaBoost pipeline adapters.

reference: ``mmdet/datasets/pipelines/auto_augment.py`` (AutoAugment),
``mmdet/datasets/pipelines/transforms.py:1211-1355`` (Albu adapter),
``mmdet/datasets/pipelines/instaboost.py`` (InstaBoost adapter).

AutoAugment is dependency-free (a random policy chooser over registered
transforms).  Albu and InstaBoost adapt external libraries; like the
reference they raise ImportError at construction when the library is
absent — configs that don't use them never import anything.
"""

from __future__ import annotations

import numpy as np

from .transforms import PIPELINES, Compose, build_pipeline


@PIPELINES.register_module()
class AutoAugment:
    """Randomly select one augmentation policy (a sub-pipeline) per sample
    (reference ``auto_augment.py:9-76``; policy search from
    arXiv 1906.11172)."""

    def __init__(self, policies):
        assert isinstance(policies, (list, tuple)) and len(policies) > 0, \
            "Policies must be a non-empty list."
        for policy in policies:
            assert isinstance(policy, (list, tuple)) and len(policy) > 0, \
                "Each policy must be a non-empty list of transform dicts."
            for aug in policy:
                assert isinstance(aug, dict) and "type" in aug
        self.policies = [list(p) for p in policies]
        self.sub_pipelines = [build_pipeline(p) for p in self.policies]

    def __call__(self, results):
        rng = results.setdefault("_rng", np.random.RandomState())
        idx = rng.randint(len(self.sub_pipelines))
        return self.sub_pipelines[idx](results)

    def __repr__(self):
        return f"AutoAugment(policies={self.policies})"


@PIPELINES.register_module()
class Albu:
    """Albumentations adapter (reference ``transforms.py:1211-1355``).

    Maps our polygon/array sample dict into albumentations' format
    (``keymap``), runs the composed transform, and maps back —
    filtering instances whose boxes were dropped.  Requires the
    ``albumentations`` package (not bundled); construction raises
    ImportError otherwise, exactly like the reference.
    """

    DEFAULT_KEYMAP = {"img": "image", "gt_bboxes": "bboxes",
                      "gt_labels": "labels"}

    def __init__(self, transforms, bbox_params=None, keymap=None,
                 update_pad_shape=False, skip_img_without_anno=False,
                 _compose_factory=None):
        self.transforms = transforms
        self.keymap_to = dict(keymap or self.DEFAULT_KEYMAP)
        self.keymap_back = {v: k for k, v in self.keymap_to.items()}
        self.update_pad_shape = update_pad_shape
        self.skip_img_without_anno = skip_img_without_anno
        factory = _compose_factory or self._albu_compose
        self.aug = factory(transforms, bbox_params)

    @staticmethod
    def _albu_compose(transforms, bbox_params):
        try:
            import albumentations
            from albumentations import Compose as ACompose
        except ImportError as e:    # pragma: no cover - env-dependent
            raise ImportError(
                "Albu transform requires the 'albumentations' package "
                "(not bundled in this image); install it or drop the "
                "Albu stage from the pipeline") from e

        def build(cfg):
            cfg = dict(cfg)
            cls = getattr(albumentations, cfg.pop("type"))
            if "transforms" in cfg:
                cfg["transforms"] = [build(t) for t in cfg["transforms"]]
            return cls(**cfg)

        bp = None
        if bbox_params is not None:
            bp = albumentations.BboxParams(
                **{k: v for k, v in dict(bbox_params).items()
                   if k != "type"})
        return ACompose([build(t) for t in transforms], bbox_params=bp)

    def __call__(self, results):
        data = {}
        for src, dst in self.keymap_to.items():
            if src in results:
                data[dst] = results[src]
        if "bboxes" in data:
            data["bboxes"] = [tuple(b) for b in
                              np.asarray(data["bboxes"],
                                         np.float32).reshape(-1, 4)]
        if "labels" in data:
            data["labels"] = np.asarray(data["labels"]).tolist()
        out = self.aug(**data)
        if "bboxes" in out:
            boxes = np.asarray(out["bboxes"], np.float32).reshape(-1, 4)
            results[self.keymap_back["bboxes"]] = boxes
            if self.skip_img_without_anno and len(boxes) == 0:
                return None       # retry-with-another upstream
        if "labels" in out:
            results[self.keymap_back["labels"]] = np.asarray(
                out["labels"], np.int64)
        results[self.keymap_back["image"]] = out["image"]
        results["img_shape"] = out["image"].shape[:2]
        if self.update_pad_shape:
            results["pad_shape"] = out["image"].shape[:2]
        return results

    def __repr__(self):
        return f"Albu(transforms={self.transforms})"


@PIPELINES.register_module()
class InstaBoost:
    """InstaBoost instance-paste augmentation adapter (reference
    ``instaboost.py``; arXiv 1908.07801).  Requires the external
    ``instaboostfast`` package — absent in this image, so construction
    raises ImportError with guidance, matching the reference's lazy-import
    failure mode."""

    def __init__(self, action_candidate=("normal", "horizontal", "skip"),
                 action_prob=(1, 0, 0), scale=(0.8, 1.2), dx=15, dy=15,
                 theta=(-1, 1), color_prob=0.5, hflag=False,
                 aug_ratio=0.5):
        try:
            import instaboostfast  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "InstaBoost requires the 'instaboostfast' package (not "
                "bundled in this image); install it or drop the "
                "InstaBoost stage from the pipeline") from e
        import instaboostfast
        self.cfg = instaboostfast.InstaBoostConfig(
            list(action_candidate), list(action_prob), scale, dx, dy,
            theta, color_prob, hflag)
        self.aug_ratio = aug_ratio

    def __call__(self, results):   # pragma: no cover - needs external dep
        import instaboostfast
        rng = results.setdefault("_rng", np.random.RandomState())
        if rng.rand() >= self.aug_ratio:
            return results
        anns = results.get("ann_info")
        img = results["img"]
        anns, img = instaboostfast.get_new_data(anns, img.astype(np.uint8),
                                                self.cfg, background=None)
        results["img"] = img
        results["ann_info"] = anns
        return results
