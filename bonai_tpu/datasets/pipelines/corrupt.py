"""Native image corruptions for robustness evaluation.

reference: the ``Corrupt`` transform wraps the external imagecorruptions
package (``mmdet/datasets/pipelines/transforms.py``); that package is not
in this image, so the common corruption families are implemented in
numpy/cv2 with severity levels 1-5.
"""

from __future__ import annotations

import numpy as np

from .transforms import PIPELINES

_SEV = {
    "gaussian_noise": [8, 16, 24, 32, 48],
    "shot_noise": [60, 25, 12, 5, 3],
    "gaussian_blur": [1, 2, 3, 4, 6],
    "motion_blur": [3, 5, 9, 13, 17],
    "brightness": [0.1, 0.2, 0.3, 0.4, 0.5],
    "contrast": [0.75, 0.5, 0.4, 0.3, 0.15],
    "pixelate": [0.8, 0.65, 0.5, 0.35, 0.25],
    "jpeg_compression": [80, 60, 40, 25, 15],
}


def corrupt_image(img, corruption, severity=1, rng=None):
    """Apply a corruption to a uint8/float BGR image (severity 1..5)."""
    import cv2
    rng = rng or np.random.RandomState(0)
    sev = _SEV[corruption][min(max(severity, 1), 5) - 1]
    x = img.astype(np.float32)
    h, w = x.shape[:2]
    if corruption == "gaussian_noise":
        x = x + rng.randn(*x.shape) * sev
    elif corruption == "shot_noise":
        x = rng.poisson(np.clip(x, 0, 255) / 255.0 * sev) / sev * 255.0
    elif corruption == "gaussian_blur":
        k = int(sev) * 2 + 1
        x = cv2.GaussianBlur(x, (k, k), sev)
    elif corruption == "motion_blur":
        k = int(sev)
        kern = np.zeros((k, k), np.float32)
        kern[k // 2, :] = 1.0 / k
        x = cv2.filter2D(x, -1, kern)
    elif corruption == "brightness":
        x = x + 255.0 * sev
    elif corruption == "contrast":
        mean = x.mean(axis=(0, 1), keepdims=True)
        x = (x - mean) * sev + mean
    elif corruption == "pixelate":
        x = cv2.resize(x, (max(int(w * sev), 1), max(int(h * sev), 1)),
                       interpolation=cv2.INTER_LINEAR)
        x = cv2.resize(x, (w, h), interpolation=cv2.INTER_NEAREST)
    elif corruption == "jpeg_compression":
        ok, enc = cv2.imencode(".jpg", np.clip(img, 0, 255).astype(np.uint8),
                               [int(cv2.IMWRITE_JPEG_QUALITY), int(sev)])
        x = cv2.imdecode(enc, cv2.IMREAD_COLOR).astype(np.float32)
    else:
        raise KeyError(f"unknown corruption {corruption}; "
                       f"available: {sorted(_SEV)}")
    return np.clip(x, 0, 255).astype(img.dtype if img.dtype == np.uint8
                                     else np.float32)


@PIPELINES.register_module()
class Corrupt:
    """reference: ``transforms.py`` Corrupt."""

    def __init__(self, corruption, severity=1):
        self.corruption = corruption
        self.severity = severity

    def __call__(self, results):
        rng = results.get("_rng") or np.random.RandomState(0)
        results["img"] = corrupt_image(results["img"], self.corruption,
                                       self.severity, rng)
        return results
