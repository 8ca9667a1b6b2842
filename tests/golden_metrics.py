"""Structural image metrics for reference-golden parity.

The reference screenshots (/root/reference/images/screenshot_*.png) are
retina macOS window captures with a display-profile transfer applied
(midtones read ~0.5x of the renderer's sRGB output), a 56px title bar, a
live mouse-hover camera, and a legacy (pre-SceneVM-refactor) pipeline. Exact
texel comparison is therefore meaningless; what IS comparable (SURVEY §4,
VERDICT r1 missing #1): edge positions / silhouettes, hue relations (which
survive monotone channel transforms), and scene structure per region.
"""

from __future__ import annotations

import numpy as np

CONTENT_TOP = 56  # retina title-bar height in the reference captures


def load_rgb(path: str, crop_chrome: bool = False) -> np.ndarray:
    from PIL import Image

    im = np.asarray(Image.open(path).convert("RGB")).astype(np.float32)
    return im[CONTENT_TOP:] if crop_chrome else im


def object_bbox(img: np.ndarray):
    """Fractional (x0, x1, y0, y1) of the largest foreground component.

    Background is estimated per row from the right margin (the gradient is
    vertical); the 2D logo overlay region (top-left) and a 3% border (window
    corners / capture artifacts) are excluded; dither noise is opened away
    and the object unified by dilation before taking the largest component.
    """
    import scipy.ndimage as ndi

    h, w = img.shape[:2]
    mx, my = int(w * 0.03), int(h * 0.03)
    inner = img[my : h - my, mx : w - mx]
    ih, iw = inner.shape[:2]
    bg = np.median(inner[:, int(iw * 0.90) : int(iw * 0.98)], axis=1, keepdims=True)
    mask = np.abs(inner - bg).max(axis=-1) > 30
    mask[: int(ih * 0.40), : int(iw * 0.30)] = False
    mask = ndi.binary_opening(mask, np.ones((3, 3)))
    mask = ndi.binary_dilation(mask, np.ones((5, 5)), iterations=3)
    lab, n = ndi.label(mask)
    if n == 0:
        return None
    sizes = np.bincount(lab.reshape(-1))[1:]
    ys, xs = np.nonzero(lab == (int(np.argmax(sizes)) + 1))
    return (
        (xs.min() + mx) / w,
        (xs.max() + mx) / w,
        (ys.min() + my) / h,
        (ys.max() + my) / h,
    )


def gradient_monotonic_share(img: np.ndarray) -> float:
    """Share of non-decreasing steps down the right-margin background column
    (the VGrayGradient grows downward; survives any monotone transfer)."""
    h, w = img.shape[:2]
    col = img[int(h * 0.05) : int(h * 0.95), int(w * 0.93) : int(w * 0.98)].mean(
        axis=(1, 2)
    )
    d = np.diff(col[::16])
    return float((d >= -1.0).mean())


def region_mean(img: np.ndarray, x0, x1, y0, y1) -> np.ndarray:
    h, w = img.shape[:2]
    return img[int(h * y0) : int(h * y1), int(w * x0) : int(w * x1)].mean(axis=(0, 1))


def sky_share(img: np.ndarray) -> float:
    """Fraction of the upper 60% of the center band whose rows read warm
    (r - b > 15): the sky texture region in the map scene."""
    h, w = img.shape[:2]
    band = img[: int(h * 0.6), int(w * 0.45) : int(w * 0.55)]
    warm = (band[..., 0] - band[..., 2] > 15).mean(axis=1) > 0.5
    return float(warm.mean())


MAP_REGIONS = {
    "sky": (0.35, 0.65, 0.02, 0.12),
    "floor": (0.35, 0.65, 0.82, 0.97),
    "brick_wall": (0.02, 0.12, 0.50, 0.58),
    "fence_wall": (0.60, 0.80, 0.42, 0.50),
}
