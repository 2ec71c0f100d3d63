"""Depth colorization for image dumps (estimator/utils/color.py equivalents).

colorize: matplotlib-cmap with percentile vmin/vmax (color.py:8-90), used by
the Tester for colored PNGs; save_raw_16bit writes the uint16 PNG (x256)
matching tester.py:87-106.
"""

from __future__ import annotations

import numpy as np


def colorize(
    value: np.ndarray,
    vmin=None,
    vmax=None,
    cmap="magma_r",
    invalid_val=-99,
    invalid_mask=None,
    background_color=(128, 128, 128, 255),
    gamma_corrected=False,
    value_transform=None,
    vminp=2,
    vmaxp=95,
) -> np.ndarray:
    """Reference color.py:95-158 semantics: percentile normalization with
    vminp/vmaxp (defaults 2/95; the Tester passes 0/100 for the full-range
    Spectral/magma dumps, tester.py:78-82)."""
    import matplotlib

    value = np.asarray(value, np.float32).squeeze()
    if invalid_mask is None:
        invalid_mask = value == invalid_val
    mask = np.logical_not(invalid_mask)

    vmin = np.percentile(value[mask], vminp) if vmin is None else vmin
    vmax = np.percentile(value[mask], vmaxp) if vmax is None else vmax
    if vmin != vmax:
        value = (value - vmin) / (vmax - vmin)
    else:
        value = value * 0.0
    value[invalid_mask] = np.nan
    cmapper = matplotlib.colormaps[cmap]
    if value_transform:
        value = value_transform(value)
    img = cmapper(value, bytes=True)  # (H, W, 4) uint8
    img[invalid_mask] = background_color
    if gamma_corrected:
        img = img / 255.0
        img = np.power(img, 2.2)
        img = (img * 255).astype(np.uint8)
    return img


def save_raw_16bit(depth: np.ndarray, path: str, scale: float = 256.0):
    import cv2

    depth = np.asarray(depth, np.float64).squeeze()
    out = (depth * scale).astype(np.uint16)
    cv2.imwrite(path, out)


def save_colored(depth: np.ndarray, path: str, cmap="Spectral_r", vmin=None,
                 vmax=None, vminp=0, vmaxp=100):
    """Tester-style colored dump: full-range percentiles like the
    reference's colorize(..., vminp=0, vmaxp=100) calls (tester.py:78-82)."""
    import cv2

    img = colorize(depth, vmin=vmin, vmax=vmax, cmap=cmap, vminp=vminp, vmaxp=vmaxp)
    cv2.imwrite(path, cv2.cvtColor(img[..., :3], cv2.COLOR_RGB2BGR))
