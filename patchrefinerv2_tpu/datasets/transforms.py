"""Host-side numpy augmentations (estimator/datasets/transformers/
augmentations.py equivalents). All operate on HWC float images in [0,1]
and HW depth maps; randomness uses python random (seeded by
fix_random_seed)."""

from __future__ import annotations

import random

import numpy as np


def aug_flip(image: np.ndarray, depths: list[np.ndarray]):
    if random.random() > 0.5:
        image = image[:, ::-1, :].copy()
        depths = [d[:, ::-1].copy() if d is not None else None for d in depths]
    return image, depths


def aug_color(image: np.ndarray, brightness_range=(0.9, 1.1)):
    if random.random() > 0.5:
        gamma = random.uniform(0.9, 1.1)
        out = image**gamma
        out = out * random.uniform(*brightness_range)
        colors = np.random.uniform(0.9, 1.1, size=3)
        out = out * colors[None, None, :]
        # keep the input dtype: the python-float factors otherwise promote
        # the whole image to float64 (2x host memory + transfer)
        image = np.clip(out, 0, 1).astype(image.dtype)
    return image


def aug_rotate(image: np.ndarray, depths: list[np.ndarray], degree: float):
    """PIL rotate: bilinear for image, nearest for depth (augmentations.py:43-75)."""
    from PIL import Image

    angle = (random.random() - 0.5) * 2 * degree
    img = Image.fromarray(image)
    img = img.rotate(angle, resample=Image.BILINEAR)
    image = np.asarray(img).copy()
    out_depths = []
    for d in depths:
        if d is None:
            out_depths.append(None)
            continue
        dd = Image.fromarray(d)
        dd = dd.rotate(angle, resample=Image.NEAREST)
        out_depths.append(np.asarray(dd).copy())
    return image, out_depths


def random_crop(image: np.ndarray, depths: list[np.ndarray], crop_size):
    h, w = image.shape[:2]
    hs = random.randint(0, h - crop_size[0])
    ws = random.randint(0, w - crop_size[1])
    image = image[hs : hs + crop_size[0], ws : ws + crop_size[1]].copy()
    depths = [
        d[hs : hs + crop_size[0], ws : ws + crop_size[1]].copy() if d is not None else None
        for d in depths
    ]
    return image, depths, (hs, ws)


def resize_hwc(image: np.ndarray, size, mode="bilinear", align_corners=True):
    """Torch-exact resize on host: native C++ fast path (bilinear ac=True,
    ~1000x the numpy fallback), shared interpolation matrices otherwise."""
    if mode == "bilinear" and align_corners and image.ndim == 3:
        from patchrefinerv2_tpu.datasets import native

        out = native.resize_bilinear_ac(np.ascontiguousarray(image, np.float32), tuple(size))
        if out is not None:
            return out
    from patchrefinerv2_tpu.ops.resize import resize_matrix

    wh = resize_matrix(image.shape[0], size[0], mode, align_corners)
    ww = resize_matrix(image.shape[1], size[1], mode, align_corners)
    out = np.einsum("oh,hwc->owc", wh, image.astype(np.float64))
    return np.einsum("pw,owc->opc", ww, out).astype(np.float32)
