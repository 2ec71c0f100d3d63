import cv2
import numpy as np
import pytest

from patchrefinerv2_tpu.ops.blend import BlendState, TileBlender
from patchrefinerv2_tpu.ops.masks import generate_blend_mask


def _reference_generatemask(size, border=0.1):
    """Numpy+cv2 transliteration of the documented formula
    (estimator/models/utils.py:51-60)."""
    mask = np.zeros(size, dtype=np.float32)
    sigma = int(size[0] / 16)
    k_size = int(2 * np.ceil(2 * int(size[0] / 16)) + 1)
    mask[
        int(border * size[0]) : size[0] - int(border * size[0]),
        int(border * size[1]) : size[1] - int(border * size[1]),
    ] = 1
    mask = cv2.GaussianBlur(mask, (int(k_size), int(k_size)), sigma)
    mask = (mask - mask.min()) / (mask.max() - mask.min())
    return mask.astype(np.float32)


@pytest.mark.parametrize("size,border", [((384, 512), 0.15), ((96, 128), 0.1)])
def test_blend_mask_matches_cv2(size, border):
    ref = _reference_generatemask(size, border)
    got = generate_blend_mask(size, border)
    np.testing.assert_allclose(got, ref, atol=2e-6)


class _RunningAverageMapRef:
    """Numpy re-derivation of the reference accumulator algebra
    (estimator/models/utils.py:22-49)."""

    def __init__(self, average_map, count_map):
        self.count_map = count_map.copy()
        self.average_map_init = average_map.copy()
        self.average_map = average_map.copy()
        self.updated = False

    def update(self, pred_map, ct_map):
        self.updated = True
        m = ct_map > 0
        self.average_map[m] = (
            pred_map[m] * ct_map[m] + self.count_map[m] * self.average_map[m]
        ) / (self.count_map[m] + ct_map[m])
        self.count_map[m] += ct_map[m]

    def get(self):
        return self.average_map if self.updated else self.average_map_init


def _scatter_full(shape, patch, start):
    canvas = np.zeros(shape, np.float64)
    canvas[start[0] : start[0] + patch.shape[0], start[1] : start[1] + patch.shape[1]] = patch
    return canvas


def test_blender_matches_running_average_multi_pass():
    rng = np.random.RandomState(0)
    shape = (16, 24)
    ph, pw = 8, 12
    mask = rng.rand(ph, pw).astype(np.float64)
    mask[0, :] = 0.0  # emulate zeroed borders of the blur mask

    # init pass: non-overlapping 2x2 grid
    init_starts = [(0, 0), (0, 12), (8, 0), (8, 12)]
    init_preds = [rng.rand(ph, pw) for _ in init_starts]
    mosaic = np.zeros(shape, np.float64)
    count0 = np.zeros(shape, np.float64)
    for p, st in zip(init_preds, init_starts):
        mosaic[st[0] : st[0] + ph, st[1] : st[1] + pw] = p
        count0[st[0] : st[0] + ph, st[1] : st[1] + pw] = mask
    ref = _RunningAverageMapRef(mosaic, count0)

    # second pass: overlapping random patches, applied sequentially
    rand_starts = [(3, 5), (4, 6), (1, 11)]
    rand_preds = [rng.rand(ph, pw) for _ in rand_starts]
    for p, st in zip(rand_preds, rand_starts):
        ref.update(_scatter_full(shape, p * 1.0, st), _scatter_full(shape, mask, st))

    state = TileBlender.init(shape)
    state = TileBlender.add_pass(
        state,
        np.stack(init_preds).astype(np.float32),
        mask.astype(np.float32),
        np.array(init_starts, np.int32),
        init_pass=True,
    )
    state = TileBlender.add_pass(
        state,
        np.stack(rand_preds).astype(np.float32),
        mask.astype(np.float32),
        np.array(rand_starts, np.int32),
    )
    got = np.asarray(TileBlender.finalize(state))
    np.testing.assert_allclose(got, ref.get(), rtol=1e-5, atol=1e-6)


def test_blender_pure_m1_returns_mosaic():
    rng = np.random.RandomState(1)
    shape = (8, 8)
    mask = generate_blend_mask((4, 4), 0.15).astype(np.float32)
    preds = rng.rand(4, 4, 4).astype(np.float32)
    starts = np.array([(0, 0), (0, 4), (4, 0), (4, 4)], np.int32)
    state = TileBlender.init(shape)
    state = TileBlender.add_pass(state, preds, mask, starts, init_pass=True)
    got = np.asarray(TileBlender.finalize(state))
    mosaic = np.zeros(shape, np.float32)
    for p, st in zip(preds, starts):
        mosaic[st[0] : st[0] + 4, st[1] : st[1] + 4] = p
    np.testing.assert_allclose(got, mosaic, rtol=1e-6)
