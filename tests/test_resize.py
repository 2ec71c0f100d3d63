import numpy as np
import pytest
import torch
import torch.nn.functional as F

from patchrefinerv2_tpu.ops.resize import resize_nchw_like_torch

CASES = [
    # (in_h, in_w, out_h, out_w, mode, align_corners)
    (7, 9, 14, 18, "bilinear", True),
    (7, 9, 14, 18, "bilinear", False),
    (16, 24, 5, 7, "bilinear", True),
    (16, 24, 5, 7, "bilinear", False),
    (12, 16, 384, 512, "bilinear", True),
    (33, 44, 17, 23, "bicubic", True),
    (33, 44, 17, 23, "bicubic", False),
    (10, 10, 23, 31, "bicubic", False),
    (9, 13, 27, 26, "nearest", None),
    (27, 26, 9, 13, "nearest", None),
    (8, 8, 8, 8, "bilinear", True),
]


@pytest.mark.parametrize("in_h,in_w,out_h,out_w,mode,ac", CASES)
def test_matches_torch_interpolate(in_h, in_w, out_h, out_w, mode, ac):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, in_h, in_w).astype(np.float32)
    kwargs = {} if ac is None else {"align_corners": ac}
    ref = F.interpolate(torch.from_numpy(x), size=(out_h, out_w), mode=mode, **kwargs)
    got = np.asarray(resize_nchw_like_torch(x, (out_h, out_w), mode, bool(ac)))
    np.testing.assert_allclose(got, ref.numpy(), rtol=2e-5, atol=2e-5)


def test_midas_resize_quirk_shape():
    # reference hard-codes bilinear to patch_process_shape (midas.py:171-174);
    # our resize is explicit so the quirk lives at the call site — just check
    # a straight 540x960 -> 384x512 bilinear matches torch.
    rng = np.random.RandomState(1)
    x = rng.rand(1, 3, 540, 960).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=(384, 512), mode="bilinear", align_corners=True)
    got = np.asarray(resize_nchw_like_torch(x, (384, 512), "bilinear", True))
    np.testing.assert_allclose(got, ref.numpy(), rtol=2e-5, atol=2e-5)
