"""Tile-plan geometry vs the reference formulas
(baseline_pretrain.py:96-124, 235-296; patchrefinerplus.py:499-511)."""

import numpy as np

from patchrefinerv2_tpu.models.tiling import TileCfg, regular_pass, random_pass_starts


def test_tile_cfg_shapes():
    tc = TileCfg((2160, 3840), (4, 4), (384, 512))
    assert tc.patch_raw_shape == (540, 960)
    assert tc.patch_reensemble_shape == (1536, 2048)


def test_regular_pass_m1_geometry():
    tc = TileCfg((2160, 3840), (4, 4), (384, 512))
    p = regular_pass(tc, (0, 0), 4)
    assert p.n_valid == 16
    # reference: h_start_list = [540*i], w_start_list = [960*j], row-major
    expected = [(540 * i, 960 * j) for i in range(4) for j in range(4)]
    assert [tuple(s) for s in p.starts_raw[:16]] == expected
    # process canvas placement at patch_process strides
    expected_p = [(384 * i, 512 * j) for i in range(4) for j in range(4)]
    assert [tuple(s) for s in p.starts_process[:16]] == expected_p
    # bbox normalization: raw xyxy * (512/3840, 384/2160)
    b0 = p.bboxes[1]
    np.testing.assert_allclose(
        b0, [960 * 512 / 3840, 0, 1920 * 512 / 3840, 540 * 384 / 2160], rtol=1e-6
    )


def test_regular_pass_shifted_counts():
    tc = TileCfg((2160, 3840), (4, 4), (384, 512))
    # half-offset passes: (2160-270)//540 = 3 rows or (3840-480)//960 = 3 cols
    p_w = regular_pass(tc, (0, 1), 4)
    assert p_w.n_valid == 4 * 3
    p_h = regular_pass(tc, (1, 0), 4)
    assert p_h.n_valid == 3 * 4
    p_hw = regular_pass(tc, (1, 1), 4)
    assert p_hw.n_valid == 3 * 3
    # padded to a process_num multiple
    assert p_hw.starts_raw.shape[0] % 4 == 0


def test_random_pass_bounds_and_shared_w():
    import jax

    tc = TileCfg((2160, 3840), (4, 4), (384, 512))
    starts, boxes = random_pass_starts(jax.random.PRNGKey(0), tc, 4)
    s = np.asarray(starts)
    assert s.shape == (4, 2)
    assert (s[:, 0] >= 0).all() and (s[:, 0] <= 2160 - 540 - 1).all()
    assert (s[:, 1] >= 0).all() and (s[:, 1] <= 3840 - 960 - 1).all()
    # reference quirk: one shared w-start per call (baseline_pretrain.py:160-161)
    assert len(set(s[:, 1].tolist())) == 1
    b = np.asarray(boxes)
    np.testing.assert_allclose(b[:, 2] - b[:, 0], 960 * 512 / 3840, rtol=1e-5)
