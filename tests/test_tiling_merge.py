"""Merged shifted-pass stream == per-pass padded blending.

The r2 perf change (models/tiling.py merge_passes) concatenates the three
shifted regular passes' VALID patches into one stream and re-chunks it
exactly, instead of padding each pass to a multiple of process_num with
duplicate patches (the duplicates were masked at blend time but still ran
through the refiner). Blending is commutative scatter-add algebra
(ops/blend.py), so the merged stream must produce the identical canvases.
"""

import jax.numpy as jnp
import numpy as np

from patchrefinerv2_tpu.models.tiling import (
    TileCfg,
    merge_passes,
    regular_pass,
)
from patchrefinerv2_tpu.ops.blend import TileBlender


def _tile_cfg():
    return TileCfg(
        image_raw_shape=(2160, 3840),
        patch_split_num=(4, 4),
        patch_process_shape=(384, 512),
    )


SHIFT_OFFSETS = [(0, 1), (1, 0), (1, 1)]


def test_merge_passes_geometry():
    tc = _tile_cfg()
    passes = [regular_pass(tc, off, 16) for off in SHIFT_OFFSETS]
    assert [p.n_valid for p in passes] == [12, 12, 9]
    segments = merge_passes(passes, 16)
    # 33 valid -> 2x16 head + 8-slot remainder tail (granule 8): 40 slots
    assert [(p.starts_raw.shape[0], c) for p, c in segments] == [(32, 16), (8, 8)]
    assert sum(p.n_valid for p, _ in segments) == 33
    # every valid (start, bbox) of every pass appears exactly once
    seen = []
    for p, _ in segments:
        seen += [tuple(s) for s in p.starts_raw[: p.n_valid].tolist()]
    expect = []
    for p in passes:
        expect += [tuple(s) for s in p.starts_raw[: p.n_valid].tolist()]
    assert sorted(seen) == sorted(expect)
    merged_boxes = np.concatenate([p.bboxes[: p.n_valid] for p, _ in segments])
    np.testing.assert_allclose(
        np.sort(merged_boxes, axis=0),
        np.sort(np.concatenate([p.bboxes[: p.n_valid] for p in passes]), axis=0),
    )


def test_merge_passes_small_stream():
    # fewer valid patches than process_num -> single granule-rounded segment
    tc = TileCfg(
        image_raw_shape=(64, 96), patch_split_num=(2, 2), patch_process_shape=(16, 24)
    )
    passes = [regular_pass(tc, off, 4) for off in SHIFT_OFFSETS]
    assert [p.n_valid for p in passes] == [2, 2, 1]
    segments = merge_passes(passes, 4)
    assert sum(p.n_valid for p, _ in segments) == 5
    for p, c in segments:
        assert p.starts_raw.shape[0] % c == 0
        assert c <= 4


def _fake_pred(start, shape):
    """Deterministic per-patch prediction derived from the crop origin."""
    h, w = shape
    base = np.arange(h * w, dtype=np.float32).reshape(h, w) / (h * w)
    return base + 0.001 * start[0] + 0.007 * start[1]


def test_merged_stream_blend_matches_per_pass_padding():
    tc = TileCfg(
        image_raw_shape=(64, 96), patch_split_num=(4, 4), patch_process_shape=(16, 24)
    )
    process_num = 6
    mask = jnp.asarray(np.random.RandomState(0).rand(16, 24).astype(np.float32))
    reensemble = tc.patch_reensemble_shape

    passes = [regular_pass(tc, off, process_num) for off in SHIFT_OFFSETS]

    def run(blend_passes):
        state = TileBlender.init(reensemble)
        for starts_proc, valid in blend_passes:
            preds = jnp.stack(
                [jnp.asarray(_fake_pred(s, (16, 24))) for s in starts_proc]
            )
            state = TileBlender.add_pass(
                state,
                preds,
                mask,
                jnp.asarray(starts_proc, jnp.int32),
                init_pass=False,
                valid=jnp.asarray(valid, jnp.float32),
            )
        return np.asarray(TileBlender.finalize(state))

    # old behavior: each pass padded to a multiple of process_num
    padded = []
    for p in passes:
        n = p.starts_process.shape[0]
        valid = (np.arange(n) < p.n_valid).astype(np.float32)
        padded.append((p.starts_process, valid))

    merged_chunks = []
    for p, chunk in merge_passes(passes, process_num):
        n = p.starts_process.shape[0]
        valid = (np.arange(n) < p.n_valid).astype(np.float32)
        for i in range(0, n, chunk):
            merged_chunks.append(
                (p.starts_process[i : i + chunk], valid[i : i + chunk])
            )

    np.testing.assert_allclose(run(padded), run(merged_chunks), rtol=1e-6, atol=1e-6)


def test_merge_passes_mesh_granule():
    """granule=G (mesh 'data' size): every chunk divides by G so the merged
    stream stays active under the mesh instead of reverting to per-pass
    padding (VERDICT r2 #8)."""
    tc = _tile_cfg()
    passes = [regular_pass(tc, off, 16) for off in SHIFT_OFFSETS]
    segments = merge_passes(passes, 16, granule=8)
    # 33 valid -> 2x16 head + one lcm(8,8)=8-granule tail
    assert [(p.starts_raw.shape[0], c) for p, c in segments] == [(32, 16), (8, 8)]
    for p, c in segments:
        assert c % 8 == 0 and p.starts_raw.shape[0] % c == 0
    assert sum(p.n_valid for p, _ in segments) == 33
    # a granule that does NOT divide the remainder: tail rounds UP, never
    # reverts — e.g. data axis 16 -> the 1-patch remainder pads to 16
    segments = merge_passes(passes, 16, granule=16)
    assert [(p.starts_raw.shape[0], c) for p, c in segments] == [(32, 16), (16, 16)]
    # valid patches preserved exactly
    seen = []
    for p, _ in segments:
        seen += [tuple(s) for s in p.starts_raw[: p.n_valid].tolist()]
    expect = []
    for p in passes:
        expect += [tuple(s) for s in p.starts_raw[: p.n_valid].tolist()]
    assert sorted(seen) == sorted(expect)


def test_merge_all_passes_unified_stream_blend_equivalence():
    """The unified regular stream (ALL passes in one chunked scan with
    per-patch init flags) must produce the exact canvases of the per-pass
    blending it replaced. Integer-valued preds/masks keep f32 sums exact
    under reordering."""
    from patchrefinerv2_tpu.models.tiling import merge_all_passes

    tc = TileCfg(
        image_raw_shape=(64, 96), patch_split_num=(2, 2),
        patch_process_shape=(16, 24),
    )
    offsets = [(0, 0), (0, 1), (1, 0), (1, 1)]
    passes = [regular_pass(tc, off, 4) for off in offsets]
    shape = tc.patch_reensemble_shape
    mask = jnp.ones((16, 24), jnp.float32)

    def pred_for(starts):
        # deterministic integer pred per patch position
        return jnp.asarray(
            np.stack([
                np.full((16, 24), 1.0 + h // 8 + w // 12, np.float32)
                for h, w in starts
            ])
        )

    # path A: per-pass blending (init pass static, shifted passes after)
    st_a = TileBlender.init(shape)
    for pi, p in enumerate(passes):
        n = p.n_valid
        st_a = TileBlender.add_pass(
            st_a, pred_for(p.starts_process[:n]), mask,
            jnp.asarray(p.starts_process[:n]), init_pass=(pi == 0),
        )

    # path B: unified stream, chunked, per-patch init flags
    stream, initv = merge_all_passes(passes, chunk=8)
    n_pad = stream.starts_raw.shape[0]
    valid = (np.arange(n_pad) < stream.n_valid).astype(np.float32)
    st_b = TileBlender.init(shape)
    for lo in range(0, n_pad, 8):
        sl = slice(lo, lo + 8)
        st_b = TileBlender.add_pass(
            st_b, pred_for(stream.starts_process[sl]), mask,
            jnp.asarray(stream.starts_process[sl]),
            valid=jnp.asarray(valid[sl]), initv=jnp.asarray(initv[sl]),
        )

    np.testing.assert_array_equal(np.asarray(st_a.sum_wp), np.asarray(st_b.sum_wp))
    np.testing.assert_array_equal(np.asarray(st_a.sum_w), np.asarray(st_b.sum_w))
    np.testing.assert_array_equal(np.asarray(st_a.mosaic), np.asarray(st_b.mosaic))
    out_a = TileBlender.finalize(st_a)
    out_b = TileBlender.finalize(st_b)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
