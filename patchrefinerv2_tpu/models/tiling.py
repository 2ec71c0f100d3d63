"""Static tile planning: the reference's tiling control flow as data.

Mirrors the geometry of estimator/models/baseline_pretrain.py:
* ``prepare_tile_cfg`` (:96-124): patch_raw_shape = raw // split,
  patch_reensemble_shape = process * split.
* ``regular_tile`` (:235-375): offset grid with stride = patch size; each
  pass yields raw-space crop starts, reensemble-canvas placement starts,
  and bboxes pre-normalized to the patch-process coordinate frame
  (:289-296) for roi_align.
* ``random_tile`` (:149-231): per call, ``process_num`` random h-starts
  crossed with ONE random w-start (:160-161 — a reference quirk we keep).

Everything here is host-side numpy computed at trace time; the arrays feed
a single jitted inference program with static shapes.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class TileCfg:
    image_raw_shape: tuple[int, int]
    patch_split_num: tuple[int, int]
    patch_process_shape: tuple[int, int]

    @property
    def patch_raw_shape(self) -> tuple[int, int]:
        return (
            self.image_raw_shape[0] // self.patch_split_num[0],
            self.image_raw_shape[1] // self.patch_split_num[1],
        )

    @property
    def patch_reensemble_shape(self) -> tuple[int, int]:
        return (
            self.patch_process_shape[0] * self.patch_split_num[0],
            self.patch_process_shape[1] * self.patch_split_num[1],
        )


@dataclass(frozen=True)
class RegularPass:
    """One regular tiling pass: static starts and pre-normalized bboxes."""

    starts_raw: np.ndarray  # (N, 2) int32 [h, w] crop origins in raw coords
    starts_process: np.ndarray  # (N, 2) int32 placement on reensemble canvas
    bboxes: np.ndarray  # (N, 4) float32 [x1,y1,x2,y2] in process coords
    n_valid: int  # patches before padding


def bbox_normalize_factor(tile_cfg: TileCfg) -> np.ndarray:
    """raw xyxy -> process xyxy (baseline_pretrain.py:289-296)."""
    rh, rw = tile_cfg.image_raw_shape
    ph, pw = tile_cfg.patch_process_shape
    return np.array([pw / rw, ph / rh, pw / rw, ph / rh], np.float32)


def regular_pass(
    tile_cfg: TileCfg, offset_frac: tuple[int, int], process_num: int
) -> RegularPass:
    """offset_frac in {0, 1}^2: 1 = half-patch offset (m2/rN shifted passes)."""
    prh, prw = tile_cfg.patch_raw_shape
    pph, ppw = tile_cfg.patch_process_shape
    irh, irw = tile_cfg.image_raw_shape
    reh, rew = tile_cfg.patch_reensemble_shape

    off_h = (prh // 2) * offset_frac[0]
    off_w = (prw // 2) * offset_frac[1]
    off_ph = (pph // 2) * offset_frac[0]
    off_pw = (ppw // 2) * offset_frac[1]

    n_h = (irh - off_h) // prh
    n_w = (irw - off_w) // prw
    starts_raw, starts_proc, bboxes = [], [], []
    factor = bbox_normalize_factor(tile_cfg)
    for i in range(n_h):
        for j in range(n_w):
            hs, ws = off_h + i * prh, off_w + j * prw
            starts_raw.append((hs, ws))
            starts_proc.append((off_ph + i * pph, off_pw + j * ppw))
            bboxes.append(np.array([ws, hs, ws + prw, hs + prh], np.float32) * factor)
    n_valid = len(starts_raw)
    # pad to a multiple of process_num with repeats (masked at blend time)
    pad = (-n_valid) % process_num
    for _ in range(pad):
        starts_raw.append(starts_raw[-1])
        starts_proc.append(starts_proc[-1])
        bboxes.append(bboxes[-1])
    return RegularPass(
        starts_raw=np.asarray(starts_raw, np.int32),
        starts_process=np.asarray(starts_proc, np.int32),
        bboxes=np.asarray(bboxes, np.float32),
        n_valid=n_valid,
    )


# Conv batch tiling granule on TPU: an 11- or 12-patch conv graph costs like
# the next multiple of 8 (measured: 3x11 merged chunks were SLOWER than 3x16
# padded passes, while process_num=8 runs scale proportionally).
_BATCH_GRANULE = 8


def _slice_pass(p: RegularPass, lo: int, hi: int, pad_to: int) -> RegularPass:
    """p[lo:hi], right-padded with repeats of the last entry to ``pad_to``."""
    sl = slice(lo, hi)
    starts_raw = p.starts_raw[sl]
    starts_proc = p.starts_process[sl]
    bboxes = p.bboxes[sl]
    pad = pad_to - starts_raw.shape[0]
    if pad:
        starts_raw = np.concatenate([starts_raw, np.repeat(starts_raw[-1:], pad, 0)])
        starts_proc = np.concatenate([starts_proc, np.repeat(starts_proc[-1:], pad, 0)])
        bboxes = np.concatenate([bboxes, np.repeat(bboxes[-1:], pad, 0)])
    return RegularPass(
        starts_raw=np.ascontiguousarray(starts_raw, np.int32),
        starts_process=np.ascontiguousarray(starts_proc, np.int32),
        bboxes=np.ascontiguousarray(bboxes, np.float32),
        n_valid=hi - lo,
    )


def merge_passes(
    passes: list[RegularPass], process_num: int, granule: int | None = None
) -> list[tuple[RegularPass, int]]:
    """Concatenate the VALID patches of several passes into one stream and
    re-chunk it as full process_num chunks plus one remainder chunk rounded
    up to the conv batch granule (e.g. the 33 shifted-pass patches at 4x4/16
    become 16+16+8 = 40 slots instead of 3x16 = 48).

    Valid because blending is commutative scatter-add algebra (ops/blend.py
    reduces the reference's sequential RunningAverageMap to sum(w*p)/sum(w));
    the reference's per-pass padding to process_num re-runs duplicate
    patches instead (~23% of r32's shifted-pass compute at 4x4/16).

    ``granule``: optional extra chunk divisor — under a mesh the tail chunk
    must also split across the 'data' axis, so callers pass the mesh data
    size and the tail rounds up to lcm(_BATCH_GRANULE, granule) (the pad
    patches are masked by the ``valid`` vector, same as granule padding).

    Returns [(pass, chunk_size), ...] segments for the infer loop.
    """
    stream = RegularPass(
        starts_raw=np.concatenate([p.starts_raw[: p.n_valid] for p in passes]),
        starts_process=np.concatenate([p.starts_process[: p.n_valid] for p in passes]),
        bboxes=np.concatenate([p.bboxes[: p.n_valid] for p in passes]),
        n_valid=sum(p.n_valid for p in passes),
    )
    n = stream.n_valid
    n_full = (n // process_num) * process_num
    rem = n - n_full
    segments: list[tuple[RegularPass, int]] = []
    if n_full:
        segments.append((_slice_pass(stream, 0, n_full, n_full), process_num))
    if rem:
        g = _BATCH_GRANULE
        if granule and granule > 1:
            g = g * granule // math.gcd(g, granule)
        tail_chunk = min(process_num, -(-rem // g) * g)
        pad_to = -(-rem // tail_chunk) * tail_chunk
        segments.append((_slice_pass(stream, n_full, n, pad_to), tail_chunk))
    return segments


def merge_all_passes(
    passes: list[RegularPass], chunk: int
) -> tuple[RegularPass, np.ndarray]:
    """Concatenate the valid patches of ALL regular passes — including the
    init (offset (0,0)) pass, which must come first — into ONE stream
    padded to a multiple of ``chunk``, with a per-patch init-flag vector.

    One stream means the whole regular phase runs as a single ``lax.scan``
    over one compiled chunk body (the r32 program previously carried FOUR
    structurally distinct refine executables: init-chunk, merged-chunk,
    remainder-chunk, random-chunk — a remote-compile-budget hazard and
    three executable transitions per frame). Valid because blending is
    commutative scatter-add algebra (ops/blend.py); the init semantics
    (mosaic write, reference models/utils.py:45-49) become per-patch via
    ``initv`` instead of per-pass.

    Returns (stream, initv): stream padded with repeats of the last entry
    (masked by n_valid at blend time), initv (n_padded,) f32 1.0 for
    init-pass patches.
    """
    stream = RegularPass(
        starts_raw=np.concatenate([p.starts_raw[: p.n_valid] for p in passes]),
        starts_process=np.concatenate(
            [p.starts_process[: p.n_valid] for p in passes]),
        bboxes=np.concatenate([p.bboxes[: p.n_valid] for p in passes]),
        n_valid=sum(p.n_valid for p in passes),
    )
    n = stream.n_valid
    pad_to = -(-n // chunk) * chunk
    initv = np.zeros(pad_to, np.float32)
    initv[: passes[0].n_valid] = 1.0
    return _slice_pass(stream, 0, n, pad_to), initv


def random_pass_starts(
    key: jax.Array, tile_cfg: TileCfg, process_num: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Traced random crop origins for one random_tile call.

    Returns (starts_raw (process_num, 2) int32, bboxes (process_num, 4) f32).
    Keeps the reference quirk of a single shared w-start per call
    (baseline_pretrain.py:160-161). randint upper bounds mirror python
    random.randint(0, dim - patch - 1) inclusive.
    """
    prh, prw = tile_cfg.patch_raw_shape
    irh, irw = tile_cfg.image_raw_shape
    kh, kw = jax.random.split(key)
    h_starts = jax.random.randint(kh, (process_num,), 0, irh - prh)
    w_start = jax.random.randint(kw, (1,), 0, irw - prw)
    w_starts = jnp.broadcast_to(w_start, (process_num,))
    starts = jnp.stack([h_starts, w_starts], axis=-1).astype(jnp.int32)
    factor = jnp.asarray(bbox_normalize_factor(tile_cfg))
    boxes = jnp.stack(
        [w_starts, h_starts, w_starts + prw, h_starts + prh], axis=-1
    ).astype(jnp.float32) * factor
    return starts, boxes


def crop_resize_patches(
    image_hr: jnp.ndarray,  # (H, W, 3) raw-resolution image
    starts: jnp.ndarray,  # (N, 2) int32 [h, w]
    patch_raw_shape: tuple[int, int],
    out_shape: tuple[int, int],
) -> jnp.ndarray:
    """Crop N raw patches and bilinear(ac=True)-resize to out_shape.

    The resize is expressed as two static interpolation matrices applied per
    patch (MXU work), matching the estimator resizer semantics
    (midas.py:171-174 hardcoded bilinear align_corners=True).
    """
    from patchrefinerv2_tpu.ops.resize import resize_matrix

    prh, prw = patch_raw_shape
    dtype = image_hr.dtype if image_hr.dtype == jnp.bfloat16 else jnp.float32
    wh = jnp.asarray(resize_matrix(prh, out_shape[0], "bilinear", True), dtype)
    ww = jnp.asarray(resize_matrix(prw, out_shape[1], "bilinear", True), dtype)
    kw = {"preferred_element_type": jnp.float32} if dtype == jnp.bfloat16 else {"precision": "highest"}

    # N static -> unrolled dynamic_slice per patch (a fast HBM copy each).
    # Do NOT vmap the slice: a vmapped dynamic_slice lowers to a gather over
    # the whole 4K image, which runs on the scalar units (~200ms/pass).
    patches = jnp.stack(
        [
            jax.lax.dynamic_slice(
                image_hr,
                (starts[i, 0], starts[i, 1], 0),
                (prh, prw, image_hr.shape[-1]),
            ).astype(dtype)
            for i in range(starts.shape[0])
        ]
    )
    p = jnp.einsum("oh,nhwc->nowc", wh, patches, **kw).astype(dtype)
    return jnp.einsum("pw,nowc->nopc", ww, p, **kw).astype(dtype)
