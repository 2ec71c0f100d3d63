"""BaselinePretrain: single-branch coarse/fine pre-training model + tiled
inference for the fine branch (estimator/models/baseline_pretrain.py:45-464).

target='coarse': train the coarse network on low-res full images.
target='fine': train the same architecture on high-res patches; inference
tiles patches with the shared engine (no coarse conditioning —
tile_temp=None path of regular_tile/random_tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from patchrefinerv2_tpu.config import ConfigDict
from patchrefinerv2_tpu.registry import MODELS, build_model
from patchrefinerv2_tpu.models.patchrefinerplus import build_coarse_branch, _da_round
from patchrefinerv2_tpu.models.tiling import (
    TileCfg,
    crop_resize_patches,
    random_pass_starts,
    regular_pass,
)
from patchrefinerv2_tpu.ops.blend import TileBlender
from patchrefinerv2_tpu.ops.masks import generate_blend_mask
from patchrefinerv2_tpu.ops.resize import resize


@MODELS.register_module()
class BaselinePretrain:
    def __init__(
        self,
        coarse_branch=None,
        fine_branch=None,
        sigloss=None,
        min_depth=1e-3,
        max_depth=80.0,
        image_raw_shape=(2160, 3840),
        patch_process_shape=(384, 512),
        patch_split_num=(4, 4),
        target="coarse",
        coarse_branch_zoe=None,
        **kwargs,
    ):
        self.target = target
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.patch_process_shape = tuple(patch_process_shape)
        self.tile_cfg = TileCfg(
            tuple(image_raw_shape), tuple(patch_split_num), self.patch_process_shape
        )
        branch_cfg = ConfigDict(
            ConfigDict._wrap(coarse_branch if target == "coarse" else fine_branch)
        )
        self.branch, self.resizer_kind = build_coarse_branch(
            branch_cfg, min_depth, max_depth
        )
        self.sigloss = build_model(sigloss)

    @property
    def patch_input_shape(self):
        if self.resizer_kind == "da":
            return _da_round(self.patch_process_shape)
        return self.patch_process_shape

    def _input_for(self, shape):
        return _da_round(shape) if self.resizer_kind == "da" else tuple(shape)

    def init(self, rng: jax.Array):
        h, w = self._input_for(self.patch_process_shape)
        x = jnp.zeros((1, h, w, 3), jnp.float32)
        return jax.jit(lambda r: self.branch.init(r, x))(rng)

    def loss(self, variables, batch: dict, rng=None, mutable=False):
        if self.target == "coarse":
            image, gt = batch["image_lr"], batch["depth_gt"]
            name = "coarse_loss"
        else:
            image, gt = batch["crops_image_hr"], batch["crop_depths"]
            name = "fine_loss"
        target_in = self._input_for(image.shape[1:3])
        if tuple(image.shape[1:3]) != target_in:
            image = resize(image, target_in, "bilinear", True)
        out = self.branch.apply(variables, image, mutable=mutable)
        out, new_vars = out if mutable else (out, None)
        pred = out["metric_depth"]
        loss = self.sigloss(pred, gt, self.min_depth, self.max_depth)
        return {name: loss, "total_loss": loss}, {
            "depth_pred": pred,
            "variables": new_vars,
        }

    # --------------------------------------------------------- inference
    def _build_infer_fn(self, cai_mode: str, tile_cfg: TileCfg, process_num: int):
        pph, ppw = self.patch_process_shape
        in_shape = self.patch_input_shape
        prh, prw = tile_cfg.patch_raw_shape
        reensemble = tile_cfg.patch_reensemble_shape
        raw = tile_cfg.image_raw_shape

        if self.target == "coarse":
            def coarse_fn(variables, image_lr, image_hr, seed):
                target_in = self._input_for(image_lr.shape[1:3])
                if tuple(image_lr.shape[1:3]) != target_in:
                    image_lr = resize(image_lr, target_in, "bilinear", True)
                out = self.branch.apply(variables, image_lr)
                return out["metric_depth"][0, :, :, 0], out["metric_depth"]

            return coarse_fn

        regular_offsets = [(0, 0)]
        if cai_mode == "m2" or cai_mode.startswith("r"):
            regular_offsets += [(0, 1), (1, 0), (1, 1)]
        passes = [regular_pass(tile_cfg, off, process_num) for off in regular_offsets]
        # baseline random-tile loop runs N iterations (not N // process_num):
        # reference quirk (baseline_pretrain.py:450 vs patchrefinerplus.py:517)
        n_random_iters = int(cai_mode[1:]) if cai_mode.startswith("r") else 0
        blur_proc = jnp.asarray(generate_blend_mask((pph, ppw), border=0.1))
        blur_raw = jnp.asarray(generate_blend_mask((prh, prw), border=0.1) + 1e-3)

        def infer_fn(variables, image_lr, image_hr, seed):
            import numpy as onp

            def refine_chunk(imgs):
                out = self.branch.apply(variables, imgs)
                return out["metric_depth"][..., 0]

            state = TileBlender.init(reensemble)
            for pi, p in enumerate(passes):
                n = p.starts_raw.shape[0]
                n_chunks = n // process_num
                valid = (onp.arange(n) < p.n_valid).astype(onp.float32)
                xs = (
                    jnp.asarray(p.starts_raw).reshape(n_chunks, process_num, 2),
                    jnp.asarray(p.starts_process).reshape(n_chunks, process_num, 2),
                    jnp.asarray(valid).reshape(n_chunks, process_num),
                )
                init_pass = pi == 0

                def chunk_body(st, x, _init=init_pass):
                    s_raw, s_place, v = x
                    imgs = crop_resize_patches(image_hr[0], s_raw, (prh, prw), in_shape)
                    preds = refine_chunk(imgs)
                    if preds.shape[1:] != (pph, ppw):
                        preds = resize(preds[..., None], (pph, ppw), "bilinear", True)[..., 0]
                    st = TileBlender.add_pass(
                        st, preds, blur_proc, s_place, init_pass=_init, valid=v
                    )
                    return st, None

                state, _ = jax.lax.scan(chunk_body, state, xs)

            if n_random_iters:
                state = TileBlender.resize(state, raw)

                def rand_body(carry, _):
                    st, key = carry
                    key, sub = jax.random.split(key)
                    starts, _ = random_pass_starts(sub, tile_cfg, process_num)
                    imgs = crop_resize_patches(image_hr[0], starts, (prh, prw), in_shape)
                    preds = refine_chunk(imgs)
                    preds = resize(preds[..., None], (prh, prw), "nearest")[..., 0]
                    st = TileBlender.add_pass(st, preds, blur_raw, starts)
                    return (st, key), None

                (state, _), _ = jax.lax.scan(
                    rand_body, (state, seed), None, length=n_random_iters
                )

            return TileBlender.finalize(state), None

        return infer_fn

    @functools.lru_cache(maxsize=8)
    def _jitted_infer(self, cai_mode: str, tile_key: tuple, process_num: int):
        tile_cfg = TileCfg(tile_key[0], tile_key[1], self.patch_process_shape)
        return jax.jit(self._build_infer_fn(cai_mode, tile_cfg, process_num))

    def infer(
        self,
        variables,
        image_lr,
        image_hr,
        cai_mode="m1",
        process_num=4,
        tile_cfg=None,
        seed=None,
    ):
        tc = self.tile_cfg
        if tile_cfg is not None:
            tc = TileCfg(
                tuple(tile_cfg["image_raw_shape"]),
                tuple(tile_cfg["patch_split_num"]),
                self.patch_process_shape,
            )
        fn = self._jitted_infer(
            cai_mode, (tc.image_raw_shape, tc.patch_split_num), process_num
        )
        if seed is None:
            seed = jax.random.PRNGKey(0)
        return fn(variables, image_lr, image_hr, seed)
