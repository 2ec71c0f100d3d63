"""Tester: evaluation / save / pseudo-label / benchmark harness
(estimator/tester/tester.py:26-455 equivalents).

run: per-image tiled inference, optional colored + uint16x256 PNG dumps
(:72-106), per-image metrics and cross-process aggregation (:109-127).
generate_pl (:132-180): pseudo-label uint16 dump for semi-supervised
training. benchmark (:325-404): fps with warmup over the jitted program
(block_until_ready is the TPU synchronize). run_consistency (:212-321):
patch-overlap consistency error.
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from patchrefinerv2_tpu.parallel.mesh import allgather_metrics
from patchrefinerv2_tpu.utils.color import save_colored, save_raw_16bit
from patchrefinerv2_tpu.utils.logging import print_log


class Tester:
    def __init__(
        self,
        config,
        model,
        dataloader,
        work_dir: str = "./work_dir",
        save: bool = False,
        cmap: str | None = None,
        gray_scale: bool = False,
        mesh=None,
    ):
        self.config = config
        self.model = model
        self.dataloader = dataloader
        self.work_dir = work_dir
        self.save = save
        self.gray_scale = gray_scale
        # optional device mesh: shards each patch chunk across local chips
        # during tiled inference (PatchRefinerPlus.infer(mesh=...)) — the
        # single-image latency axis; cross-image DP stays the multiprocess
        # loader split as in the reference (tester.py:52-127)
        self.mesh = mesh
        # reference colormap policy (tester.py:72-86): gray_r when
        # gray_scale (default 2/95 percentiles), magma_r full-range on
        # cityscapes, Spectral full-range otherwise
        if cmap is not None:
            self.cmap = cmap
        elif gray_scale:
            self.cmap = "gray_r"
        else:
            ds_name = getattr(
                getattr(dataloader, "dataset", None), "dataset_name", ""
            )
            self.cmap = "magma_r" if ds_name == "cityscapes" else "Spectral"
        os.makedirs(work_dir, exist_ok=True)

    def run(
        self,
        variables,
        cai_mode="m1",
        process_num=4,
        image_raw_shape=(2160, 3840),
        patch_split_num=(4, 4),
    ):
        results = []
        tile_cfg = {
            "image_raw_shape": list(image_raw_shape),
            "patch_split_num": list(patch_split_num),
        }
        dataset = getattr(self.dataloader, "dataset", None)
        seed = jax.random.PRNGKey(0)
        for i, batch in enumerate(self.dataloader):
            seed, sub = jax.random.split(seed)
            depth, coarse = self.model.infer(
                variables,
                batch["image_lr"],
                batch["image_hr"],
                cai_mode=cai_mode,
                process_num=process_num,
                tile_cfg=tile_cfg,
                seed=sub,
                mesh=self.mesh,
            )
            depth = np.asarray(depth)
            name = batch.get("img_file_basename", [f"img_{i:05d}"])[0]
            if self.save:
                kw = {"vminp": 2, "vmaxp": 95} if self.gray_scale else {}
                save_colored(
                    depth, os.path.join(self.work_dir, f"{name}.png"), self.cmap, **kw
                )
                save_raw_16bit(depth, os.path.join(self.work_dir, f"{name}_uint16.png"))

            if "depth_gt" in batch and dataset is not None and hasattr(dataset, "get_metrics"):
                m = dataset.get_metrics(
                    np.asarray(batch["depth_gt"]),
                    depth,
                    disp_gt_edges=batch.get("boundary"),
                    seg_image=batch.get("seg_image"),
                )
                if m:
                    results.append(m)
        results = allgather_metrics(results)
        if results and dataset is not None and hasattr(dataset, "evaluate"):
            return dataset.evaluate(results)
        if results:
            agg = {k: float(np.nanmean([r[k] for r in results])) for k in results[0]}
            print_log("metrics: " + " ".join(f"{k}={v:.4f}" for k, v in agg.items()))
            return agg
        return {}

    def generate_pl(self, variables, out_dir=None, **infer_kwargs):
        out_dir = out_dir or self.work_dir
        os.makedirs(out_dir, exist_ok=True)
        seed = jax.random.PRNGKey(0)
        for i, batch in enumerate(self.dataloader):
            seed, sub = jax.random.split(seed)
            depth, _ = self.model.infer(
                variables, batch["image_lr"], batch["image_hr"], seed=sub,
                mesh=self.mesh, **infer_kwargs
            )
            name = batch.get("img_file_basename", [f"img_{i:05d}"])[0]
            save_raw_16bit(np.asarray(depth), os.path.join(out_dir, f"{name}_uint16.png"))
        print_log(f"pseudo labels written to {out_dir}")

    def benchmark(
        self,
        variables,
        image_lr,
        image_hr,
        cai_mode="r32",
        process_num=4,
        iters=50,
        warmup=20,
        repeats=10,
        tile_cfg=None,
    ):
        """fps over the jitted tiled-inference program (tester.py:325-404)."""
        seed = jax.random.PRNGKey(0)

        def once():
            d, _ = self.model.infer(
                variables, image_lr, image_hr,
                cai_mode=cai_mode, process_num=process_num, tile_cfg=tile_cfg, seed=seed,
                mesh=self.mesh,
            )
            jax.block_until_ready(d)

        fps_list = []
        for _ in range(repeats):
            for _ in range(warmup):
                once()
            t0 = time.perf_counter()
            for _ in range(iters):
                once()
            dt = time.perf_counter() - t0
            fps_list.append(iters / dt)
        fps = float(np.mean(fps_list))
        var = float(np.var(fps_list))
        print_log(f"benchmark {cai_mode}: {fps:.3f} fps (var {var:.4f})")
        # benchmark.txt in the work dir (tester.py:400-404)
        os.makedirs(self.work_dir, exist_ok=True)
        with open(os.path.join(self.work_dir, "benchmark.txt"), "w") as f:
            f.write(f"cai_mode: {cai_mode}\nprocess_num: {process_num}\n")
            f.write(f"fps_mean: {fps:.6f}\nfps_variance: {var:.6f}\n")
        return {"fps": fps, "fps_variance": var}

    def show_gts(self, out_dir=None):
        """Colorized ground-truth dumps (tester.py:183-209)."""
        out_dir = out_dir or os.path.join(self.work_dir, "gts")
        os.makedirs(out_dir, exist_ok=True)
        for i, batch in enumerate(self.dataloader):
            if "depth_gt" not in batch:
                continue
            name = batch.get("img_file_basename", [f"img_{i:05d}"])[0]
            save_colored(
                np.asarray(batch["depth_gt"]).squeeze(),
                os.path.join(out_dir, f"{name}_gt.png"),
                self.cmap,
            )
        print_log(f"gt visualizations written to {out_dir}")
        return out_dir

    def model_complexity(
        self,
        variables,
        image_lr_shape=(1, 384, 512, 3),
        image_hr_shape=(1, 2160, 3840, 3),
        cai_mode="m1",
        process_num=4,
        tile_cfg=None,
    ):
        """FLOPs / params via XLA cost analysis on the compiled tiled-
        inference program (replaces mmengine.analysis
        get_model_complexity_info, tester.py:384-398)."""
        import jax.numpy as jnp

        from patchrefinerv2_tpu.models.tiling import TileCfg

        if self.mesh is not None:
            print_log("model_complexity: whole-graph FLOPs are analyzed "
                      "unsharded (mesh ignored)")
        tc = self.model.tile_cfg
        if tile_cfg is not None:
            tc = TileCfg(
                tuple(tile_cfg["image_raw_shape"]),
                tuple(tile_cfg["patch_split_num"]),
                self.model.patch_process_shape,
            )
        fn = self.model._jitted_infer(
            cai_mode, (tc.image_raw_shape, tc.patch_split_num), process_num
        )
        lowered = fn.lower(
            variables,
            jnp.zeros(image_lr_shape, jnp.float32),
            jnp.zeros(image_hr_shape, jnp.float32),
            jax.random.PRNGKey(0),
        )
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        n_params = sum(
            int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"])
        )
        flops = float(cost.get("flops", float("nan")))
        bytes_accessed = float(cost.get("bytes accessed", float("nan")))
        print_log(
            f"complexity[{cai_mode}]: {flops/1e9:.1f} GFLOPs/frame, "
            f"{bytes_accessed/1e9:.2f} GB accessed, {n_params/1e6:.1f} M params"
        )
        return {"flops": flops, "bytes_accessed": bytes_accessed, "params": n_params}

    def vis_feat(self, variables, batch, out_dir=None, max_maps=32):
        """Dump coarse-branch AND fusion-head feature heatmaps
        (tester.py:407-455: the reference hooks
        ``refiner_fusion_model.fusion_layers_1[0]`` — the torch hooks are
        replaced by flax ``capture_intermediates`` over the explicit
        graph, which exposes every fusion refinenet/gated-block output)."""
        import jax.numpy as jnp

        from patchrefinerv2_tpu.utils.color import save_colored

        out_dir = out_dir or os.path.join(self.work_dir, "featvis")
        os.makedirs(out_dir, exist_ok=True)
        net = self.model.net
        feats, pred = net.apply(
            variables, jnp.asarray(batch["image_lr"]), method=type(net).coarse_forward
        )
        count = 0
        for li, f in enumerate(feats):
            fmean = np.asarray(f).mean(axis=-1)[0]  # channel-mean heatmap
            save_colored(fmean, os.path.join(out_dir, f"coarse_lvl{li}_mean.png"), cmap="magma")
            count += 1
            if count >= max_maps:
                break
        save_colored(np.asarray(pred)[0, :, :, 0], os.path.join(out_dir, "coarse_pred.png"))

        # fusion-head view (the paper-figure maps): run one crop batch
        # through the train-mode forward capturing the fusion submodule
        # outputs (reference hook point tester.py:426-427)
        if "crops_image_hr" in batch and "bboxs" in batch:
            def _is_fusion(mdl, _method):
                name = type(mdl).__name__
                return name in (
                    "BiDirectionalFusion", "FusionUnet", "GuidedFusion",
                    "C2FModule", "C2FNOENCModule", "GatedFusionBlock",
                    "FeatureFusionBlock",
                )

            _, state = net.apply(
                variables,
                jnp.asarray(batch["image_lr"]),
                jnp.asarray(batch["crops_image_hr"]),
                jnp.asarray(batch["bboxs"]),
                False,
                method=type(net).train_forward,
                capture_intermediates=_is_fusion,
                mutable=["intermediates"],
            )

            def _walk(tree, path):
                if isinstance(tree, dict):
                    for k, v in tree.items():
                        yield from _walk(v, path + (k,))
                elif isinstance(tree, (tuple, list)):
                    for v in tree:
                        yield from _walk(v, path)
                elif hasattr(tree, "ndim") and tree.ndim == 4:
                    yield "_".join(p for p in path if p != "__call__"), tree

            for name, f in _walk(state.get("intermediates", {}), ()):
                if count >= max_maps:
                    break
                fmean = np.asarray(f, np.float32).mean(axis=-1)[0]
                save_colored(
                    fmean, os.path.join(out_dir, f"fusion_{name}.png"), cmap="magma"
                )
                count += 1
        print_log(f"feature maps written to {out_dir}")
        return out_dir

    def run_consistency(self, variables, process_num=4, overlap=None, **_legacy):
        """Reference-semantics patch-overlap consistency (tester.py:212-321).

        The consistency dataloader (``consistency=True`` dataset, e.g.
        u4k_dataset.py:158-184) yields a fixed grid of half-overlapping
        crops per image. Each crop runs through the TRAIN-mode forward —
        the per-crop refined prediction, NOT the blended map — is upsampled
        back to the crop's raw shape (bilinear align_corners=True,
        tester.py:242-243), and the mean abs disagreement in the
        ``overlap``-px strips shared with the left/up neighbours is
        aggregated via ``dataset.evaluate_consistency``
        (u4k_dataset.py:308-341).

        The reference loops the crops one-at-a-time (batch 1,
        tester.py:228-244); here the crops run in ``process_num``-sized
        batches through one jitted program — numerically identical per
        crop (no cross-batch coupling: norm layers are frozen in eval).
        """
        import jax.numpy as jnp

        from patchrefinerv2_tpu.ops.resize import resize

        if self.mesh is not None:
            print_log("run_consistency: per-crop train-mode forwards run "
                      "unsharded (mesh ignored)")
        dataset = self.dataloader.dataset
        if not hasattr(dataset, "h_start_list") or not hasattr(dataset, "evaluate_consistency"):
            raise ValueError(
                "run_consistency needs a consistency-mode dataset "
                "(consistency=True, e.g. UnrealStereo4k) providing the fixed "
                f"overlapping crop grid; {type(dataset).__name__} does not "
                "(set test_dataloader.dataset.consistency=True in the config)"
            )
        h_starts = list(dataset.h_start_list)
        w_starts = list(dataset.w_start_list)
        ph, pw = (int(s) for s in dataset.patch_raw_shape)
        ov = int(overlap if overlap is not None else getattr(dataset, "overlap", 270))
        half = ov // 2
        n_crops = len(h_starts) * len(w_starts)
        chunk = max(1, min(int(process_num), n_crops))
        while n_crops % chunk:
            chunk -= 1

        @jax.jit
        def crop_forward(v, image_lr, crops, crop_depths, bboxs):
            batch = {
                "image_lr": jnp.tile(image_lr, (crops.shape[0], 1, 1, 1)),
                "crops_image_hr": crops,
                "crop_depths": crop_depths,
                "bboxs": bboxs,
            }
            _, aux = self.model.loss(v, batch)
            # F.interpolate(pred, patch_raw_shape, bilinear, align_corners=True)
            return resize(aux["depth_pred"], (ph, pw), "bilinear", True)

        results = []
        for batch in self.dataloader:
            preds = []
            for s in range(0, n_crops, chunk):
                out = crop_forward(
                    variables,
                    jnp.asarray(batch["image_lr"][:1]),
                    jnp.asarray(batch["crops_image_hr"][0, s : s + chunk]),
                    jnp.asarray(batch["crop_depths"][0, s : s + chunk]),
                    jnp.asarray(batch["bboxs"][0, s : s + chunk]),
                )
                preds.extend(np.asarray(out, np.float32)[..., 0])

            # left/up overlap disagreement, mirroring tester.py:246-301
            # (current crop vs temp[-1] left neighbour and temp[-ncols] up
            # neighbour; corner crop contributes nothing)
            mosaic = np.zeros(tuple(dataset.image_raw_shape), np.float32)
            temp: list[np.ndarray] = []
            err_chunks = []
            inner = 0
            for ii, x in enumerate(h_starts):
                for jj, y in enumerate(w_starts):
                    cur = preds[inner]
                    mosaic[x + half : x + ph - half, y + half : y + pw - half] = cur[
                        half : ph - half, half : pw - half
                    ]
                    if ii > 0:
                        up = temp[-len(w_starts)]
                        err_chunks.append(
                            np.abs(up[-ov:, :] - cur[:ov, :]).ravel()
                        )
                    if jj > 0:
                        left = temp[-1]
                        err_chunks.append(
                            np.abs(left[:, -ov:] - cur[:, :ov]).ravel()
                        )
                    temp.append(cur)
                    inner += 1
            err = float(np.concatenate(err_chunks).mean())
            results.append({"consistency_error": err})
            if self.save:
                name = batch.get("img_file_basename", ["consistency"])[0]
                save_colored(mosaic, os.path.join(self.work_dir, f"{name}.png"), self.cmap)

        results = allgather_metrics(results)
        ret = dataset.evaluate_consistency(results)
        return {"consistency": float(ret["consistency_error"]), **ret}
