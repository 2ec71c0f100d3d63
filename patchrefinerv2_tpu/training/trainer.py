"""Trainer: epoch-based loop with data-parallel pjit train steps.

Capability match for estimator/trainer/trainer.py:16-316: per-step OneCycle
LR + grad clipping, periodic validation (val_type epoch_base/iter_base,
eval_start, early_stop_epoch), rank-0 checkpointing, console/wandb logging.
TPU-native differences: the train step is one jitted function over a
``Mesh(('data',))`` with the batch sharded and parameters replicated (XLA
inserts the gradient all-reduce); checkpoints are orbax; no DDP wrappers,
barriers, or samplers — the data loader shards by process index.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from patchrefinerv2_tpu.parallel.mesh import (
    allgather_metrics,
    batch_sharding,
    data_mesh,
    replicate_tree,
    shard_batch,
)
from patchrefinerv2_tpu.training.optim import build_optimizer
from patchrefinerv2_tpu.utils.checkpoint import save_checkpoint
from patchrefinerv2_tpu.utils.logging import print_log
from patchrefinerv2_tpu.utils.metrics_logger import MetricsLogger


class TrainState:
    """Minimal mutable container (kept as a pytree-of-arrays dict)."""

    def __init__(self, params, batch_stats, opt_state, step=0):
        self.params = params
        self.batch_stats = batch_stats
        self.opt_state = opt_state
        self.step = step

    def variables(self):
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


class Trainer:
    def __init__(
        self,
        config,
        model,
        train_loader,
        val_loader=None,
        val_evaluator: Callable | None = None,
        work_dir: str = "./work_dir",
        mesh=None,
    ):
        self.config = config
        self.model = model
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.val_evaluator = val_evaluator
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)
        self.mesh = mesh if mesh is not None else data_mesh()
        # reference BN semantics: per-GPU stats by default, global only
        # when the config sets convert_syncbn=True (parallel/bn.py)
        from patchrefinerv2_tpu.parallel.bn import groups_for, set_bn_groups

        set_bn_groups(groups_for(config, self.mesh))

        tc = config.get("train_cfg", {})
        self.max_epochs = int(tc.get("max_epochs", 24))
        self.val_interval = int(tc.get("val_interval", 2))
        self.val_type = tc.get("val_type", "epoch_base")
        self.eval_start = int(tc.get("eval_start", 0))
        self.early_stop_epoch = int(tc.get("early_stop_epoch", -1))
        self.save_interval = int(tc.get("save_checkpoint_interval", self.max_epochs))
        self.log_interval = int(tc.get("log_interval", 100))
        self.train_log_img_interval = int(tc.get("train_log_img_interval", 0))
        self.val_log_img_interval = int(tc.get("val_log_img_interval", 0))
        self.min_depth = float(config.get("min_depth", 1e-3))
        self.max_depth = float(config.get("max_depth", 80))

        steps_per_epoch = len(train_loader)
        total_steps = self.max_epochs * steps_per_epoch
        rng = jax.random.PRNGKey(int(config.get("seed", 0)))
        variables = model.init(rng)
        # reference-style in-config checkpoint loading (pretrain_coarse_model
        # / pretrained / whole_pretrained, patchrefinerplus.py:105-205)
        from patchrefinerv2_tpu.utils.checkpoint import apply_config_pretrained

        variables = apply_config_pretrained(model, variables)
        params = variables["params"]
        batch_stats = variables.get("batch_stats")

        frozen = ()
        if getattr(model, "e2e_training", True) is False and not getattr(
            model, "pretrain_stage", False
        ):
            frozen = (("coarse",),)
        self.tx, self.lr_schedule = build_optimizer(
            config.get("optim_wrapper", {}),
            config.get("param_scheduler", {}),
            total_steps,
            params,
            frozen_prefixes=frozen,
        )
        opt_state = self.tx.init(params)
        self.state = TrainState(
            self._place(params),
            self._place(batch_stats) if batch_stats is not None else None,
            self._place(opt_state),
        )
        self.start_epoch = 1
        resume = config.get("resume_from")
        if resume:
            self._resume(resume)
        if self.val_loader is not None and self.val_evaluator is None:
            # default m1 tiled-inference evaluator (reference val_epoch,
            # trainer.py:137-218) so a plain CLI run actually validates
            self.val_evaluator = self._default_val_evaluator()
        self._train_step = self._build_train_step()
        self._rng = jax.random.PRNGKey(int(config.get("seed", 0)) + 1)
        self.metrics = MetricsLogger(
            work_dir, project=config.get("project", ""), debug=bool(config.get("debug", False))
        )

    def _place(self, tree):
        """Mesh placement for params/optimizer state: replicated on a 1-D
        data mesh; on a 2-D (data, model) mesh the coarse-trunk attention/
        MLP kernels (and their optimizer moments — optax state carries the
        same param paths) shard tensor-parallel over 'model'
        (parallel/tp.py). Gradients/updates are elementwise per leaf, so
        GSPMD keeps the TP placement through the whole train step."""
        if "model" in self.mesh.shape and self.mesh.shape["model"] > 1:
            from patchrefinerv2_tpu.parallel.tp import shard_tp

            return shard_tp(tree, self.mesh, within="coarse")
        return replicate_tree(tree, self.mesh)

    def _build_train_step(self):
        model, tx = self.model, self.tx
        has_bn = self.state.batch_stats is not None

        def step_fn(params, batch_stats, opt_state, batch, rng):
            def loss_fn(p):
                variables = {"params": p}
                if has_bn:
                    variables["batch_stats"] = batch_stats
                loss_dict, aux = model.loss(
                    variables, batch, rng=rng, mutable=["batch_stats"] if has_bn else False
                )
                new_vars = aux.get("variables")
                new_bs = new_vars.get("batch_stats") if (has_bn and new_vars) else None
                return loss_dict["total_loss"], (loss_dict, new_bs)

            (total, (loss_dict, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, (new_bs if has_bn else None), opt_state, loss_dict

        return jax.jit(step_fn, donate_argnums=(0, 1, 2))

    def _log_train_images(self, batch, step):
        """Training image panels (reference trainer.py:270-271 →
        log_images:55-125): the logged prediction is recomputed from the
        post-update weights with one extra forward — kept off the jitted
        train step so the panel path costs nothing when disabled."""
        if not hasattr(self, "_panel_loss"):
            self._panel_loss = getattr(
                self.model, "loss_jit", jax.jit(lambda v, b, r=None: self.model.loss(v, b))
            )
        _, aux = self._panel_loss(self.state.variables(), batch)
        self.metrics.log_images(
            {
                "rgb": batch.get("crops_image_hr", batch.get("image_lr")),
                "depth_pred": aux["depth_pred"],
                "depth_gt": batch.get("crop_depths", batch.get("depth_gt")),
            },
            prefix="Train",
            min_depth=self.min_depth,
            max_depth=self.max_depth,
            step=self.state.step,
        )

    def train_epoch(self, epoch: int):
        t0 = time.time()
        collect = self.config.get("collect_input_args")
        for i, batch in enumerate(self.train_loader):
            if collect:
                batch = {k: v for k, v in batch.items() if k in collect}
            batch = shard_batch(batch, self.mesh)
            self._rng, sub = jax.random.split(self._rng)
            params, bs, opt_state, loss_dict = self._train_step(
                self.state.params, self.state.batch_stats, self.state.opt_state, batch, sub
            )
            self.state.params = params
            self.state.batch_stats = bs
            self.state.opt_state = opt_state
            self.state.step += 1
            if i % self.log_interval == 0:
                lr = float(self.lr_schedule(self.state.step))
                losses = {k: float(v) for k, v in loss_dict.items()}
                ips = (i + 1) * _batch_size(batch) / (time.time() - t0)
                print_log(
                    f"epoch {epoch} step {i}/{len(self.train_loader)} "
                    f"lr {lr:.2e} img/s {ips:.1f} "
                    + " ".join(f"{k}={v:.4f}" for k, v in losses.items())
                )
                # numerical-failure guard at the sync point we already pay
                # for (SURVEY 5.3; the reference's nan diagnostics are
                # per-loss prints, losses.py:56-66) — jax_debug_nans
                # (--debug-nans) localizes the op when this fires
                if not np.isfinite(losses.get("total_loss", 0.0)):
                    print_log(
                        f"WARNING: non-finite total_loss at step "
                        f"{self.state.step}: {losses}"
                    )
                if jax.process_index() == 0:
                    self.metrics.log({"lr": lr, "imgs_per_sec": ips, **losses}, self.state.step)
            if (
                self.train_log_img_interval > 0
                and jax.process_index() == 0
                and (i + 1) % self.train_log_img_interval == 0
            ):
                self._log_train_images(batch, self.state.step)
            if self.val_type == "iter_base" and self.val_loader is not None:
                if self.state.step % self.val_interval == 0:
                    self.val_epoch()

    def _default_val_evaluator(self):
        """m1 tiled inference + dataset.get_metrics per val image, mirroring
        the reference val_epoch (trainer.py:152-178). Returns
        (metrics, depth_pred) so val_epoch can also log image panels."""
        tc = self.config.get("train_cfg", {})
        cai_mode = tc.get("val_cai_mode", "m1")
        process_num = int(tc.get("val_process_num", 4))
        dataset = getattr(self.val_loader, "dataset", None)
        # reuse the trainer's mesh so TP-sharded params validate through
        # the sharded infer program instead of an implicit per-image
        # weight all-gather (patchrefinerplus.infer handles both 1-D data
        # and 2-D data x model meshes)
        mesh = self.mesh if self.mesh is not None and self.mesh.devices.size > 1 else None
        if mesh is not None:
            dsz = mesh.shape.get("data", mesh.devices.size)
            process_num = -(-process_num // dsz) * dsz  # round up to shardable

        def evaluate(model, variables, batch):
            if "image_hr" not in batch or "depth_gt" not in batch:
                return None
            hr = np.asarray(batch["image_hr"])
            split = getattr(getattr(model, "tile_cfg", None), "patch_split_num", (4, 4))
            tile_cfg = {
                "image_raw_shape": list(hr.shape[1:3]),
                "patch_split_num": list(split),
            }
            depth, _ = model.infer(
                variables,
                batch["image_lr"],
                batch["image_hr"],
                cai_mode=cai_mode,
                process_num=process_num,
                tile_cfg=tile_cfg,
                seed=jax.random.PRNGKey(0),
                mesh=mesh,
            )
            depth = np.asarray(depth)
            if dataset is None or not hasattr(dataset, "get_metrics"):
                return None
            m = dataset.get_metrics(
                np.asarray(batch["depth_gt"]),
                depth,
                disp_gt_edges=batch.get("boundary"),
                seg_image=batch.get("seg_image"),
            )
            return m, depth

        return evaluate

    def val_epoch(self):
        if self.val_loader is None or self.val_evaluator is None:
            return {}
        self._val_count = getattr(self, "_val_count", 0)
        metrics = []
        variables = self.state.variables()
        for idx, batch in enumerate(self.val_loader):
            out = self.val_evaluator(self.model, variables, batch)
            depth_pred = None
            if isinstance(out, tuple):
                out, depth_pred = out
            if out is not None:
                metrics.append(out)
            self._val_count += 1
            if (
                depth_pred is not None
                and self.val_log_img_interval > 0
                and jax.process_index() == 0
                and (idx + 1) % self.val_log_img_interval == 0
            ):
                self.metrics.log_images(
                    {
                        "rgb": batch.get("image_hr"),
                        "depth_pred": depth_pred,
                        "depth_gt": batch.get("depth_gt"),
                    },
                    prefix="Val",
                    min_depth=self.min_depth,
                    max_depth=self.max_depth,
                    step=self._val_count,
                )
        metrics = allgather_metrics(metrics)
        if not metrics:
            return {}
        dataset = getattr(self.val_loader, "dataset", None)
        if dataset is not None and hasattr(dataset, "evaluate"):
            agg = {k: float(v) for k, v in dataset.evaluate(metrics).items()}
        else:
            agg = {
                k: float(np.nanmean([m[k] for m in metrics]))
                for k in metrics[0]
                if np.isscalar(metrics[0][k]) or np.ndim(metrics[0][k]) == 0
            }
        print_log("val: " + " ".join(f"Val/{k}={v:.4f}" for k, v in agg.items()))
        if jax.process_index() == 0:
            self.metrics.log({f"Val/{k}": v for k, v in agg.items()}, self.state.step)
        return agg

    def save(self, epoch: int):
        if jax.process_index() != 0:
            return
        path = os.path.join(self.work_dir, f"checkpoint_{epoch:02d}")
        # async: the d2h copy blocks (so the next step may donate the live
        # buffers) but the disk write overlaps with the next epoch;
        # run() joins the last write before returning
        save_checkpoint(
            path,
            {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "opt_state": self.state.opt_state,
                "epoch": epoch,
                "step": self.state.step,
            },
            block=False,
        )
        print_log(f"saved checkpoint to {path}")

    def _resume(self, path: str):
        """Full-state resume (params + optimizer + step) — the reference
        saves this state but never reloads it (trainer.py:276-294);
        restoring it is a deliberate improvement."""
        from patchrefinerv2_tpu.utils.checkpoint import load_checkpoint

        ckpt = load_checkpoint(path)
        self.state.params = self._place(ckpt["params"])
        if ckpt.get("batch_stats"):
            self.state.batch_stats = self._place(ckpt["batch_stats"])
        if ckpt.get("opt_state") is not None:
            restored = jax.tree_util.tree_map(
                lambda tpl, arr: arr, self.state.opt_state, ckpt["opt_state"]
            )
            self.state.opt_state = self._place(restored)
        self.state.step = int(ckpt.get("step", 0))
        self.start_epoch = int(ckpt.get("epoch", 0)) + 1
        print_log(f"resumed from {path} at epoch {self.start_epoch} step {self.state.step}")

    def run(self):
        for epoch in range(self.start_epoch, self.max_epochs + 1):
            if hasattr(self.train_loader, "set_epoch"):
                self.train_loader.set_epoch(epoch)
            self.train_epoch(epoch)
            if (
                self.val_type == "epoch_base"
                and epoch >= self.eval_start
                and epoch % self.val_interval == 0
            ):
                self.val_epoch()
            if epoch % self.save_interval == 0 or epoch == self.max_epochs:
                self.save(epoch)
            if self.early_stop_epoch > 0 and epoch >= self.early_stop_epoch:
                print_log(f"early stop at epoch {epoch}")
                break
        from patchrefinerv2_tpu.utils.checkpoint import wait_for_checkpoints

        wait_for_checkpoints()


def _batch_size(batch: dict) -> int:
    return next(iter(batch.values())).shape[0]
