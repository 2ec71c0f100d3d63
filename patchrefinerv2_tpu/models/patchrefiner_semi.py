"""PatchRefinerSemi: teacher-student semi-supervised transfer
(estimator/models/patchrefiner_semi.py:46-198).

Student (PatchRefinerPlus or PatchRefiner) trains on real-domain gt while an
edge loss supervises against pseudo labels — either produced online by a
frozen teacher forward per step (:141-148) or loaded offline from the
dataset (cityscapes_dataset.py:200-219). Edge-loss variants by config type:
SSI (midas), SSI-DA, SSI-Uncert, EdgeguidedRanking, SILog (:161-182).
NaN/Inf guards zero the losses branchlessly (:184-192).

No hooks: the distillation feature (reference: forward hook on
``refiner_fusion_model.final_conv``, patchrefiner_semi.py:99-106) is
returned explicitly by the fusion head via ``return_feat``; the distill
loss is applied between student and (stop-gradient) teacher features.
Divergence note: the reference snapshot registers the hooks and builds the
distill loss but never applies it in ``forward`` (verified — no use of
``self.distill_loss``/``feat_*_hook.feat`` after __init__); here the
evidently-intended loss IS applied, weighted by ``distill_loss_weight``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from patchrefinerv2_tpu.config import ConfigDict
from patchrefinerv2_tpu.registry import MODELS, build_model


def _nan_guard(loss, anchor):
    """Replace nan/inf loss with 0 * anchor (keeps the graph connected like
    the reference guard, patchrefiner_semi.py:184-191)."""
    bad = jnp.logical_or(jnp.isnan(loss), jnp.isinf(loss))
    return jnp.where(bad, 0.0 * anchor, loss)


@MODELS.register_module()
class PatchRefinerSemi:
    def __init__(
        self,
        model_cfg_student,
        teacher_pretrain=None,
        sigloss=None,
        edgeloss=None,
        model_cfg_teacher=None,
        edge_loss_weight=1.0,
        edge_thr=0.08,
        mix_loss=False,
        ranking_weight=0.1,
        ssi_weight=0.1,
        edgeloss_ranking=None,
        edgeloss_ssi=None,
        distill=False,
        distill_loss_weight=1.0,
        distill_loss=None,
        last_feat=True,
        **kwargs,
    ):
        self.student = build_model(ConfigDict._wrap(model_cfg_student))
        self.teacher = (
            build_model(ConfigDict._wrap(model_cfg_teacher))
            if model_cfg_teacher is not None
            else None
        )
        # consumed by utils.checkpoint.apply_config_pretrained (the
        # reference loads it in __init__, patchrefiner_semi.py:85-94)
        self.teacher_pretrain = teacher_pretrain
        self.edge_loss_weight = edge_loss_weight
        self.edgeloss_cfg = ConfigDict._wrap(edgeloss or {})
        self.edgeloss = build_model(edgeloss) if edgeloss else None
        self.mix_loss = mix_loss
        if mix_loss:
            self.edgeloss_ranking = build_model(edgeloss_ranking)
            self.edgeloss_ssi = build_model(edgeloss_ssi)
            self.ranking_weight = ranking_weight
            self.ssi_weight = ssi_weight
        self.distill = bool(distill)
        self.last_feat = last_feat
        if self.distill:
            if self.teacher is None:
                # reference fails here too (hook registration on a missing
                # teacher_model, patchrefiner_semi.py:103)
                raise ValueError("distill=True requires model_cfg_teacher")
            self.distill_loss_weight = distill_loss_weight
            self.distill_loss = build_model(distill_loss)
            import inspect

            self._distill_takes_rng = (
                "rng" in inspect.signature(self.distill_loss.__call__).parameters
            )
        self.min_depth = self.student.min_depth
        self.max_depth = self.student.max_depth
        self.patch_process_shape = self.student.patch_process_shape
        self.tile_cfg = self.student.tile_cfg
        self.e2e_training = getattr(self.student, "e2e_training", False)
        self.pretrain_stage = False

    def init(self, rng: jax.Array):
        """Composed variables: {'params': {'student', 'teacher'},
        'batch_stats': {...}} so the Trainer/optimizer treat this like any
        model (teacher frozen via the ('teacher',) prefix)."""
        ks, kt = jax.random.split(rng)
        vs = self.student.init(ks)
        params = {"student": vs["params"]}
        stats = {"student": vs.get("batch_stats", {})}
        if self.teacher is not None:
            vt = self.teacher.init(kt)
            params["teacher"] = vt["params"]
            stats["teacher"] = vt.get("batch_stats", {})
        if self.distill and getattr(self.distill_loss, "connector", None) is not None:
            # connector (1x1 conv student->teacher dims) is trainable and
            # channel-polymorphic; spatial dims are placeholders
            dec_chl = tuple(self.student.net.fusion.dec_chl)
            cv = self.distill_loss.init_connector(
                jax.random.fold_in(kt, 1), (1, 8, 8, dec_chl[-1])
            )
            params["distill_connector"] = cv.get("params", {})
        return {"params": params, "batch_stats": stats}

    @staticmethod
    def _split_vars(variables, who):
        v = {"params": variables["params"][who]}
        bs = variables.get("batch_stats", {}).get(who)
        if bs:
            v["batch_stats"] = bs
        return v

    def loss(self, variables, batch: dict, rng=None, mutable=False):
        vs = self._split_vars(variables, "student")
        aux_t = None
        if self.teacher is not None:
            # online pseudo label: frozen teacher forward (no grads)
            vt = jax.lax.stop_gradient(self._split_vars(variables, "teacher"))
            loss_t, aux_t = self.teacher.loss(
                vt, batch, rng=rng, mutable=False, return_feat=self.distill
            )
            pseudo_label = jax.lax.stop_gradient(aux_t["depth_pred"])
        else:
            pseudo_label = batch["pseudo_label"]

        loss_dict_s, aux_s = self.student.loss(
            vs, batch, rng=rng, mutable=mutable, return_feat=self.distill
        )
        if mutable and aux_s.get("variables"):
            new_stats = dict(variables.get("batch_stats", {}))
            new_stats["student"] = aux_s["variables"].get("batch_stats", {})
            aux_s["variables"] = {"batch_stats": new_stats}
        pred_s = aux_s["depth_pred"]

        etype = self.edgeloss_cfg.get("type", "")
        mask = jnp.ones_like(pseudo_label, bool)
        if etype in ("ScaleAndShiftInvariantLoss", "ScaleAndShiftInvariantDALoss"):
            edge_loss = self.edgeloss(
                pred_s, pseudo_label, batch.get("crop_depths"), mask,
                self.min_depth, self.max_depth,
            )
        elif etype == "ScaleAndShiftInvariantUncertLoss":
            edge_loss = self.edgeloss(
                pred_s, pseudo_label, batch.get("crop_depths"), mask,
                self.min_depth, self.max_depth, batch.get("pseudo_uncert"),
            )
        elif etype == "SILogLoss":
            edge_loss = self.edgeloss(
                pred_s, pseudo_label, min_depth=self.min_depth, max_depth=self.max_depth
            )
        elif etype == "EdgeguidedRankingLoss":
            # the ranking loss returns (loss, sample_count) like the
            # reference forward (losses.py:520)
            edge_loss, _ = self.edgeloss(
                pred_s, pseudo_label, batch.get("crops_image_hr"), batch.get("crop_depths"),
                rng=None if rng is None else jax.random.fold_in(rng, 7),
            )
        else:
            raise NotImplementedError(f"edge loss type {etype!r}")

        anchor = pred_s[0, 0, 0, 0]
        edge_loss = _nan_guard(edge_loss, anchor)
        total_s = _nan_guard(loss_dict_s["total_loss"], anchor)
        loss_dict_s = dict(loss_dict_s)
        loss_dict_s["edge_loss"] = edge_loss
        loss_dict_s["total_loss"] = total_s + self.edge_loss_weight * edge_loss

        if self.distill and aux_t is not None:
            feat_s = aux_s["distill_feat"]
            feat_t = jax.lax.stop_gradient(aux_t["distill_feat"])
            conn = variables["params"].get("distill_connector")
            conn = {"params": conn} if conn else None
            kw = {"connector_vars": conn}
            if self._distill_takes_rng:
                kw["rng"] = rng
            d_loss = self.distill_loss(
                feat_s, feat_t, batch.get("crop_depths"),
                self.min_depth, self.max_depth, **kw,
            )
            d_loss = _nan_guard(d_loss, anchor)
            loss_dict_s["distill_loss"] = d_loss
            loss_dict_s["total_loss"] = (
                loss_dict_s["total_loss"] + self.distill_loss_weight * d_loss
            )
        aux_s["pseudo_label"] = pseudo_label
        return loss_dict_s, aux_s

    def loss_jit(self, variables, batch, rng=None, mutable=False):
        key = bool(mutable)
        if not hasattr(self, "_loss_jit_cache"):
            self._loss_jit_cache = {}
        if key not in self._loss_jit_cache:
            mut = ["batch_stats"] if mutable else False
            self._loss_jit_cache[key] = jax.jit(
                lambda v, b, r: self.loss(v, b, rng=r, mutable=mut)
            )
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return self._loss_jit_cache[key](variables, batch, rng)

    def infer(self, variables, *args, **kwargs):
        return self.student.infer(self._split_vars(variables, "student"), *args, **kwargs)
