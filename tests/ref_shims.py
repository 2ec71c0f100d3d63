"""Import shims that let the ACTUAL reference model files run on CPU.

The reference (/root/reference, read-only) depends on mmengine, timm,
torchvision, and kornia — none of which exist in this environment. Their
surface used by the estimator model files is tiny, so this module serves
minimal stand-ins and pre-seeds the ``estimator`` package machinery so
that ``estimator/models/{baseline_pretrain,patchrefinerplus}.py`` (and the
blocks/losses they pull in) import and execute EXACTLY as written — no
re-typed copies. tests/test_reference_composed_parity.py then pins this
framework's composed tiled-inference output against the genuine reference
code path (VERDICT r4 missing item #1).

Shimmed surfaces (each cited to its reference consumer):
- ``mmengine``: print_log / Registry / ConfigDict
  (estimator/registry/registry.py:7-8, estimator/models/patchrefinerplus.py:37-40)
- ``timm.create_model(name, features_only=True)`` -> the torch golden
  encoders of tests/_torch_encoders.py (timm layout + key names)
  (estimator/models/blocks/lightweight_refiner.py:260-262)
- ``timm.layers.Conv2dSame`` (patchrefinerplus.py:43,158-163) and
  ``timm.models.layers.{DropPath,to_2tuple,trunc_normal_}``
  (estimator/models/blocks/swin_layers.py:30)
- ``torchvision.ops.roi_align`` -> the numpy golden of
  tests/_roi_align_np.py (patchrefinerplus.py:38,243-276)
- ``torchvision.transforms.{Normalize,Compose}``
  (external/zoedepth/models/base_models/midas.py:28, depth_model.py:29,
  external/depth_anything_v2/dpt.py:5)
- ``kornia`` import-time names only — raising stubs
  (estimator/models/losses.py:2,12; never called in inference)
- ``estimator`` / ``estimator.models`` / ``estimator.utils`` package
  stubs: the package __init__s pull the full trainer/tester/dataset
  closure (wandb, skimage, torchmetrics, ...), so the stubs expose just
  the names the model files import while letting every ``estimator.models
  .*`` / ``estimator.registry`` submodule load from the real files.
"""

import importlib.machinery
import importlib.util
import sys
import types

import numpy as np
import torch

REF = "/root/reference"


def _mk(name):
    """New shim module with a real ModuleSpec — transformers probes
    ``importlib.util.find_spec('timm')``, which raises on a spec-less
    sys.modules entry."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


# --------------------------------------------------------------- mmengine
class ConfigDict(dict):
    """Attribute-access dict, recursive over nested dicts (the reference
    reads e.g. ``config.refiner.fine_branch.coarse_condition`` off the
    PretrainedConfig built from ``ConfigDict.to_dict()``)."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        for k, v in dict(*args, **kwargs).items():
            self[k] = v

    @classmethod
    def _wrap(cls, v):
        if isinstance(v, dict) and not isinstance(v, cls):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._wrap(x) for x in v)
        return v

    def __setitem__(self, k, v):
        super().__setitem__(k, self._wrap(v))

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v

    def to_dict(self):
        # keep attribute access on nested values (see class docstring)
        return self


class Registry:
    """mmengine-Registry stand-in: register_module decorator + build."""

    def __init__(self, name="", parent=None, locations=None, **_kw):
        self.name = name
        self.parent = parent
        self._modules = {}

    def register_module(self, name=None, module=None, force=False):
        if module is not None:
            self._modules[name or module.__name__] = module
            return module

        def deco(obj):
            self._modules[name if isinstance(name, str) else obj.__name__] = obj
            return obj

        return deco

    def get(self, key):
        if key in self._modules:
            return self._modules[key]
        if self.parent is not None:
            return self.parent.get(key)
        return None

    def build(self, cfg, **kwargs):
        cfg = dict(cfg)
        cfg.update(kwargs)
        t = cfg.pop("type")
        cls = self.get(t) if isinstance(t, str) else t
        if cls is None:
            raise KeyError(f"{t!r} not registered in {self.name!r}")
        return cls(**cfg)


def _install_mmengine():
    mm = _mk("mmengine")
    mm.__prv2_shim__ = True
    mm.print_log = lambda msg, logger=None, level=None: None
    mm.Registry = Registry
    mm.ConfigDict = ConfigDict
    cfg = _mk("mmengine.config")
    cfg.ConfigDict = ConfigDict
    reg = _mk("mmengine.registry")
    reg.Registry = Registry
    reg.MODELS = Registry("mm_model")
    reg.DATASETS = Registry("mm_dataset")
    mm.config = cfg
    mm.registry = reg
    sys.modules["mmengine"] = mm
    sys.modules["mmengine.config"] = cfg
    sys.modules["mmengine.registry"] = reg


# ------------------------------------------------------------------- timm
def _install_timm():
    from tests._torch_encoders import Conv2dSame, TorchEffB5, TorchMNV3Large

    tm = _mk("timm")
    tm.__prv2_shim__ = True

    def create_model(name, pretrained=False, features_only=False, **_kw):
        if not features_only:
            raise NotImplementedError("shim serves features_only encoders")
        if name == "mobilenetv3_large_100":
            m = TorchMNV3Large()
            m.default_cfg = {"mean": (0.485, 0.456, 0.406),
                             "std": (0.229, 0.224, 0.225)}
        elif name == "tf_efficientnet_b5_ap":
            m = TorchEffB5()
            m.default_cfg = {"mean": (0.5, 0.5, 0.5), "std": (0.5, 0.5, 0.5)}
        else:
            raise NotImplementedError(f"shim has no encoder {name!r}")
        return m

    tm.create_model = create_model
    layers = _mk("timm.layers")
    layers.Conv2dSame = Conv2dSame
    models = _mk("timm.models")
    mlayers = _mk("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):  # eval-time identity (inference parity only)
            return x

    mlayers.DropPath = DropPath
    mlayers.to_2tuple = lambda x: tuple(x) if isinstance(x, (tuple, list)) else (x, x)
    mlayers.trunc_normal_ = torch.nn.init.trunc_normal_
    models.layers = mlayers
    tm.layers = layers
    tm.models = models
    sys.modules["timm"] = tm
    sys.modules["timm.layers"] = layers
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = mlayers


# ------------------------------------------------------------ torchvision
def _install_torchvision():
    from tests._roi_align_np import roi_align_np

    tv = _mk("torchvision")
    tv.__prv2_shim__ = True
    ops = _mk("torchvision.ops")

    def roi_align(input, boxes, output_size, spatial_scale=1.0,
                  sampling_ratio=-1, aligned=False):
        if not aligned:
            raise NotImplementedError("shim implements aligned=True only")
        if not torch.is_tensor(boxes):
            raise NotImplementedError("shim expects a (K,5) boxes tensor")
        if isinstance(output_size, int):
            output_size = (output_size, output_size)
        feats = input.detach().numpy().transpose(0, 2, 3, 1)
        b = boxes.detach().numpy().astype(np.float64)
        idxs = b[:, 0].astype(np.int64)
        sr = sampling_ratio if sampling_ratio > 0 else None
        out = roi_align_np(feats, b[:, 1:], idxs, tuple(output_size),
                           float(spatial_scale), sr)
        return torch.from_numpy(np.ascontiguousarray(
            out.transpose(0, 3, 1, 2))).to(input.dtype)

    ops.roi_align = roi_align

    transforms = _mk("torchvision.transforms")

    class Normalize:
        def __init__(self, mean, std, inplace=False):
            self.mean = torch.tensor(mean, dtype=torch.float32)
            self.std = torch.tensor(std, dtype=torch.float32)

        def __call__(self, x):  # (C,H,W) or (B,C,H,W): broadcast last 3 dims
            return (x - self.mean.view(-1, 1, 1)) / self.std.view(-1, 1, 1)

    class Compose:
        def __init__(self, fns):
            self.fns = list(fns)

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    transforms.Normalize = Normalize
    transforms.Compose = Compose
    tv.ops = ops
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.transforms"] = transforms


# ----------------------------------------------------------------- kornia
def _install_kornia():
    ko = _mk("kornia")
    ko.__prv2_shim__ = True

    def _raiser(name):
        def fn(*_a, **_k):
            raise NotImplementedError(
                f"kornia.{name} shim: import-time stub, not callable")

        return fn

    losses = _mk("kornia.losses")
    losses.dice_loss = _raiser("losses.dice_loss")
    losses.focal_loss = _raiser("losses.focal_loss")
    filters = _mk("kornia.filters")
    filters.gaussian_blur2d = _raiser("filters.gaussian_blur2d")
    filters.canny = _raiser("filters.canny")
    ko.losses = losses
    ko.filters = filters
    sys.modules["kornia"] = ko
    sys.modules["kornia.losses"] = losses
    sys.modules["kornia.filters"] = filters


# ----------------------------------------------- estimator package stubs
def _install_estimator_pkgs():
    est = _mk("estimator")
    est.__prv2_shim__ = True
    est.__path__ = [REF + "/estimator"]
    sys.modules["estimator"] = est

    models = _mk("estimator.models")
    models.__path__ = [REF + "/estimator/models"]

    def build_model(cfg):
        from estimator.registry import MODELS

        return MODELS.build(cfg)

    models.build_model = build_model
    sys.modules["estimator.models"] = models

    # estimator.utils __init__ pulls skimage/torchmetrics/matplotlib closure;
    # expose only what the model files import (losses.py:15-19)
    utils = _mk("estimator.utils")
    spec = importlib.util.spec_from_file_location(
        "estimator.utils.anchor_generation",
        REF + "/estimator/utils/anchor_generation.py",
    )
    anchor = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(anchor)
    utils.RandomBBoxQueries = anchor.RandomBBoxQueries

    def _metric_stub(name):
        def fn(*_a, **_k):
            raise NotImplementedError(
                f"estimator.utils.{name} stub (metrics layer not shimmed)")

        return fn

    for n in ("get_boundaries", "compute_metrics",
              "compute_boundary_metrics", "extract_edges"):
        setattr(utils, n, _metric_stub(n))
    sys.modules["estimator.utils"] = utils


def install():
    """Install all shims + sys.path entries (idempotent)."""
    if getattr(sys.modules.get("mmengine"), "__prv2_shim__", False):
        return
    for mod in ("mmengine", "timm", "torchvision", "kornia"):
        if mod in sys.modules:
            raise RuntimeError(
                f"real {mod} already imported; shims would shadow it")
    _install_mmengine()
    _install_timm()
    _install_torchvision()
    _install_kornia()
    _install_estimator_pkgs()
    for p in (REF, REF + "/external"):
        if p not in sys.path:
            sys.path.append(p)  # append: never shadow repo/test imports
