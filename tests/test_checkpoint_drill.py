"""End-to-end converted-checkpoint drill (VERDICT r2 #9).

Chain under test — as a PIPELINE, not as units:

    synthetic estimator ``.pth`` (reference save-dict key schema)
      -> tools/convert_checkpoint.py --kind estimator   (CLI, subprocess)
      -> orbax checkpoint on disk
      -> tools/test.py --ckp-path ... --save            (CLI, subprocess)
      -> 16-bit depth dumps

must be byte-identical to inserting ``convert_patchrefinerplus(sd)``
directly into the in-process model and running the same Tester over the
same synthetic dataset. Covers converter -> orbax save -> orbax load ->
strict=False merge -> tiled inference as one chain.

Runnable sizes: the flagship topology (ZoeDepth BEiT coarse + eff-b5
refiner + V2 fusion) with the debug-tiny BEiT trunk passthrough.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from patchrefinerv2_tpu.registry import MODELS, DATASETS
from patchrefinerv2_tpu.datasets.base import DataLoader
from patchrefinerv2_tpu.evaluation.tester import Tester
from patchrefinerv2_tpu.utils.checkpoint import load_checkpoint, merge_pretrained
from patchrefinerv2_tpu.utils.torch_convert import convert_patchrefinerplus
from tests.test_convert_estimator import (
    _flagship_tiny_cfg,
    _inverse_sd,
    _tree_paths,
)

pytestmark = pytest.mark.slow  # heavy integration module (VERDICT r4 #9)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _runnable_cfg():
    cfg = _flagship_tiny_cfg()
    cfg["coarse_branch"]["trunk"] = dict(
        embed_dim=64, depth=4, num_heads=4, taps=[0, 1, 2, 3],
        features=32, out_channels=[24, 32, 48, 48])
    return cfg


_DS = dict(
    type="SyntheticDataset",
    mode="infer",
    length=2,
    image_raw_shape=(192, 256),
    network_process_size=(96, 128),
    patch_raw_shape=(96, 128),
)


@pytest.mark.filterwarnings("ignore::FutureWarning")
def test_convert_save_load_test_cli_chain(tmp_path):
    cfg = _runnable_cfg()
    model = MODELS.build(dict(type="PatchRefinerPlus", config=cfg))

    # synthetic reference state dict from the flax tree's shapes
    pph, ppw = model.patch_input_shape
    clh, clw = model.coarse_input_shape(model.patch_process_shape)
    shapes = jax.eval_shape(
        lambda r: model.net.init(
            r,
            jnp.zeros((1, clh, clw, 3), jnp.float32),
            jnp.zeros((1, pph, ppw, 3), jnp.float32),
            jnp.asarray([[0.0, 0.0, ppw / 4, pph / 4]], jnp.float32),
            method=type(model.net).train_forward,
        ),
        jax.random.PRNGKey(0),
    )
    sd = _inverse_sd(_tree_paths(shapes))
    for k in sd:  # BN running variance must be positive for a live forward
        if "running_var" in k:
            sd[k] = np.abs(sd[k]) + 0.5
    # reference save format: {'model_state_dict': model.module.get_save_dict()}
    # — keys carry NO 'module.' prefix (reference trainer.py:281-289)
    pth = tmp_path / "estimator.pth"
    torch.save({"model_state_dict": {k: torch.tensor(v)
                                     for k, v in sd.items()}}, pth)

    # CLI conversion -> orbax
    ckpt_dir = tmp_path / "ckpt"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=ROOT)
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "convert_checkpoint.py"),
         str(pth), str(ckpt_dir), "--kind", "estimator"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    # orbax round trip must be bitwise-lossless vs the direct conversion
    direct = convert_patchrefinerplus(sd)
    loaded = load_checkpoint(str(ckpt_dir))
    d_flat = _tree_paths(direct["params"])
    l_flat = _tree_paths(loaded["params"])
    assert d_flat == l_flat
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        direct["params"], loaded["params"])

    # direct insertion -> in-process Tester over the synthetic dataset
    variables = model.init(jax.random.PRNGKey(0))
    params = merge_pretrained(variables["params"], direct["params"])
    variables = dict(variables, params=params)
    if direct.get("batch_stats"):
        variables["batch_stats"] = merge_pretrained(
            variables["batch_stats"], direct["batch_stats"])
    ds = DATASETS.build(dict(_DS))
    loader = DataLoader(ds, batch_size=1, shuffle=False, num_prefetch=0)
    dir_a = tmp_path / "direct"
    tester = Tester({}, model, loader, work_dir=str(dir_a), save=True)
    tester.run(variables, cai_mode="m1", process_num=2,
               image_raw_shape=(192, 256), patch_split_num=(2, 2))

    # CLI: tools/test.py --ckp-path over the SAME dataset/config
    cfg_py = tmp_path / "drill_cfg.py"
    cfg_py.write_text(
        "model = dict(type='PatchRefinerPlus', config=" + repr(cfg) + ")\n"
        "general_dataloader = dict(dataset=" + repr(_DS) + ", num_workers=0)\n"
    )
    dir_b = tmp_path / "cli"
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "test.py"), str(cfg_py),
         "--ckp-path", str(ckpt_dir), "--test-type", "general",
         "--cai-mode", "m1", "--process-num", "2", "--save",
         "--work-dir", str(dir_b),
         "--image-raw-shape", "192", "256", "--patch-split-num", "2", "2"],
        capture_output=True, text=True, env=env, timeout=1200)
    assert r.returncode == 0, (r.stderr[-3000:] or r.stdout[-1000:])

    a_pngs = sorted(p for p in os.listdir(dir_a) if p.endswith("_uint16.png"))
    b_pngs = sorted(p for p in os.listdir(dir_b) if p.endswith("_uint16.png"))
    assert a_pngs and a_pngs == b_pngs
    for name in a_pngs:
        with open(dir_a / name, "rb") as fa, open(dir_b / name, "rb") as fb:
            assert fa.read() == fb.read(), f"{name} differs CLI vs direct"
