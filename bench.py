#!/usr/bin/env python
"""Driver benchmark: 4K frames/sec/chip at 4x4 split, cai-mode r32
(BASELINE.json target: >= 5 fps/chip on v5e, vs_baseline = fps / 5).

Runs the flagship PatchRefinerPlus graph (ZoeDepth BEiT-L coarse +
tf_efficientnet_b5_ap refiner + BiDirectionalFusion — the
configs/patchrefinerv2_zoedepth/v2_eff_u4k.py architecture) with random
weights on one real chip; throughput is weight-independent.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/prv2_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from patchrefinerv2_tpu.registry import MODELS  # noqa: E402


def flagship_config(max_depth=80.0):
    return dict(
        e2e_training=False,
        pretrain_stage=False,
        image_raw_shape=[2160, 3840],
        patch_process_shape=[384, 512],
        patch_split_num=[4, 4],
        fusion_feat_level=6,
        min_depth=1e-3,
        max_depth=max_depth,
        strategy_refiner_target="offset_coarse",
        coarse_branch=dict(
            type="ZoeDepth",
            n_bins=64,
            bin_centers_type="softplus",
            bin_embedding_dim=128,
            n_attractors=[16, 8, 4, 1],
            attractor_alpha=1000,
            attractor_gamma=2,
            attractor_kind="mean",
            attractor_type="inv",
            min_temp=0.0212,
            max_temp=50.0,
        ),
        refiner=dict(
            fine_branch=dict(
                type="LightWeightRefiner",
                coarse_condition=True,
                with_decoder=False,
                encoder_name="tf_efficientnet_b5_ap",
            ),
            fusion_model=dict(
                type="BiDirectionalFusion",
                coarse2fine=True,
                coarse2fine_type="coarse-gated",
                coarse_chl=[32, 256, 256, 256, 256, 256],
                fine_chl=[24, 40, 64, 176, 512],
                fine_chl_after_coarse2fine=[32, 256, 256, 256, 256, 256],
                temp_chl=[32, 64, 64, 128, 256, 512],
                dec_chl=[512, 256, 128, 64, 32],
            ),
        ),
        sigloss=dict(type="SILogLoss"),
        gmloss=dict(type="GradMatchLoss"),
        sigweight=1.0,
        pre_norm_bbox=True,
        infer_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
    )


def _cached_calibration(model, variables, image_lr, image_hr, process_num):
    """Calibrate-once/serve-many: load the int8 calibration artifact
    (``quant_scales`` + ``quant_kq`` trees) from a cache keyed on the
    bench config, the quant env flags, and the content of the quant
    implementation files; calibrate and persist on miss. Mirrors the
    deployed flow (tools/calibrate_int8.py persists scales into a
    checkpoint; the bench uses random PRNGKey(0) weights, so the artifact
    is fully determined by the key)."""
    import hashlib
    import pickle

    import numpy as _np

    here = os.path.dirname(os.path.abspath(__file__))
    code = b""
    # every module that owns quant conv SITES must be in the key: a stale
    # artifact missing a site silently serves that site dynamic scales
    for rel in ("patchrefinerv2_tpu/ops/quant.py",
                "patchrefinerv2_tpu/ops/s2d.py",
                "patchrefinerv2_tpu/models/patchrefinerplus.py",
                "patchrefinerv2_tpu/models/blocks/dpt.py",
                "patchrefinerv2_tpu/models/blocks/convs.py",
                "patchrefinerv2_tpu/models/blocks/fusion.py",
                "patchrefinerv2_tpu/models/backbones/encoders.py"):
        with open(os.path.join(here, rel), "rb") as f:
            code += f.read()
    key = json.dumps(
        [repr(sorted(flagship_config().items())), process_num,
         os.environ.get("PRV2_INT8_MIN_KC", ""),
         os.environ.get("PRV2_INT8_PERCHAN", ""),
         # S2D / SKIP change WHICH sites sow scales -> fork the artifact
         os.environ.get("PRV2_INT8_S2D", ""),
         os.environ.get("PRV2_INT8_SKIP", ""),
         hashlib.sha256(code).hexdigest()],
        sort_keys=True,
    )
    cache_dir = os.environ.get("BENCH_CALIB_CACHE", "/tmp/prv2_calib_cache")
    path = os.path.join(
        cache_dir, hashlib.sha256(key.encode()).hexdigest()[:16] + ".pkl")
    if os.path.exists(path):
        try:
            t0 = time.perf_counter()
            with open(path, "rb") as f:
                scales_np, kq_np = pickle.load(f)
            to_dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
            variables = dict(variables, quant_scales=to_dev(scales_np),
                             quant_kq=to_dev(kq_np))
            print(f"loaded cached int8 calibration from {path} in "
                  f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
            return variables
        except Exception as e:  # corrupt artifact: recalibrate
            print(f"calibration cache unreadable ({e}); recalibrating",
                  file=sys.stderr)
    print("calibrating static int8 scales...", file=sys.stderr)
    t0 = time.perf_counter()
    variables = model.calibrate_int8(
        variables, [(image_lr, image_hr)], process_num=process_num
    )
    n_sites = len(jax.tree_util.tree_leaves(variables["quant_scales"]))
    print(f"calibrated {n_sites} conv sites in "
          f"{time.perf_counter()-t0:.0f}s", file=sys.stderr)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        host = lambda t: jax.tree_util.tree_map(
            lambda a: _np.asarray(a), t)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump((host(variables["quant_scales"]),
                         host(variables["quant_kq"])), f)
        os.replace(tmp, path)
        print(f"cached calibration artifact at {path}", file=sys.stderr)
    except Exception as e:
        print(f"calibration cache write failed ({e})", file=sys.stderr)
    return variables


def _wait_for_backend(attempts=None, probe_timeout=900):
    """The tunneled chip grant can transiently fail OR hang (pool
    contention / relay restart — a dead relay blocks jax.devices() on the
    grant wait for ~30 min instead of erroring). Probe in a subprocess
    with a hard timeout first: a killed probe abandons its claim without
    poisoning this process. The driver runs this file unattended at round
    end, so bound the total wait."""
    import subprocess

    if attempts is None:
        # a pool outage window is usually minutes-to-an-hour; the driver
        # runs this unattended at round end, so default to ~45 min of
        # patience (3 x 900 s probes) — overridable for interactive runs
        attempts = int(os.environ.get("BENCH_BACKEND_ATTEMPTS", "3"))
    err = "backend probe failed"
    for i in range(attempts):
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices(); print('devok')"],
                capture_output=True, timeout=probe_timeout, text=True,
            )
            if probe.returncode == 0 and "devok" in probe.stdout:
                return True
            if probe.stderr:
                err = probe.stderr.strip().splitlines()[-1]
        except subprocess.TimeoutExpired:
            err = f"backend probe timed out after {probe_timeout}s"
        if i < attempts - 1:
            print(f"{err}; retrying", file=sys.stderr)
            time.sleep(60)
    raise RuntimeError(f"TPU backend unavailable: {err}")


def _apply_flag_env():
    """BENCH_FLAGS="K=V,K=V": export experiment env flags (read by the
    library at trace time) before the model is built — the A/B hook
    tools/bench_matrix.py drives. Round-3 note: the PRV2_FUSED_*/
    PRV2_FLASH_* Pallas-kernel flag family this hook was built for is
    retired (every kernel measured at-or-below the XLA baseline on the
    real chip — docs/performance.md "Retired kernels"); the surviving
    flag is the non-parity serving mode PRV2_INT8 (prefer BENCH_INT8=1,
    which also labels the metric)."""
    spec = os.environ.get("BENCH_FLAGS", "")
    flags = {}
    for pair in filter(None, spec.split(",")):
        k, _, v = pair.partition("=")
        flags[k.strip()] = v.strip() or "1"
    os.environ.update(flags)
    if flags:
        print(f"experiment flags: {flags}", file=sys.stderr)
    return flags


def main():
    cai_mode = os.environ.get("BENCH_CAI_MODE", "r32")
    process_num = int(os.environ.get("BENCH_PROCESS_NUM", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))
    _apply_flag_env()
    # BENCH_INT8=1|static: measure the int8 serving mode (ops/quant.py) —
    # "static" calibrates per-site activation scales on the bench input
    # first (PTQ; skips the dynamic abs-max reduction, measured -13%
    # round 3). The metric is labeled "+int8[...]".
    # Default bench mode is int8[static] (round 4): measured against the
    # f32 program, the static-int8 depth error distribution is
    # statistically identical to bf16's (mean 3.33e-3 vs 3.32e-3, same
    # 81.1% of pixels > 1e-3 — tools/ab_int8.py --vs-f32), i.e. the int8
    # quantization noise (~8e-4 vs bf16) is drowned by bf16 rounding the
    # default already accepts. BENCH_INT8=0 restores the pure-bf16 mode.
    # default int8[perchan] (round 5): at the default site set (tail
    # excluded) perchan's depth-error distribution vs f32 is IDENTICAL to
    # bf16's (mean 3.36e-3 vs 3.32e-3, >1e-2 1.71% vs 1.61%) at identical
    # speed — strictly tighter than per-tensor static (3.45e-3 / 2.06%).
    int8_mode = os.environ.get("BENCH_INT8", "perchan")
    int8 = int8_mode not in ("", "0")
    if int8:
        os.environ["PRV2_INT8"] = "1"
    else:
        os.environ.pop("PRV2_INT8", None)
    # BENCH_INT8=perchan: static calibration + per-input-channel
    # activation scales folded into the weight grid (ops/quant.py)
    int8_label = int8_mode if int8_mode != "1" else "dynamic"
    if int8_mode == "perchan":
        os.environ["PRV2_INT8_PERCHAN"] = "1"
        int8_mode = "static"
    else:
        os.environ.pop("PRV2_INT8_PERCHAN", None)
    # bounded backend probe first (claims + releases the exclusive
    # tunneled chip in a subprocess), then the in-process claim
    _wait_for_backend()
    jax.devices()

    model = MODELS.build(dict(type="PatchRefinerPlus", config=flagship_config()))
    variables = model.init(jax.random.PRNGKey(0))

    # on a multi-chip host, shard each patch chunk across the chips (the
    # mesh path of PatchRefinerPlus.infer); single chip runs unsharded.
    # BENCH_TP=m additionally splits the mesh (data=n/m, model=m) to shard
    # the coarse trunk Megatron-style (parallel/tp.py).
    mesh = None
    n_dev = jax.device_count()
    tp = int(os.environ.get("BENCH_TP", "1"))
    if n_dev > 1 and tp > 1 and n_dev % tp == 0 and process_num % (n_dev // tp) == 0:
        from patchrefinerv2_tpu.parallel.tp import tp_mesh

        mesh = tp_mesh(tp)
    elif n_dev > 1 and process_num % n_dev == 0:
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()), ("data",))
    if tp > 1 and (mesh is None or "model" not in getattr(mesh, "shape", {})):
        print(f"BENCH_TP={tp} not satisfiable (n_dev={n_dev}, "
              f"process_num={process_num}); measuring without TP", file=sys.stderr)
    print(f"mesh: {dict(mesh.shape) if mesh is not None else None}", file=sys.stderr)

    rng = np.random.RandomState(0)
    image_lr = jnp.asarray(rng.rand(1, 384, 512, 3), jnp.float32)
    image_hr = jnp.asarray(rng.rand(1, 2160, 3840, 3), jnp.float32)
    seed = jax.random.PRNGKey(0)

    if int8 and int8_mode == "static":
        # PTQ calibration on the bench input (throughput is
        # scale-value-independent; real deployments calibrate on real
        # frames via tools/calibrate_int8.py). Calibrate-once/serve-many:
        # the quant_scales/quant_kq trees are persisted keyed on the
        # config + quant flags + quant-code content, so repeat bench
        # invocations load the artifact (<10 s) instead of re-spending
        # ~250 s re-calibrating 242 sites per run.
        variables = _cached_calibration(model, variables, image_lr, image_hr,
                                        process_num)

    def once():
        d, _ = model.infer(
            variables, image_lr, image_hr,
            cai_mode=cai_mode, process_num=process_num, seed=seed, mesh=mesh,
        )
        return d

    # Throughput timing: frames are dispatched back-to-back (JAX async
    # dispatch) and joined once at the end — the device runs saturated and
    # the per-frame host/tunnel dispatch latency overlaps with compute (the
    # serving pipeline pattern). Each frame is a full distinct execution
    # (every output buffer is materialized and held); blocking per frame
    # instead measured ~30 ms/frame of pure dispatch gap on the tunneled
    # chip. Chaining frame i+1's input to frame i's output via tiny slice
    # ops was tried and rejected: each extra micro-op costs a dispatch
    # round trip (m1 3.6 -> 2.6 fps).
    def measure():
        type(model)._jitted_infer.cache_clear()  # env flags bind at trace
        for _ in range(warmup):
            jax.block_until_ready(once())
        t0 = time.perf_counter()
        outs = [once() for _ in range(iters)]
        jax.block_until_ready(outs)
        return iters / (time.perf_counter() - t0)

    fps = measure()
    print(f"measured: {fps:.4f} fps", file=sys.stderr)

    if os.environ.get("BENCH_BREAKDOWN"):
        # per-pass breakdown (stderr, JSON stdout stays single-line): time
        # the m1 (1 pass) and m2 (4 passes) programs to decompose the rN
        # frame into coarse+dispatch vs per-pass patch cost
        import sys as _sys

        for mode in ("m1", "m2"):
            fn = lambda: model.infer(
                variables, image_lr, image_hr,
                cai_mode=mode, process_num=process_num, seed=seed, mesh=mesh,
            )[0]
            jax.block_until_ready(fn())
            tb = time.perf_counter()
            sub = [fn() for _ in range(iters)]
            jax.block_until_ready(sub)
            tm = (time.perf_counter() - tb) / iters
            print(f"breakdown {mode}: {tm*1e3:.1f} ms/frame "
                  f"({1.0/tm:.3f} fps)", file=_sys.stderr)

    print(
        json.dumps(
            {
                "metric": f"4K frames/sec/chip, 4x4 split, {cai_mode}"
                + (f"+int8[{int8_label}]" if int8 else ""),
                "value": round(fps, 4),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 5.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
