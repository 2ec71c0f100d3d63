"""Torch-forward parity for the C2F gated decoder (the V2 fusion head's
core). The torch side is a functional transcription of the reference
modules (bi_directional_fusion_model.py:26-208: GatedConvUnit with
channels-first LayerNorm + ReLU + sigmoid gate, GatedFusionBlock skip/
main units + bilinear align_corners upsample + 1x1 out conv, the
refinenet5..1 chain and output convs) consuming the SAME weights as the
flax C2FModule (flax->torch layout transposes in place)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from patchrefinerv2_tpu.models.blocks.dpt import C2FModule

torch.manual_seed(0)

FEAT = 16
HEAD2 = 8


def _w(p):  # flax conv kernel (kh,kw,I,O) -> torch (O,I,kh,kw)
    return torch.tensor(np.transpose(np.asarray(p), (3, 2, 0, 1)))


def _b(p):
    return torch.tensor(np.asarray(p))


def t_conv(x, P, k=3, bias=True):
    return F.conv2d(x, _w(P["kernel"]), _b(P["bias"]) if bias else None,
                    padding=k // 2)


def t_ln_cf(x, P):  # channels_first LayerNorm over C (reference convs.py:5-28)
    u = x.mean(1, keepdim=True)
    s = (x - u).pow(2).mean(1, keepdim=True)
    x = (x - u) / torch.sqrt(s + 1e-6)
    return _b(P["scale"])[None, :, None, None] * x + _b(P["bias"])[None, :, None, None]


def t_gcu(x, c, P, gate=True):
    out = F.relu(x)
    out = t_conv(out, P["Conv_0"])
    out = out + x
    fused = torch.cat([out, c], dim=1)
    fused = t_conv(fused, P["Conv_1"])
    fused = t_ln_cf(fused, P["LayerNorm_0"])
    fused = F.relu(fused)
    fused = F.conv2d(fused, _w(P["Conv_2"]["kernel"]))
    if gate:
        return out * torch.sigmoid(fused)
    return fused


def t_up(x, size):
    return F.interpolate(x, size, mode="bilinear", align_corners=True)


def t_gfb(P, x, skip=None, size=None, coarse=None, upscale=True, gate=True):
    out = x
    if skip is not None:
        out = out + t_gcu(skip, coarse, P["GatedConvUnit_0"], gate)
        out2 = t_gcu(out, coarse, P["GatedConvUnit_1"], gate)
    else:
        out2 = t_gcu(out, coarse, P["GatedConvUnit_0"], gate)
    if upscale:
        out2 = t_up(out2, size) if size is not None else t_up(
            out2, (out2.shape[-2] * 2, out2.shape[-1] * 2)
        )
    return F.conv2d(out2, _w(P["Conv_0"]["kernel"]), _b(P["Conv_0"]["bias"]))


def t_c2f(P, fine, coarse):
    rn = [
        F.conv2d(fine[i], _w(P["Scratch_0"][f"layer{i+1}_rn"]["kernel"]), padding=1)
        for i in range(5)
    ]
    l1, l2, l3, l4, l5 = rn
    p5 = t_gfb(P["refinenet5"], l5, size=l4.shape[-2:], coarse=coarse[5])
    p4 = t_gfb(P["refinenet4"], p5, l4, size=l3.shape[-2:], coarse=coarse[4])
    p3 = t_gfb(P["refinenet3"], p4, l3, size=l2.shape[-2:], coarse=coarse[3])
    p2 = t_gfb(P["refinenet2"], p3, l2, size=l1.shape[-2:], coarse=coarse[2])
    p1 = t_gfb(P["refinenet1"], p2, l1, coarse=coarse[1])
    out = t_conv(p1, P["output_conv1"])
    last = F.relu(t_conv(out, P["output_conv2"]))
    last = t_gfb(P["output_conv2_fusion"], last, coarse=coarse[0], upscale=False)
    out = F.conv2d(last, _w(P["output_conv3"]["kernel"]), _b(P["output_conv3"]["bias"]))
    return out, [l5, p5, p4, p3, p2, last]


def test_c2f_module_matches_reference_transcription():
    rng = np.random.RandomState(0)
    # fine levels high->low res; coarse[0] at 2x fine[0] res, 1..5 match fine
    sizes = [(16, 20), (8, 10), (4, 5), (2, 3), (1, 2)]
    fine = [rng.randn(1, h, w, FEAT).astype(np.float32) for h, w in sizes]
    # coarse[0] at the post-upscale (2x l1) res for output_conv2_fusion;
    # coarse[1..5] at the refinenet INPUT resolutions (the gated units run
    # before the upsample)
    coarse = [rng.randn(1, 32, 40, HEAD2).astype(np.float32)] + [
        rng.randn(1, h, w, FEAT).astype(np.float32) for h, w in sizes
    ]

    mod = C2FModule(features=FEAT, head2_features=HEAD2, gate=True, fusion=True)
    variables = mod.init(
        jax.random.PRNGKey(0),
        [jnp.asarray(f) for f in fine],
        [jnp.asarray(c) for c in coarse],
    )
    feats, out = mod.apply(
        variables,
        [jnp.asarray(f) for f in fine],
        [jnp.asarray(c) for c in coarse],
    )

    P = variables["params"]
    with torch.no_grad():
        t_out, t_feats = t_c2f(
            P,
            [torch.tensor(f.transpose(0, 3, 1, 2)) for f in fine],
            [torch.tensor(c.transpose(0, 3, 1, 2)) for c in coarse],
        )
    np.testing.assert_allclose(
        np.asarray(out), t_out.numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
    )
    for i, (g, r) in enumerate(zip(feats, t_feats)):
        np.testing.assert_allclose(
            np.asarray(g), r.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=1e-3, err_msg=f"feat {i}",
        )


def t_rcu(x, P):
    """ResidualConvUnit (depth_anything/blocks.py:37-96, bn=False):
    x + conv(relu(conv(relu(x))))."""
    out = F.relu(x)
    out = t_conv(out, P["Conv_0"])
    out = F.relu(out)
    out = t_conv(out, P["Conv_1"])
    return out + x


def t_ffb(P, x, skip=None, size=None):
    out = x
    if skip is not None:
        out = out + t_rcu(skip, P["ResidualConvUnit_0"])
        out = t_rcu(out, P["ResidualConvUnit_1"])
    else:
        out = t_rcu(out, P["ResidualConvUnit_0"])
    out = t_up(out, size) if size is not None else t_up(
        out, (out.shape[-2] * 2, out.shape[-1] * 2)
    )
    return F.conv2d(out, _w(P["Conv_0"]["kernel"]), _b(P["Conv_0"]["bias"]))


def test_feature_fusion_block_matches_reference_transcription():
    from patchrefinerv2_tpu.models.blocks.dpt import FeatureFusionBlock

    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 5, FEAT).astype(np.float32)
    skip = rng.randn(1, 4, 5, FEAT).astype(np.float32)

    mod = FeatureFusionBlock(FEAT)
    variables = mod.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(skip), size=(8, 10)
    )
    got = mod.apply(variables, jnp.asarray(x), jnp.asarray(skip), size=(8, 10))
    with torch.no_grad():
        ref = t_ffb(
            variables["params"],
            torch.tensor(x.transpose(0, 3, 1, 2)),
            torch.tensor(skip.transpose(0, 3, 1, 2)),
            size=(8, 10),
        )
    np.testing.assert_allclose(
        np.asarray(got), ref.numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
    )

    # single-input head block (scale-factor-2 upsample)
    mod1 = FeatureFusionBlock(FEAT)
    v1 = mod1.init(jax.random.PRNGKey(1), jnp.asarray(x))
    got1 = mod1.apply(v1, jnp.asarray(x))
    with torch.no_grad():
        ref1 = t_ffb(v1["params"], torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(got1), ref1.numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
    )


def test_simple_dpt_head_matches_reference_transcription():
    """SimpleDPTHead (lightweight_refiner.py:61-140): scratch projections,
    plain FeatureFusionBlock chain, conv->relu32->1x1 head, feats list."""
    from patchrefinerv2_tpu.models.blocks.dpt import SimpleDPTHead

    rng = np.random.RandomState(2)
    sizes = [(16, 20), (8, 10), (4, 5), (2, 3), (1, 2)]
    fine = [rng.randn(1, h, w, FEAT).astype(np.float32) for h, w in sizes]

    mod = SimpleDPTHead(features=FEAT)
    variables = mod.init(jax.random.PRNGKey(0), [jnp.asarray(f) for f in fine])
    feats, out = mod.apply(variables, [jnp.asarray(f) for f in fine])

    P = variables["params"]
    tf = [torch.tensor(f.transpose(0, 3, 1, 2)) for f in fine]
    with torch.no_grad():
        rn = [
            F.conv2d(tf[i], _w(P["Scratch_0"][f"layer{i+1}_rn"]["kernel"]), padding=1)
            for i in range(5)
        ]
        l1, l2, l3, l4, l5 = rn
        p5 = t_ffb(P["refinenet5"], l5, size=l4.shape[-2:])
        p4 = t_ffb(P["refinenet4"], p5, l4, size=l3.shape[-2:])
        p3 = t_ffb(P["refinenet3"], p4, l3, size=l2.shape[-2:])
        p2 = t_ffb(P["refinenet2"], p3, l2, size=l1.shape[-2:])
        p1 = t_ffb(P["refinenet1"], p2, l1)
        o = t_conv(p1, P["output_conv1"])
        last = F.relu(t_conv(o, P["output_conv2"]))
        o = F.conv2d(last, _w(P["output_conv3"]["kernel"]), _b(P["output_conv3"]["bias"]))
        t_feats = [l5, p5, p4, p3, p2, last]
    np.testing.assert_allclose(
        np.asarray(out), o.numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
    )
    for i, (g, r) in enumerate(zip(feats, t_feats)):
        np.testing.assert_allclose(
            np.asarray(g), r.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=1e-3, err_msg=f"feat {i}",
        )


def test_c2f_noenc_matches_reference_transcription():
    """'only-gate' C2FNOENCModule (bi_directional_fusion_model.py:211-286):
    per-level gate pairs (fusion conv, no sigmoid gate), transposed-conv
    upsample stem for the top level."""
    from patchrefinerv2_tpu.models.blocks.dpt import C2FNOENCModule

    rng = np.random.RandomState(3)
    sizes = [(8, 10), (4, 5), (2, 3), (2, 3), (1, 2)]
    fine = [rng.randn(1, h, w, FEAT).astype(np.float32) for h, w in sizes]
    coarse = [rng.randn(1, 16, 20, 32).astype(np.float32)] + [
        rng.randn(1, h, w, FEAT).astype(np.float32) for h, w in sizes
    ]

    mod = C2FNOENCModule(features=FEAT, gate=False, fusion=True)
    variables = mod.init(
        jax.random.PRNGKey(0),
        [jnp.asarray(f) for f in fine],
        [jnp.asarray(c) for c in coarse],
    )
    feats, out = mod.apply(
        variables,
        [jnp.asarray(f) for f in fine],
        [jnp.asarray(c) for c in coarse],
    )
    P = variables["params"]
    tf = [torch.tensor(f.transpose(0, 3, 1, 2)) for f in fine]
    tc = [torch.tensor(c.transpose(0, 3, 1, 2)) for c in coarse]
    with torch.no_grad():
        rn = [
            F.conv2d(tf[i], _w(P["Scratch_0"][f"layer{i+1}_rn"]["kernel"]), padding=1)
            for i in range(5)
        ]

        def gate_pair(x, c, name):
            x = t_gcu(x, c, P[f"{name}_gate1"], gate=False)
            return t_gcu(x, c, P[f"{name}_gate2"], gate=False)

        p5 = gate_pair(rn[4], tc[5], "layer1")
        p4 = gate_pair(rn[3], tc[4], "layer2")
        p3 = gate_pair(rn[2], tc[3], "layer3")
        p2 = gate_pair(rn[1], tc[2], "layer4")
        p1 = gate_pair(rn[0], tc[1], "layer5")
        # transposed-conv 2x upsample of the raw top fine level
        wk = np.asarray(P["upsample_convt"]["kernel"])  # flax (kh,kw,I,O)
        # torch conv_transpose2d flips the kernel; flax ConvTranspose does
        # not -> flip spatial dims when mapping flax->torch
        wt = torch.tensor(np.transpose(wk[::-1, ::-1], (2, 3, 0, 1)).copy())
        l0 = F.conv_transpose2d(tf[0], wt, _b(P["upsample_convt"]["bias"]), stride=2)
        l0 = F.relu(l0)
        l0 = F.conv2d(l0, _w(P["upsample_conv"]["kernel"]), padding=1)
        p0 = gate_pair(l0, tc[0], "layer6")
        o = t_conv(p0, P["output_conv"])
        t_feats = [p5, p4, p3, p2, p1, p0]
    np.testing.assert_allclose(
        np.asarray(out), o.numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
    )
    for i, (g, r) in enumerate(zip(feats, t_feats)):
        np.testing.assert_allclose(
            np.asarray(g), r.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=1e-3, err_msg=f"feat {i}",
        )
