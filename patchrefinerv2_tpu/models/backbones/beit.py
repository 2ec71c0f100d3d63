"""BEiT-L/16 trunk + MiDaS DPT decoder ("DPT_BEiT_L_384") as an explicit-
feature core for ZoeDepth (flax, NHWC).

Capability match for the torch.hub MiDaS model the reference wraps in
MidasCore (external/zoedepth/models/base_models/midas.py:191-374; the
encoder/decoder themselves are downloaded, not vendored). Structure:

* BEiT blocks: pre-LN, attention with q/v bias (k bias fixed at zero),
  per-block relative position bias over the (grid_h, grid_w) window with
  3 extra cls interactions, LayerScale gamma_1/gamma_2.
* DPT decoder: readout 'project' (cat cls -> dense+gelu), reassemble to
  [256, 512, 1024, 1024] at strides 4/8/16/32, scratch 3x3 -> 256,
  4 fusion blocks, head conv->2x upsample->conv32->relu->conv1->relu.
* Core taps (midas.py:296-318): out_conv (32ch ReLU act), l4_rn, r4..r1.
* Input prep: Normalize(0.5, 0.5) (midas.py:177-188), resize handled by the
  caller (do_resize=False in all reference configs).

TPU-first: the relative position bias is materialized once per block as an
(S, S) table gather — static shapes, folded into the attention einsum.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from patchrefinerv2_tpu.models.blocks.convs import gelu, relu
from patchrefinerv2_tpu.models.blocks.dpt import FeatureFusionBlock
from patchrefinerv2_tpu.ops.resize import resize


import functools


@functools.lru_cache(maxsize=None)
def _axis_onehot(g: int) -> np.ndarray:
    """(g, g, 2g-1) constant: O[i, j, a] = 1 iff i - j + g - 1 == a."""
    i = np.arange(g)
    diff = i[:, None] - i[None, :] + g - 1
    out = np.zeros((g, g, 2 * g - 1), np.float32)
    out[np.arange(g)[:, None], np.arange(g)[None, :], diff] = 1.0
    return out


def relative_position_bias(table: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
    """Materialize the (nH, S+1, S+1) BEiT bias from the (num_rel, nH) table.

    TPU-native: the timm formulation gathers (S+1)^2 rows, which is the
    single most expensive op in the BEiT forward on TPU (~40% of the trunk).
    The patch-patch part is a 2D Toeplitz in (dy, dx), so it factors into two
    small one-hot einsums on the MXU (exact, ~25x faster); the 3 cls entries
    are concatenated as border rows/cols. The einsum emits the heads-leading
    layout attention consumes directly — the former (S,S,H)->(H,S,S)
    transpose was ~37 MB of pure layout traffic per block, ~11 ms/frame
    across the 24 BEiT-L blocks.
    """
    nh = table.shape[-1]
    n_patch_rel = (2 * gh - 1) * (2 * gw - 1)
    t2 = table[:n_patch_rel].reshape(2 * gh - 1, 2 * gw - 1, nh)
    oy = jnp.asarray(_axis_onehot(gh), table.dtype)
    ox = jnp.asarray(_axis_onehot(gw), table.dtype)
    # one-hot selection must be exact: full precision for f32 tables (this
    # environment reduces the default matmul precision), native for bf16
    kw = {} if table.dtype == jnp.bfloat16 else {"precision": "highest"}
    m = jnp.einsum("ika,abh->ikbh", oy, t2, preferred_element_type=jnp.float32, **kw)
    patch = jnp.einsum(
        "jlb,ikbh->hijkl", ox, m.astype(table.dtype),
        preferred_element_type=jnp.float32, **kw,
    )  # (nh, gh, gw, gh, gw)
    s = gh * gw
    patch = patch.reshape(nh, s, s)
    dt = patch.dtype
    cls_to_all = jnp.broadcast_to(
        table[n_patch_rel].astype(dt)[:, None, None], (nh, 1, s)
    )
    all_to_cls = jnp.broadcast_to(
        table[n_patch_rel + 1].astype(dt)[:, None, None], (nh, s, 1)
    )
    cls_cls = table[n_patch_rel + 2].astype(dt)[:, None, None]  # (nh, 1, 1)
    top = jnp.concatenate([cls_cls, cls_to_all], axis=2)  # (nh, 1, s+1)
    body = jnp.concatenate([all_to_cls, patch], axis=2)  # (nh, s, s+1)
    return jnp.concatenate([top, body], axis=1)  # (nh, s+1, s+1)


def _relative_position_index(h: int, w: int) -> np.ndarray:
    """timm BEiT relative_position_index for an h*w window + cls token."""
    coords = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"))
    coords = coords.reshape(2, -1)  # (2, hw)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, hw, hw)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += h - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    num_rel = (2 * h - 1) * (2 * w - 1)
    idx = np.zeros((h * w + 1, h * w + 1), dtype=np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel  # cls -> all
    idx[0:, 0] = num_rel + 1  # all -> cls
    idx[0, 0] = num_rel + 2  # cls -> cls
    return idx


class BeitAttention(nn.Module):
    dim: int
    num_heads: int
    grid: tuple[int, int]
    use_rel_bias: bool = True  # debug/profiling switch

    @nn.compact
    def __call__(self, x):
        b, s, d = x.shape
        hd = self.dim // self.num_heads
        gh, gw = self.grid
        num_rel = (2 * gh - 1) * (2 * gw - 1) + 3

        qkv_kernel = nn.Dense(self.dim * 3, use_bias=False, name="qkv")(x)
        q_bias = self.param("q_bias", nn.initializers.zeros, (self.dim,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (self.dim,))
        bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
        qkv = qkv_kernel + bias
        qkv = qkv.reshape(b, s, 3, self.num_heads, hd)
        q, k, v = [jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3)]

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.zeros,
            (num_rel, self.num_heads),
        )
        scale = hd**-0.5
        rel_bias = (
            relative_position_bias(table, gh, gw) if self.use_rel_bias else None
        )  # (H, S, S)

        # Exact attention on XLA: matmuls stay in the input dtype (bf16 on
        # TPU MXU) with f32 accumulation; softmax in f32. A Pallas flash
        # kernel with the bias folded per-block was built and swept on-chip
        # (round 3) and measured BELOW this path end-to-end at the BEiT-L
        # geometry (S=769: both S^2 matrices fit VMEM, so online softmax
        # only adds overhead) — see docs/performance.md "Retired kernels".
        att = jnp.einsum(
            "bhqd,bhkd->bhqk", q * jnp.asarray(scale, q.dtype), k,
            preferred_element_type=jnp.float32,
        )
        if rel_bias is not None:
            att = att + rel_bias[None].astype(att.dtype)
        att = nn.softmax(att.astype(jnp.float32), axis=-1)
        o = jnp.einsum(
            "bhqk,bhkd->bhqd", att.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        o = jnp.transpose(o, (0, 2, 1, 3)).reshape(b, s, d)
        return nn.Dense(self.dim, name="proj")(o)


class BeitBlock(nn.Module):
    dim: int
    num_heads: int
    grid: tuple[int, int]
    mlp_ratio: float = 4.0
    init_values: float = 1e-5
    use_rel_bias: bool = True

    @nn.compact
    def __call__(self, x):
        g1 = self.param("gamma_1", nn.initializers.constant(self.init_values), (self.dim,))
        g2 = self.param("gamma_2", nn.initializers.constant(self.init_values), (self.dim,))
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = BeitAttention(self.dim, self.num_heads, self.grid, self.use_rel_bias, name="attn")(h)
        x = x + g1 * h
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(h)
        h = gelu(h)
        h = nn.Dense(self.dim, name="fc2")(h)
        return x + g2 * h


class BeitLarge(nn.Module):
    """BEiT-L/16 trunk returning tokens at the 4 DPT tap depths [5,11,17,23]."""

    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch_size: int = 16
    taps: tuple[int, ...] = (5, 11, 17, 23)
    use_rel_bias: bool = True

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        gh, gw = h // self.patch_size, w // self.patch_size
        tok = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            name="patch_embed",
        )(x)
        tok = tok.reshape(b, gh * gw, self.embed_dim)
        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, self.embed_dim))
        tok = jnp.concatenate([jnp.broadcast_to(cls_token, (b, 1, self.embed_dim)), tok], axis=1)

        outs = {}
        for i in range(self.depth):
            tok = BeitBlock(self.embed_dim, self.num_heads, (gh, gw), use_rel_bias=self.use_rel_bias, name=f"block{i}")(tok)
            if i in self.taps:
                outs[i] = tok
        return [outs[i] for i in self.taps], (gh, gw)


class MidasDPTBEiT(nn.Module):
    """DPT_BEiT_L_384 graph: BEiT trunk -> reassemble -> fusion -> head.

    Returns (rel_depth (B,H,W,1), [out_conv32, l4_rn, r4, r3, r2, r1]).
    """

    features: int = 256
    out_channels: tuple[int, ...] = (256, 512, 1024, 1024)
    use_rel_bias: bool = True
    # trunk size passthrough (defaults = BEiT-L/16; smaller for tests)
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    taps: tuple[int, ...] = (5, 11, 17, 23)

    @nn.compact
    def __call__(self, x):
        # PrepForMidas normalization (midas.py:177-188); resize is external
        x = (x - 0.5) / 0.5
        taps, (gh, gw) = BeitLarge(
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            taps=self.taps,
            use_rel_bias=self.use_rel_bias,
            name="pretrained",
        )(x)

        levels = []
        for i, tok in enumerate(taps):
            b, s, d = tok.shape
            cls = tok[:, :1]
            patches = tok[:, 1:]
            # readout 'project': cat cls to every token -> dense + gelu
            readout = jnp.broadcast_to(cls, patches.shape)
            h = jnp.concatenate([patches, readout], axis=-1)
            h = gelu(nn.Dense(d, name=f"readout{i}")(h))
            h = h.reshape(b, gh, gw, d)
            h = nn.Conv(self.out_channels[i], (1, 1), name=f"project{i}")(h)
            if i == 0:
                h = nn.ConvTranspose(self.out_channels[0], (4, 4), strides=(4, 4), name="resize0")(h)
            elif i == 1:
                h = nn.ConvTranspose(self.out_channels[1], (2, 2), strides=(2, 2), name="resize1")(h)
            elif i == 3:
                # torch pads k//2 both sides on this stride-2 conv
                h = nn.Conv(self.out_channels[3], (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), name="resize3")(h)
            levels.append(h)

        l1, l2, l3, l4 = levels
        l1rn = nn.Conv(self.features, (3, 3), use_bias=False, name="layer1_rn")(l1)
        l2rn = nn.Conv(self.features, (3, 3), use_bias=False, name="layer2_rn")(l2)
        l3rn = nn.Conv(self.features, (3, 3), use_bias=False, name="layer3_rn")(l3)
        l4rn = nn.Conv(self.features, (3, 3), use_bias=False, name="layer4_rn")(l4)

        r4 = FeatureFusionBlock(self.features, name="refinenet4")(l4rn, size=l3rn.shape[1:3])
        r3 = FeatureFusionBlock(self.features, name="refinenet3")(r4, l3rn, size=l2rn.shape[1:3])
        r2 = FeatureFusionBlock(self.features, name="refinenet2")(r3, l2rn, size=l1rn.shape[1:3])
        r1 = FeatureFusionBlock(self.features, name="refinenet1")(r2, l1rn)

        h = nn.Conv(self.features // 2, (3, 3), name="output_conv1")(r1)
        h = resize(h, (h.shape[1] * 2, h.shape[2] * 2), mode="bilinear", align_corners=True)
        out_conv = relu(nn.Conv(32, (3, 3), name="output_conv2_0")(h))
        rel = relu(nn.Conv(1, (1, 1), name="output_conv2_1")(out_conv))
        return rel, [out_conv, l4rn, r4, r3, r2, r1]
