"""Torch-transcription parity for the SAM-style TwoWayTransformer used by
the glb_att fusion path (reference estimator/models/blocks/
transformers.py:41-272: self-attn, downsampled token<->image cross-attn,
ReLU MLP, final token-to-image attention)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from patchrefinerv2_tpu.models.blocks.transformers import TwoWayTransformer

DIM, HEADS, MLP, DOWN = 32, 4, 64, 2


def _lin(x, P):
    return F.linear(
        x,
        torch.tensor(np.asarray(P["kernel"]).T),
        torch.tensor(np.asarray(P["bias"])),
    )


def _ln(x, P):
    return F.layer_norm(
        x, (x.shape[-1],),
        torch.tensor(np.asarray(P["scale"])),
        torch.tensor(np.asarray(P["bias"])),
    )


def t_attn(P, q, k, v, heads, down=1):
    internal = DIM // down
    q = _lin(q, P["q_proj"])
    k = _lin(k, P["k_proj"])
    v = _lin(v, P["v_proj"])

    def sep(x):
        b, n, c = x.shape
        return x.reshape(b, n, heads, c // heads).transpose(1, 2)

    q, k, v = sep(q), sep(k), sep(v)
    c_head = q.shape[-1]
    att = (q @ k.transpose(-2, -1)) / np.sqrt(c_head)
    att = att.softmax(-1)
    out = (att @ v).transpose(1, 2).reshape(q.shape[0], -1, internal)
    return _lin(out, P["out_proj"])


def t_block(P, queries, keys, q_pe, k_pe, skip_first):
    if skip_first:
        queries = t_attn(P["self_attn"], queries, queries, queries, HEADS)
    else:
        q = queries + q_pe
        queries = queries + t_attn(P["self_attn"], q, q, queries, HEADS)
    queries = _ln(queries, P["norm1"])
    q = queries + q_pe
    k = keys + k_pe
    queries = queries + t_attn(
        P["cross_attn_token_to_image"], q, k, keys, HEADS, DOWN
    )
    queries = _ln(queries, P["norm2"])
    mlp = _lin(F.relu(_lin(queries, P["mlp"]["lin1"])), P["mlp"]["lin2"])
    queries = _ln(queries + mlp, P["norm3"])
    q = queries + q_pe
    k = keys + k_pe
    keys = keys + t_attn(P["cross_attn_image_to_token"], k, q, queries, HEADS, DOWN)
    keys = _ln(keys, P["norm4"])
    return queries, keys


def test_twoway_transformer_matches_reference_transcription():
    rng = np.random.RandomState(0)
    patch = rng.randn(2, 3, 4, DIM).astype(np.float32)
    patch_pe = rng.randn(2, 3, 4, DIM).astype(np.float32)
    whole = rng.randn(2, 5, 6, DIM).astype(np.float32)
    whole_pe = rng.randn(2, 5, 6, DIM).astype(np.float32)

    mod = TwoWayTransformer(
        depth=2, embedding_dim=DIM, num_heads=HEADS, mlp_dim=MLP,
        attention_downsample_rate=DOWN,
    )
    variables = mod.init(
        jax.random.PRNGKey(0),
        jnp.asarray(patch), jnp.asarray(patch_pe),
        jnp.asarray(whole), jnp.asarray(whole_pe),
    )
    gq, gk = mod.apply(
        variables,
        jnp.asarray(patch), jnp.asarray(patch_pe),
        jnp.asarray(whole), jnp.asarray(whole_pe),
    )

    P = variables["params"]
    with torch.no_grad():
        queries = torch.tensor(patch.reshape(2, -1, DIM))
        q_pe = torch.tensor(patch_pe.reshape(2, -1, DIM))
        keys = torch.tensor(whole.reshape(2, -1, DIM))
        k_pe = torch.tensor(whole_pe.reshape(2, -1, DIM))
        for i in range(2):
            queries, keys = t_block(
                P[f"layer{i}"], queries, keys, q_pe, k_pe, skip_first=(i == 0)
            )
        q = queries + q_pe
        k = keys + k_pe
        queries = queries + t_attn(
            P["final_attn_token_to_image"], q, k, keys, HEADS, DOWN
        )
        queries = _ln(queries, P["norm_final_attn"])

    np.testing.assert_allclose(
        np.asarray(gq), queries.numpy().reshape(2, 3, 4, DIM), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(gk), keys.numpy().reshape(2, 5, 6, DIM), atol=2e-4, rtol=1e-3
    )


def test_position_embedding_random_matches_torch():
    """PositionEmbeddingRandom (position_embedding.py:28-76): grid coords
    (cumsum-0.5)/dim -> 2x-1 -> gaussian projection -> [sin, cos]."""
    from patchrefinerv2_tpu.models.blocks.transformers import PositionEmbeddingRandom

    h, w, nf = 6, 8, 16
    mod = PositionEmbeddingRandom(num_pos_feats=nf)
    variables = mod.init(jax.random.PRNGKey(0), (h, w))
    got = mod.apply(variables, (h, w))  # (h, w, 2*nf)

    gauss = torch.tensor(
        np.asarray(variables["params"]["positional_encoding_gaussian_matrix"])
    )
    grid = torch.ones((h, w))
    y = (grid.cumsum(0) - 0.5) / h
    x = (grid.cumsum(1) - 0.5) / w
    coords = 2 * torch.stack([x, y], dim=-1) - 1
    proj = 2 * np.pi * (coords @ gauss)
    ref = torch.cat([proj.sin(), proj.cos()], dim=-1)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5, rtol=1e-4)

    # pe_type='none' -> zeros (position_embedding.py:55-57)
    mod0 = PositionEmbeddingRandom(num_pos_feats=nf, pe_type="none")
    v0 = mod0.init(jax.random.PRNGKey(1), (h, w))
    assert not np.asarray(mod0.apply(v0, (h, w))).any()
