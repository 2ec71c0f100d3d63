"""Pallas flash attention vs the exact XLA path: forward and the full
Pallas backward (flash-attention-2 recomputation), including ragged
sequence lengths that exercise the pad-masking in both directions.

Reference numerics ground truth: plain softmax attention
(external/depth_anything_v2/dinov2_layers/attention.py:49-61)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchrefinerv2_tpu.ops.attention import flash_mha, mha_reference


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


@pytest.mark.parametrize("sq,skv", [(128, 128), (130, 70), (64, 257)])
def test_flash_forward_matches_reference(sq, skv):
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = _rand(k0, (2, 3, sq, 32))
    k = _rand(k1, (2, 3, skv, 32))
    v = _rand(k2, (2, 3, skv, 32))
    out = flash_mha(q, k, v, block_q=64, block_kv=64, interpret=True)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("sq,skv", [(128, 128), (130, 70)])
def test_flash_backward_matches_reference(sq, skv):
    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 4)
    q = _rand(k0, (2, 2, sq, 32))
    k = _rand(k1, (2, 2, skv, 32))
    v = _rand(k2, (2, 2, skv, 32))
    ct = _rand(k3, (2, 2, sq, 32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_mha(q, k, v, block_q=64, block_kv=64, interpret=True) * ct)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v) * ct)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5, err_msg=name
        )


def test_flash_backward_custom_scale_bf16():
    """bf16 inputs with an explicit scale: gradients stay finite and close
    to the f32 reference within bf16 tolerance."""
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(3), 3)
    q = _rand(k0, (1, 2, 96, 64), jnp.bfloat16)
    k = _rand(k1, (1, 2, 96, 64), jnp.bfloat16)
    v = _rand(k2, (1, 2, 96, 64), jnp.bfloat16)

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_mha(q, k, v, 0.1, block_q=32, block_kv=32, interpret=True)
            .astype(jnp.float32)
        )

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, 0.1).astype(jnp.float32))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        a32 = np.asarray(a, np.float32)
        b32 = np.asarray(b, np.float32)
        assert np.isfinite(a32).all()
        np.testing.assert_allclose(a32, b32, atol=0.05, rtol=0.05)


def test_flash_grad_under_jit():
    """The custom_vjp composes with jit + value_and_grad (the train-step
    shape): one compiled program, finite grads, matches reference."""
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(11), 3)
    q = _rand(k0, (1, 2, 100, 32))
    k = _rand(k1, (1, 2, 100, 32))
    v = _rand(k2, (1, 2, 100, 32))

    @jax.jit
    def step(q, k, v):
        def loss(q, k, v):
            o = flash_mha(q, k, v, block_q=64, block_kv=64, interpret=True)
            return jnp.mean(o * o)

        return jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)

    val, grads = step(q, k, v)

    def loss_ref(q, k, v):
        o = mha_reference(q, k, v)
        return jnp.mean(o * o)

    val_r, grads_r = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(val), float(val_r), rtol=1e-5)
    for a, b in zip(grads, grads_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5)


def test_flash_bias_matches_reference():
    """Additive (H, Sq, Skv) bias (the BEiT rel-pos shape), odd lengths so
    both q and kv padding paths run under the bias."""
    import jax

    rng = jax.random.PRNGKey(7)
    kq, kk, kv_, kb = jax.random.split(rng, 4)
    b, h, s, d = 2, 3, 37, 32
    q = jax.random.normal(kq, (b, h, s, d))
    k = jax.random.normal(kk, (b, h, s, d))
    v = jax.random.normal(kv_, (b, h, s, d))
    bias = jax.random.normal(kb, (h, s, s))

    sc = d**-0.5
    att = jnp.einsum("bhqd,bhkd->bhqk", q * sc, k) + bias[None]
    p = jax.nn.softmax(att, axis=-1)
    ref = jnp.einsum("bhqk,bhkd->bhqd", p, v)

    out = flash_mha(q, k, v, bias=bias, block_q=16, block_kv=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_beit_attention_flash_matches_dense(monkeypatch):
    from patchrefinerv2_tpu.models.backbones.beit import BeitAttention
    import jax

    m = BeitAttention(dim=64, num_heads=4, grid=(3, 5))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64))
    params = m.init(jax.random.PRNGKey(1), x)
    # non-zero rel-pos table so the bias actually matters
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 if a.ndim == 2 else a, params
    )
    ref = m.apply(params, x)
    monkeypatch.setenv("PRV2_FLASH_BEIT", "1")
    monkeypatch.setenv("PRV2_FUSED_FORCE", "1")
    got = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-5, atol=5e-5)
