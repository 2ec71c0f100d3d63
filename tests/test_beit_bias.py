"""The Toeplitz-factored BEiT relative-position bias must equal the direct
table gather (the timm formulation)."""

import jax.numpy as jnp
import numpy as np

from patchrefinerv2_tpu.models.backbones.beit import (
    _relative_position_index,
    relative_position_bias,
)


def test_bias_matches_gather():
    gh, gw = 6, 8
    num_rel = (2 * gh - 1) * (2 * gw - 1) + 3
    nh = 4
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(num_rel, nh).astype(np.float32))

    idx = _relative_position_index(gh, gw)
    s = gh * gw + 1
    ref = np.asarray(table)[idx.reshape(-1)].reshape(s, s, nh)
    ref = ref.transpose(2, 0, 1)  # heads-leading layout (what attention adds)
    got = np.asarray(relative_position_bias(table, gh, gw))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
