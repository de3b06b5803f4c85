"""Fused LayerNorm kernel vs flax: forward and gradients (interpret mode
on CPU), tail-row padding correctness, and model-level integration."""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpat_tpu.ops.pallas_layernorm import fused_layernorm, supports


@pytest.mark.parametrize("m,d", [(8, 128), (515, 256), (1024, 768)])
def test_fused_ln_matches_flax(rng, m, d):
    x = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))

    got = fused_layernorm(x, scale, bias, 1e-6)
    ln = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False)
    want = ln.apply({"params": {"scale": scale, "bias": bias}}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_ln_gradients_match(rng):
    m, d = 130, 256  # non-multiple of the row block: exercises tail pad
    x = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))
    scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=(d,)).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.normal(size=(d,)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))

    def loss_fused(x, s, b):
        return jnp.sum(w * fused_layernorm(x, s, b, 1e-6))

    def loss_flax(x, s, b):
        ln = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False)
        return jnp.sum(w * ln.apply({"params": {"scale": s, "bias": b}}, x))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    gx = jax.grad(loss_flax, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)


def test_fused_ln_3d_and_bf16(rng):
    x = jnp.asarray(
        rng.normal(size=(2, 17, 128)).astype(np.float32)
    ).astype(jnp.bfloat16)
    scale = jnp.ones((128,))
    bias = jnp.zeros((128,))
    y = fused_layernorm(x, scale, bias, 1e-6)
    assert y.shape == x.shape and y.dtype == jnp.bfloat16
    row = np.asarray(y[0, 3]).astype(np.float32)
    assert abs(row.mean()) < 0.05 and abs(row.std() - 1.0) < 0.05


def test_supports():
    assert supports(768) and supports(128)
    assert not supports(192) or 192 % 128 == 0  # 192 not lane-aligned
    assert not supports(100)
