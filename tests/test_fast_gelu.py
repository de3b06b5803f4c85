"""Polynomial GELU (ops/fast_gelu.py): accuracy envelope and the Mlp
dtype gating that keeps float32 compute on exact erf."""

import numpy as np

import jax
import jax.numpy as jnp

from tpat_tpu.ops.fast_gelu import gelu_poly


def test_gelu_poly_accuracy_envelope(rng):
    """Max abs error vs exact-erf GELU stays under 2e-4 everywhere
    (documented 1.3e-4 fit bound + f32 evaluation slack), including the
    clipped |x| > 4 tails, and the gradient stays within 6e-3."""
    x = jnp.asarray(
        np.concatenate([
            rng.normal(size=100_000) * 2.0,
            np.linspace(-12.0, 12.0, 10_001),
        ]).astype(np.float32)
    )
    exact = jax.nn.gelu(x, approximate=False)
    poly = gelu_poly(x)
    assert float(jnp.max(jnp.abs(exact - poly))) < 2e-4
    g_e = jax.grad(lambda v: jnp.sum(jax.nn.gelu(v, approximate=False)))(x)
    g_p = jax.grad(lambda v: jnp.sum(gelu_poly(v)))(x)
    assert float(jnp.max(jnp.abs(g_e - g_p))) < 6e-3


def test_gelu_poly_beats_native_bf16_erf(rng):
    """In bf16 the polynomial must be at least as close to the f32 truth
    as XLA's bf16-native erf — the claim that justifies making it the
    bf16 default (docs/BENCH_NOTES.md 'GELU epilogue')."""
    xb = jnp.asarray(
        (rng.normal(size=200_000) * 2.0).astype(np.float32)
    ).astype(jnp.bfloat16)
    truth = jax.nn.gelu(
        xb.astype(jnp.float32), approximate=False
    ).astype(jnp.bfloat16)

    def flips(a):
        return float(jnp.mean((a != truth).astype(jnp.float32)))

    f_poly = flips(gelu_poly(xb))
    f_native = flips(jax.nn.gelu(xb, approximate=False))
    assert f_poly <= f_native
    # and poly deviations are at most one bf16 ulp of the local magnitude
    dev = jnp.abs(
        gelu_poly(xb).astype(jnp.float32) - truth.astype(jnp.float32)
    )
    ulp = jnp.maximum(jnp.abs(truth.astype(jnp.float32)), 2.0 ** -14) * 2.0 ** -7
    assert bool(jnp.all(dev <= ulp + 2e-4))


def test_mlp_gelu_dtype_gating(rng):
    """Mlp 'auto': float32 activations use exact erf (bit-identical to
    the previous behavior); bfloat16 activations route through the
    polynomial; gelu_impl='exact' forces erf even in bf16."""
    from tpat_tpu.config import audiomae_vit_tiny
    from tpat_tpu.models.vit import AudioViT

    x = jnp.asarray(rng.normal(size=(2, 1, 64, 32)).astype(np.float32))
    outs = {}
    for dtype, impl in [
        ("float32", "auto"), ("float32", "exact"),
        ("bfloat16", "auto"), ("bfloat16", "exact"), ("bfloat16", "poly"),
    ]:
        cfg = audiomae_vit_tiny(
            target_length=64, num_mel_bins=32, num_classes=4,
            compute_dtype=dtype, gelu_impl=impl, drop_path_rate=0.0,
            drop_loc=(1, 3), base_keep_rate=0.7,
        )
        model = AudioViT(cfg)
        params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
        outs[(dtype, impl)] = np.asarray(
            model.apply({"params": params}, x), np.float32
        )
    # f32: auto == exact, bit-identical
    np.testing.assert_array_equal(
        outs[("float32", "auto")], outs[("float32", "exact")]
    )
    # bf16: auto == poly (the gate routes to the polynomial)...
    np.testing.assert_array_equal(
        outs[("bfloat16", "auto")], outs[("bfloat16", "poly")]
    )
    # ...and both stay within bf16 tolerance of the exact-erf variant
    np.testing.assert_allclose(
        outs[("bfloat16", "auto")], outs[("bfloat16", "exact")],
        rtol=3e-2, atol=3e-2,
    )


def test_mae_gelu_impl_plumbed(rng):
    """MAEConfig.gelu_impl reaches every Mlp in the model — encoder
    Blocks AND the swin decoder's SwinBlock MLPs: under bf16,
    'exact' must change the loss vs 'poly' (the escape hatch works),
    while f32 'auto' equals f32 'exact' bit-for-bit."""
    from tpat_tpu.models.mae import MAEConfig, MaskedAutoencoderViT

    x = jnp.asarray(rng.normal(size=(2, 1, 64, 32)).astype(np.float32))

    def loss(dtype, impl):
        cfg = MAEConfig(
            embed_dim=64, depth=2, num_heads=2,
            decoder_embed_dim=32, decoder_num_heads=2, decoder_depth=2,
            target_length=64, num_mel_bins=32, window_size=(2, 2),
            decoder_mode=1, compute_dtype=dtype, gelu_impl=impl,
        )
        model = MaskedAutoencoderViT(cfg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
            x, 0.75,
        )
        out = model.apply(
            variables, x, 0.75, rngs={"masking": jax.random.PRNGKey(2)}
        )
        return np.asarray(out[0], np.float32)

    assert loss("float32", "auto") == loss("float32", "exact")
    assert loss("bfloat16", "exact") != loss("bfloat16", "poly")
