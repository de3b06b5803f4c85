"""Fused dense-masked swin window attention vs the XLA restatement
(interpret mode on CPU): SwinBlock outputs and gradients — including the
learned logit_scale and meta-MLP bias parameters — must agree across
impls; the full MAE model under window_attention_impl='fused' must match
'xla'.  The two impls share one parameter layout, so a single params
tree drives both."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpat_tpu.models.mae import (
    MAEConfig,
    MaskedAutoencoderViT,
    SwinBlock,
)
from tpat_tpu.ops import pallas_window_attention as pwa


def test_supports_geometry():
    # reference decoder at ESC-50 geometry: dim 512, 16 heads (head_dim
    # 32), grid (32, 8) -> 256 tokens: fused
    assert pwa.supports(16, 32, 256)
    # AudioSet grid (64, 8) -> 512 tokens: template slabs exceed VMEM
    assert not pwa.supports(16, 32, 512)
    assert not pwa.supports(16, 80, 256)  # head_dim must divide 128
    assert not pwa.supports(3, 32, 256)  # C must tile 128 lanes


def _blocks(shift):
    kw = dict(
        dim=128, num_heads=4, feat_size=(8, 8), window=(4, 4),
        shift=shift, mlp_ratio=2.0,
    )
    return SwinBlock(attn_impl="xla", **kw), SwinBlock(attn_impl="fused", **kw)


@pytest.mark.parametrize("shift", [(0, 0), (2, 0)])
def test_swin_block_fused_matches_xla(rng, shift):
    blk_x, blk_f = _blocks(shift)
    x = jnp.asarray(rng.normal(size=(2, 64, 128)).astype(np.float32))
    params = blk_x.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    np.testing.assert_allclose(
        np.asarray(blk_f.apply({"params": params}, x)),
        np.asarray(blk_x.apply({"params": params}, x)),
        rtol=1e-5, atol=1e-5,
    )


def test_swin_block_gradients_match_xla(rng):
    blk_x, blk_f = _blocks((2, 0))
    x = jnp.asarray(rng.normal(size=(2, 64, 128)).astype(np.float32))
    params = blk_x.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    # sharpen logit scales away from the constant init so d(scale) is
    # non-trivial per head
    params = jax.tree_util.tree_map(lambda p: p, params)
    params["attn"]["logit_scale"] = jnp.asarray(
        rng.normal(size=(4,)).astype(np.float32)
    )

    def loss(blk):
        def f(p, x):
            return jnp.sum(blk.apply({"params": p}, x) ** 2)

        return f

    gx_p, gx_x = jax.grad(loss(blk_x), argnums=(0, 1))(params, x)
    gf_p, gf_x = jax.grad(loss(blk_f), argnums=(0, 1))(params, x)

    np.testing.assert_allclose(
        np.asarray(gf_x), np.asarray(gx_x), rtol=1e-4, atol=1e-4
    )
    flat_x = jax.tree_util.tree_leaves_with_path(gx_p)
    flat_f = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(gf_p)
    )
    assert flat_x and len(flat_x) == len(flat_f)
    for key, vx in flat_x:
        vf = flat_f[jax.tree_util.keystr(key)]
        np.testing.assert_allclose(
            np.asarray(vf), np.asarray(vx), rtol=1e-4, atol=1e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(key)}",
        )


def test_mae_model_fused_matches_xla(rng):
    common = dict(
        embed_dim=96, depth=2, num_heads=3, decoder_embed_dim=128,
        decoder_depth=2, decoder_num_heads=4, decoder_mode=1,
        target_length=128, num_mel_bins=128, window_size=(4, 4),
    )
    cfg_x = MAEConfig(window_attention_impl="xla", **common)
    cfg_f = MAEConfig(window_attention_impl="fused", **common)
    t, f = cfg_f.grid
    assert pwa.supports(
        cfg_f.decoder_num_heads,
        cfg_f.decoder_embed_dim // cfg_f.decoder_num_heads,
        t * f,
    )
    x = jnp.asarray(rng.normal(size=(2, 1, 128, 128)).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)}
    m_x = MaskedAutoencoderViT(cfg_x)
    m_f = MaskedAutoencoderViT(cfg_f)
    params = m_x.init(rngs, x, 0.75)["params"]
    loss_x, pred_x, _ = m_x.apply(
        {"params": params}, x, 0.75, rng=jax.random.PRNGKey(7)
    )
    loss_f, pred_f, _ = m_f.apply(
        {"params": params}, x, 0.75, rng=jax.random.PRNGKey(7)
    )
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pred_f), np.asarray(pred_x), rtol=1e-4, atol=1e-5
    )


def test_auto_falls_back_on_unsupported_geometry(rng):
    # head_dim 48 does not divide 128 -> 'auto' must take the XLA path
    blk = SwinBlock(
        dim=96, num_heads=2, feat_size=(8, 8), window=(4, 4),
        shift=(2, 0), mlp_ratio=2.0, attn_impl="auto",
    )
    x = jnp.asarray(rng.normal(size=(1, 64, 96)).astype(np.float32))
    params = blk.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    assert blk.apply({"params": params}, x).shape == (1, 64, 96)


def test_template_excludes_cross_window_pairs():
    t = pwa.build_window_template(
        jnp.zeros((1, 16, 16), jnp.float32), (8, 8), (4, 4), (0, 0), None
    )
    t = np.asarray(t)[0]
    # token 0 (tile 0,0) and token 4 (tile 0,1) are in different windows
    assert t[0, 4] <= -1e29
    # tokens 0 and 1 share the first window, bias 0 -> additive 0
    assert t[0, 1] == 0.0
    # every row keeps exactly 16 in-window partners
    assert ((t > -1e29).sum(axis=1) == 16).all()
