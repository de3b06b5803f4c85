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
    # 32), grid (32, 8) -> 256 tokens: fused (bf16 and f32 both fit)
    assert pwa.supports(16, 32, 256)
    assert pwa.supports(16, 32, 256, itemsize=4)
    # AudioSet grid (64, 8) -> 512 tokens: template slabs exceed VMEM
    assert not pwa.supports(16, 32, 512)
    assert not pwa.supports(16, 80, 256)  # head_dim must divide 128
    assert not pwa.supports(3, 32, 256)  # C must tile 128 lanes
    # intermediate grid (56, 8) -> 448 tokens: bf16 io fits beside the
    # template slabs, the f32 backward does not — itemsize must gate it
    assert pwa.supports(16, 32, 448, itemsize=2)
    assert not pwa.supports(16, 32, 448, itemsize=4)
    # _batch_group signals infeasibility (0) rather than launching g=1
    # past the VMEM budget
    assert pwa._batch_group(1, 448, 4, 4, n_io=7, n_tmpl=2) == 0


def _blocks(shift):
    kw = dict(
        dim=128, num_heads=4, feat_size=(8, 8), window=(4, 4),
        shift=shift, mlp_ratio=2.0,
    )
    return SwinBlock(attn_impl="xla", **kw), SwinBlock(attn_impl="fused", **kw)


def _assert_param_grads_match(ref_grads, got_grads, rtol=1e-3, atol=5e-4):
    """Elementwise grad parity with tolerances sized for f32
    different-reduction-order noise: gradients in these tests span 1e2+
    magnitudes, and the fused/XLA paths disagree by <= ~2e-4 absolute on
    near-zero elements (measured), so atol sits just above that."""
    flat_x = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat_f = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(got_grads)
    )
    assert flat_x and len(flat_x) == len(flat_f)
    for key, vx in flat_x:
        ks = jax.tree_util.keystr(key)
        if "meta_fc2" in ks and "bias" in ks:
            # d(meta_fc2.bias) is the full sum of d(template), exactly
            # zero in real arithmetic (softmax dlog rows sum to 0) —
            # both impls produce only cancellation noise, which need
            # not agree elementwise; require both to be noise-sized
            assert float(np.abs(np.asarray(vx)).max()) < 5e-3
            assert float(np.abs(np.asarray(flat_f[ks])).max()) < 5e-3
            continue
        np.testing.assert_allclose(
            np.asarray(flat_f[ks]), np.asarray(vx), rtol=rtol, atol=atol,
            err_msg=f"grad mismatch at {ks}",
        )


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
    _assert_param_grads_match(gx_p, gf_p)


def test_multi_laneblock_multi_group_gradients_match_xla(rng):
    """dim 256 (8 heads x 32 -> hb=2 lane blocks) at batch 16 (two
    batch-group grid steps in interpret mode): exercises the backward
    kernel's j-indexed head/scale/template block mapping and the
    ``i != 0`` d(scale)/d(template) accumulation branch that the
    dim-128/batch-2 geometries above never reach."""
    kw = dict(
        dim=256, num_heads=8, feat_size=(8, 8), window=(4, 4),
        shift=(2, 2), mlp_ratio=1.0,
    )
    blk_x = SwinBlock(attn_impl="xla", **kw)
    blk_f = SwinBlock(attn_impl="fused", **kw)
    x = jnp.asarray(rng.normal(size=(16, 64, 256)).astype(np.float32))
    params = blk_x.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    params["attn"]["logit_scale"] = jnp.asarray(
        rng.normal(size=(8,)).astype(np.float32)
    )
    # both grid dims really iterate: 2 lane blocks, >1 batch group step
    g = pwa._batch_group(16, 64, 4, 4, n_io=7, n_tmpl=2)
    assert g >= 1 and 16 // g > 1

    def loss(blk):
        return lambda p, x: jnp.sum(blk.apply({"params": p}, x) ** 2)

    gx_p, gx_x = jax.grad(loss(blk_x), argnums=(0, 1))(params, x)
    gf_p, gf_x = jax.grad(loss(blk_f), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(
        np.asarray(gf_x), np.asarray(gx_x), rtol=1e-4, atol=1e-4
    )
    _assert_param_grads_match(gx_p, gf_p)


@pytest.mark.parametrize("shift", [(0, 0), (2, 0)])
def test_banded_matches_xla(rng, shift):
    """Window-order block-diagonal kernel vs the XLA restatement at the
    minimum chunked grid (16, 8) -> 128 tokens: forward and full
    gradient parity (params incl. logit_scale/meta-MLP bias, input)."""
    kw = dict(
        dim=128, num_heads=4, feat_size=(16, 8), window=(4, 4),
        shift=shift, mlp_ratio=1.0,
    )
    blk_x = SwinBlock(attn_impl="xla", **kw)
    blk_b = SwinBlock(attn_impl="banded", **kw)
    x = jnp.asarray(rng.normal(size=(2, 128, 128)).astype(np.float32))
    params = blk_x.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    params["attn"]["logit_scale"] = jnp.asarray(
        rng.normal(size=(4,)).astype(np.float32)
    )
    np.testing.assert_allclose(
        np.asarray(blk_b.apply({"params": params}, x)),
        np.asarray(blk_x.apply({"params": params}, x)),
        rtol=1e-5, atol=1e-5,
    )

    def loss(blk):
        return lambda p, x: jnp.sum(blk.apply({"params": p}, x) ** 2)

    gx_p, gx_x = jax.grad(loss(blk_x), argnums=(0, 1))(params, x)
    gb_p, gb_x = jax.grad(loss(blk_b), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(
        np.asarray(gb_x), np.asarray(gx_x), rtol=1e-4, atol=1e-4
    )
    _assert_param_grads_match(gx_p, gb_p)


def test_banded_audioset_grid_matches_xla(rng):
    """The AudioSet decoder grid (64, 8) -> 512 tokens — the geometry
    whose dense template exceeds VMEM — through the banded kernel
    (4 diagonal chunks, multi-chunk d(scale)/d(template) accumulation)
    vs the XLA restatement, with the shifted mask active."""
    kw = dict(
        dim=128, num_heads=4, feat_size=(64, 8), window=(4, 4),
        shift=(2, 0), mlp_ratio=1.0,
    )
    assert pwa.supports_banded(4, 32, 512, 16)
    blk_x = SwinBlock(attn_impl="xla", **kw)
    blk_b = SwinBlock(attn_impl="banded", **kw)
    x = jnp.asarray(rng.normal(size=(2, 512, 128)).astype(np.float32))
    params = blk_x.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    params["attn"]["logit_scale"] = jnp.asarray(
        rng.normal(size=(4,)).astype(np.float32)
    )

    def loss(blk):
        return lambda p, x: jnp.sum(blk.apply({"params": p}, x) ** 2)

    (lx, gx), (lb, gb) = (
        jax.value_and_grad(loss(blk_x))(params, x),
        jax.value_and_grad(loss(blk_b))(params, x),
    )
    np.testing.assert_allclose(float(lb), float(lx), rtol=1e-5)
    _assert_param_grads_match(gx, gb)


def test_auto_selects_banded_on_audioset_grid():
    """'auto' at the real AudioSet decoder geometry (dim 512, 16 heads,
    N=512, f32) must route to the banded kernel: dense is infeasible,
    banded is supported."""
    assert not pwa.supports(16, 32, 512, itemsize=4)
    assert pwa.supports_banded(16, 32, 512, 16, itemsize=4)


def test_window_order_roundtrip():
    perm, inv_perm, wo_win, wo_pos = pwa.window_order((8, 8), (4, 4), (2, 2))
    assert (perm[inv_perm] == np.arange(64)).all()
    # window-major: window ids non-decreasing, 16 tokens each, positions
    # 0..15 within each window
    assert (np.diff(wo_win) >= 0).all()
    assert (wo_pos.reshape(4, 16) == np.arange(16)).all()


def test_mae_model_fused_matches_xla(rng):
    common = dict(
        embed_dim=96, depth=2, num_heads=3, decoder_embed_dim=128,
        decoder_depth=2, decoder_num_heads=4, decoder_mode=1,
        target_length=128, num_mel_bins=128, window_size=(4, 4),
        compute_dtype="float32",
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


def test_mae_model_banded_matches_xla(rng):
    """Full MAE model with the banded decoder kernel forced, at a grid
    large enough to chunk (target_length 256 -> decoder grid (16,8) =
    128 tokens): loss and reconstruction must match the XLA
    restatement."""
    common = dict(
        embed_dim=96, depth=2, num_heads=3, decoder_embed_dim=128,
        decoder_depth=2, decoder_num_heads=4, decoder_mode=1,
        target_length=256, num_mel_bins=128, window_size=(4, 4),
        compute_dtype="float32",
    )
    cfg_x = MAEConfig(window_attention_impl="xla", **common)
    cfg_b = MAEConfig(window_attention_impl="banded", **common)
    t, f = cfg_b.grid
    assert pwa.supports_banded(
        cfg_b.decoder_num_heads,
        cfg_b.decoder_embed_dim // cfg_b.decoder_num_heads,
        t * f, 16,
    )
    x = jnp.asarray(rng.normal(size=(2, 1, 256, 128)).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)}
    m_x = MaskedAutoencoderViT(cfg_x)
    m_b = MaskedAutoencoderViT(cfg_b)
    params = m_x.init(rngs, x, 0.75)["params"]
    loss_x, pred_x, _ = m_x.apply(
        {"params": params}, x, 0.75, rng=jax.random.PRNGKey(7)
    )
    loss_b, pred_b, _ = m_b.apply(
        {"params": params}, x, 0.75, rng=jax.random.PRNGKey(7)
    )
    np.testing.assert_allclose(float(loss_b), float(loss_x), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pred_b), np.asarray(pred_x), rtol=1e-4, atol=1e-5
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
