"""MAE pretraining model tests: patchify round-trip, masking semantics
(counts, restore composition, 2D union mask), forward/loss, and a short
overfit run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpat_tpu.models.mae import MAEConfig, MaskedAutoencoderViT


def tiny_mae(decoder_mode):
    return MAEConfig(
        compute_dtype="float32",
        embed_dim=64,
        depth=2,
        num_heads=2,
        decoder_embed_dim=32,
        decoder_depth=2,
        decoder_num_heads=2,
        decoder_mode=decoder_mode,
        window_size=(2, 2),
        target_length=64,
        num_mel_bins=32,
    )


def test_patchify_roundtrip(rng):
    cfg = tiny_mae(0)
    model = MaskedAutoencoderViT(cfg)
    imgs = jnp.asarray(rng.normal(size=(2, 1, 64, 32)).astype(np.float32))
    x = model.patchify(imgs)
    assert x.shape == (2, cfg.num_patches, 256)
    back = model.unpatchify(x)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(imgs))


def test_random_masking_semantics(rng):
    cfg = tiny_mae(0)
    model = MaskedAutoencoderViT(cfg)
    x = jnp.asarray(rng.normal(size=(2, 8, 4)).astype(np.float32))
    xm, mask, ids_restore = model.random_masking(x, 0.75, jax.random.PRNGKey(0))
    assert xm.shape == (2, 2, 4)  # int(8 * 0.25)
    assert mask.shape == (2, 8)
    np.testing.assert_array_equal(np.asarray(mask).sum(axis=1), [6, 6])
    # restore composition: visible tokens land where mask == 0
    m = np.asarray(mask)
    for b in range(2):
        vis_positions = np.where(m[b] == 0)[0]
        assert len(vis_positions) == 2


def test_random_masking_2d_union(rng):
    cfg = tiny_mae(0)  # grid (4, 2)
    model = MaskedAutoencoderViT(cfg)
    x = jnp.asarray(rng.normal(size=(3, 8, 4)).astype(np.float32))
    xm, mask, ids_restore = model.random_masking_2d(
        x, 0.5, 0.5, jax.random.PRNGKey(1)
    )
    # keep 2 of 4 time rows and 1 of 2 freq cols -> 2 tokens kept
    assert xm.shape == (3, 2, 4)
    np.testing.assert_array_equal(np.asarray(mask).sum(axis=1), [6, 6, 6])


@pytest.mark.parametrize("decoder_mode", [0, 1])
def test_mae_forward_and_loss(rng, decoder_mode):
    cfg = tiny_mae(decoder_mode)
    model = MaskedAutoencoderViT(cfg)
    imgs = jnp.asarray(rng.normal(size=(2, 1, 64, 32)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        imgs,
        0.75,
    )
    loss, pred, mask = model.apply(
        variables, imgs, 0.75, rngs={"masking": jax.random.PRNGKey(2)}
    )
    assert np.isfinite(float(loss))
    assert pred.shape == (2, cfg.num_patches, 256)
    assert mask.shape == (2, cfg.num_patches)


def test_swin_v2_cr_block_matches_torch(rng):
    """The decoder block math (cosine attention + logit scale + log-CPB
    meta-MLP + shift masking + V2 post-norm) matches a torch restatement of
    timm's SwinTransformerV2CrBlock at the reference's shifted
    configuration."""
    import torch

    from tests.torch_reference import RefSwinV2CrBlock
    from tpat_tpu.models.mae import SwinBlock
    from tpat_tpu.utils.torch_import import _swin_v2_cr_block

    dim, heads, feat, window, shift = 32, 4, (8, 4), (4, 4), (2, 0)
    torch.manual_seed(0)
    ref = RefSwinV2CrBlock(dim, heads, feat, window, shift).eval()
    sd = {f"b.{k}": v.numpy() for k, v in ref.state_dict().items()}
    params = _swin_v2_cr_block(sd, "b")

    x = rng.normal(size=(2, feat[0] * feat[1], dim)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    blk = SwinBlock(dim, heads, feat, window, shift)
    got = np.asarray(blk.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_mae_swin_decoder_import_matches_torch(rng):
    """A full reference-layout MAE state_dict (encoder + swin_v2_cr decoder)
    imports into the exact flax param tree, and the imported decoder
    reproduces the torch decoder path (models_mae.py:357-404) on the same
    latent/ids_restore."""
    import torch
    import torch.nn as nn

    from tests.torch_reference import RefBlock, RefMAEDecoder, RefPatchEmbed
    from tpat_tpu.utils.torch_import import mae_params_from_state_dict

    cfg = tiny_mae(1)  # grid (4, 2), window (2, 2), dd=32
    model = MaskedAutoencoderViT(cfg)
    p = cfg.num_patches

    class _Enc(nn.Module):
        def __init__(self):
            super().__init__()
            self.cls_token = nn.Parameter(torch.randn(1, 1, cfg.embed_dim))
            self.pos_embed = nn.Parameter(
                torch.randn(1, p + 1, cfg.embed_dim), requires_grad=False
            )
            self.patch_embed = RefPatchEmbed(cfg.embed_dim)
            self.blocks = nn.ModuleList(
                [
                    RefBlock(cfg.embed_dim, cfg.num_heads, 1, "patch_mean")
                    for _ in range(cfg.depth)
                ]
            )
            self.norm = nn.LayerNorm(cfg.embed_dim, eps=1e-6)

    torch.manual_seed(1)
    enc = _Enc()
    dec = RefMAEDecoder(
        dim_enc=cfg.embed_dim,
        dim_dec=cfg.decoder_embed_dim,
        depth=cfg.decoder_depth,
        num_heads=cfg.decoder_num_heads,
        feat_size=cfg.grid,
        window=cfg.window_size,
        pred_dim=cfg.patch_size ** 2,
    ).eval()
    with torch.no_grad():
        dec.mask_token.normal_()
        dec.decoder_pos_embed.normal_()
    sd = {
        **{k: v.numpy() for k, v in enc.state_dict().items()},
        **{k: v.numpy() for k, v in dec.state_dict().items()},
    }
    imported = mae_params_from_state_dict(sd)

    # structural fidelity: imported tree == init tree, key for key
    imgs = jnp.asarray(rng.normal(size=(2, 1, 64, 32)).astype(np.float32))
    init_params = model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        imgs,
        0.75,
    )["params"]

    def flat(tree, pre=""):
        if not isinstance(tree, dict):
            return {pre: tuple(np.shape(tree))}
        out = {}
        for k, v in tree.items():
            out.update(flat(v, f"{pre}/{k}"))
        return out

    assert flat(imported) == flat(init_params)

    # decoder forward parity on a shared latent / ids_restore
    len_keep = 3
    latent = rng.normal(size=(2, 1 + len_keep, cfg.embed_dim)).astype(
        np.float32
    )
    ids_restore = np.stack(
        [rng.permutation(p) for _ in range(2)]
    ).astype(np.int64)
    with torch.no_grad():
        want = dec(
            torch.from_numpy(latent), torch.from_numpy(ids_restore)
        ).numpy()
    got = np.asarray(
        model.apply(
            {"params": imported},
            jnp.asarray(latent),
            jnp.asarray(ids_restore),
            method=MaskedAutoencoderViT.forward_decoder,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("decoder_mode", [0, 1])
def test_mae_export_import_roundtrip(rng, tmp_path, decoder_mode):
    """save_pth(flavor='mae') -> mae_params_from_state_dict is lossless for
    both decoder flavors (the full pretraining checkpoint layout)."""
    from tpat_tpu.utils import torch_export as te
    from tpat_tpu.utils import torch_import as ti

    cfg = tiny_mae(decoder_mode)
    model = MaskedAutoencoderViT(cfg)
    imgs = jnp.asarray(rng.normal(size=(2, 1, 64, 32)).astype(np.float32))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        imgs,
        0.75,
    )["params"]
    path = str(tmp_path / "mae.pth")
    te.save_pth(path, params, flavor="mae", epoch=3)
    back = ti.mae_params_from_state_dict(ti.load_torch_state_dict(path))

    def flat(tree, pre=""):
        if not isinstance(tree, dict):
            return {pre: np.asarray(tree)}
        out = {}
        for k, v in tree.items():
            out.update(flat(v, f"{pre}/{k}"))
        return out

    a, b = flat(params), flat(back)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_mae_overfits_one_batch(rng):
    import optax

    cfg = tiny_mae(1)
    model = MaskedAutoencoderViT(cfg)
    imgs = jnp.asarray(rng.normal(size=(4, 1, 64, 32)).astype(np.float32))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        imgs, 0.5,
    )["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            loss, _, _ = model.apply(
                {"params": p}, imgs, 0.5, rngs={"masking": rng}
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    rng_ = jax.random.PRNGKey(3)
    for i in range(40):
        rng_, sub = jax.random.split(rng_)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    # random-noise targets learn slowly; expect a clear downward trend
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.97, (
        losses[:3] + losses[-3:]
    )


def test_mae_reference_init_distributions(rng):
    """Pretraining-from-scratch init matches models_mae.py:157-177: every
    Dense kernel is xavier_uniform (bounded by sqrt(6/(fan_in+fan_out)),
    reaching near the bound), biases zero, tokens ~ normal(0.02); the
    patch-embed conv uses xavier on the (O, I*kh*kw)-flattened view."""
    cfg = tiny_mae(1)
    model = MaskedAutoencoderViT(cfg)
    imgs = jnp.asarray(rng.normal(size=(2, 1, 64, 32)).astype(np.float32))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        imgs,
        0.75,
    )["params"]

    def check_xavier(kernel, name):
        k = np.asarray(kernel)
        fan_in, fan_out = k.shape[0], k.shape[-1]
        if k.ndim == 4:  # conv (kh, kw, I, O): torch flattened fan
            fan_in = k.shape[0] * k.shape[1] * k.shape[2]
            fan_out = k.shape[3]
        bound = np.sqrt(6.0 / (fan_in + fan_out))
        assert np.abs(k).max() <= bound * 1.0001, name
        assert np.abs(k).max() >= bound * 0.9, (name, "not uniform-to-bound")

    check_xavier(params["blocks_0"]["mlp"]["fc1"]["kernel"], "enc fc1")
    check_xavier(params["blocks_0"]["attn"]["qkv"]["kernel"], "enc qkv")
    check_xavier(params["decoder_blocks_0"]["attn"]["qkv"]["kernel"], "dec qkv")
    check_xavier(params["decoder_blocks_0"]["mlp"]["fc1"]["kernel"], "dec mlp")
    check_xavier(params["decoder_embed"]["kernel"], "decoder_embed")
    check_xavier(params["decoder_pred"]["kernel"], "decoder_pred")
    check_xavier(params["patch_embed"]["proj"]["kernel"], "patch conv")
    assert float(np.abs(params["blocks_0"]["mlp"]["fc1"]["bias"]).max()) == 0.0
    # tokens: plain normal(0.02) — the reference's comment notes timm's
    # trunc cutoff (2.0 absolute) is vacuous at std 0.02
    tok = np.asarray(params["cls_token"])
    assert 0.005 < tok.std() < 0.05


def test_norm_pix_loss_unbiased_var(rng):
    """norm_pix_loss normalizes targets with torch's unbiased variance
    (ddof=1, models_mae.py:412-415)."""
    import dataclasses

    cfg = dataclasses.replace(tiny_mae(0), norm_pix_loss=True)
    model = MaskedAutoencoderViT(cfg)
    imgs = jnp.asarray(rng.normal(size=(2, 1, 64, 32)).astype(np.float32))
    pred = jnp.zeros((2, cfg.num_patches, cfg.patch_size ** 2))
    mask = jnp.ones((2, cfg.num_patches))
    got = float(model.loss(imgs, pred, mask))

    t = np.asarray(model.patchify(imgs))
    mean = t.mean(-1, keepdims=True)
    var = t.var(-1, keepdims=True, ddof=1)
    tn = (t - mean) / np.sqrt(var + 1e-6)
    want = float((tn ** 2).mean(-1).mean())
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_mae_pos_embeds_frozen(rng):
    """The sin-cos pos embeds carry zero gradient (models_mae.py:55,69:
    requires_grad=pos_trainable, default False) while real params don't."""
    cfg = tiny_mae(1)
    model = MaskedAutoencoderViT(cfg)
    imgs = jnp.asarray(rng.normal(size=(2, 1, 64, 32)).astype(np.float32))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        imgs, 0.75,
    )["params"]

    def loss_fn(p):
        loss, _, _ = model.apply(
            {"params": p}, imgs, 0.75,
            rngs={"masking": jax.random.PRNGKey(2)},
        )
        return loss

    grads = jax.grad(loss_fn)(params)
    np.testing.assert_array_equal(np.asarray(grads["pos_embed"]), 0.0)
    np.testing.assert_array_equal(np.asarray(grads["decoder_pos_embed"]), 0.0)
    assert float(np.abs(np.asarray(grads["cls_token"])).max()) > 0.0

    import dataclasses

    cfg_t = dataclasses.replace(cfg, pos_trainable=True)
    model_t = MaskedAutoencoderViT(cfg_t)
    grads_t = jax.grad(
        lambda p: model_t.apply(
            {"params": p}, imgs, 0.75,
            rngs={"masking": jax.random.PRNGKey(2)},
        )[0]
    )(params)
    assert float(np.abs(np.asarray(grads_t["pos_embed"])).max()) > 0.0


def test_mae_meta_mlp_dropout(rng):
    """The swin decoder's meta-MLP hidden dropout (timm drop=(0.125, 0.))
    is active under deterministic=False (stochastic across dropout rngs)
    and absent by default (deterministic eval)."""
    cfg = tiny_mae(1)
    model = MaskedAutoencoderViT(cfg)
    imgs = jnp.asarray(rng.normal(size=(2, 1, 64, 32)).astype(np.float32))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        imgs, 0.75,
    )["params"]
    mask_rng = jax.random.PRNGKey(7)

    def run(drop_key=None):
        rngs = {"masking": mask_rng}
        kw = {}
        if drop_key is not None:
            rngs["dropout"] = drop_key
            kw["deterministic"] = False
        loss, _, _ = model.apply(
            {"params": params}, imgs, 0.75, rngs=rngs, **kw
        )
        return float(loss)

    # deterministic (default): reproducible, no dropout rng required
    assert run() == run()
    # training mode: different dropout keys -> different losses
    a = run(jax.random.PRNGKey(3))
    b = run(jax.random.PRNGKey(4))
    assert a != b


def test_random_masking_2d_large_grid_offset():
    """The reference's 999 offset only works because its grid is 512
    positions; with > 999 patches the offset must still sort every masked
    token after every unmasked one."""
    import dataclasses

    cfg = MAEConfig(
        compute_dtype="float32",
        embed_dim=32, depth=1, num_heads=2, decoder_embed_dim=32,
        decoder_depth=1, decoder_num_heads=2, decoder_mode=0,
        target_length=2048, num_mel_bins=128,  # grid (128, 8) = 1024 > 999
    )
    model = MaskedAutoencoderViT(cfg)
    t, f = cfg.grid
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, t * f, 32)).astype(np.float32)
    )
    xm, mask, ids_restore = model.random_masking_2d(
        x, 0.5, 0.25, jax.random.PRNGKey(0)
    )
    m = np.asarray(mask)
    keep = xm.shape[1]
    # every kept row must be an UNMASKED position's features
    ids = np.argsort(np.asarray(ids_restore), axis=1)[:, :keep]  # ids_keep
    for b in range(2):
        assert (m[b][ids[b]] == 0).all()


def test_mae_bfloat16_pretrain_step(rng):
    """compute_dtype='bfloat16' runs encoder AND swin decoder in bf16
    (finite loss, f32 prediction head) — previously the decoder silently
    stayed f32."""
    import dataclasses

    cfg = dataclasses.replace(tiny_mae(1), compute_dtype="bfloat16")
    model = MaskedAutoencoderViT(cfg)
    imgs = jnp.asarray(rng.normal(size=(2, 1, 64, 32)).astype(np.float32))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        imgs, 0.75,
    )["params"]
    loss, pred, _ = model.apply(
        {"params": params}, imgs, 0.75,
        rngs={"masking": jax.random.PRNGKey(2)},
    )
    assert pred.dtype == jnp.float32  # decoder_pred head stays f32
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda p: model.apply(
            {"params": p}, imgs, 0.75,
            rngs={"masking": jax.random.PRNGKey(2)},
        )[0]
    )(params)
    gmax = max(
        float(np.abs(np.asarray(x)).max())
        for x in jax.tree_util.tree_leaves(g)
    )
    assert np.isfinite(gmax) and gmax > 0.0


def test_mae_config_rejects_unknown_impls():
    """A typo'd impl string must raise, not silently select the XLA
    fallback (losing the fused-kernel pretrain speedup) or exact GELU."""
    from tpat_tpu.models.mae import MAEConfig

    MAEConfig()  # defaults valid
    with pytest.raises(ValueError, match="window_attention_impl"):
        MAEConfig(window_attention_impl="fuse")
    with pytest.raises(ValueError, match="gelu_impl"):
        MAEConfig(gelu_impl="fast")
    with pytest.raises(ValueError, match="compute_dtype"):
        MAEConfig(compute_dtype="float16")
