"""Parity of the JAX AudioViT against an independent torch restatement of
the reference math (tests/torch_reference.py): logits, pruning indices and
per-block attention scores must match within float32 tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from tpat_tpu.config import ViTConfig
from tpat_tpu.models.vit import AudioViT
from tpat_tpu.utils.torch_import import (
    audiomae_params_from_state_dict,
    ast_params_from_state_dict,
    overlay_params,
)
from tests.torch_reference import RefModel

DIM, DEPTH, HEADS, NC = 192, 4, 3, 10
GRID = (8, 8)  # (time, freq) patches -> input (B, 1, 128, 128)


def _randomize(model: torch.nn.Module, seed: int = 0):
    # qkv weights get a large scale so attention is sharp and importance
    # scores are decisively separated — random near-uniform attention would
    # make topk ordering ill-conditioned at float32 across frameworks.
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        scale = 1.0 if "qkv" in k else 0.05
        sd[k] = torch.randn(v.shape, generator=g) * scale
    model.load_state_dict(sd)
    return model


def _make_pair(num_extra, importance, pooling, use_final_norm, keep, drop_loc):
    torch_model = _randomize(
        RefModel(
            dim=DIM,
            depth=DEPTH,
            num_heads=HEADS,
            num_classes=NC,
            grid=GRID,
            num_extra_tokens=num_extra,
            importance=importance,
            pooling=pooling,
            use_final_norm=use_final_norm,
        )
    ).eval()

    cfg = ViTConfig(
        compute_dtype="float32",
        embed_dim=DIM,
        depth=DEPTH,
        num_heads=HEADS,
        num_classes=NC,
        target_length=GRID[0] * 16,
        num_mel_bins=GRID[1] * 16,
        num_extra_tokens=num_extra,
        importance=importance,
        pooling=pooling,
        pos_embed_mode="pre_cls" if num_extra == 1 else "post_cat",
        use_final_norm=use_final_norm,
        frozen_pos_embed=(num_extra == 1),
        drop_path_rate=0.0,
        drop_loc=drop_loc,
        base_keep_rate=keep,
    )
    model = AudioViT(cfg)

    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    if num_extra == 1:
        imported = audiomae_params_from_state_dict(sd, cfg, ckpt_grid=GRID)
    else:
        sd2 = {}
        for k, v in sd.items():
            if k.startswith("mlp_head.0."):
                sd2[k.replace("mlp_head.0.", "mlp_head.0.")] = v
            elif k.startswith("mlp_head.1."):
                sd2[k] = v
            else:
                sd2["v." + k] = v
        imported = ast_params_from_state_dict(sd2, cfg)

    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 1, cfg.target_length, cfg.num_mel_bins))
    init = model.init({"params": rng}, x0)["params"]
    params = overlay_params(init, imported)
    return torch_model, model, params, cfg


@pytest.mark.parametrize("keep", [1.0, 0.7, 0.5])
def test_audiomae_flavor_parity(keep):
    drop_loc = (1, 2)
    torch_model, model, params, cfg = _make_pair(
        1, "patch_mean", "gap_fcnorm", False, keep, drop_loc
    )
    x = np.random.default_rng(1).normal(size=(3, 1, 128, 128)).astype(np.float32)
    with torch.no_grad():
        ref, ref_feats = torch_model(
            torch.from_numpy(x), keep_rates=cfg.keep_rates, collect=True
        )
    got, feats = model.apply(
        {"params": params}, jnp.asarray(x), extract_features=True
    )
    np.testing.assert_allclose(
        np.asarray(got), ref.numpy(), rtol=1e-3, atol=2e-4
    )
    for k, v in ref_feats.items():
        assert k in feats, f"missing feature {k}"
        if k.endswith("topk_idx"):
            np.testing.assert_array_equal(np.asarray(feats[k]), v.numpy())
        else:
            np.testing.assert_allclose(
                np.asarray(feats[k]), v.numpy(), rtol=1e-3, atol=1e-6
            )


@pytest.mark.parametrize("keep", [1.0, 0.6])
def test_ast_flavor_parity(keep):
    drop_loc = (1, 3)
    torch_model, model, params, cfg = _make_pair(
        2, "cls", "cls_dist", True, keep, drop_loc
    )
    x = np.random.default_rng(2).normal(size=(2, 1, 128, 128)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x), keep_rates=cfg.keep_rates)
    got = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-3, atol=2e-4)


def test_masked_path_matches_static():
    """forward_masked (traced keep rates, full shapes) must reproduce the
    static physically-pruned logits."""
    _, model, params, cfg = _make_pair(
        1, "patch_mean", "gap_fcnorm", False, 0.6, (1, 2)
    )
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 1, 128, 128)).astype(np.float32)
    )
    static = model.apply({"params": params}, x)
    masked = model.apply(
        {"params": params},
        x,
        jnp.asarray(cfg.keep_rates, dtype=jnp.float32),
        method=AudioViT.forward_masked,
    )
    np.testing.assert_allclose(
        np.asarray(masked), np.asarray(static), rtol=1e-3, atol=2e-4
    )


def test_masked_path_traced_keep_rates_no_recompile():
    """The masked step compiles once and accepts varying keep rates."""
    _, model, params, cfg = _make_pair(
        1, "patch_mean", "gap_fcnorm", False, 0.5, (1, 2)
    )
    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(2, 1, 128, 128)).astype(np.float32)
    )

    @jax.jit
    def step(kr):
        return model.apply({"params": params}, x, kr, method=AudioViT.forward_masked)

    out1 = step(jnp.asarray([1.0, 0.9, 0.8, 1.0]))
    out2 = step(jnp.asarray([1.0, 0.55, 0.71, 1.0]))
    assert out1.shape == out2.shape == (2, 10)
    assert step._cache_size() == 1


def test_overlapping_patch_embed_matches_torch():
    """PatchEmbed_new stride-10 overlapping variant
    (util/patch_embed.py:6-92)."""
    from tpat_tpu.config import ViTConfig
    from tpat_tpu.models.vit import PatchEmbed

    cfg = ViTConfig(
        compute_dtype="float32",
        embed_dim=32, depth=1, num_heads=2, target_length=64,
        num_mel_bins=32, patch_size=16, patch_stride=10, drop_loc=(),
    )
    assert cfg.grid_t == (64 - 16) // 10 + 1 == 5
    assert cfg.grid_f == (32 - 16) // 10 + 1 == 2
    x = np.random.default_rng(0).normal(size=(2, 1, 64, 32)).astype(np.float32)
    pe = PatchEmbed(cfg)
    params = pe.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    out = np.asarray(pe.apply({"params": params}, jnp.asarray(x)))
    assert out.shape == (2, 10, 32)

    conv = torch.nn.Conv2d(1, 32, kernel_size=16, stride=10)
    with torch.no_grad():
        conv.weight.copy_(
            torch.from_numpy(
                np.asarray(params["proj"]["kernel"]).transpose(3, 2, 0, 1)
            )
        )
        conv.bias.copy_(torch.from_numpy(np.asarray(params["proj"]["bias"])))
        want = conv(torch.from_numpy(x)).flatten(2).transpose(1, 2).numpy()
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "depth,drop_loc,keep,extra,importance,pooling,final_norm",
    [
        (3, (0,), 0.4, 1, "patch_mean", "gap_fcnorm", False),
        (4, (0, 1, 2, 3), 0.8, 1, "patch_mean", "gap_fcnorm", False),
        (5, (2, 4), 0.55, 2, "cls", "cls_dist", True),
        (2, (), 1.0, 1, "patch_mean", "gap_fcnorm", False),
        (4, (1, 3), 0.3, 2, "cls", "cls_dist", True),
    ],
)
def test_masked_static_equivalence_sweep(
    depth, drop_loc, keep, extra, importance, pooling, final_norm
):
    """Property: across arbitrary (depth, drop_loc, keep-rate, family)
    combinations, the masked path must reproduce the static physically
    pruned logits."""
    cfg = ViTConfig(
        compute_dtype="float32",
        embed_dim=64,
        depth=depth,
        num_heads=2,
        num_classes=6,
        target_length=64,
        num_mel_bins=32,
        num_extra_tokens=extra,
        importance=importance,
        pooling=pooling,
        pos_embed_mode="pre_cls" if extra == 1 else "post_cat",
        use_final_norm=final_norm,
        frozen_pos_embed=(extra == 1),
        drop_path_rate=0.0,
        drop_loc=drop_loc,
        base_keep_rate=keep,
        attention_impl="xla",
    )
    model = AudioViT(cfg)
    rng = np.random.default_rng(depth * 100 + extra)
    x = jnp.asarray(rng.normal(size=(2, 1, 64, 32)).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    static = model.apply({"params": params}, x)
    masked = model.apply(
        {"params": params},
        x,
        jnp.asarray(cfg.keep_rates, dtype=jnp.float32),
        method=AudioViT.forward_masked,
    )
    np.testing.assert_allclose(
        np.asarray(masked), np.asarray(static), rtol=2e-3, atol=5e-4
    )


def test_bicubic_pos_embed_matches_torch_interpolate():
    """Pos-embed bicubic surgery must reproduce torch F.interpolate
    (mode='bicubic', align_corners=False, A=-0.75, no antialias) — the
    exact call at util/pos_embed.py:93-137 — for both the square and the
    img2audio rectangular paths, upscale and downscale."""
    import torch.nn.functional as F

    from tpat_tpu.models import pos_embed as pe

    rng = np.random.default_rng(3)

    def want(grid_np, size):
        t = torch.from_numpy(grid_np).permute(2, 0, 1)[None]
        o = F.interpolate(t, size=size, mode="bicubic", align_corners=False)
        return o[0].permute(1, 2, 0).numpy()

    # img2audio: DeiT 14x14 -> audio (8, 64)
    pos = rng.normal(size=(1, 1 + 14 * 14, 16)).astype(np.float32)
    out = pe.interpolate_img2audio_pos_embed(pos, (14, 14), (8, 64))
    w = want(pos[0, 1:].reshape(14, 14, 16), (8, 64))
    np.testing.assert_allclose(
        out[0, 1:].reshape(8, 64, 16), w, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(out[:, :1], pos[:, :1])  # cls untouched

    # square: 14x14 -> 20x20 (upscale); atol covers f32-vs-f64
    # accumulation-order noise on near-zero outputs
    out = pe.interpolate_square_pos_embed(pos, 20)
    w = want(pos[0, 1:].reshape(14, 14, 16), (20, 20))
    np.testing.assert_allclose(
        out[0, 1:].reshape(20, 20, 16), w, rtol=1e-4, atol=5e-6
    )


def test_frozen_pos_embed_respects_extra_tokens():
    """Frozen sin-cos pos-embed init must emit one zero row per extra
    token: an AST-shaped config (2 extras) with frozen_pos_embed used to
    build a (1, P+1, D) table against a declared (1, P+2, D) shape and
    blow up at the first forward."""
    cfg = ViTConfig(
        compute_dtype="float32",
        embed_dim=32, depth=1, num_heads=2, num_classes=3,
        target_length=64, num_mel_bins=32, drop_loc=(),
        num_extra_tokens=2, importance="cls", pooling="cls_dist",
        pos_embed_mode="post_cat", use_final_norm=True,
        frozen_pos_embed=True, drop_path_rate=0.0,
    )
    model = AudioViT(cfg)
    x = jnp.zeros((2, 1, 64, 32), np.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    assert params["pos_embed"].shape == (1, cfg.num_patches + 2, 32)
    np.testing.assert_array_equal(
        np.asarray(params["pos_embed"][0, :2]), np.zeros((2, 32), np.float32)
    )
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 3)


def test_custom_rank_ignored_under_2d_masking(rng):
    """The reference's masked-2d path (forward_features_mask,
    models_vit.py:468-497) never consults use_custom_rank; full-grid rank
    indices would be misaligned with the permuted shrunk sequence."""
    cfg = ViTConfig(
        compute_dtype="float32",
        embed_dim=32, depth=2, num_heads=2, num_classes=3,
        target_length=64, num_mel_bins=32, drop_loc=(1,),
        base_keep_rate=0.5, drop_path_rate=0.0,
    )
    model = AudioViT(cfg)
    x = jnp.asarray(rng.normal(size=(2, 1, 64, 32)).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]

    def run(custom_rank):
        return model.apply(
            {"params": params}, x, mask_t_prob=0.25, mask_f_prob=0.25,
            custom_rank=custom_rank, deterministic=False,
            rngs={"mask2d": jax.random.PRNGKey(5),
                  "dropout": jax.random.PRNGKey(6)},
        )

    np.testing.assert_array_equal(
        np.asarray(run("mean")), np.asarray(run(None))
    )


def test_frozen_pos_embed_no_grad_in_masked2d(rng):
    """With frozen_pos_embed, the 2D-masked training path must leak zero
    gradient into pos_embed (the CLS row previously bypassed the
    stop_gradient)."""
    cfg = ViTConfig(
        compute_dtype="float32",
        embed_dim=32, depth=1, num_heads=2, num_classes=3,
        target_length=64, num_mel_bins=32, drop_loc=(),
        drop_path_rate=0.0, frozen_pos_embed=True,
    )
    model = AudioViT(cfg)
    x = jnp.asarray(rng.normal(size=(2, 1, 64, 32)).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]

    def loss_fn(p):
        out = model.apply(
            {"params": p}, x, mask_t_prob=0.25, mask_f_prob=0.25,
            deterministic=False,
            rngs={"mask2d": jax.random.PRNGKey(5),
                  "dropout": jax.random.PRNGKey(6)},
        )
        return jnp.sum(out ** 2)

    grads = jax.grad(loss_fn)(params)
    np.testing.assert_array_equal(np.asarray(grads["pos_embed"]), 0.0)
    assert float(np.abs(np.asarray(grads["cls_token"])).max()) > 0.0


def test_bfloat16_is_the_default_compute_dtype():
    """The platform default is bf16 (the reference trains under AMP,
    engine_finetune.py:102); f32 is the explicit parity override — the
    tests in this suite pin it where they compare against torch math."""
    from tpat_tpu.models.mae import MAEConfig

    assert ViTConfig(
        embed_dim=32, depth=1, num_heads=2, num_classes=3,
        target_length=64, num_mel_bins=32, drop_loc=(),
    ).compute_dtype == "bfloat16"
    assert MAEConfig().compute_dtype == "bfloat16"


def test_attn_drop_rate_rejected():
    import pytest

    with pytest.raises(ValueError, match="attn_drop_rate"):
        ViTConfig(
            embed_dim=32, depth=1, num_heads=2, num_classes=3,
            target_length=64, num_mel_bins=32, attn_drop_rate=0.1,
        )
    # jnp.dtype("float16") would parse, silently running an unsupported
    # precision — fail loudly at config construction instead
    with pytest.raises(ValueError, match="compute_dtype"):
        ViTConfig(
            embed_dim=32, depth=1, num_heads=2, num_classes=3,
            target_length=64, num_mel_bins=32, compute_dtype="float16",
        )


def test_ast_mlp_head_torch_default_init():
    """ast_models.py:290 builds a PLAIN nn.Linear head: torch default
    kaiming-uniform(a=sqrt(5)) => weight ~ U(+-sqrt(1/fan_in)), bias ~
    U(+-1/sqrt(fan_in)) — not timm trunc-normal."""
    cfg = ViTConfig(
        compute_dtype="float32",
        embed_dim=64, depth=1, num_heads=2, num_classes=35,
        target_length=128, num_mel_bins=32, drop_loc=(),
        num_extra_tokens=2, importance="cls", pooling="cls_dist",
        pos_embed_mode="post_cat", use_final_norm=True,
        frozen_pos_embed=False, drop_path_rate=0.0,
    )
    model = AudioViT(cfg)
    x = jnp.zeros((1, 1, 128, 32), np.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    w = np.asarray(params["mlp_head"]["kernel"])
    b = np.asarray(params["mlp_head"]["bias"])
    bound_w = np.sqrt(1.0 / 64)
    assert np.abs(w).max() <= bound_w * 1.0001
    assert np.abs(w).max() >= bound_w * 0.85  # uniform reaches the bound
    bound_b = 1.0 / np.sqrt(64)
    assert np.abs(b).max() <= bound_b * 1.0001
    assert np.abs(b).max() > 0.0  # not zeros


@pytest.mark.parametrize(
    "depth,drop_loc,base,exact,extra,importance,pooling,final_norm",
    [
        (4, (1, 3), 0.5, 0.77, 1, "patch_mean", "gap_fcnorm", False),
        (5, (2, 4), 0.55, 0.61, 2, "cls", "cls_dist", True),
        (3, (0,), 0.4, 0.95, 1, "patch_mean", "gap_fcnorm", False),
        # exact == base: bucket snaps to the base level, widths == exact
        (4, (1, 3), 0.5, 0.5, 1, "patch_mean", "gap_fcnorm", False),
    ],
)
def test_hybrid_matches_masked_sweep(
    depth, drop_loc, base, exact, extra, importance, pooling, final_norm
):
    """Property (VERDICT r2 #2): forward_hybrid — the exact traced anneal
    schedule masked inside physically-pruned bucket-level shapes — must
    reproduce forward_masked's logits for arbitrary mid-anneal keep rates.
    Same kept sets and widths by construction; logits equal to float
    tolerance (softmax reduction width differs, as in the masked-vs-static
    sweep above)."""
    from tpat_tpu.engine.schedules import bucket_keep_rates, masked_kept_counts

    cfg = ViTConfig(
        compute_dtype="float32",
        embed_dim=64,
        depth=depth,
        num_heads=2,
        num_classes=6,
        target_length=64,
        num_mel_bins=32,
        num_extra_tokens=extra,
        importance=importance,
        pooling=pooling,
        pos_embed_mode="pre_cls" if extra == 1 else "post_cat",
        use_final_norm=final_norm,
        frozen_pos_embed=(extra == 1),
        drop_path_rate=0.0,
        drop_loc=drop_loc,
        base_keep_rate=base,
        attention_impl="xla",
    )
    model = AudioViT(cfg)
    rng = np.random.default_rng(depth * 77 + extra)
    x = jnp.asarray(rng.normal(size=(2, 1, 64, 32)).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(2)}, x)["params"]

    rates = tuple(exact if i in drop_loc else 1.0 for i in range(depth))
    bucket = bucket_keep_rates(rates, base_keep_rate=base, n_buckets=4)
    assert all(b >= r - 1e-9 for b, r in zip(bucket, rates))
    nl = jnp.asarray(
        masked_kept_counts(rates, drop_loc, cfg.num_patches), jnp.int32
    )
    kr = jnp.asarray(rates, jnp.float32)

    masked = model.apply(
        {"params": params}, x, kr, num_left_array=nl,
        method=AudioViT.forward_masked,
    )
    hybrid = model.apply(
        {"params": params}, x, kr, num_left_array=nl, bucket_rates=bucket,
        method=AudioViT.forward_hybrid,
    )
    np.testing.assert_allclose(
        np.asarray(hybrid), np.asarray(masked), rtol=2e-3, atol=5e-4
    )


def test_hybrid_fused_prefix_matches_xla():
    """The hybrid anneal's fused prefix-kernel attention (traced valid
    length, ops/pallas_attention.fused_qkv_attention_prefix) must agree
    with the boolean-mask XLA path through the full forward_hybrid, in
    both importance modes (interpret-mode kernel on CPU)."""
    from tpat_tpu.engine.schedules import bucket_keep_rates, masked_kept_counts

    for extra, importance, pooling, final_norm in [
        (1, "patch_mean", "gap_fcnorm", False),
        (2, "cls", "cls_dist", True),
    ]:
        common = dict(
            embed_dim=128, depth=4, num_heads=2, num_classes=5,
            target_length=128, num_mel_bins=32,
            num_extra_tokens=extra, importance=importance, pooling=pooling,
            pos_embed_mode="pre_cls" if extra == 1 else "post_cat",
            use_final_norm=final_norm, frozen_pos_embed=(extra == 1),
            drop_path_rate=0.0, drop_loc=(1, 3), base_keep_rate=0.5,
        )
        cfg_x = ViTConfig(attention_impl="xla", **common)
        cfg_f = ViTConfig(attention_impl="fused", **common)
        model_x, model_f = AudioViT(cfg_x), AudioViT(cfg_f)
        rng = np.random.default_rng(extra)
        x = jnp.asarray(rng.normal(size=(2, 1, 128, 32)).astype(np.float32))
        params = model_x.init({"params": jax.random.PRNGKey(3)}, x)["params"]

        rates = tuple(0.8 if i in (1, 3) else 1.0 for i in range(4))
        bucket = bucket_keep_rates(rates, base_keep_rate=0.5, n_buckets=4)
        nl = jnp.asarray(
            masked_kept_counts(rates, (1, 3), cfg_x.num_patches), jnp.int32
        )
        kr = jnp.asarray(rates, jnp.float32)
        kw = dict(num_left_array=nl, bucket_rates=bucket,
                  method=AudioViT.forward_hybrid)
        want = model_x.apply({"params": params}, x, kr, **kw)
        got = model_f.apply({"params": params}, x, kr, **kw)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-3, atol=1e-4
        )
