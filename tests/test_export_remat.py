"""Round-trip torch export/import, remat gradient equality, config
validation, and the distributed helpers (single-host no-op path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpat_tpu.config import ViTConfig
from tpat_tpu.models.vit import AudioViT
from tpat_tpu.utils import torch_export as te
from tpat_tpu.utils import torch_import as ti


def base_cfg(**kw):
    kw.setdefault("embed_dim", 64)
    kw.setdefault("depth", 2)
    kw.setdefault("num_heads", 2)
    kw.setdefault("num_classes", 5)
    kw.setdefault("target_length", 64)
    kw.setdefault("num_mel_bins", 32)
    kw.setdefault("drop_loc", (1,))
    kw.setdefault("base_keep_rate", 0.7)
    kw.setdefault("drop_path_rate", 0.0)
    kw.setdefault("compute_dtype", "float32")
    return ViTConfig(**kw)


def _params(cfg):
    return AudioViT(cfg).init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 1, cfg.target_length, cfg.num_mel_bins)),
    )["params"]


def test_audiomae_export_import_roundtrip(tmp_path, rng):
    cfg = base_cfg()
    params = _params(cfg)
    path = str(tmp_path / "export.pth")
    te.save_pth(path, params, flavor="audiomae", epoch=7)

    sd = ti.load_torch_state_dict(path)
    back = ti.audiomae_params_from_state_dict(
        sd, cfg, ckpt_grid=(cfg.grid_f, cfg.grid_t)
    )
    merged = ti.overlay_params(params, back)
    x = jnp.asarray(rng.normal(size=(2, 1, 64, 32)).astype(np.float32))
    out_a = AudioViT(cfg).apply({"params": params}, x)
    out_b = AudioViT(cfg).apply({"params": merged}, x)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-6)

    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    assert raw["epoch"] == 7 and "model" in raw  # reference envelope


def test_ast_export_import_roundtrip(tmp_path, rng):
    cfg = base_cfg(
        num_extra_tokens=2, importance="cls", pooling="cls_dist",
        pos_embed_mode="post_cat", use_final_norm=True,
        frozen_pos_embed=False,
    )
    params = _params(cfg)
    path = str(tmp_path / "ast.pth")
    te.save_pth(path, params, flavor="ast")
    sd = ti.load_torch_state_dict(path)
    assert any(k.startswith("v.") for k in sd)  # module. stripped -> v.*
    back = ti.ast_params_from_state_dict(sd, cfg)
    merged = ti.overlay_params(params, back)
    x = jnp.asarray(rng.normal(size=(2, 1, 64, 32)).astype(np.float32))
    out_a = AudioViT(cfg).apply({"params": params}, x)
    out_b = AudioViT(cfg).apply({"params": merged}, x)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-6)


def test_remat_matches_no_remat(rng):
    cfg = base_cfg()
    cfg_r = base_cfg(remat=True)
    params = _params(cfg)
    x = jnp.asarray(rng.normal(size=(2, 1, 64, 32)).astype(np.float32))
    y = jnp.asarray(np.eye(5, dtype=np.float32)[[1, 3]])

    def loss(model):
        def f(p):
            logits = model.apply(
                {"params": p}, x, deterministic=True
            )
            return -jnp.mean(jnp.sum(y * jax.nn.log_softmax(logits), -1))

        return f

    l0, g0 = jax.value_and_grad(loss(AudioViT(cfg)))(params)
    l1, g1 = jax.value_and_grad(loss(AudioViT(cfg_r)))(params)
    assert abs(float(l0) - float(l1)) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_config_validation():
    with pytest.raises(ValueError, match="drop_loc"):
        base_cfg(drop_loc=(5,))
    with pytest.raises(ValueError, match="num_heads"):
        base_cfg(embed_dim=65)
    with pytest.raises(ValueError, match="base_keep_rate"):
        base_cfg(base_keep_rate=0.0)
    with pytest.raises(ValueError, match="patch_size"):
        base_cfg(target_length=65)


def test_distributed_single_host():
    from tpat_tpu.parallel import distributed as dist

    rank, world = dist.init_distributed_mode()
    assert rank == 0 and world == 1
    assert dist.is_main_process()


def test_audioset_pretrained_geometry_import(tmp_path, rng):
    """The published AudioMAE checkpoint geometry: ViT-B keys with a
    (1, 513, 768) pos-embed over the (8, 64) AudioSet grid plus pretrain
    leftovers (decoder_*, mask_token, norm) — import for ESC-50 must crop
    the time axis to (8, 32) -> 257 rows, drop the mismatched head, ignore
    extras, and produce a working forward."""
    import torch

    d = 768
    g = torch.Generator().manual_seed(0)
    sd = {
        "cls_token": torch.randn(1, 1, d, generator=g) * 0.02,
        "pos_embed": torch.randn(1, 513, d, generator=g) * 0.02,
        "patch_embed.proj.weight": torch.randn(d, 1, 16, 16, generator=g) * 0.02,
        "patch_embed.proj.bias": torch.zeros(d),
        # pretrain leftovers that strict=False ignores (main_finetune.py:414)
        "norm.weight": torch.ones(d),
        "norm.bias": torch.zeros(d),
        "mask_token": torch.zeros(1, 1, 512),
        "decoder_embed.weight": torch.zeros(512, d),
        # mismatched 527-class head must be dropped for 50 classes
        "head.weight": torch.zeros(527, d),
        "head.bias": torch.zeros(527),
    }
    for i in range(12):
        p = f"blocks.{i}"
        sd[f"{p}.norm1.weight"] = torch.ones(d)
        sd[f"{p}.norm1.bias"] = torch.zeros(d)
        sd[f"{p}.attn.qkv.weight"] = torch.randn(3 * d, d, generator=g) * 0.02
        sd[f"{p}.attn.qkv.bias"] = torch.zeros(3 * d)
        sd[f"{p}.attn.proj.weight"] = torch.randn(d, d, generator=g) * 0.02
        sd[f"{p}.attn.proj.bias"] = torch.zeros(d)
        sd[f"{p}.norm2.weight"] = torch.ones(d)
        sd[f"{p}.norm2.bias"] = torch.zeros(d)
        sd[f"{p}.mlp.fc1.weight"] = torch.randn(4 * d, d, generator=g) * 0.02
        sd[f"{p}.mlp.fc1.bias"] = torch.zeros(4 * d)
        sd[f"{p}.mlp.fc2.weight"] = torch.randn(d, 4 * d, generator=g) * 0.02
        sd[f"{p}.mlp.fc2.bias"] = torch.zeros(d)
    path = str(tmp_path / "pretrained.pth")
    torch.save({"model": sd}, path)

    from tpat_tpu.config import audiomae_vit_base
    from tpat_tpu.models.vit import AudioViT

    cfg = audiomae_vit_base(
        compute_dtype="float32",
        target_length=512, num_classes=50, base_keep_rate=0.5,
        drop_loc=(3, 6, 9), drop_path_rate=0.0,
    )
    loaded = ti.load_torch_state_dict(path)
    imported = ti.audiomae_params_from_state_dict(loaded, cfg)
    assert imported["pos_embed"].shape == (1, 257, 768)
    assert "head" not in imported  # 527-class head dropped
    # the crop takes the first 32 time columns of each of the 8 freq rows
    ref_pos = sd["pos_embed"].numpy()
    grid = ref_pos[:, 1:].reshape(1, 8, 64, 768)[:, :, :32]
    np.testing.assert_array_equal(
        imported["pos_embed"][:, 1:], grid.reshape(1, 256, 768)
    )

    model = AudioViT(cfg)
    x0 = jnp.zeros((1, 1, 512, 128))
    params = ti.overlay_params(
        model.init({"params": jax.random.PRNGKey(0)}, x0)["params"], imported
    )
    logits = model.apply({"params": params}, x0)
    assert logits.shape == (1, 50) and np.isfinite(np.asarray(logits)).all()


def test_serving_export_roundtrip(tmp_path):
    """jax.export serving artifact (utils/serving.py): serialize the
    static-pruned eval forward + params, reload WITHOUT the model object,
    and require identical logits."""
    import jax
    import jax.numpy as jnp

    from tpat_tpu.config import ViTConfig
    from tpat_tpu.models.vit import AudioViT
    from tpat_tpu.utils import serving

    cfg = ViTConfig(
        compute_dtype="float32",
        embed_dim=64, depth=3, num_heads=2, num_classes=5,
        target_length=64, num_mel_bins=32, drop_loc=(1,),
        base_keep_rate=0.6, drop_path_rate=0.0, attention_impl="xla",
    )
    model = AudioViT(cfg)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 1, 64, 32)).astype(np.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))[
        "params"
    ]
    want = np.asarray(model.apply({"params": params}, jnp.asarray(x)))

    out = serving.export_forward(
        model, params, (4, 1, 64, 32), str(tmp_path / "artifact")
    )
    fn, meta = serving.load_forward(out)
    got = np.asarray(fn(x))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    assert meta["input_shape"] == [4, 1, 64, 32]
    assert (tmp_path / "artifact" / "forward.jaxexport").exists()


def test_serving_export_bucketed(tmp_path):
    """Bucketed artifact (batch_sizes=(2, 4)): requests that are not a
    bucket size pad up to the smallest fitting bucket, requests larger
    than the biggest bucket chunk — logits must equal the live model's
    for every request size, because padding rows never cross samples
    (pruning topk and attention are per-sample)."""
    import jax
    import jax.numpy as jnp

    from tpat_tpu.config import ViTConfig
    from tpat_tpu.models.vit import AudioViT
    from tpat_tpu.utils import serving

    cfg = ViTConfig(
        compute_dtype="float32",
        embed_dim=64, depth=3, num_heads=2, num_classes=5,
        target_length=64, num_mel_bins=32, drop_loc=(1,),
        base_keep_rate=0.6, drop_path_rate=0.0, attention_impl="xla",
    )
    model = AudioViT(cfg)
    rng = np.random.default_rng(1)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 1, 64, 32))
    )["params"]
    out = serving.export_forward(
        model, params, (1, 1, 64, 32), str(tmp_path / "artifact"),
        batch_sizes=(4, 2),  # unsorted on purpose; loader needs ascending
    )
    fn, meta = serving.load_forward(out)
    assert meta["batch_sizes"] == [2, 4]
    assert meta["input_shape"] == [None, 1, 64, 32]
    assert (tmp_path / "artifact" / "forward.b2.jaxexport").exists()
    assert (tmp_path / "artifact" / "forward.b4.jaxexport").exists()
    for n in (1, 2, 3, 4, 7):  # pad->2, exact, pad->4, exact, chunk 4+3
        x = rng.normal(size=(n, 1, 64, 32)).astype(np.float32)
        want = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
        got = np.asarray(fn(x))
        assert got.shape == (n, 5)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_serving_export_fused_path(tmp_path):
    """Serving export of the FUSED attention path (the production
    config): the custom_partitioning-wrapped Pallas kernel must
    serialize through jax.export and reproduce the live logits.
    (Also validated on the real TPU with the Mosaic lowering: ViT-B
    keep-0.7 exported, reloaded and served — docs/BENCH_NOTES.md.)"""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tpat_tpu.config import audiomae_vit_base
    from tpat_tpu.models.vit import AudioViT
    from tpat_tpu.utils import serving

    cfg = audiomae_vit_base(
        compute_dtype="float32",
        target_length=64, num_classes=5, base_keep_rate=0.6, drop_loc=(1,),
        drop_path_rate=0.0,
    )
    cfg = dataclasses.replace(
        cfg, embed_dim=128, depth=2, num_heads=4, num_mel_bins=32,
        attention_impl="fused",
    )
    model = AudioViT(cfg)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 1, 64, 32)).astype(np.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))[
        "params"
    ]
    want = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    out = serving.export_forward(
        model, params, (4, 1, 64, 32), str(tmp_path / "artifact")
    )
    fn, _meta = serving.load_forward(out)
    np.testing.assert_allclose(np.asarray(fn(x)), want, rtol=1e-5, atol=1e-6)


def test_export_serving_cli(tmp_path):
    """The export CLI end-to-end: orbax checkpoint in, loadable serving
    artifact out, logits identical to the live model."""
    import jax
    import jax.numpy as jnp

    from tpat_tpu.cli.export_serving import get_parser, main
    from tpat_tpu.config import audiomae_vit_tiny
    from tpat_tpu.models.vit import AudioViT
    from tpat_tpu.utils import serving
    from tpat_tpu.utils.checkpoint import save_checkpoint

    cfg = audiomae_vit_tiny(
        num_classes=4, target_length=64, num_mel_bins=128,
        drop_loc=(1,), base_keep_rate=0.6, drop_path_rate=0.0,
        compute_dtype="float32",
    )
    model = AudioViT(cfg)
    x0 = jnp.zeros((1, 1, 64, 128))
    params = model.init({"params": jax.random.PRNGKey(1)}, x0)["params"]

    class S:  # minimal state for save_checkpoint
        pass

    s = S()
    s.params = params
    s.opt_state = {}
    s.step = jnp.zeros((), jnp.int32)
    save_checkpoint(str(tmp_path / "ckpt"), s, epoch=0)

    out = main(get_parser().parse_args([
        "--model", "audiomae_vit_tiny", "--dataset", "esc50",
        "--nb_classes", "4", "--target_length", "64",
        "--base_keep_rate", "0.6", "--drop_loc", "(1,)",
        "--compute_dtype", "float32",
        "--finetuned_model_path", str(tmp_path / "ckpt"),
        "--batch_size", "2", "--out_dir", str(tmp_path / "artifact"),
    ]))
    fn, meta = serving.load_forward(out)
    x = np.random.default_rng(0).normal(size=(2, 1, 64, 128)).astype(np.float32)
    got = np.asarray(fn(x))
    want = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # comma-list --batch_size -> bucketed artifact through the CLI
    out2 = main(get_parser().parse_args([
        "--model", "audiomae_vit_tiny", "--dataset", "esc50",
        "--nb_classes", "4", "--target_length", "64",
        "--base_keep_rate", "0.6", "--drop_loc", "(1,)",
        "--compute_dtype", "float32",
        "--finetuned_model_path", str(tmp_path / "ckpt"),
        "--batch_size", "1,2", "--out_dir", str(tmp_path / "bucketed"),
    ]))
    fn2, meta2 = serving.load_forward(out2)
    assert meta2["batch_sizes"] == [1, 2]
    np.testing.assert_allclose(
        np.asarray(fn2(x)), want, rtol=1e-6, atol=1e-6
    )

    # malformed --batch_size fails fast with a clear message, not an
    # IndexError / opaque export error downstream
    import pytest

    for bad in ("", ",", "0", "2,0", "-1", "8x"):
        with pytest.raises(SystemExit, match="batch_size"):
            main(get_parser().parse_args([
                "--model", "audiomae_vit_tiny", "--dataset", "esc50",
                "--nb_classes", "4", "--target_length", "64",
                "--drop_loc", "(1,)",
                "--finetuned_model_path", str(tmp_path / "ckpt"),
                "--batch_size", bad, "--out_dir", str(tmp_path / "bad"),
            ]))


def test_convert_cli_orbax_to_pth(tmp_path, rng):
    """tpat-convert closes the migration round-trip (MIGRATION.md
    "Checkpoints"): an orbax best_model converts to a reference-layout
    .pth whose re-import reproduces the original logits; AST and MAE
    trees auto-detect their flavor."""
    import torch

    from tpat_tpu.cli.convert import detect_flavor, get_parser, main
    from tpat_tpu.utils.checkpoint import save_checkpoint

    cfg = base_cfg()
    params = _params(cfg)

    class S:
        pass

    s = S()
    s.params = params
    s.opt_state = {}
    s.step = jnp.zeros((), jnp.int32)
    save_checkpoint(str(tmp_path / "best_model"), s, epoch=11)

    out = main(get_parser().parse_args([
        "--checkpoint", str(tmp_path / "best_model"),
        "--out", str(tmp_path / "best_model.pth"),
    ]))
    raw = torch.load(out, map_location="cpu", weights_only=False)
    assert raw["epoch"] == 11 and "model" in raw  # reference envelope

    sd = ti.load_torch_state_dict(out)
    back = ti.audiomae_params_from_state_dict(
        sd, cfg, ckpt_grid=(cfg.grid_f, cfg.grid_t)
    )
    merged = ti.overlay_params(params, back)
    x = jnp.asarray(rng.normal(size=(2, 1, 64, 32)).astype(np.float32))
    out_a = AudioViT(cfg).apply({"params": params}, x)
    out_b = AudioViT(cfg).apply({"params": merged}, x)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-6)

    # flavor auto-detection on the other trees
    assert detect_flavor({"dist_token": 0, "cls_token": 0}) == "ast"
    assert detect_flavor({"decoder_embed": 0, "cls_token": 0}) == "mae"
    assert detect_flavor(params) == "audiomae"

    # a .pth input is rejected with a pointer at the right flag
    with pytest.raises(SystemExit, match="orbax checkpoint directory"):
        main(get_parser().parse_args([
            "--checkpoint", str(tmp_path / "best_model.pth"),
            "--out", str(tmp_path / "x.pth"),
        ]))


def test_serving_export_waveform_frontend(tmp_path):
    """Waveform->logits serving artifact (VERDICT r4 #4): the exported
    program fuses the on-device frontend (ops/frontend.py) with the
    pruned forward, so a server feeds raw PCM and gets logits with zero
    host fbank.  Checks both the direct export_forward(frontend=...) and
    the CLI --device_frontend path, including the NaN-tail short-clip
    contract (meta.json documents it)."""
    from tpat_tpu.cli.export_serving import get_parser, main
    from tpat_tpu.config import audiomae_vit_tiny
    from tpat_tpu.ops.frontend import FrontendConfig, device_frontend
    from tpat_tpu.utils import serving
    from tpat_tpu.utils.checkpoint import save_checkpoint

    cfg = audiomae_vit_tiny(
        num_classes=4, target_length=64, num_mel_bins=128,
        drop_loc=(1,), base_keep_rate=0.6, drop_path_rate=0.0,
        compute_dtype="float32",
    )
    model = AudioViT(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(1)}, jnp.zeros((1, 1, 64, 128))
    )["params"]

    fcfg = FrontendConfig(num_mel_bins=128, target_length=64)
    n_samples = fcfg.fbank_cfg.window_size + 63 * fcfg.fbank_cfg.window_shift
    rng = np.random.default_rng(0)
    wav = rng.normal(size=(2, n_samples)).astype(np.float32) * 0.1
    wav[1, n_samples // 2:] = np.nan  # short clip, NaN-tail contract

    spec = device_frontend(jnp.asarray(wav), fcfg, train=False)
    want = np.asarray(model.apply({"params": params}, spec))

    out = serving.export_forward(
        model, params, (2, n_samples), str(tmp_path / "artifact"),
        frontend=fcfg,
    )
    fn, meta = serving.load_forward(out)
    np.testing.assert_allclose(np.asarray(fn(wav)), want, rtol=1e-5, atol=1e-5)
    assert meta["frontend"]["input"] == "waveform"
    assert meta["frontend"]["num_samples"] == n_samples
    assert "NaN" in meta["frontend"]["padding_contract"]

    # the CLI path (--device_frontend), default num_samples formula
    class S:
        pass

    s = S()
    s.params = params
    s.opt_state = {}
    s.step = jnp.zeros((), jnp.int32)
    save_checkpoint(str(tmp_path / "ckpt"), s, epoch=0)
    out2 = main(get_parser().parse_args([
        "--model", "audiomae_vit_tiny", "--dataset", "esc50",
        "--nb_classes", "4", "--target_length", "64",
        "--base_keep_rate", "0.6", "--drop_loc", "(1,)",
        "--compute_dtype", "float32",
        "--finetuned_model_path", str(tmp_path / "ckpt"),
        "--batch_size", "2", "--device_frontend",
        "--out_dir", str(tmp_path / "artifact_cli"),
    ]))
    fn2, meta2 = serving.load_forward(out2)
    assert meta2["frontend"]["num_samples"] == n_samples
    # CLI uses the esc50 preset's norm stats == FrontendConfig defaults
    np.testing.assert_allclose(
        np.asarray(fn2(wav)), want, rtol=1e-5, atol=1e-5
    )
