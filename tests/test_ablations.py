"""Ablation machinery tests (SURVEY.md §2 #31): custom-rank pruning and
the intensity-band token drop, end-to-end through the eval API."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpat_tpu.config import ViTConfig
from tpat_tpu.engine import evaluate as eval_lib
from tpat_tpu.models.vit import AudioViT, patch_stats


def cfg(**kw):
    kw.setdefault("embed_dim", 64)
    kw.setdefault("depth", 3)
    kw.setdefault("num_heads", 2)
    kw.setdefault("num_classes", 5)
    kw.setdefault("target_length", 64)
    kw.setdefault("num_mel_bins", 32)
    kw.setdefault("drop_path_rate", 0.0)
    kw.setdefault("drop_loc", ())
    kw.setdefault("compute_dtype", "float32")
    return ViTConfig(**kw)


def test_patch_stats_order_and_values(rng):
    x = rng.normal(size=(2, 1, 64, 32)).astype(np.float32)
    m = np.asarray(patch_stats(jnp.asarray(x), 16, "mean"))
    # token order is row-major over the (4, 2) patch grid
    want00 = x[0, 0, :16, :16].mean()
    want01 = x[0, 0, :16, 16:].mean()
    want10 = x[0, 0, 16:32, :16].mean()
    np.testing.assert_allclose(m[0, 0], want00, rtol=1e-5)
    np.testing.assert_allclose(m[0, 1], want01, rtol=1e-5)
    np.testing.assert_allclose(m[0, 2], want10, rtol=1e-5)


def test_custom_rank_selects_by_intensity(rng):
    """With custom_rank='mean' the kept indices must be the top-k patch
    means (via the reference's quirky full-sequence gather)."""
    c = cfg(drop_loc=(1,), base_keep_rate=0.5)
    model = AudioViT(c)
    x = rng.normal(size=(2, 1, 64, 32)).astype(np.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))["params"]
    logits, feats = model.apply(
        {"params": params}, jnp.asarray(x), extract_features=True,
        custom_rank="mean",
    )
    # NOTE: custom_rank + extract_features both work here (the reference
    # asserts they are mutually exclusive, models_vit.py:344).
    means = np.asarray(patch_stats(jnp.asarray(x), 16, "mean"))
    idx = np.asarray(feats["block-1.topk_idx"])
    want = np.argsort(-means, axis=1, kind="stable")[:, : idx.shape[1]]
    np.testing.assert_array_equal(idx, want)
    assert logits.shape == (2, 5)


def test_intensity_band_eval_skips_empty(rng):
    c = cfg()
    model = AudioViT(c)
    x = rng.normal(size=(4, 1, 64, 32)).astype(np.float32)
    # sample 0: push all patch means far below the band -> zero kept
    x[0] -= 100.0
    y = np.eye(5, dtype=np.float32)[[0, 1, 2, 3]]
    params = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))["params"]

    step = eval_lib.make_eval_step(model, intensity_band=(-1.0, 1.0, 1))
    logits, kept = step(params, jnp.asarray(x))
    kept = np.asarray(kept)
    assert kept[0] == 0 and (kept[1:] > 0).all()

    stats = eval_lib.evaluate_classification(
        model, params, [(x, y)], batch_size=4,
        intensity_band=(-1.0, 1.0, 1),
    )
    assert 0.0 <= stats["acc1"] <= 100.0  # computed over 3 surviving samples


def test_intensity_band_matches_reference_semantics(rng):
    """Tokens outside (retain_min, retain_max) after the chosen block must
    not influence the pooled feature: verify against a manual masked mean."""
    c = cfg(depth=2)
    model = AudioViT(c)
    x = rng.normal(size=(1, 1, 64, 32)).astype(np.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))["params"]
    lo, hi = -0.05, 0.05
    step = eval_lib.make_eval_step(model, intensity_band=(lo, hi, 1))
    logits, kept = step(params, jnp.asarray(x))
    means = np.asarray(patch_stats(jnp.asarray(x), 16, "mean"))[0]
    want_kept = int(((means > lo) & (means < hi)).sum())
    assert int(kept[0]) == want_kept


def test_kept_count_tables_double_ceil():
    """table[i][n] must be the host-DOUBLE ceil (the reference's
    math.ceil, models_vit.py:104): at keep 0.07, n=100 double gives
    7.000000000000001 -> 8 while the f32 product rounds to exactly 7.0."""
    from tpat_tpu.engine import schedules

    tbl = schedules.kept_count_tables((1.0, 0.07), (1,), 128)
    assert tbl[1][100] == 8
    assert float(np.ceil(np.float32(0.07) * np.float32(100))) == 7.0
    np.testing.assert_array_equal(tbl[0], np.arange(129))


def test_band_keeping_all_matches_static_pruned_forward(rng):
    """A band wide enough to keep every token must leave the band eval on
    exactly the static pruned forward — exercising the table-driven exact
    kept counts end-to-end through make_eval_step."""
    c = cfg(drop_loc=(1,), base_keep_rate=0.5)
    model = AudioViT(c)
    x = rng.normal(size=(2, 1, 64, 32)).astype(np.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(x)
    )["params"]
    step = eval_lib.make_eval_step(model, intensity_band=(-1e9, 1e9, 0))
    logits, kept = step(params, jnp.asarray(x))
    want = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(want), rtol=2e-5, atol=2e-5
    )
