"""On-device frontend vs the host dataset pipeline (eval mode must be
numerically equivalent; train mode shapes + masking bounds)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpat_tpu.ops import fbank as fb
from tpat_tpu.ops.frontend import FrontendConfig, device_frontend


@pytest.fixture(scope="module")
def waves(rng=None):
    g = np.random.default_rng(0)
    return np.clip(g.normal(size=(3, 16000)) * 0.2, -1, 1).astype(np.float32)


def host_pipeline(wave, cfg: FrontendConfig):
    mel = fb.fbank_numpy(wave, cfg.fbank_cfg)
    mel = fb.pad_or_crop(mel, cfg.target_length)
    return fb.normalize(mel, cfg.norm_mean, cfg.norm_std)


def test_device_matches_host_eval(waves):
    cfg = FrontendConfig(target_length=128, norm_mean=-6.0, norm_std=5.0)
    out = np.asarray(
        jax.jit(lambda w: device_frontend(w, cfg))(jnp.asarray(waves))
    )
    assert out.shape == (3, 1, 128, 128)
    for b in range(3):
        want = host_pipeline(waves[b], cfg)
        np.testing.assert_allclose(out[b, 0], want, rtol=1e-3, atol=2e-3)


def test_device_short_clip_nan_tail_matches_host(waves):
    """Short clips arrive NaN-padded to the fixed sample budget
    (datasets._fixed_waveform); the device frontend must reproduce the
    host pipeline run on the UNPADDED clip — fbank over real samples
    only, missing frames filled with that clip's fbank.min()
    (dataset.py:218-225) — not log-mel of digital silence."""
    cfg = FrontendConfig(target_length=128, norm_mean=-6.0, norm_std=5.0)
    num_samples = (cfg.target_length - 1) * 160 + 400
    lengths = [9000, 399, 16000, num_samples]  # incl. sub-window clip
    long = np.tile(waves, (1, 1 + num_samples // waves.shape[1]))
    batch = np.full((len(lengths), num_samples), np.nan, dtype=np.float32)
    for i, n in enumerate(lengths):
        batch[i, :n] = long[i % 3, :n]
    out = np.asarray(
        jax.jit(lambda w: device_frontend(w, cfg))(jnp.asarray(batch))
    )
    for i, n in enumerate(lengths):
        if n < 400:
            continue  # sub-window clips are pathological; shape-only
        want = host_pipeline(long[i % 3, :n], cfg)
        np.testing.assert_allclose(out[i, 0], want, rtol=1e-3, atol=2e-3)
    # fully-NaN-free batches take the identical path (regression guard)
    full = np.asarray(
        jax.jit(lambda w: device_frontend(w, cfg))(
            jnp.asarray(np.nan_to_num(batch[3:4]))
        )
    )
    np.testing.assert_array_equal(full[0], out[3])


def test_device_crop(waves):
    cfg = FrontendConfig(target_length=64, norm_mean=-6.0, norm_std=5.0)
    out = np.asarray(device_frontend(jnp.asarray(waves), cfg))
    assert out.shape == (3, 1, 64, 128)


def test_device_train_augs(waves):
    cfg = FrontendConfig(
        target_length=128, norm_mean=-6.0, norm_std=5.0,
        freqm=24, timem=48, noise=True,
    )
    fn = jax.jit(
        lambda w, r: device_frontend(w, cfg, rng=r, train=True)
    )
    out1 = np.asarray(fn(jnp.asarray(waves), jax.random.PRNGKey(0)))
    out2 = np.asarray(fn(jnp.asarray(waves), jax.random.PRNGKey(1)))
    assert out1.shape == (3, 1, 128, 128)
    assert not np.allclose(out1, out2)  # augmentation varies with rng
    # SpecAug zero-fill before normalization -> masked cells equal
    # normalize(0) exactly; count cells at that value in out1's mel rows
    masked_value = (0.0 - cfg.norm_mean) / (2 * cfg.norm_std)
    frac = np.isclose(out1, masked_value).mean()
    assert frac < 0.6  # masks are bands, not everything


def test_device_spec_masking_floor_semantics():
    """The device SpecAug band width is exactly floor(value) bins —
    torchaudio computes mask_end = min.long() + value.long(), so with
    param=2 the band is 0 or 1 bins wide, never 2 (floor(min + value)
    would mask 2 bins whenever the fractional parts sum past 1)."""
    from tpat_tpu.ops.frontend import _spec_masking_device

    mel = jnp.ones((8, 16, 16))
    widths = set()
    for seed in range(40):
        out = np.asarray(
            _spec_masking_device(mel, 2, 0, jax.random.PRNGKey(seed))
        )
        # per-sample count of fully-zeroed freq columns
        for b in range(out.shape[0]):
            zero_cols = int((out[b] == 0.0).all(axis=0).sum())
            widths.add(zero_cols)
            assert zero_cols <= 1, zero_cols
    assert widths == {0, 1}  # both outcomes occur across draws


def test_device_noise_aug_per_sample():
    """Noise scale and time roll are drawn PER SAMPLE (dataset.py:299-301
    draws per clip), not once per batch."""
    from tpat_tpu.ops.frontend import FrontendConfig, device_frontend

    cfg = FrontendConfig(
        target_length=64, norm_mean=0.0, norm_std=0.5, noise=True,
        freqm=0, timem=0,
    )
    waves = np.tile(
        np.clip(np.random.default_rng(0).normal(size=(1, 16000)) * 0.2, -1, 1),
        (8, 1),
    ).astype(np.float32)  # identical clips
    out = np.asarray(
        jax.jit(lambda w, r: device_frontend(w, cfg, rng=r, train=True))(
            jnp.asarray(waves), jax.random.PRNGKey(0)
        )
    )
    # identical inputs + per-sample noise/roll -> pairwise different mels
    diffs = [
        np.abs(out[i] - out[0]).max() > 1e-4 for i in range(1, 8)
    ]
    assert sum(diffs) >= 6, diffs
