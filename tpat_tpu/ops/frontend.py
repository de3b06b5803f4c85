"""On-device audio frontend: batched waveform -> model-ready spectrogram
inside jit.

The reference computes fbank per-clip on CPU workers (torchaudio native
kernels); here the whole frontend — framing, window, rFFT, mel matmul
(MXU), pad-with-min, SpecAug, normalization, noise — can run batched on
the TPU, fused into the training step's graph, removing the host fbank
from the input-pipeline critical path.

Pipeline order matches the reference dataset exactly
(``/root/reference/audiomae/dataset.py:209-301``): fbank -> pad/crop to
target_length (fill = per-utterance min) -> SpecAug (zero fill, BEFORE
normalization) -> (x - mean) / (2 std) -> optional noise + time roll.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from tpat_tpu.ops import fbank as fb
from tpat_tpu.ops import pruning


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    sample_rate: int = 16000
    num_mel_bins: int = 128
    target_length: int = 512
    norm_mean: float = -6.6268077
    norm_std: float = 5.358466
    freqm: int = 0
    timem: int = 0
    noise: bool = False

    @property
    def fbank_cfg(self) -> fb.FbankConfig:
        return fb.FbankConfig(
            sample_rate=self.sample_rate, num_mel_bins=self.num_mel_bins
        )


def _spec_masking_device(mel, freqm, timem, rng):
    """SpecAug with traced widths/starts (static shapes), matching
    torchaudio ``_mask_along_axis`` exactly: draw continuous value ~
    U[0, param) and min ~ U[0, size - value), then mask the integer band
    [trunc(min), trunc(min) + trunc(value)) — torchaudio computes
    ``mask_end = min_value.long() + value.long()``, i.e. start and WIDTH
    are truncated separately (trunc(min + value) would mask one extra bin
    whenever the fractional parts sum past 1), so the masked-bin
    distribution matches the host pipeline (dataset.py:290-297)."""
    b, t, f = mel.shape
    r1, r2, r3, r4 = jax.random.split(rng, 4)

    def band_mask(size, param, rw, rs, batch):
        # NO clamp of param to the axis size: torchaudio's _get_mask_param
        # returns mask_param unmodified at the transforms' default p=1.0.
        # With param > size, (size - width) goes negative and start draws
        # negative — .long() truncates TOWARD ZERO (trunc, not floor), and
        # the band [trunc(start), trunc(start)+trunc(width)) then clips
        # against [0, size) naturally in the comparison below.
        width = jax.random.uniform(rw, (batch,)) * param
        start = jax.random.uniform(rs, (batch,)) * (size - width)
        lo = jnp.trunc(start)
        hi = lo + jnp.trunc(width)
        idx = jnp.arange(size, dtype=jnp.float32)[None, :]
        inside = (idx >= lo[:, None]) & (idx < hi[:, None])
        return ~inside  # True where kept

    if freqm > 0:
        keep_f = band_mask(f, float(freqm), r1, r2, b)  # (B, F)
        mel = mel * keep_f[:, None, :]
    if timem > 0:
        keep_t = band_mask(t, float(timem), r3, r4, b)  # (B, T)
        mel = mel * keep_t[:, :, None]
    return mel


def device_frontend(
    waveforms: jnp.ndarray,
    cfg: FrontendConfig,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jnp.ndarray:
    """(B, num_samples) float32 -> (B, 1, target_length, num_mel_bins).

    jit-able with static shapes; ``train=True`` enables SpecAug/noise
    (requires ``rng``).

    Short-clip contract: fixed-shape batching forces the dataset to pad
    short waveforms up to ``num_samples``, but the reference computes
    fbank on the UNPADDED clip and pads the *mel* rows with
    ``fbank.min()`` (dataset.py:218-225) — frames over digital silence
    are not the same thing.  The dataset therefore pads with **NaN**
    (impossible in decoded PCM); the NaN runs are scanned here, frames a
    shorter true length cannot produce are replaced by that clip's min
    over its REAL frames, and the NaNs are zeroed before the FFT.
    Fully-finite inputs are unaffected.

    A NaN **head** encodes VoxCeleb's random left pad (lr_pad,
    dataset.py:357-366: ``pad_left`` rows of fbank.min() BEFORE the
    clip's rows).  The head length must be ``pad_left * window_shift``
    samples — then real frame ``i`` of the padded waveform covers
    exactly the samples of unpadded frame ``i - pad_left``, so the
    computed rows are bit-aligned with the reference's shifted mel and
    the first ``pad_left`` rows (over padding) take the min fill.
    """
    finite = jnp.isfinite(waveforms)
    n_samp = jnp.sum(finite, axis=1)  # (B,) true lengths
    head = jnp.argmax(finite, axis=1)  # first real sample (0: no head pad)
    waveforms = jnp.where(finite, waveforms, 0.0)

    mel = fb.fbank_jax(waveforms, cfg.fbank_cfg)  # (B, frames, bins)
    b, n_frames, bins = mel.shape

    fcfg = cfg.fbank_cfg
    valid = jnp.where(
        n_samp < fcfg.window_size,
        0,
        1 + (n_samp - fcfg.window_size) // fcfg.window_shift,
    )
    valid = jnp.clip(valid, 1, n_frames)  # (B,) frames the true clip has
    head_frames = head // fcfg.window_shift  # contract: exact multiple
    fidx = jnp.arange(n_frames)[None, :]
    frame_ok = (fidx >= head_frames[:, None]) & (
        fidx < (head_frames + valid)[:, None]
    )  # (B, F)
    real_min = jnp.min(
        jnp.where(frame_ok[:, :, None], mel, jnp.inf), axis=(1, 2),
        keepdims=True,
    )
    # Replace the frames computed over padding with the reference's
    # fbank.min() fill.  For a fully-finite clip, valid == n_frames by the
    # same snip_edges formula fbank_jax uses, so frame_ok is all-true and
    # this is an identity; the scan+fill always executes (traced values —
    # there is no compile-time fast path), costing O(B·samples) isfinite
    # plus one masked min over the mel — negligible next to the FFT.
    mel = jnp.where(frame_ok[:, :, None], mel, real_min)

    # pad with the per-utterance min / crop to target_length (after the
    # fill above, min over all frames == min over real frames)
    t = cfg.target_length
    if n_frames < t:
        fill = jnp.min(mel, axis=(1, 2), keepdims=True)
        pad = jnp.broadcast_to(fill, (b, t - n_frames, bins))
        mel = jnp.concatenate([mel, pad], axis=1)
    elif n_frames > t:
        mel = mel[:, :t]

    if train and (cfg.freqm or cfg.timem):
        assert rng is not None
        rng, sub = jax.random.split(rng)
        mel = _spec_masking_device(mel, cfg.freqm, cfg.timem, sub)

    mel = fb.normalize(mel, cfg.norm_mean, cfg.norm_std)

    if train and cfg.noise:
        assert rng is not None
        r1, r2, r3 = jax.random.split(rng, 3)
        # PER-SAMPLE scale and roll, as the host pipeline draws them per
        # clip (dataset.py:299-301) — batch-wide scalars would correlate
        # the augmentation across the whole batch
        scale = jax.random.uniform(r2, (b,)) / 10.0
        mel = mel + jax.random.uniform(r1, mel.shape) * scale[:, None, None]
        shift = jax.random.randint(r3, (b,), -10, 10)
        rows = (jnp.arange(t)[None, :] - shift[:, None]) % t  # (B, T)
        mel = pruning.take_rows(mel, rows)

    return mel[:, None, :, :]
