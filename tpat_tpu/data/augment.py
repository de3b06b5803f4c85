"""Host-side audio augmentations, matching the reference dataset pipeline
(``/root/reference/audiomae/dataset.py``):

- roll-mag: Beta(10,10)+0.5 gain (``dataset.py:168-173``; the reference's
  circular roll is vestigial — its roll index is always 0, see
  ``roll_mag_aug``)
- waveform mixup with lambda ~ Beta(10,10) building soft labels
  (``dataset.py:254-274``)
- SpecAug frequency/time masking applied BEFORE normalization, masking
  with zeros (``dataset.py:289-297``), torchaudio semantics: continuous
  value ~ U[0, param), min ~ U[0, size - value), band = [int(min),
  int(min) + int(value))
- additive noise + random time roll for SPC-2/VoxCeleb
  (``dataset.py:299-301``)
"""

from __future__ import annotations

import numpy as np


def roll_mag_aug(waveform: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """dataset.py:168-173.  The reference's roll is VESTIGIAL: it draws
    ``np.random.randint(len(waveform))`` on a (1, N) tensor, and
    ``len`` of that is 1, so the roll index is always 0 — only the
    Beta(10,10)+0.5 gain ever applies.  Replicated faithfully (an actual
    roll would change every augmented sample vs the reference run)."""
    mag = rng.beta(10, 10) + 0.5
    return (waveform * mag).astype(np.float32)


def mixup_waveforms(
    w1: np.ndarray, w2: np.ndarray, rng: np.random.Generator
):
    """dataset.py:193-207: pad/cut w2 to w1's length, mix with
    lambda~Beta(10,10), re-center.  Returns (mix, lam)."""
    n1, n2 = w1.shape[-1], w2.shape[-1]
    if n1 != n2:
        if n1 > n2:
            tmp = np.zeros_like(w1)
            tmp[..., :n2] = w2[..., :n2]
            w2 = tmp
        else:
            w2 = w2[..., :n1]
    lam = float(rng.beta(10, 10))
    mix = lam * w1 + (1 - lam) * w2
    mix = mix - mix.mean()
    return mix.astype(np.float32), lam


def spec_masking(
    fbank: np.ndarray,
    freqm: int,
    timem: int,
    rng: np.random.Generator,
    mask_value: float = 0.0,
) -> np.ndarray:
    """SpecAug on a (T, F) fbank (torchaudio ``_mask_along_axis``
    semantics, one mask each): draw continuous value ~ U[0, param) and
    min ~ U[0, size - value), then mask [int(min), int(min) + int(value))
    — start and width truncated separately, exactly as torchaudio's
    ``min_value.long() + value.long()``."""
    fbank = fbank.copy()
    t, f = fbank.shape

    def band(size, param):
        # torchaudio does NOT clamp param to the axis at the transforms'
        # default p=1.0 (_get_mask_param); value > size makes the start
        # draw negative, and .long() truncates toward zero
        value = rng.uniform(0.0, param)
        min_v = rng.random() * (size - value)
        start = int(min_v)  # trunc-toward-zero, like Tensor.long()
        return start, start + int(value)

    if freqm > 0:
        s, e = band(f, freqm)
        fbank[:, max(s, 0) : max(e, 0)] = mask_value
    if timem > 0:
        s, e = band(t, timem)
        fbank[max(s, 0) : max(e, 0), :] = mask_value
    return fbank


def noise_aug(fbank: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """dataset.py:299-301: add uniform noise scaled by a random factor and
    roll the time axis by U[-10, 10)."""
    fbank = fbank + rng.random(fbank.shape).astype(np.float32) * (
        rng.random() / 10.0
    )
    shift = int(rng.integers(-10, 10))
    return np.roll(fbank, shift, axis=0).astype(np.float32)
