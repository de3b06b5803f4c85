"""Positional embeddings and checkpoint pos-embed surgery.

Re-derivations of ``/root/reference/audiomae/util/pos_embed.py`` in numpy:
2D sin-cos grids (MoCo-v3 style) and the time-axis crop used when adapting
an AudioSet-pretrained (8, 64) grid to a shorter target length
(``pos_embed.py:139-159``), plus the AST DeiT center-crop adaptation
(``ast/src/models/ast_models.py:308-330, 362-381``).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """(M,) positions -> (M, embed_dim) sin-cos embedding.

    Matches ``util/pos_embed.py:67-85``: omega = 1/10000^(2i/D), concat
    [sin, cos] along the feature axis.
    """
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float32)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float32), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def sincos_2d(
    embed_dim: int, grid_hw: Tuple[int, int], cls_token: bool = False
) -> np.ndarray:
    """2D sin-cos embedding over an (H, W) grid, row-major (h outer, w
    inner).  NOTE the reference quirk replicated bit-exactly
    (``util/pos_embed.py:38-64``): ``np.meshgrid(grid_w, grid_h)`` puts
    the W coordinates in ``grid[0]``, and the "emb_h" variable name there
    (and here) actually holds the W encoding — so the FIRST half of the
    channels encodes w, the second half h.  Do not "fix" this: every
    imported AudioMAE checkpoint was trained against this layout."""
    h, w = grid_hw
    grid_h = np.arange(h, dtype=np.float32)
    grid_w = np.arange(w, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w first, like the reference
    grid = np.stack(grid, axis=0).reshape([2, 1, h, w])
    emb_h = sincos_1d(embed_dim // 2, grid[0])
    emb_w = sincos_1d(embed_dim // 2, grid[1])
    emb = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        emb = np.concatenate([np.zeros([1, embed_dim], dtype=emb.dtype), emb], axis=0)
    return emb


def crop_time_audio_pos_embed(
    pos_embed: np.ndarray,
    orig_size: Tuple[int, int],
    new_size: Tuple[int, int],
    num_extra_tokens: int = 1,
) -> np.ndarray:
    """AudioMAE checkpoint surgery (``util/pos_embed.py:139-159``).

    pos_embed: (1, extra + orig_h*orig_w, D).  The patch rows are viewed as
    an (orig_h, orig_w) grid — the reference treats the AudioSet grid as
    (8, 64) — and the *second* axis is cropped to new_size[1].  Extra-token
    rows are preserved at the front.
    """
    if orig_size == new_size:
        return pos_embed
    d = pos_embed.shape[-1]
    extras = pos_embed[:, :num_extra_tokens, :]
    patches = pos_embed[:, num_extra_tokens:, :]
    patches = patches.reshape(-1, orig_size[0], orig_size[1], d)
    if new_size[1] > orig_size[1]:
        raise ValueError(
            f"time axis can only be cropped, got {orig_size} -> {new_size}"
        )
    patches = patches[:, :, : new_size[1], :]
    patches = patches.reshape(1, new_size[0] * new_size[1], d)
    return np.concatenate([extras, patches], axis=1)



def _bicubic_resize_torch(
    grid: np.ndarray, out_hw: Tuple[int, int]
) -> np.ndarray:
    """(H, W, D) -> (out_h, out_w, D) replicating torch
    ``F.interpolate(mode='bicubic', align_corners=False)`` exactly:
    src = (dst + 0.5) * in/out - 0.5, separable 4-tap Keys cubic with
    A = -0.75, edge-clamped taps, no antialiasing.  (jax.image.resize uses
    A = -0.5 and antialiases on downscale, so its output diverges from the
    reference surgery at util/pos_embed.py:93-137.)"""
    a = -0.75

    def axis_weights(n_in, n_out):
        dst = np.arange(n_out, dtype=np.float64)
        src = (dst + 0.5) * (n_in / n_out) - 0.5
        x1 = np.floor(src)
        t = src - x1

        def cc1(x):  # |x| <= 1
            return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0

        def cc2(x):  # 1 < |x| < 2
            return ((a * x - 5.0 * a) * x + 8.0 * a) * x - 4.0 * a

        w = np.stack([cc2(t + 1.0), cc1(t), cc1(1.0 - t), cc2(2.0 - t)], 1)
        idx = np.stack([x1 - 1, x1, x1 + 1, x1 + 2], 1).astype(np.int64)
        return w, np.clip(idx, 0, n_in - 1)

    h, w, _d = grid.shape
    oh, ow = out_hw
    wy, iy = axis_weights(h, oh)
    wx, ix = axis_weights(w, ow)
    g = grid.astype(np.float64)
    rows = (g[iy] * wy[:, :, None, None]).sum(axis=1)  # (oh, W, D)
    out = (rows[:, ix] * wx[None, :, :, None]).sum(axis=2)  # (oh, ow, D)
    return out.astype(grid.dtype)


def interpolate_square_pos_embed(
    pos_embed: np.ndarray, new_size: int, num_extra_tokens: int = 1
) -> np.ndarray:
    """Square bicubic pos-embed interpolation — ``interpolate_pos_embed``
    (``util/pos_embed.py:93-114``): for image-pretrained checkpoints whose
    grid side differs from the target.  torch-bicubic (A=-0.75, no
    antialias), not jax.image.resize."""
    d = pos_embed.shape[-1]
    n = pos_embed.shape[1] - num_extra_tokens
    orig = int(n ** 0.5)
    if orig == new_size:
        return pos_embed
    extras = pos_embed[:, :num_extra_tokens]
    grid = pos_embed[:, num_extra_tokens:].reshape(orig, orig, d)
    grid = _bicubic_resize_torch(grid, (new_size, new_size))
    return np.concatenate(
        [extras, grid.reshape(1, new_size * new_size, d)], axis=1
    )


def interpolate_img2audio_pos_embed(
    pos_embed: np.ndarray,
    orig_size: Tuple[int, int],
    new_size: Tuple[int, int],
    num_extra_tokens: int = 1,
) -> np.ndarray:
    """Rectangular bicubic interpolation — ``interpolate_pos_embed_
    img2audio`` (``util/pos_embed.py:116-137``): adapt an image grid (e.g.
    14x14) to an audio grid (e.g. 8x64).  torch-bicubic semantics."""
    if orig_size == new_size:
        return pos_embed
    d = pos_embed.shape[-1]
    extras = pos_embed[:, :num_extra_tokens]
    grid = pos_embed[:, num_extra_tokens:].reshape(
        orig_size[0], orig_size[1], d
    )
    grid = _bicubic_resize_torch(grid, new_size)
    return np.concatenate(
        [extras, grid.reshape(1, new_size[0] * new_size[1], d)], axis=1
    )


def _bilinear_resize_torch(
    grid: np.ndarray, out_hw: Tuple[int, int]
) -> np.ndarray:
    """(H, W, D) -> (out_h, out_w, D) replicating torch
    ``F.interpolate(mode='bilinear', align_corners=False)`` exactly:
    src = max((dst + 0.5) * in/out - 0.5, 0) — the non-cubic source-index
    formula clamps negatives to 0 — then a separable 2-tap lerp with
    edge-clamped taps.  Used by the AST DeiT pos-embed surgery
    (``ast_models.py:315-323`` is bilinear, unlike the AudioMAE adapters'
    bicubic)."""

    def axis_weights(n_in, n_out):
        dst = np.arange(n_out, dtype=np.float64)
        src = (dst + 0.5) * (n_in / n_out) - 0.5
        src = np.maximum(src, 0.0)
        x0 = np.floor(src)
        t = src - x0
        w = np.stack([1.0 - t, t], 1)
        idx = np.stack([x0, x0 + 1], 1).astype(np.int64)
        return w, np.clip(idx, 0, n_in - 1)

    h, w, _d = grid.shape
    oh, ow = out_hw
    wy, iy = axis_weights(h, oh)
    wx, ix = axis_weights(w, ow)
    g = grid.astype(np.float64)
    rows = (g[iy] * wy[:, :, None, None]).sum(axis=1)  # (oh, W, D)
    out = (rows[:, ix] * wx[None, :, :, None]).sum(axis=2)  # (oh, ow, D)
    return out.astype(grid.dtype)


def deit_img2audio_pos_embed(
    pos_embed: np.ndarray,
    f_dim: int,
    t_dim: int,
    num_extra_tokens: int = 2,
) -> np.ndarray:
    """AST ImageNet-DeiT pos-embed surgery (``ast_models.py:308-325``).

    The DeiT-distilled checkpoint carries a square (24, 24) grid behind the
    CLS + distill rows.  The reference views it channel-first as
    (1, D, 24, 24) and adapts axis-by-axis, TIME first then FREQ:
    an axis whose target fits inside 24 is center-CUT
    (``[hw//2 - dim//2 : hw//2 - dim//2 + dim]``); a larger target is
    torch-BILINEAR interpolated (the second interpolate passes
    ``size=(f_dim, t_dim)`` after the time axis already reached t_dim, so
    it only ever stretches freq).  Extra-token rows pass through.
    """
    d = pos_embed.shape[-1]
    n = pos_embed.shape[1] - num_extra_tokens
    hw = int(round(n ** 0.5))
    if hw * hw != n:
        raise ValueError(f"DeiT pos-embed grid is square; got {n} patches")
    extras = pos_embed[:, :num_extra_tokens]
    grid = pos_embed[:, num_extra_tokens:].reshape(hw, hw, d)
    # time axis (grid W) — ast_models.py:315-318
    if t_dim <= hw:
        start = int(hw / 2) - int(t_dim / 2)
        grid = grid[:, start : start + t_dim, :]
    else:
        grid = _bilinear_resize_torch(grid, (hw, t_dim))
    # freq axis (grid H) — ast_models.py:320-323
    if f_dim <= hw:
        start = int(hw / 2) - int(f_dim / 2)
        grid = grid[start : start + f_dim, :, :]
    else:
        grid = _bilinear_resize_torch(grid, (f_dim, t_dim))
    return np.concatenate(
        [extras, grid.reshape(1, f_dim * t_dim, d)], axis=1
    )


def sum_rgb_patch_embed(kernel: np.ndarray) -> np.ndarray:
    """RGB->1ch patch-embed adaptation by channel sum
    (``util/pos_embed.py:162-167``); kernel in flax layout (kh, kw, C, D)."""
    return kernel.sum(axis=2, keepdims=True)


def center_crop_time_ast_pos_embed(
    pos_embed: np.ndarray,
    t_dim: int,
    f_dim: int = 8,
    num_extra_tokens: int = 2,
) -> np.ndarray:
    """AST AudioSet-checkpoint surgery (``ast_models.py:362-381``).

    The 512 patch rows are viewed as (768-d, 8, 64) and the time axis is
    center-cropped to t_dim: columns [32 - t_dim//2, 32 - t_dim//2 + t_dim).
    """
    if f_dim != 8:
        raise ValueError("AST AudioSet grid is (8, 64); f_dim must be 8")
    d = pos_embed.shape[-1]
    extras = pos_embed[:, :num_extra_tokens, :]
    patches = pos_embed[:, num_extra_tokens:, :]  # (1, 512, D)
    # reshape(1, 512, D).transpose(1,2).reshape(1, D, 8, 64) in the
    # reference == channel-last view (1, 8, 64, D) here.
    grid = patches.reshape(1, 8, 64, d)
    if t_dim < 64:
        start = 32 - int(t_dim / 2)
        grid = grid[:, :, start : start + t_dim, :]
    elif t_dim > 64:
        raise ValueError(f"t_dim={t_dim} > 64 not supported (ast_models.py:371)")
    patches = grid.reshape(1, 8 * t_dim, d)
    return np.concatenate([extras, patches], axis=1)
