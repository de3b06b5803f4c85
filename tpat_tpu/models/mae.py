"""Masked Autoencoder for spectrograms (pretraining model).

Re-derivation of ``/root/reference/audiomae/models_mae.py``: ViT encoder on
visible patches + lightweight decoder over the de-shuffled full sequence,
masked-patch MSE loss with optional per-patch pixel normalization
(``models_mae.py:405-421``).  Masking flavors (``:225-303``):

- unstructured ``random_masking``: keep int(L*(1-ratio)) tokens by argsort
  of per-token noise
- structured ``random_masking_2d``: drop whole time rows and freq columns
  of the (T/16, 8) patch grid; the kept count is the product of kept rows
  and columns (999-offset argsort composition trick replicated exactly)

Decoders (``decoder_mode``):
- 0: plain transformer blocks over [cls + unshuffled tokens]
- 1: shifted-window swin_v2_cr blocks over the (64, 8) patch grid with
  window (4, 4) and alternating (0,0)/(2,0) shifts (``models_mae.py:76-109``;
  the kwargs there — ``feat_size``, ``drop_attn``, ``extra_norm``,
  ``sequential_attn`` — are timm's ``SwinTransformerV2CrBlock`` signature).
  Faithful to that block's math: scaled-cosine attention with clamped
  learned logit scales, log-CPB meta-MLP relative-position bias, V2
  res-post-norm residuals, and shift-region attention masking — so a
  reference MAE checkpoint's *decoder* weights import too
  (``utils/torch_import.py::mae_params_from_state_dict``), not just the
  encoder (finetuning drops decoder weights, main_finetune.py:414
  strict=False).

Unlike the reference, a runnable pretraining driver is provided
(``tpat_tpu/cli/pretrain.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpat_tpu.config import ViTConfig
from tpat_tpu.models import pos_embed as pe
from tpat_tpu.models.vit import Block, Mlp, PatchEmbed
from tpat_tpu.ops import pruning

_xavier = nn.initializers.xavier_uniform()
_normal02 = nn.initializers.normal(stddev=0.02)

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class MAEConfig:
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    decoder_embed_dim: int = 512
    decoder_depth: int = 16
    decoder_num_heads: int = 16
    decoder_mode: int = 1  # 0 = transformer, 1 = shifted-window
    window_size: Tuple[int, int] = (4, 4)
    mlp_ratio: float = 4.0
    patch_size: int = 16
    target_length: int = 1024
    num_mel_bins: int = 128
    norm_pix_loss: bool = False
    mask_2d: bool = False
    mask_t_prob: float = 0.7
    mask_f_prob: float = 0.3
    # bfloat16 by default, matching ViTConfig (the platform's fast mode);
    # float32 is the explicit parity/test override.
    compute_dtype: str = "bfloat16"
    # 'auto' picks a fused Pallas window-attention kernel when the
    # geometry supports it (head_dim divides 128, dim % 128 == 0 —
    # true for the reference decoder: 512 dim, 16 heads): the
    # dense-masked kernel where its (H, N, N) template fits VMEM
    # (ESC-50 grid, N=256), else the window-order block-diagonal
    # 'banded' kernel whose template is (H, N, 128) (AudioSet grid,
    # N=512); 'fused'/'banded' force those kernels, 'xla' forces the
    # reference-shaped lowering.
    window_attention_impl: str = "auto"
    # GELU implementation for every Mlp in the model (encoder Blocks,
    # swin decoder blocks, transformer decoder blocks).  Same semantics
    # as ViTConfig.gelu_impl: 'auto' uses the polynomial normal-CDF fit
    # (ops/fast_gelu.py) when the compute dtype is bfloat16, 'exact'
    # forces erf, 'poly' forces the polynomial.
    gelu_impl: str = "auto"
    # models_mae.py:33,55,69 — the sin-cos pos embeds are nn.Parameters
    # with requires_grad=pos_trainable, default False: frozen throughout
    # pretraining (gradient stopped in the forward; the driver also
    # excludes them from weight decay).
    pos_trainable: bool = False

    def __post_init__(self):
        # an unrecognized impl string must fail loudly, not silently take
        # the XLA fallback (giving up the fused-kernel pretrain speedup)
        if self.window_attention_impl not in ("auto", "fused", "banded", "xla"):
            raise ValueError(
                "window_attention_impl must be 'auto', 'fused', 'banded', "
                f"or 'xla', got {self.window_attention_impl!r}"
            )
        if self.gelu_impl not in ("auto", "exact", "poly"):
            raise ValueError(
                "gelu_impl must be 'auto', 'exact', or 'poly', "
                f"got {self.gelu_impl!r}"
            )
        if self.compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                "compute_dtype must be 'float32' or 'bfloat16', "
                f"got {self.compute_dtype!r}"
            )

    @property
    def grid(self) -> Tuple[int, int]:
        return (
            self.target_length // self.patch_size,
            self.num_mel_bins // self.patch_size,
        )

    @property
    def num_patches(self) -> int:
        t, f = self.grid
        return t * f

    def encoder_vit_config(self) -> ViTConfig:
        return ViTConfig(
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            target_length=self.target_length,
            num_mel_bins=self.num_mel_bins,
            drop_loc=(),
            base_keep_rate=1.0,
            drop_path_rate=0.0,
            compute_dtype=self.compute_dtype,
            gelu_impl=self.gelu_impl,
            dense_init="xavier_uniform",  # models_mae.py:170-173
        )

    def decoder_vit_config(self) -> ViTConfig:
        return ViTConfig(
            embed_dim=self.decoder_embed_dim,
            depth=self.decoder_depth,
            num_heads=self.decoder_num_heads,
            mlp_ratio=self.mlp_ratio,
            target_length=self.target_length,
            num_mel_bins=self.num_mel_bins,
            drop_loc=(),
            base_keep_rate=1.0,
            drop_path_rate=0.0,
            compute_dtype=self.compute_dtype,
            gelu_impl=self.gelu_impl,
            dense_init="xavier_uniform",  # models_mae.py:170-173
        )


def _relative_coordinates_log(window: Tuple[int, int]) -> np.ndarray:
    """Log-spaced pairwise window coordinates, (L*L, 2), matching timm
    swin_v2_cr ``WindowMultiHeadAttention._make_pair_wise_relative_positions``
    (sign(Δ)·log(1+|Δ|), row-major (query, key) pair order)."""
    wh, ww = window
    coords = np.stack(
        np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, L, L)
    rel = rel.transpose(1, 2, 0).reshape(-1, 2).astype(np.float32)
    return np.sign(rel) * np.log1p(np.abs(rel))


def _shift_attn_mask(
    feat_size: Tuple[int, int],
    window: Tuple[int, int],
    shift: Tuple[int, int],
) -> Optional[np.ndarray]:
    """Additive (-100) attention mask for shifted windows, matching timm
    swin_v2_cr ``SwinTransformerV2CrBlock._make_attention_mask``: region ids
    painted with the canonical 3x3 slice loop, windows partitioned, pairs in
    different regions masked.  None when the block is unshifted."""
    st, sf = shift
    if not (st or sf):
        return None
    t, f = feat_size
    wh, ww = window
    img = np.zeros((t, f), dtype=np.float32)
    cnt = 0
    for hsl in (slice(0, -wh), slice(-wh, -st), slice(-st, None)):
        for wsl in (slice(0, -ww), slice(-ww, -sf), slice(-sf, None)):
            img[hsl, wsl] = cnt
            cnt += 1
    win = (
        img.reshape(t // wh, wh, f // ww, ww)
        .transpose(0, 2, 1, 3)
        .reshape(-1, wh * ww)
    )
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttentionV2(nn.Module):
    """swin_v2_cr window attention (timm ``swin_transformer_v2_cr.py``
    ``WindowMultiHeadAttention``, the block class the reference constructs at
    ``models_mae.py:93-106``): scaled-cosine attention with a clamped learned
    per-head ``logit_scale`` (init log 10, clamp max log 100) and a continuous
    relative-position bias from a 2-layer ReLU meta-MLP over log-spaced
    coordinates, including timm's hard-coded meta-MLP hidden dropout
    ``drop=(0.125, 0.)`` (active while training — the pretrain driver runs
    with ``deterministic=False``).

    Two execution paths sharing one parameter layout (same submodule
    names and shapes — checkpoints are interchangeable):

    - ``__call__`` with ``dense_geometry``: the fused Pallas kernel
      (``ops/pallas_window_attention.py``) evaluates window attention as
      dense masked attention over the WHOLE token grid — the partition,
      shift roll, region mask and relative-position bias collapse into a
      static per-head additive template, the kernel consumes the packed
      qkv Dense output directly (no head split/merge permutes), and
      probabilities never leave VMEM.  Motivated by ~45 ms/step of XLA
      window machinery at MAE-base b32 (scripts/bench_mae_step.py).
    - ``__call__`` on partitioned windows: the reference restatement
      (parity/fallback path).
    """

    dim: int
    num_heads: int
    window: Tuple[int, int]
    meta_hidden_dim: int = 384
    dtype: Any = jnp.float32

    def _bias_table(self, n: int, deterministic: bool) -> Array:
        """(H, L, L) log-CPB relative-position bias from the meta-MLP."""
        h = self.num_heads
        rel_log = jnp.asarray(_relative_coordinates_log(self.window))
        bias = nn.Dense(
            self.meta_hidden_dim, name="meta_fc1", kernel_init=_xavier
        )(rel_log)
        bias = nn.relu(bias)
        # timm meta_mlp drop=(0.125, 0.): dropout on the hidden activation
        bias = nn.Dropout(0.125)(bias, deterministic=deterministic)
        bias = nn.Dense(h, name="meta_fc2", kernel_init=_xavier)(bias)
        return bias.transpose(1, 0).reshape(h, n, n)

    @nn.compact
    def __call__(
        self, x: Array, mask: Optional[Array] = None,
        deterministic: bool = True,
        dense_geometry: Optional[tuple] = None,
    ) -> Array:
        # partitioned call: x (num_windows*B, tokens, dim),
        #   mask (num_windows, tokens, tokens)
        # dense call:       x (B, T*F, dim), mask unused,
        #   dense_geometry = (feat_size, shift, region_mask|None, mode)
        #   with mode 'fused' (dense-masked kernel) or 'banded'
        #   (window-order block-diagonal kernel)
        b, n, c = x.shape
        h = self.num_heads
        wh, ww = self.window
        qkv = nn.Dense(3 * c, name="qkv", kernel_init=_xavier,
                       dtype=self.dtype)(x)

        logit_scale = self.param(
            "logit_scale",
            lambda rng, shape: jnp.full(shape, np.log(10.0), jnp.float32),
            (h,),
        )
        scale = jnp.exp(jnp.minimum(logit_scale, np.log(1.0 / 0.01)))
        bias = self._bias_table(wh * ww, deterministic)

        if dense_geometry is not None:
            from tpat_tpu.ops import pallas_window_attention as pwa

            feat_size, shift, region_mask, mode = dense_geometry
            if mode == "banded":
                # window-order block-diagonal: permute tokens to
                # window-major order (static gather), run the banded
                # kernel on the 128-token diagonal chunks, permute back
                band, perm, inv_perm = pwa.build_band_template(
                    bias.astype(jnp.float32), feat_size, self.window,
                    shift, region_mask,
                )
                out = pwa.fused_window_attention_banded(
                    qkv[:, perm], scale, band
                )[:, inv_perm]
            else:
                template = pwa.build_window_template(
                    bias.astype(jnp.float32), feat_size, self.window, shift,
                    region_mask,
                )
                out = pwa.fused_window_attention(qkv, scale, template)
            return nn.Dense(c, name="proj", kernel_init=_xavier,
                            dtype=self.dtype)(out)

        assert n == wh * ww
        qkv = qkv.reshape(b, n, 3, h, c // h).transpose(2, 0, 3, 1, 4)
        # cosine/softmax math in f32 regardless of compute dtype
        q = qkv[0].astype(jnp.float32)
        k = qkv[1].astype(jnp.float32)
        v = qkv[2]

        # cosine attention: F.normalize semantics (eps=1e-12 floor on norms)
        qn = q / jnp.maximum(
            jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12
        )
        kn = k / jnp.maximum(
            jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12
        )
        logits = jnp.einsum("bhqd,bhkd->bhqk", qn, kn)
        logits = logits * scale.reshape(1, h, 1, 1)
        logits = logits + bias[None]

        if mask is not None:
            nw = mask.shape[0]
            logits = logits.reshape(b // nw, nw, h, n, n)
            logits = logits + mask[None, :, None]
            logits = logits.reshape(b, h, n, n)

        p = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, name="proj", kernel_init=_xavier,
                        dtype=self.dtype)(out)


class SwinBlock(nn.Module):
    """swin_v2_cr shifted-window block over a (T, F) token grid
    (``SwinTransformerV2CrBlock`` as constructed at ``models_mae.py:93-106``:
    window (4,4), feat (64,8), shifts alternating (0,0)/(2,0), extra_norm
    False, drop-path 0).  V2 res-post-norm ordering: ``x = x + norm1(attn(x))``
    then ``x = x + norm2(mlp(x))`` — the norm follows the sublayer."""

    dim: int
    num_heads: int
    feat_size: Tuple[int, int]
    window: Tuple[int, int]
    shift: Tuple[int, int]
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    gelu_impl: str = "auto"

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        # x: (B, T*F, D)
        b, l, d = x.shape
        t, f = self.feat_size
        wh, ww = self.window
        st, sf = self.shift
        assert l == t * f

        from tpat_tpu.ops import pallas_window_attention as pwa

        mask = _shift_attn_mask(self.feat_size, self.window, self.shift)
        attn = WindowAttentionV2(
            d, self.num_heads, self.window, dtype=self.dtype, name="attn"
        )
        itemsize = jnp.dtype(self.dtype).itemsize
        d_head = d // self.num_heads
        impl = self.attn_impl
        if impl == "auto":
            # dense-masked where the full template fits VMEM (the
            # measured winner at the ESC-50 grid); the banded
            # block-diagonal form covers larger grids (AudioSet N=512)
            # the dense template cannot
            if pwa.supports(self.num_heads, d_head, l, itemsize):
                impl = "fused"
            elif pwa.supports_banded(
                self.num_heads, d_head, l, wh * ww, itemsize
            ):
                impl = "banded"
            else:
                impl = "xla"
        if impl in ("fused", "banded"):
            # fused paths: tokens stay in grid order at the module
            # boundary — the roll/partition/reverse become part of the
            # static template (and, for banded, a static permutation)
            h = attn(
                x, deterministic=deterministic,
                dense_geometry=(self.feat_size, self.shift, mask, impl),
            )
        else:
            h = x.reshape(b, t, f, d)
            if st or sf:
                h = jnp.roll(h, shift=(-st, -sf), axis=(1, 2))
            # window partition
            h = h.reshape(b, t // wh, wh, f // ww, ww, d)
            h = h.transpose(0, 1, 3, 2, 4, 5).reshape(-1, wh * ww, d)
            h = attn(
                h, None if mask is None else jnp.asarray(mask),
                deterministic=deterministic,
            )
            # reverse
            h = h.reshape(b, t // wh, f // ww, wh, ww, d)
            h = h.transpose(0, 1, 3, 2, 4, 5).reshape(b, t, f, d)
            if st or sf:
                h = jnp.roll(h, shift=(st, sf), axis=(1, 2))
        x = x + nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(
            h.reshape(b, l, d)
        )

        h = Mlp(int(d * self.mlp_ratio), d, 0.0, self.dtype,
                gelu_impl=self.gelu_impl, kernel_init=_xavier, name="mlp")(x)
        return x + nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(h)


class MaskedAutoencoderViT(nn.Module):
    cfg: MAEConfig

    def setup(self):
        cfg = self.cfg
        enc_cfg = cfg.encoder_vit_config()
        dec_cfg = cfg.decoder_vit_config()
        d, dd = cfg.embed_dim, cfg.decoder_embed_dim
        p = cfg.num_patches

        self.patch_embed = PatchEmbed(enc_cfg)
        self.cls_token = self.param("cls_token", _normal02, (1, 1, d))
        pos = pe.sincos_2d(d, cfg.grid, cls_token=True)[None].astype(np.float32)
        self.pos_embed = self.param(
            "pos_embed", lambda rng, shape: jnp.asarray(pos), (1, p + 1, d)
        )
        self.blocks = [
            Block(enc_cfg, block_id=i, drop_path_rate=0.0, name=f"blocks_{i}")
            for i in range(cfg.depth)
        ]
        cdtype = jnp.dtype(cfg.compute_dtype)
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=cdtype)

        self.decoder_embed = nn.Dense(dd, kernel_init=_xavier, dtype=cdtype)
        self.mask_token = self.param("mask_token", _normal02, (1, 1, dd))
        dpos = pe.sincos_2d(dd, cfg.grid, cls_token=True)[None].astype(np.float32)
        self.decoder_pos_embed = self.param(
            "decoder_pos_embed", lambda rng, shape: jnp.asarray(dpos),
            (1, p + 1, dd),
        )
        if cfg.decoder_mode == 1:
            self.decoder_blocks = [
                SwinBlock(
                    dim=dd,
                    num_heads=cfg.decoder_num_heads,
                    feat_size=cfg.grid,
                    window=cfg.window_size,
                    shift=(0, 0) if i % 2 == 0 else (2, 0),
                    mlp_ratio=cfg.mlp_ratio,
                    attn_impl=cfg.window_attention_impl,
                    gelu_impl=cfg.gelu_impl,
                    dtype=cdtype,
                    name=f"decoder_blocks_{i}",
                )
                for i in range(cfg.decoder_depth)
            ]
        else:
            self.decoder_blocks = [
                Block(dec_cfg, block_id=i, drop_path_rate=0.0,
                      name=f"decoder_blocks_{i}")
                for i in range(cfg.decoder_depth)
            ]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-6, dtype=cdtype)
        # prediction head stays f32: its output feeds the f32 MSE loss
        self.decoder_pred = nn.Dense(
            cfg.patch_size ** 2, kernel_init=_xavier, dtype=jnp.float32
        )

    # -- patch math ------------------------------------------------------

    def patchify(self, imgs: Array) -> Array:
        """(B, 1, H, W) -> (B, L, p*p) (models_mae.py:179-211)."""
        p = self.cfg.patch_size
        b, c, hh, ww = imgs.shape
        h, w = hh // p, ww // p
        x = imgs.reshape(b, 1, h, p, w, p)
        x = jnp.einsum("nchpwq->nhwpqc", x)
        return x.reshape(b, h * w, p * p)

    def unpatchify(self, x: Array) -> Array:
        p = self.cfg.patch_size
        t, f = self.cfg.grid
        b = x.shape[0]
        x = x.reshape(b, t, f, p, p, 1)
        x = jnp.einsum("nhwpqc->nchpwq", x)
        return x.reshape(b, 1, t * p, f * p)

    # -- masking ---------------------------------------------------------

    def random_masking(self, x: Array, mask_ratio: float, rng) -> Tuple:
        b, l, d = x.shape
        len_keep = int(l * (1 - mask_ratio))
        noise = jax.random.uniform(rng, (b, l))
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :len_keep]
        x_masked = pruning.take_rows(x, ids_keep)
        mask = jnp.ones((b, l))
        mask = mask.at[:, :len_keep].set(0)
        mask = jnp.take_along_axis(mask, ids_restore, axis=1)
        return x_masked, mask, ids_restore

    def random_masking_2d(self, x: Array, mask_t_prob, mask_f_prob, rng):
        """models_mae.py:252-303 — union of masked time rows and freq
        columns; kept ids via the 999-offset argsort composition."""
        b, l, d = x.shape
        t, f = self.cfg.grid
        len_keep_t = int(t * (1 - mask_t_prob))
        len_keep_f = int(f * (1 - mask_f_prob))
        rng_t, rng_f = jax.random.split(rng)

        noise_t = jax.random.uniform(rng_t, (b, t))
        ids_shuffle_t = jnp.argsort(noise_t, axis=1)
        ids_restore_t = jnp.argsort(ids_shuffle_t, axis=1)
        noise_f = jax.random.uniform(rng_f, (b, f))
        ids_shuffle_f = jnp.argsort(noise_f, axis=1)
        ids_restore_f = jnp.argsort(ids_shuffle_f, axis=1)

        mask_f = jnp.ones((b, f)).at[:, :len_keep_f].set(0)
        mask_f = jnp.take_along_axis(mask_f, ids_restore_f, axis=1)
        mask_f = jnp.tile(mask_f[:, None, :], (1, t, 1))  # (B, T, F)
        mask_t = jnp.ones((b, t)).at[:, :len_keep_t].set(0)
        mask_t = jnp.take_along_axis(mask_t, ids_restore_t, axis=1)
        mask_t = jnp.tile(mask_t[:, :, None], (1, 1, f))  # (B, T, F)
        mask = 1 - (1 - mask_t) * (1 - mask_f)

        # The reference's literal offset is 999 (models_mae.py:289),
        # valid because its grid is fixed at 64*8 = 512 < 999 positions;
        # a generalized grid can exceed that, where 999 would let masked
        # tokens sort ahead of unmasked ones.  max(999, t*f) is
        # bit-identical for every reference geometry and correct beyond.
        offset = float(max(999, t * f))
        id2res = jnp.arange(t * f, dtype=jnp.float32)[None, :].repeat(b, 0)
        id2res = id2res + offset * mask.reshape(b, -1)
        id2res2 = jnp.argsort(id2res, axis=1)
        ids_keep = id2res2[:, : len_keep_t * len_keep_f]
        x_masked = pruning.take_rows(x, ids_keep)
        ids_restore = jnp.argsort(id2res2, axis=1)
        return x_masked, mask.reshape(b, -1), ids_restore

    # -- forward ---------------------------------------------------------

    def _pos(self, table: Array) -> Array:
        """Pos-embed table with gradient stopped unless ``pos_trainable``
        (models_mae.py:55,69 requires_grad=pos_trainable, default False)."""
        return table if self.cfg.pos_trainable else jax.lax.stop_gradient(table)

    def forward_encoder(self, x, mask_ratio, rng, mask_2d=False):
        cfg = self.cfg
        x = self.patch_embed(x)
        pos = self._pos(self.pos_embed).astype(x.dtype)
        x = x + pos[:, 1:, :]
        if mask_2d:
            x, mask, ids_restore = self.random_masking_2d(
                x, cfg.mask_t_prob, cfg.mask_f_prob, rng
            )
        else:
            x, mask, ids_restore = self.random_masking(x, mask_ratio, rng)
        cls = self.cls_token.astype(x.dtype) + pos[:, :1, :]
        cls = jnp.broadcast_to(cls, (x.shape[0], 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
        for blk in self.blocks:
            x, _ = blk(x, keep_rate=1.0)
        x = self.norm(x)
        return x, mask, ids_restore

    def forward_decoder(self, x, ids_restore, deterministic: bool = True):
        cfg = self.cfg
        x = self.decoder_embed(x)
        b = x.shape[0]
        n_mask = ids_restore.shape[1] + 1 - x.shape[1]
        mask_tokens = jnp.broadcast_to(
            self.mask_token.astype(x.dtype), (b, n_mask, cfg.decoder_embed_dim)
        )
        x_ = jnp.concatenate([x[:, 1:, :], mask_tokens], axis=1)
        x_ = pruning.take_rows(x_, ids_restore)
        x = jnp.concatenate([x[:, :1, :], x_], axis=1)
        x = x + self._pos(self.decoder_pos_embed).astype(x.dtype)

        if cfg.decoder_mode == 1:
            x = x[:, 1:, :]  # swin decoder drops cls (models_mae.py:370-373)
            for blk in self.decoder_blocks:
                x = blk(x, deterministic=deterministic)
            x = self.decoder_norm(x)
            return self.decoder_pred(x)
        for blk in self.decoder_blocks:
            x, _ = blk(x, keep_rate=1.0)
        x = self.decoder_norm(x)
        return self.decoder_pred(x)[:, 1:, :]

    def loss(self, imgs, pred, mask):
        """Masked-patch MSE (models_mae.py:405-421)."""
        target = self.patchify(imgs)
        if self.cfg.norm_pix_loss:
            mean = target.mean(axis=-1, keepdims=True)
            # torch Tensor.var default is the unbiased estimator (ddof=1)
            var = target.var(axis=-1, keepdims=True, ddof=1)
            target = (target - mean) / jnp.sqrt(var + 1e-6)
        per_patch = jnp.mean((pred - target) ** 2, axis=-1)
        return jnp.sum(per_patch * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def __call__(
        self, imgs, mask_ratio: float = 0.8, *, mask_2d=None, rng=None,
        deterministic: bool = True,
    ):
        if rng is None:
            rng = self.make_rng("masking")
        mask_2d = self.cfg.mask_2d if mask_2d is None else mask_2d
        latent, mask, ids_restore = self.forward_encoder(
            imgs, mask_ratio, rng, mask_2d=mask_2d
        )
        pred = self.forward_decoder(latent, ids_restore, deterministic)
        loss = self.loss(imgs, pred, mask)
        return loss, pred, mask


def mae_vit_base_dec512d8b(**kw) -> MAEConfig:
    """models_mae.py:438-442 factory geometry.  NOTE the reference factory
    name says d8b but does NOT pass decoder_depth, so the class default 16
    (models_mae.py:30) applies — replicated here (checkpoint-shape
    fidelity beats the vestigial name)."""
    kw.setdefault("decoder_depth", 16)
    return MAEConfig(embed_dim=768, depth=12, num_heads=12,
                     decoder_embed_dim=512, decoder_num_heads=16, **kw)
