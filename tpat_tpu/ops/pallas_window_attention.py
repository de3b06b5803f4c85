"""Fused swin_v2_cr window attention (Pallas) for the MAE decoder.

Motivation (profiled on the target chip, MAE pretrain b32 512x128 bf16,
scripts/bench_mae_step.py): the XLA lowering of the 16-block shifted-window
decoder costs ~45 ms/step of window machinery — roll/partition/reverse
copies, per-head split/merge permutes, and tiny (16, 16, 32) attention
einsums that strand the 128-wide MXU/VPU — against ~2 ms of attention math.
A first kernel that kept the window granularity (one (16, 32) dot per
window per head) removed the copies but ran even slower: 64 unrolled
16-token ops per grid instance cannot feed 128-wide hardware.

The shipped design instead evaluates window attention as **dense masked
attention over the whole token grid**: every window-partition detail —
the (4, 4) tiling, the alternating shift roll, the cross-region -100
mask, and the log-CPB relative-position bias — collapses into one static
per-head additive template

    template[h, i, j] = bias[h, p_i, p_j] + region_mask[w_i, p_i, p_j]
                        if w_i == w_j else -1e30

built at trace time from the (rolled) window membership of each token
(``build_window_template``).  Tokens stay in ORIGINAL grid order end to
end (no rolls or partitions anywhere), the per-head Q.K^T becomes one
MXU-shaped (N, N, D) contraction, off-window probabilities underflow to
exact zeros through exp(-1e30), and the probability matrices never leave
VMEM.  The -1e30 vs timm's -100 distinction matters: -100 is the
*cross-region* softener timm applies inside shifted windows (replicated
via ``region_mask``), while cross-window pairs must be excluded outright.

The kernel consumes the packed qkv Dense output (B, N, 3C) directly — no
head split/merge permutes — and the custom VJP emits d(qkv) plus
d(scales) and d(template) (accumulated across the sequential grid);
XLA backpropagates d(template) through the gather onto the meta-MLP bias.

Reference math: timm ``swin_transformer_v2_cr.WindowMultiHeadAttention`` /
``SwinTransformerV2CrBlock`` — the classes the reference's decoder kwargs
name at ``models_mae.py:93-106``; the XLA restatement in
``models/mae.py::WindowAttentionV2`` remains the parity/fallback path
(``MAEConfig.window_attention_impl='xla'``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpat_tpu.ops import partitioning as _pt

LANES = 128
_EPS = 1e-12  # F.normalize clamp floor
_NEG = -1e30  # cross-window exclusion (exp underflows to exact 0 in f32)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fixed_bytes(n: int, hpb: int, n_tmpl_blocks: int) -> int:
    """VMEM held regardless of batch group: the (hpb, n, n) f32 template
    slab(s) — resident across the inner batch sweep, not double-buffered —
    plus ~6 (n, n) f32 softmax/backward temporaries."""
    return n_tmpl_blocks * hpb * n * n * 4 + 6 * n * n * 4


def _batch_group(
    b: int, n: int, hpb: int, itemsize: int, n_io: int, n_tmpl: int,
    cap: int = 8,
) -> int:
    """Largest divisor of b whose double-buffered (g, n, 128) io blocks fit
    beside the fixed-resident slabs, within a ~13 MB budget."""
    budget = 13 * 1024 * 1024 - _fixed_bytes(n, hpb, n_tmpl)
    for g in range(min(cap, b), 0, -1):
        if b % g != 0:
            continue
        if n_io * g * n * LANES * itemsize * 2 <= budget:
            return g
    return 0  # infeasible even at g=1 — callers must gate on supports()


def supports(
    num_heads: int, head_dim: int, tokens: int, itemsize: int = 2
) -> bool:
    """Packed-layout + VMEM feasibility for the dense-masked formulation.

    ``itemsize`` is the qkv dtype's byte width (2 for the bf16 compute
    path, 4 for f32 — the caller must pass the itemsize of the actual
    compute dtype; f32 fails first on
    intermediate grids where bf16 still fits).  The backward is the
    binding case: 7 io blocks at the minimum batch group (g=1, always a
    divisor) plus TWO template-sized slabs (input template + the
    d(template) accumulator).  The reference decoder at ESC-50 geometry
    (16 heads x 32, N=256) fits; the AudioSet grid (N=512) does not with
    4 heads per lane block — that geometry takes the XLA path."""
    if LANES % head_dim != 0 or (num_heads * head_dim) % LANES != 0:
        return False
    hpb = LANES // head_dim
    budget = 13 * 1024 * 1024 - _fixed_bytes(tokens, hpb, n_tmpl_blocks=2)
    return budget >= 7 * tokens * LANES * itemsize * 2


def _window_coords(
    feat_size: Tuple[int, int],
    window: Tuple[int, int],
    shift: Tuple[int, int],
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-token ``(window id, within-window position)`` of the rolled
    grid, flattened to (N,) in original token order.  Rolled coordinates:
    ``roll(x, (-st, -sf))`` puts token (t, f) at (t−st mod T, f−sf mod F).
    Single source for the roll/window-id convention shared by the dense
    template and the banded window-major permutation."""
    t, f = feat_size
    wh, ww = window
    st, sf = shift
    tt, ff = np.meshgrid(np.arange(t), np.arange(f), indexing="ij")
    a = (tt - st) % t
    b = (ff - sf) % f
    win = (a // wh) * (f // ww) + b // ww
    pos = (a % wh) * ww + b % ww
    return win.reshape(t * f), pos.reshape(t * f)


def build_window_template(
    bias: jnp.ndarray,
    feat_size: Tuple[int, int],
    window: Tuple[int, int],
    shift: Tuple[int, int],
    region_mask: Optional[np.ndarray],
) -> jnp.ndarray:
    """(H, N, N) additive attention template in ORIGINAL token order.

    bias: (H, L, L) traced meta-MLP relative-position bias (L = window
    tokens); everything else is static.  Gradient flows through the
    bias gather (scatter-add on the backward pass).
    """
    n = feat_size[0] * feat_size[1]
    win, pos = _window_coords(feat_size, window, shift)
    allowed = win[:, None] == win[None, :]
    if region_mask is not None:
        rm = region_mask[win[:, None], pos[:, None], pos[None, :]]
    else:
        rm = np.zeros((n, n), np.float32)
    rm = np.where(allowed, rm, _NEG).astype(np.float32)
    gathered = bias[:, pos[:, None], pos[None, :]]  # (H, N, N)
    return gathered + jnp.asarray(rm)[None]


def supports_banded(
    num_heads: int,
    head_dim: int,
    tokens: int,
    window_tokens: int,
    itemsize: int = 2,
) -> bool:
    """Feasibility of the window-order block-diagonal formulation.

    Requirements: the packed-lane layout (as ``supports``), tokens a
    multiple of the 128-row chunk, and whole windows per chunk.  VMEM is
    never binding — the per-chunk template block is (hpb, 128, 128) f32
    regardless of N, which is exactly why this formulation covers the
    AudioSet grid (N=512) that the dense template cannot."""
    if LANES % head_dim != 0 or (num_heads * head_dim) % LANES != 0:
        return False
    return tokens % BLK == 0 and BLK % window_tokens == 0


BLK = 128  # row/col chunk: 8 sublane tiles, one lane width


def window_order(
    feat_size: Tuple[int, int],
    window: Tuple[int, int],
    shift: Tuple[int, int],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Static window-major token permutation of the (rolled) grid.

    Returns ``(perm, inv_perm, wo_win, wo_pos)``: ``perm[i]`` is the
    original-order index of the token at window-major position ``i``
    (windows in scan order, tokens within a window in within-window
    position order); ``inv_perm`` undoes it; ``wo_win``/``wo_pos`` are
    the window id / within-window position at each window-major slot."""
    n = feat_size[0] * feat_size[1]
    win, pos = _window_coords(feat_size, window, shift)
    perm = np.lexsort((pos, win))
    inv_perm = np.empty(n, np.int64)
    inv_perm[perm] = np.arange(n)
    return perm, inv_perm, win[perm], pos[perm]


def build_band_template(
    bias: jnp.ndarray,
    feat_size: Tuple[int, int],
    window: Tuple[int, int],
    shift: Tuple[int, int],
    region_mask: Optional[np.ndarray],
) -> Tuple[jnp.ndarray, np.ndarray, np.ndarray]:
    """(H, N, BLK) additive template in WINDOW-MAJOR token order.

    Row ``i`` covers only its own 128-token chunk's columns — in
    window-major order window attention is block-diagonal, so those are
    the only columns whose logits survive.  Returns the band plus the
    (perm, inv_perm) pair the caller uses to reorder tokens.  Gradient
    flows through the bias gather exactly as in the dense template."""
    n = feat_size[0] * feat_size[1]
    perm, inv_perm, wo_win, wo_pos = window_order(feat_size, window, shift)
    cols = (np.arange(n)[:, None] // BLK) * BLK + np.arange(BLK)[None, :]
    allowed = wo_win[:, None] == wo_win[cols]
    if region_mask is not None:
        rm = region_mask[wo_win[:, None], wo_pos[:, None], wo_pos[cols]]
    else:
        rm = np.zeros((n, BLK), np.float32)
    rm = np.where(allowed, rm, _NEG).astype(np.float32)
    band = bias[:, wo_pos[:, None], wo_pos[cols]] + jnp.asarray(rm)[None]
    return band, perm, inv_perm


def _banded_bwd_kernel(
    q_ref, k_ref, v_ref, scale_ref, tmpl_ref, do_ref,
    dq_ref, dk_ref, dv_ref, dscale_ref, dtmpl_ref,
    *, head_dim, heads_per_block, group,
):
    """Block-diagonal backward: a token chunk's dq/dk/dv never cross the
    chunk, so only d(scale) (accumulated over chunks AND batch groups)
    and d(template) (over batch groups) need resident accumulators."""
    j = pl.program_id(0)
    c = pl.program_id(1)
    i = pl.program_id(2)
    for hh in range(heads_per_block):
        sl = slice(hh * head_dim, (hh + 1) * head_dim)
        ds_acc = jnp.zeros((), jnp.float32)
        db_acc = jnp.zeros((BLK, BLK), jnp.float32)
        for b in range(group):
            q = q_ref[b, :, sl].astype(jnp.float32)
            k = k_ref[b, :, sl].astype(jnp.float32)
            v = v_ref[b, :, sl]
            do = do_ref[b, :, sl]

            qs = jax.lax.rsqrt(
                jnp.maximum(jnp.sum(q * q, -1, keepdims=True), _EPS * _EPS)
            )
            ks = jax.lax.rsqrt(
                jnp.maximum(jnp.sum(k * k, -1, keepdims=True), _EPS * _EPS)
            )
            qn = q * qs
            kn = k * ks
            cos = jax.lax.dot_general(
                qn, kn,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = scale_ref[j * heads_per_block + hh]
            logits = cos * s + tmpl_ref[hh]
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)

            dp = jax.lax.dot_general(
                do, v,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dlog = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            ds_acc = ds_acc + jnp.sum(dlog * cos)
            db_acc = db_acc + dlog
            dcos = dlog * s
            dqn = jnp.dot(dcos, kn, preferred_element_type=jnp.float32)
            dkn = jax.lax.dot_general(
                dcos, qn,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dq = (dqn - qn * jnp.sum(dqn * qn, -1, keepdims=True)) * qs
            dk = (dkn - kn * jnp.sum(dkn * kn, -1, keepdims=True)) * ks
            dq_ref[b, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[b, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[b, :, sl] = jax.lax.dot_general(
                p.astype(do.dtype), do,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dv_ref.dtype)

        ds_row = jnp.full((1, BLK), ds_acc, jnp.float32)

        @pl.when((i == 0) & (c == 0))
        def _():
            dscale_ref[hh] = ds_row

        @pl.when((i != 0) | (c != 0))
        def _():
            dscale_ref[hh] = dscale_ref[hh] + ds_row

        @pl.when(i == 0)
        def _():
            dtmpl_ref[hh] = db_acc

        @pl.when(i != 0)
        def _():
            dtmpl_ref[hh] = dtmpl_ref[hh] + db_acc


def _banded_io_specs(g, hb, hpb):
    def sec(section):
        return pl.BlockSpec(
            (g, BLK, LANES),
            lambda j, c, i, s=section: (i, c, s * hb + j),
            memory_space=pltpu.VMEM,
        )

    return [
        sec(0), sec(1), sec(2),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (hpb, BLK, BLK), lambda j, c, i: (j, c, 0),
            memory_space=pltpu.VMEM,
        ),
    ]


def _banded_group(b: int, cap: int = 8) -> int:
    """Per-chunk io blocks are (g, 128, 128) — VMEM is never binding at
    the cap, so just take the largest divisor of b up to ``cap``."""
    for g in range(min(cap, b), 0, -1):
        if b % g == 0:
            return g
    return 1


def _banded_impl(qkv, scales, band):
    b, n, c3 = qkv.shape
    c = c3 // 3
    h = scales.shape[0]
    d = c // h
    assert n % BLK == 0, (n, BLK)
    hpb = LANES // d
    hb = c // LANES
    g = _banded_group(b)
    io_out = pl.BlockSpec(
        (g, BLK, LANES), lambda j, c_, i: (i, c_, j), memory_space=pltpu.VMEM
    )
    # the dense forward body is shape-agnostic (all shapes come from the
    # BlockSpecs and it only reads grid dim 0) — the banded grid simply
    # adds the chunk dimension via the index maps
    kernel = functools.partial(
        _fwd_kernel, head_dim=d, heads_per_block=hpb, group=g
    )
    return pl.pallas_call(
        kernel,
        grid=(hb, n // BLK, b // g),
        in_specs=_banded_io_specs(g, hb, hpb),
        out_specs=io_out,
        out_shape=jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * n * BLK * d,
            bytes_accessed=qkv.size * qkv.dtype.itemsize,
            transcendentals=b * h * n * BLK,
        ),
        interpret=_interpret(),
    )(qkv, qkv, qkv, scales, band)


def _banded_bwd_impl(qkv, scales, band, d_out):
    b, n, c3 = qkv.shape
    c = c3 // 3
    h = scales.shape[0]
    d = c // h
    hpb = LANES // d
    hb = c // LANES
    g = _banded_group(b)
    io_spec = pl.BlockSpec(
        (g, BLK, LANES), lambda j, c_, i: (i, c_, j), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _banded_bwd_kernel, head_dim=d, heads_per_block=hpb, group=g
    )
    dq, dk, dv, dscale_rows, d_band = pl.pallas_call(
        kernel,
        # batch innermost, chunk next: the d(template) block (j, c) is
        # resident across the batch sweep, the d(scale) block (j) across
        # both the chunk and batch sweeps
        grid=(hb, n // BLK, b // g),
        in_specs=_banded_io_specs(g, hb, hpb) + [io_spec],
        out_specs=[
            io_spec, io_spec, io_spec,
            pl.BlockSpec(
                (hpb, 1, BLK), lambda j, c_, i: (j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (hpb, BLK, BLK), lambda j, c_, i: (j, c_, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((h, 1, BLK), jnp.float32),
            jax.ShapeDtypeStruct((h, n, BLK), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * h * n * BLK * d,
            bytes_accessed=2 * qkv.size * qkv.dtype.itemsize,
            transcendentals=b * h * n * BLK,
        ),
        interpret=_interpret(),
    )(qkv, qkv, qkv, scales, band, d_out)
    d_qkv = jnp.concatenate([dq, dk, dv], axis=-1)
    return d_qkv, dscale_rows[:, 0, 0], d_band


_banded_impl_cp = _pt.batch_partitioned(
    _banded_impl, (True, False, False), 1,
    sharding_rule="b n c, h, x y z -> b n c",
)
_banded_bwd_impl_cp = _pt.batch_partitioned(
    _banded_bwd_impl, (True, False, False, True), 3, reduced_outs=(1, 2),
    sharding_rule="b n c, h, x y z, b n d -> b n c, h, x y z",
)


@jax.custom_vjp
def fused_window_attention_banded(
    qkv: jnp.ndarray,
    scales: jnp.ndarray,
    band: jnp.ndarray,
) -> jnp.ndarray:
    """Fused cosine window attention, block-diagonal formulation.

    qkv:  (B, N, 3C) packed qkv in WINDOW-MAJOR token order (the caller
          permutes with ``window_order``'s perm before the qkv Dense)
    band: (H, N, BLK) f32 — ``build_band_template`` output
    Returns (B, N, C) in window-major order (caller applies inv_perm).

    Does ``N/BLK``-fold less logit work than ``fused_window_attention``
    and holds only (hpb, BLK, BLK) template per grid step, so it scales
    to the AudioSet grid (N=512) the dense template cannot fit."""
    return _banded_impl_cp(qkv, scales, band)


def _banded_vjp_fwd(qkv, scales, band):
    return _banded_impl_cp(qkv, scales, band), (qkv, scales, band)


def _banded_vjp_bwd(residuals, d_out):
    qkv, scales, band = residuals
    return _banded_bwd_impl_cp(qkv, scales, band, d_out)


fused_window_attention_banded.defvjp(_banded_vjp_fwd, _banded_vjp_bwd)


def _fwd_kernel(
    q_ref, k_ref, v_ref, scale_ref, tmpl_ref, o_ref,
    *, head_dim, heads_per_block, group,
):
    # shared by the dense impl (grid (hb, b/g)) and the banded impl
    # (grid (hb, chunks, b/g)): block shapes come entirely from the
    # BlockSpecs and only grid dim 0 (the lane-block j) is read here
    j = pl.program_id(0)  # lane-block index (heads j*hpb .. (j+1)*hpb)
    for b in range(group):
        for hh in range(heads_per_block):
            sl = slice(hh * head_dim, (hh + 1) * head_dim)
            q = q_ref[b, :, sl].astype(jnp.float32)
            k = k_ref[b, :, sl].astype(jnp.float32)
            v = v_ref[b, :, sl]
            qn = q * jax.lax.rsqrt(
                jnp.maximum(jnp.sum(q * q, -1, keepdims=True), _EPS * _EPS)
            )
            kn = k * jax.lax.rsqrt(
                jnp.maximum(jnp.sum(k * k, -1, keepdims=True), _EPS * _EPS)
            )
            cos = jax.lax.dot_general(
                qn, kn,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            logits = cos * scale_ref[j * heads_per_block + hh] + tmpl_ref[hh]
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o_ref[b, :, sl] = jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)


def _bwd_kernel(
    q_ref, k_ref, v_ref, scale_ref, tmpl_ref, do_ref,
    dq_ref, dk_ref, dv_ref, dscale_ref, dtmpl_ref,
    *, head_dim, heads_per_block, group,
):
    """Recompute probabilities in VMEM; d(scale)/d(template) accumulate
    across the sequential batch grid dim (innermost), so their blocks
    stay VMEM-resident for the whole sweep."""
    i = pl.program_id(1)  # batch-group index (accumulation dim)
    j = pl.program_id(0)
    n = q_ref.shape[1]
    for hh in range(heads_per_block):
        sl = slice(hh * head_dim, (hh + 1) * head_dim)
        ds_acc = jnp.zeros((), jnp.float32)
        db_acc = jnp.zeros((n, n), jnp.float32)
        for b in range(group):
            q = q_ref[b, :, sl].astype(jnp.float32)
            k = k_ref[b, :, sl].astype(jnp.float32)
            v = v_ref[b, :, sl]
            do = do_ref[b, :, sl]

            qs = jax.lax.rsqrt(
                jnp.maximum(jnp.sum(q * q, -1, keepdims=True), _EPS * _EPS)
            )
            ks = jax.lax.rsqrt(
                jnp.maximum(jnp.sum(k * k, -1, keepdims=True), _EPS * _EPS)
            )
            qn = q * qs
            kn = k * ks
            cos = jax.lax.dot_general(
                qn, kn,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = scale_ref[j * heads_per_block + hh]
            logits = cos * s + tmpl_ref[hh]
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)

            dp = jax.lax.dot_general(
                do, v,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dlog = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            ds_acc = ds_acc + jnp.sum(dlog * cos)
            db_acc = db_acc + dlog
            dcos = dlog * s
            dqn = jnp.dot(dcos, kn, preferred_element_type=jnp.float32)
            dkn = jax.lax.dot_general(
                dcos, qn,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # F.normalize VJP (|x| > eps branch): (g - x̂ <x̂, g>) / |x|
            dq = (dqn - qn * jnp.sum(dqn * qn, -1, keepdims=True)) * qs
            dk = (dkn - kn * jnp.sum(dkn * kn, -1, keepdims=True)) * ks
            dq_ref[b, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[b, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[b, :, sl] = jax.lax.dot_general(
                p.astype(do.dtype), do,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dv_ref.dtype)

        # accumulate over the batch sweep; scalar partials ride an n-lane
        # row (sub-lane blocks are not legal tiles)
        ds_row = jnp.full((1, n), ds_acc, jnp.float32)

        @pl.when(i == 0)
        def _():
            dscale_ref[hh] = ds_row
            dtmpl_ref[hh] = db_acc

        @pl.when(i != 0)
        def _():
            dscale_ref[hh] = dscale_ref[hh] + ds_row
            dtmpl_ref[hh] = dtmpl_ref[hh] + db_acc


def _io_specs(g, n, hb, hpb):
    def sec(section):
        return pl.BlockSpec(
            (g, n, LANES),
            lambda j, i, s=section: (i, 0, s * hb + j),
            memory_space=pltpu.VMEM,
        )

    return [
        sec(0), sec(1), sec(2),
        # all per-head scales as SMEM scalars (indexed by program_id(0))
        pl.BlockSpec(memory_space=pltpu.SMEM),
        # per-head template slab for this lane block
        pl.BlockSpec(
            (hpb, n, n), lambda j, i: (j, 0, 0), memory_space=pltpu.VMEM
        ),
    ]


def _fused_impl(qkv, scales, template):
    b, n, c3 = qkv.shape
    c = c3 // 3
    h = scales.shape[0]
    d = c // h
    assert supports(h, d, n, qkv.dtype.itemsize), (h, d, n, qkv.dtype)
    hpb = LANES // d
    hb = c // LANES
    g = _batch_group(b, n, hpb, qkv.dtype.itemsize, n_io=4, n_tmpl=1)
    assert g >= 1, "geometry passed supports() but fwd io does not fit"

    kernel = functools.partial(
        _fwd_kernel, head_dim=d, heads_per_block=hpb, group=g
    )
    out = pl.pallas_call(
        kernel,
        grid=(hb, b // g),
        in_specs=_io_specs(g, n, hb, hpb),
        out_specs=pl.BlockSpec(
            (g, n, LANES), lambda j, i: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * n * n * d,
            bytes_accessed=qkv.size * qkv.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
        interpret=_interpret(),
    )(qkv, qkv, qkv, scales, template)
    return out


def _fused_bwd_impl(qkv, scales, template, d_out):
    b, n, c3 = qkv.shape
    c = c3 // 3
    h = scales.shape[0]
    d = c // h
    hpb = LANES // d
    hb = c // LANES
    g = _batch_group(b, n, hpb, qkv.dtype.itemsize, n_io=7, n_tmpl=2)
    assert g >= 1, "geometry passed supports() but bwd io does not fit"

    kernel = functools.partial(
        _bwd_kernel, head_dim=d, heads_per_block=hpb, group=g
    )
    io_spec = pl.BlockSpec(
        (g, n, LANES), lambda j, i: (i, 0, j), memory_space=pltpu.VMEM
    )
    dq, dk, dv, dscale_rows, d_template = pl.pallas_call(
        kernel,
        # batch innermost: the d(scale)/d(template) accumulator blocks
        # (indexed by j only) stay resident across the whole batch sweep
        grid=(hb, b // g),
        in_specs=_io_specs(g, n, hb, hpb) + [io_spec],
        out_specs=[
            io_spec, io_spec, io_spec,
            pl.BlockSpec(
                (hpb, 1, n), lambda j, i: (j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (hpb, n, n), lambda j, i: (j, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((h, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((h, n, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * h * n * n * d,
            bytes_accessed=2 * qkv.size * qkv.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
        interpret=_interpret(),
    )(qkv, qkv, qkv, scales, template, d_out)
    d_qkv = jnp.concatenate([dq, dk, dv], axis=-1)
    return d_qkv, dscale_rows[:, 0, 0], d_template


# GSPMD mesh support (ops/partitioning.py): batch-sharded per-shard
# lowering; the backward's d(scale)/d(template) are batch SUMS and get
# psum'd across the shards.
_fused_impl_cp = _pt.batch_partitioned(
    _fused_impl, (True, False, False), 1,
    sharding_rule="b n c, h, x y z -> b n c",
)
_fused_bwd_impl_cp = _pt.batch_partitioned(
    _fused_bwd_impl, (True, False, False, True), 3, reduced_outs=(1, 2),
    sharding_rule="b n c, h, x y z, b n d -> b n c, h, x y z",
)


@jax.custom_vjp
def fused_window_attention(
    qkv: jnp.ndarray,
    scales: jnp.ndarray,
    template: jnp.ndarray,
) -> jnp.ndarray:
    """Fused cosine window attention, dense-masked formulation.

    qkv:      (B, N, 3C) — packed qkv Dense output over the FULL token
              grid in original order, sections [q | k | v], heads
              contiguous (C = H * D)
    scales:   (H,) f32 — exp(clamped logit_scale), computed in XLA
    template: (H, N, N) f32 — ``build_window_template`` output: bias +
              region mask on within-window pairs, -1e30 elsewhere
    Returns (B, N, C) in original token order.
    """
    return _fused_impl_cp(qkv, scales, template)


def _vjp_fwd(qkv, scales, template):
    return _fused_impl_cp(qkv, scales, template), (qkv, scales, template)


def _vjp_bwd(residuals, d_out):
    qkv, scales, template = residuals
    return _fused_bwd_impl_cp(qkv, scales, template, d_out)


fused_window_attention.defvjp(_vjp_fwd, _vjp_bwd)
