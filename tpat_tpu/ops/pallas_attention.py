"""Fused TPU attention kernels (Pallas) with pruning-score emission.

Motivation (measured on the target chip, ViT-B N=257 B=128 bf16):

- the chip sustains ~151 TFLOP/s on dense-queued matmuls, but the XLA
  attention path runs the model at ~66 TFLOP/s;
- the gap is data movement: the (B, N, 3C) -> (3, B, H, N, D) qkv permute
  and the output head-merge transpose materialize ~9 GB/batch, and softmax
  materializes the (B, H, N, N) probability tensor in HBM.

``fused_qkv_attention`` therefore consumes the **packed qkv projection
output directly** — layout (B, N, 3C) with C = H*D and rows [q | k | v],
exactly what a single Dense(3C) emits (and what the reference's torch
``qkv.weight`` layout maps to) — and writes output in (B, N, C), the
layout the output projection wants.  No transposes exist anywhere in the
attention block, and probabilities never leave VMEM.

Head pairs ride the 128-lane constraint: with D = 64, two heads occupy one
128-lane block, so lane-blocked BlockSpecs slice q/k/v per head-pair
straight out of the packed tensor (the same array is passed three times
with different index maps — no copies).

Importance scores (the pruning signal, emitted in the same pass):
- 'patch_mean' (AudioMAE, models_vit.py:113): per-head column sums of the
  probability matrix over patch-query rows; wrapper divides by H * P.
- 'cls' (AST, ast_models.py:124): the CLS query row per head.

Training: ``jax.custom_vjp`` — forward runs the kernel, backward
recomputes probabilities in XLA (flash-attention recompute trade).  The
score output feeds top_k (integer indices) so its cotangent is normally
zero, but the backward handles it exactly anyway.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# CLS-split: when n is just past a lane boundary (n % 128 in {1, 2} —
# the "+1 CLS" 257/129-token widths of the pruning shape walk, or "+2"
# for AST's cls+dist), the (n, n) probability tile pads its lane
# dimension up a whole extra 128-tile (257 -> 384 lanes: 1.5x wasted
# q@k'/exp/p@v work).  The split form computes the first nb = n - r keys
# as an aligned 128-multiple block and folds each of the r tail keys in
# as an exact rank-1 softmax correction (no approximation: the running
# max/denominator include the tail logits).
#
# MEASURED SLOWER on the target chip -> OPT-IN (TPAT_CLS_SPLIT=1):
# every (n, 1) column intermediate (tail logit, exp, normalized column,
# outer-product factor) occupies a full 128-lane vector register, so the
# ~10 rank-1 ops cost about as much as the block's entire elementwise
# budget — +0.41 ms at w257 and +0.38 ms at w129 per forward invocation
# (width-independent, i.e. fixed overhead), vs a 0.23 ms tile saving.
# Numbers and the register-padding analysis: docs/BENCH_NOTES.md
# "CLS-split rank-1 correction"; probe: scripts/probe_cls_split.py.
# The math is exact and stays covered by tests (test_pallas_attention
# "cls_split" block) so the variant remains available to future chips
# with cheaper sub-lane vectors.
import os as _os

_SPLIT_ENABLED = _os.environ.get("TPAT_CLS_SPLIT", "0") == "1"
_SPLIT_R_MAX = 2


def _split_r(n: int) -> int:
    """Tail-key count handled as rank-1 corrections (0 = no split)."""
    r = n % LANES
    if _SPLIT_ENABLED and 0 < r <= _SPLIT_R_MAX and n > LANES:
        return r
    return 0


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (unit tests on CPU)."""
    return jax.default_backend() != "tpu"


def _batch_group(
    b: int, n: int, itemsize: int, n_io_blocks: int, cap: int = 8
) -> int:
    """Largest divisor of b whose VMEM footprint fits: io blocks are
    double-buffered (g, n, 128) tiles, plus ~2 f32 (n, n) scratch tiles
    for the probability matrices.  Budget 12 MB of the ~16 MB/core."""
    budget = 12 * 1024 * 1024 - 2 * n * n * 4
    for g in range(min(cap, b), 0, -1):
        if b % g != 0:
            continue
        io_bytes = n_io_blocks * g * n * LANES * itemsize * 2
        if io_bytes <= budget:
            return g
    return 1


def supports(
    num_heads: int, head_dim: int, n: Optional[int] = None,
    itemsize: int = 2,
) -> bool:
    """Layout feasibility — and, when ``n`` is given, VMEM feasibility.

    The kernels hold ~2 (n, n) f32 probability tiles plus double-buffered
    (g, n, 128) io blocks; past n ≈ 1200 even g=1 exceeds the ~12 MB
    budget, and without this check the caller would launch a pallas_call
    that dies in the Mosaic compiler instead of falling back to XLA.
    Checked against the worst case (the backward's 7 io blocks)."""
    if LANES % head_dim != 0 or (num_heads * head_dim) % LANES != 0:
        return False
    if n is not None:
        budget = 12 * 1024 * 1024 - 2 * n * n * 4
        if budget <= 0 or 7 * n * LANES * itemsize * 2 > budget:
            return False
    return True


def _qkv_kernel(
    *refs,
    scale, mode, extra, head_dim, heads_per_block, group, prefix, split,
):
    """Forward kernel.  When ``prefix`` is True the first ref is an SMEM
    scalar holding kv_valid — the number of valid tokens (extras + kept
    patches); keys at column >= kv_valid are masked out of the softmax and
    the 'patch_mean' reduction sums only valid patch-query rows.  The
    prefix form is what the hybrid anneal produces: after a bucket gather
    the kept set is a contiguous prefix, identical for every sample.

    ``split`` (int, 0 = off): CLS-split — the first n - split keys run
    through the lane-aligned block matmuls, the last ``split`` keys fold
    in as exact rank-1 corrections (see module note at ``_split_r``)."""
    if prefix:
        kv_ref, q_ref, k_ref, v_ref, o_ref, colsum_ref = refs
        kv_valid = kv_ref[0]
    else:
        q_ref, k_ref, v_ref, o_ref, colsum_ref = refs
        kv_valid = None
    n = q_ref.shape[1]
    nb = n - split
    if prefix:
        col = jax.lax.broadcasted_iota(jnp.int32, (n, nb), 1)
        kmask = col < kv_valid  # valid-key predicate over the block
        rvalid = (
            jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) < kv_valid
        ).astype(jnp.float32)
    for b in range(group):
        for hh in range(heads_per_block):
            sl = slice(hh * head_dim, (hh + 1) * head_dim)
            # keep matmul operands in the input dtype (bf16 runs the MXU
            # at full rate with f32 accumulation); softmax math in f32
            q = q_ref[b, :, sl]
            k = k_ref[b, 0:nb, sl]
            v = v_ref[b, 0:nb, sl]
            logits = (
                jax.lax.dot_general(
                    q, k,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            if prefix:
                logits = jnp.where(kmask, logits, -1e30)
            m = jnp.max(logits, axis=-1, keepdims=True)
            if split:
                # one aligned (split, d) load for the tail keys/values;
                # rank-1 logit columns against each.  VPU mul+reduce, not
                # a (n, 1)-output dot_general: Mosaic's matmul lowering
                # emits an invalid mixed-dtype vector.broadcast for the
                # 1-row RHS (verified on hardware).
                kt = k_ref[b, nb:n, sl].astype(jnp.float32)
                vt = v_ref[b, nb:n, sl].astype(jnp.float32)
                qf = q.astype(jnp.float32)
                lt = []
                for j in range(split):
                    lj = (
                        jnp.sum(qf * kt[j : j + 1], axis=-1, keepdims=True)
                        * scale
                    )  # (n, 1)
                    if prefix:
                        lj = jnp.where(kv_valid > nb + j, lj, -1e30)
                    lt.append(lj)
                    m = jnp.maximum(m, lj)
            p = jnp.exp(logits - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            if split:
                pt = [jnp.exp(lj - m) for lj in lt]
                for pj in pt:
                    denom = denom + pj
            # reciprocal-multiply instead of an (n, n) broadcast divide:
            # VPU division is multi-cycle per element, the reciprocal is
            # only (n, 1)
            inv = 1.0 / denom
            if split:
                # defer normalization to the (n, d) output: one small
                # multiply instead of an (n, nb) one
                o = jnp.dot(
                    p.astype(v.dtype), v, preferred_element_type=jnp.float32
                ) * inv
                for j in range(split):
                    o = o + (pt[j] * inv) * vt[j : j + 1]
                o_ref[b, :, sl] = o.astype(o_ref.dtype)
            else:
                p = p * inv
                o_ref[b, :, sl] = jnp.dot(
                    p.astype(v.dtype), v, preferred_element_type=jnp.float32
                ).astype(o_ref.dtype)

            if mode == "patch_mean":
                if split:
                    # column sums of the normalized p over valid patch-
                    # query rows, as a matvec: w = inv * rowmask
                    row = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
                    w = inv * (row >= extra).astype(jnp.float32)
                    if prefix:
                        w = w * rvalid
                    cs = jax.lax.dot_general(
                        w, p,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (1, nb)
                    tail = [
                        jnp.sum(w * pj, axis=0, keepdims=True) for pj in pt
                    ]
                    colsum_ref[b, hh] = jnp.concatenate([cs] + tail, axis=-1)
                elif prefix:
                    # sum over VALID patch-query rows only (rows in
                    # [extra, kv_valid)); wrapper divides by h * valid
                    colsum_ref[b, hh] = jnp.sum(
                        p * rvalid, axis=0, keepdims=True
                    ) - jnp.sum(p[:extra], axis=0, keepdims=True)
                else:
                    # column sums over patch-query rows = total minus the
                    # few extra rows — avoids an (n, n) iota+mask product
                    colsum_ref[b, hh] = jnp.sum(
                        p, axis=0, keepdims=True
                    ) - jnp.sum(p[:extra], axis=0, keepdims=True)
            elif mode == "cls":
                if split:
                    colsum_ref[b, hh] = jnp.concatenate(
                        [p[0:1] * inv[0:1]]
                        + [pj[0:1] * inv[0:1] for pj in pt],
                        axis=-1,
                    )
                else:
                    colsum_ref[b, hh] = p[0:1]
            else:
                colsum_ref[b, hh] = jnp.zeros((1, n), jnp.float32)


def _fused_qkv_impl(
    qkv: jnp.ndarray,
    num_heads: int,
    mode: Optional[str],
    num_extra_tokens: int,
    kv_valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    assert supports(num_heads, d, n, qkv.dtype.itemsize), (num_heads, d, n)
    hpb = LANES // d  # heads per 128-lane block
    hb = c // LANES  # lane blocks per q/k/v section
    g = _batch_group(b, n, qkv.dtype.itemsize, n_io_blocks=4)
    scale = d ** -0.5
    prefix = kv_valid is not None

    kernel = functools.partial(
        _qkv_kernel,
        scale=scale,
        mode=mode,
        extra=num_extra_tokens,
        head_dim=d,
        heads_per_block=hpb,
        group=g,
        prefix=prefix,
        split=_split_r(n),
    )

    def spec(section):
        return pl.BlockSpec(
            (g, n, LANES),
            lambda i, j, s=section: (i, 0, s * hb + j),
            memory_space=pltpu.VMEM,
        )

    in_specs = [spec(0), spec(1), spec(2)]
    operands = [qkv, qkv, qkv]
    if prefix:
        in_specs.insert(
            0, pl.BlockSpec(memory_space=pltpu.SMEM)
        )
        operands.insert(0, kv_valid.astype(jnp.int32).reshape(1))

    out, colsum = pl.pallas_call(
        kernel,
        grid=(b // g, hb),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (g, n, LANES), lambda i, j: (i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (g, hpb, 1, n), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, num_heads, 1, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * num_heads * n * n * d,
            bytes_accessed=qkv.size * qkv.dtype.itemsize,
            transcendentals=b * num_heads * n * n,
        ),
        interpret=_interpret(),
    )(*operands)
    return out, colsum[:, :, 0, :]


def _reduce_scores(
    colsum: jnp.ndarray,
    mode: Optional[str],
    n: int,
    extra: int,
    kv_valid: Optional[jnp.ndarray] = None,
) -> Optional[jnp.ndarray]:
    if mode is None:
        return None
    h = colsum.shape[1]
    block = colsum[:, :, extra:]
    if mode == "patch_mean":
        valid = (
            (kv_valid - extra).astype(jnp.float32)
            if kv_valid is not None
            else float(n - extra)
        )
        return jnp.sum(block, axis=1) / (h * valid)
    if mode == "cls":
        return jnp.mean(block, axis=1)
    raise ValueError(mode)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fused_qkv_attention(
    qkv: jnp.ndarray,
    num_heads: int,
    mode: Optional[str] = None,
    num_extra_tokens: int = 1,
):
    """Packed-qkv fused attention.

    qkv: (B, N, 3C) — the raw output of the qkv Dense projection, sections
    [q | k | v], heads laid out contiguously inside each section.
    Returns (out (B, N, C), scores (B, N - extra) | None).
    """
    out, colsum = _impl_cp(num_heads, mode, num_extra_tokens, False)(qkv)
    return out, _reduce_scores(colsum, mode, qkv.shape[1], num_extra_tokens)


def _qkv_bwd_kernel(
    *refs,
    scale, mode, extra, head_dim, heads_per_block, group, prefix,
):
    """Fused backward: recompute p per head in VMEM, emit dq/dk/dv in the
    packed layout.  ds_ref carries the (zero-padded-to-N) score cotangent,
    already scaled by 1/(H*P) ('patch_mean') or 1/H ('cls'); in prefix
    mode the wrapper pre-scales by the traced 1/(H*valid) instead and the
    kernel recomputes p with the same key mask as the forward.

    The backward NEVER takes the CLS-split form, even under
    TPAT_CLS_SPLIT=1: Mosaic rejects the tail-row (1, d) stores with
    "Invalid input layout", and the custom_vjp recomputes p from qkv so a
    full-width backward composes exactly with a split forward (both are
    the same softmax, associativity aside)."""
    if prefix:
        kv_ref, q_ref, k_ref, v_ref, do_ref, ds_ref, dq_ref, dk_ref, dv_ref = refs
        kv_valid = kv_ref[0]
    else:
        q_ref, k_ref, v_ref, do_ref, ds_ref, dq_ref, dk_ref, dv_ref = refs
        kv_valid = None
    n = q_ref.shape[1]
    if prefix:
        kmask = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) < kv_valid
    for b in range(group):
        for hh in range(heads_per_block):
            sl = slice(hh * head_dim, (hh + 1) * head_dim)
            q = q_ref[b, :, sl]
            k = k_ref[b, :, sl]
            v = v_ref[b, :, sl]
            do = do_ref[b, :, sl]

            logits = (
                jax.lax.dot_general(
                    q, k,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            if prefix:
                logits = jnp.where(kmask, logits, -1e30)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            # reciprocal-multiply instead of an (n, n) broadcast divide:
            # VPU division is multi-cycle per element, the reciprocal is
            # only (n, 1)
            p = p * (1.0 / jnp.sum(p, axis=-1, keepdims=True))

            dp = jax.lax.dot_general(
                do, v,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if mode is not None:
                ds = ds_ref[b, 0].astype(jnp.float32)  # (N,), pre-scaled
                row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
                if mode == "patch_mean":
                    rmask = (row >= extra).astype(jnp.float32)
                    if prefix:
                        rmask = rmask * (row < kv_valid).astype(jnp.float32)
                else:  # 'cls'
                    rmask = (row == 0).astype(jnp.float32)
                dp = dp + rmask * ds[None, :]

            dlog = (
                p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            ).astype(q.dtype)
            dq_ref[b, :, sl] = (
                jnp.dot(dlog, k, preferred_element_type=jnp.float32) * scale
            ).astype(dq_ref.dtype)
            dk_ref[b, :, sl] = (
                jax.lax.dot_general(
                    dlog, q,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            ).astype(dk_ref.dtype)
            dv_ref[b, :, sl] = jax.lax.dot_general(
                p.astype(do.dtype), do,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dv_ref.dtype)


def _fused_qkv_bwd_impl(
    qkv, d_out, d_scores, num_heads, mode, num_extra_tokens, kv_valid=None
):
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    hpb = LANES // d
    hb = c // LANES
    g = _batch_group(b, n, qkv.dtype.itemsize, n_io_blocks=7)
    e = num_extra_tokens
    prefix = kv_valid is not None

    # Pre-scale + zero-pad the score cotangent to (B, 1, N).
    if mode is not None and d_scores is not None:
        if mode == "patch_mean":
            denom = (
                (kv_valid - e).astype(jnp.float32) * num_heads
                if prefix
                else float(num_heads * (n - e))
            )
        else:
            denom = float(num_heads)
        ds = (d_scores.astype(jnp.float32) / denom)
        ds = jnp.pad(ds, ((0, 0), (e, 0)))[:, None, :]  # (B, 1, N)
        eff_mode = mode
    else:
        ds = jnp.zeros((b, 1, n), jnp.float32)
        eff_mode = None

    kernel = functools.partial(
        _qkv_bwd_kernel,
        scale=d ** -0.5,
        mode=eff_mode,
        extra=e,
        head_dim=d,
        heads_per_block=hpb,
        group=g,
        prefix=prefix,
    )

    def spec(section):
        return pl.BlockSpec(
            (g, n, LANES),
            lambda i, j, s=section: (i, 0, s * hb + j),
            memory_space=pltpu.VMEM,
        )

    out_spec = pl.BlockSpec(
        (g, n, LANES), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    in_specs = [
        spec(0), spec(1), spec(2),
        out_spec,  # d_out
        pl.BlockSpec((g, 1, n), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qkv, qkv, qkv, d_out, ds]
    if prefix:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.insert(0, kv_valid.astype(jnp.int32).reshape(1))
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b // g, hb),
        in_specs=in_specs,
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((b, n, c), qkv.dtype)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * num_heads * n * n * d,
            bytes_accessed=2 * qkv.size * qkv.dtype.itemsize,
            transcendentals=b * num_heads * n * n,
        ),
        interpret=_interpret(),
    )(*operands)
    return jnp.concatenate([dq, dk, dv], axis=-1)


# --- GSPMD mesh support (ops/partitioning.py) ------------------------------
# Mosaic kernels cannot be auto-partitioned by XLA; these wrappers give
# each impl a batch-sharded custom_partitioning so multi-device
# data-parallel jit lowers the kernel per-shard.  One wrapper per static
# configuration (custom_partitioning objects are built once, cached).

from tpat_tpu.ops import partitioning as _pt


@_pt.cached_factory
def _impl_cp(num_heads, mode, extra, prefix):
    if prefix:
        def fn(qkv, kv_valid):
            return _fused_qkv_impl(qkv, num_heads, mode, extra, kv_valid)

        return _pt.batch_partitioned(
            fn, (True, False), 2, sharding_rule="b n c, s -> b n c, b h w"
        )

    def fn(qkv):
        return _fused_qkv_impl(qkv, num_heads, mode, extra)

    return _pt.batch_partitioned(
        fn, (True,), 2, sharding_rule="b n c -> b n c, b h w"
    )


@_pt.cached_factory
def _bwd_cp(num_heads, mode, extra, has_scores, prefix):
    if prefix and has_scores:
        def fn(qkv, d_out, d_scores, kv_valid):
            return _fused_qkv_bwd_impl(
                qkv, d_out, d_scores, num_heads, mode, extra, kv_valid
            )

        return _pt.batch_partitioned(
            fn, (True, True, True, False), 1,
            sharding_rule="b n c, b n d, b p, s -> b n c",
        )
    if prefix:
        def fn(qkv, d_out, kv_valid):
            return _fused_qkv_bwd_impl(
                qkv, d_out, None, num_heads, mode, extra, kv_valid
            )

        return _pt.batch_partitioned(
            fn, (True, True, False), 1,
            sharding_rule="b n c, b n d, s -> b n c",
        )
    if has_scores:
        def fn(qkv, d_out, d_scores):
            return _fused_qkv_bwd_impl(
                qkv, d_out, d_scores, num_heads, mode, extra
            )

        return _pt.batch_partitioned(
            fn, (True, True, True), 1,
            sharding_rule="b n c, b n d, b p -> b n c",
        )

    def fn(qkv, d_out):
        return _fused_qkv_bwd_impl(qkv, d_out, None, num_heads, mode, extra)

    return _pt.batch_partitioned(
        fn, (True, True), 1, sharding_rule="b n c, b n d -> b n c"
    )


def _fwd(qkv, num_heads, mode, num_extra_tokens):
    out, colsum = _impl_cp(num_heads, mode, num_extra_tokens, False)(qkv)
    scores = _reduce_scores(colsum, mode, qkv.shape[1], num_extra_tokens)
    return (out, scores), (qkv,)


def _split_heads(x, h):
    b, n, c = x.shape
    return x.reshape(b, n, h, c // h).transpose(0, 2, 1, 3)


def _bwd(num_heads, mode, num_extra_tokens, residuals, cotangents):
    """Fused Pallas recompute backward; XLA fallback below kept for
    reference/debug (set TPAT_XLA_ATTENTION_BWD=1)."""
    import os

    (qkv,) = residuals
    d_out, d_scores = cotangents
    if os.environ.get("TPAT_XLA_ATTENTION_BWD") != "1":
        has_scores = d_scores is not None and mode is not None
        cp = _bwd_cp(num_heads, mode, num_extra_tokens, has_scores, False)
        d_qkv = (
            cp(qkv, d_out, d_scores) if has_scores else cp(qkv, d_out)
        )
        return (d_qkv,)
    b, n, c3 = qkv.shape
    c = c3 // 3
    h = num_heads
    d = c // h
    e = num_extra_tokens
    scale = d ** -0.5

    qf = _split_heads(qkv[..., :c], h).astype(jnp.float32)
    kf = _split_heads(qkv[..., c : 2 * c], h).astype(jnp.float32)
    vf = _split_heads(qkv[..., 2 * c :], h).astype(jnp.float32)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    p = jax.nn.softmax(logits, axis=-1)

    d_out_h = _split_heads(d_out, h).astype(jnp.float32)
    d_p = jnp.einsum("bhqd,bhkd->bhqk", d_out_h, vf)
    if d_scores is not None and mode is not None:
        ds = d_scores.astype(jnp.float32)  # (B, N - e)
        if mode == "patch_mean":
            contrib = ds[:, None, None, :] / (h * (n - e))
            d_p = d_p.at[:, :, e:, e:].add(
                jnp.broadcast_to(contrib, (b, h, n - e, n - e))
            )
        elif mode == "cls":
            d_p = d_p.at[:, :, 0, e:].add(ds[:, None, :] / h)
    d_logits = p * (d_p - jnp.sum(d_p * p, axis=-1, keepdims=True))
    d_v = jnp.einsum("bhqk,bhqd->bhkd", p, d_out_h)
    d_q = jnp.einsum("bhqk,bhkd->bhqd", d_logits, kf) * scale
    d_k = jnp.einsum("bhqk,bhqd->bhkd", d_logits, qf) * scale

    def merge(x):  # (B,H,N,D) -> (B,N,C)
        return x.transpose(0, 2, 1, 3).reshape(b, n, c)

    d_qkv = jnp.concatenate([merge(d_q), merge(d_k), merge(d_v)], axis=-1)
    return (d_qkv.astype(qkv.dtype),)


fused_qkv_attention.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_qkv_attention_prefix(
    qkv: jnp.ndarray,
    kv_valid: jnp.ndarray,
    num_heads: int,
    mode: Optional[str] = None,
    num_extra_tokens: int = 1,
):
    """Packed-qkv fused attention with a traced valid-length key mask.

    kv_valid: int scalar — tokens [0, kv_valid) (extras + kept patches)
    are valid; later columns are masked from the softmax and, for
    'patch_mean', from the query-row score reduction.  This is the HYBRID
    anneal's attention (models/vit.py::forward_hybrid): after a bucket
    gather the kept set is a descending-score prefix, identical across
    the batch, so one scalar replaces the (B, P) boolean mask — and the
    fused kernel (probabilities never leave VMEM) stays usable where the
    masked XLA path would materialize B*H*N^2 in HBM.

    Returns (out (B, N, C), scores (B, N - extra) | None).
    """
    out, colsum = _impl_cp(num_heads, mode, num_extra_tokens, True)(
        qkv, kv_valid.reshape(1)
    )
    return out, _reduce_scores(
        colsum, mode, qkv.shape[1], num_extra_tokens, kv_valid
    )


def _prefix_fwd(qkv, kv_valid, num_heads, mode, num_extra_tokens):
    out, colsum = _impl_cp(num_heads, mode, num_extra_tokens, True)(
        qkv, kv_valid.reshape(1)
    )
    scores = _reduce_scores(
        colsum, mode, qkv.shape[1], num_extra_tokens, kv_valid
    )
    return (out, scores), (qkv, kv_valid)


def _prefix_bwd(num_heads, mode, num_extra_tokens, residuals, cotangents):
    """Fused Pallas recompute backward; the same TPAT_XLA_ATTENTION_BWD=1
    escape hatch as the plain kernel (``_bwd``) — hybrid anneal is the
    training default, so the debug knob must cover this path too."""
    import os

    qkv, kv_valid = residuals
    d_out, d_scores = cotangents
    has_scores = d_scores is not None and mode is not None
    if os.environ.get("TPAT_XLA_ATTENTION_BWD") != "1":
        cp = _bwd_cp(num_heads, mode, num_extra_tokens, has_scores, True)
        kv1 = kv_valid.reshape(1)
        d_qkv = (
            cp(qkv, d_out, d_scores, kv1)
            if has_scores
            else cp(qkv, d_out, kv1)
        )
        return (d_qkv, None)

    # XLA reference backward: differentiate the masked XLA restatement
    # whose forward parity with this kernel test_model_parity.py::
    # test_hybrid_fused_prefix_matches_xla establishes.
    from tpat_tpu.ops.attention import attention_with_scores

    b, n, c3 = qkv.shape
    c = c3 // 3
    h = num_heads
    dh = c // h
    e = num_extra_tokens
    token_mask = jnp.broadcast_to(
        jnp.arange(n - e) < (kv_valid - e), (b, n - e)
    )

    def ref(qkv_):
        qkv_r = qkv_.reshape(b, n, 3, h, dh).transpose(2, 0, 3, 1, 4)
        out, scores = attention_with_scores(
            qkv_r[0], qkv_r[1], qkv_r[2],
            num_extra_tokens=e,
            importance=mode if mode is not None else "patch_mean",
            token_mask=token_mask,
            need_scores=has_scores,
            impl="xla",
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return (out, scores) if has_scores else out

    _, vjp = jax.vjp(ref, qkv)
    (d_qkv,) = vjp((d_out, d_scores) if has_scores else d_out)
    return (d_qkv, None)


fused_qkv_attention_prefix.defvjp(_prefix_fwd, _prefix_bwd)


def supports_lane_padded(
    num_heads: int, head_dim: int, n: Optional[int] = None, itemsize: int = 2
) -> bool:
    """Feasibility of the lane-padded path: head_dim is NOT a lane divisor
    (so the plain packed layout fails) but padding every head to 128 lanes
    yields a supported geometry.  ViT-H (16 heads x 80) is the motivating
    case (VERDICT r2 weak #6)."""
    if LANES % head_dim == 0:
        return False  # plain path applies; padding would only waste FLOPs
    if head_dim >= LANES:
        return False
    return supports(num_heads, LANES, n, itemsize)


def fused_qkv_attention_lane_padded(
    qkv: jnp.ndarray,
    num_heads: int,
    mode: Optional[str] = None,
    num_extra_tokens: int = 1,
):
    """Packed-qkv fused attention for head dims that don't divide the
    128-lane width (ViT-H: 16 heads x 80).

    Each head's q/k/v slice is zero-padded to 128 lanes and the padded
    tensor goes through the standard kernel.  The math is exact: padded
    dims contribute 0 to every q.k dot product, and V's padded columns
    produce zeros that are sliced away.  The kernel scales logits by
    padded_dim**-0.5, so q is pre-multiplied by sqrt(128/head_dim) —
    composing to the true head_dim**-0.5 — instead of threading a scale
    override through the custom_vjp.  The multiply runs in f32 with the
    exact scale so no systematic bias enters; the product then rounds
    once to the compute dtype (the same numerics class as q itself —
    under bf16 a bf16-rounded *scale factor* would instead bias every
    logit by up to ~0.06%).  Autodiff flows through the
    pad/reshape/slice into the kernel's own VJP; no extra backward code.

    Costs 128/head_dim more attention FLOPs than a native-width kernel
    would, but keeps probabilities in VMEM — measured against the XLA
    fallback in docs/BENCH_NOTES.md.
    """
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    q3 = qkv.reshape(b, n, 3, num_heads, d)
    q_scaled = (
        q3[:, :, :1].astype(jnp.float32) * ((LANES / d) ** 0.5)
    ).astype(qkv.dtype)
    q3 = jnp.concatenate([q_scaled, q3[:, :, 1:]], axis=2)
    q3 = jnp.pad(q3, ((0, 0), (0, 0), (0, 0), (0, 0), (0, LANES - d)))
    packed = q3.reshape(b, n, 3 * num_heads * LANES)
    out, scores = fused_qkv_attention(packed, num_heads, mode, num_extra_tokens)
    out = out.reshape(b, n, num_heads, LANES)[..., :d].reshape(b, n, c)
    return out, scores


# ---------------------------------------------------------------------------
# Legacy per-(b,h) interface used when the packed layout doesn't apply
# (odd head_dim).  Kept for API compatibility with tests.
# ---------------------------------------------------------------------------


def fused_attention_with_scores(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mode: Optional[str] = None,
    num_extra_tokens: int = 1,
):
    """(B,H,N,D) q/k/v interface; packs into (B,N,3C) and calls the fused
    kernel when supported, else falls back to XLA math."""
    b, h, n, d = q.shape
    c = h * d

    def merge(x):
        return x.transpose(0, 2, 1, 3).reshape(b, n, c)

    if supports(h, d, n, q.dtype.itemsize):
        qkv = jnp.concatenate([merge(q), merge(k), merge(v)], axis=-1)
        out, scores = fused_qkv_attention(qkv, h, mode, num_extra_tokens)
        return out.reshape(b, n, h, d).transpose(0, 2, 1, 3), scores

    # XLA fallback (exact reference math)
    from tpat_tpu.ops.attention import attention_with_scores

    return attention_with_scores(
        q, k, v,
        num_extra_tokens=num_extra_tokens,
        importance=mode or "patch_mean",
        need_scores=mode is not None,
        impl="xla",
    )
