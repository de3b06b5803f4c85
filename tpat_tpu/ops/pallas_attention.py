"""Fused TPU attention kernel (Pallas) with pruning-score emission.

Why: at ViT scale (N = 257..513 tokens) the XLA attention path materializes
the (B, H, N, N) float32 probability tensor in HBM several times per block
(~1.4 GB/block at B=128, N=257) — the measured bottleneck of the forward
pass.  N is small enough that one (query-block = whole sequence) tile fits
VMEM, so this kernel computes logits -> masked softmax -> out entirely
on-chip and additionally emits, per (batch, head), the column sums of the
probability matrix over the query rows the importance reduction needs:

- 'patch_mean' (AudioMAE, models_vit.py:113): sum over patch-query rows;
  host-side wrapper divides by H * P and sums over heads.
- 'cls' (AST, ast_models.py:124): the CLS query row.

Grid layout: the (B, H) pairs are flattened and processed GROUP at a time
per grid step — one (b, h) per step leaves the pipeline overhead-bound
(measured 1536 tiny programs slower than XLA); grouping amortizes it while
staying well under the VMEM budget (GROUP * (3*N*D + N^2) * 4B ~ 4 MB).

Sequence padding to the sublane multiple is handled with an in-kernel key
mask, so no host-side repacking of N=257 to a 128-multiple is needed.

Training: exposed through ``jax.custom_vjp`` — forward runs this kernel,
backward recomputes the probabilities in XLA (the standard flash-attention
recompute trade).  The score output feeds ``top_k`` (integer indices) so
its cotangent is normally zero, but the backward handles it exactly anyway.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_GROUP = 8  # (batch*head) slices per grid step


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    """Run the kernel in interpreter mode off-TPU (unit tests on CPU)."""
    return jax.default_backend() != "tpu"


def _attn_kernel(
    q_ref, k_ref, v_ref, o_ref, colsum_ref, *, scale, n_valid, mode, extra,
    group,
):
    for g in range(group):
        q = q_ref[g].astype(jnp.float32)
        k = k_ref[g].astype(jnp.float32)
        v = v_ref[g].astype(jnp.float32)

        logits = (
            jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < n_valid, logits, _NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)

        o_ref[g] = jnp.dot(
            p, v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)

        if mode == "patch_mean":
            row = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
            qmask = ((row >= extra) & (row < n_valid)).astype(jnp.float32)
            colsum_ref[g] = jnp.sum(p * qmask, axis=0, keepdims=True)
        elif mode == "cls":
            colsum_ref[g] = p[0:1]
        else:  # scores not needed; cheap write keeps one output signature
            colsum_ref[g] = jnp.zeros((1, p.shape[1]), jnp.float32)


def _fused_fwd_impl(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mode: Optional[str],
    num_extra_tokens: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, h, n, d = q.shape
    n_pad = _round_up(n, 8)
    bh = b * h
    group = _GROUP if bh % _GROUP == 0 else 1
    if n_pad != n:
        pad = [(0, 0), (0, 0), (0, n_pad - n), (0, 0)]
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
    qf, kf, vf = (t.reshape(bh, n_pad, d) for t in (q, k, v))

    scale = d ** -0.5
    kernel = functools.partial(
        _attn_kernel,
        scale=scale,
        n_valid=n,
        mode=mode,
        extra=num_extra_tokens,
        group=group,
    )
    qkv_spec = pl.BlockSpec(
        (group, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out, colsum = pl.pallas_call(
        kernel,
        grid=(bh // group,),
        in_specs=[qkv_spec, qkv_spec, qkv_spec],
        out_specs=[
            qkv_spec,
            pl.BlockSpec(
                (group, 1, n_pad), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, n_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * n_pad * n_pad * d,
            bytes_accessed=4 * bh * n_pad * d * 4,
            transcendentals=bh * n_pad * n_pad,
        ),
        interpret=_interpret(),
    )(qf, kf, vf)
    out = out.reshape(b, h, n_pad, d)[:, :, :n]
    colsum = colsum.reshape(b, h, n_pad)[:, :, :n]
    return out, colsum


def _reduce_scores(
    colsum: jnp.ndarray, mode: Optional[str], n: int, extra: int
) -> Optional[jnp.ndarray]:
    if mode is None:
        return None
    h = colsum.shape[1]
    block = colsum[:, :, extra:]
    if mode == "patch_mean":
        return jnp.sum(block, axis=1) / (h * (n - extra))
    if mode == "cls":
        return jnp.mean(block, axis=1)
    raise ValueError(mode)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention_with_scores(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mode: Optional[str] = None,
    num_extra_tokens: int = 1,
):
    """out (B,H,N,D) and importance scores (B, N-extra) or None."""
    out, colsum = _fused_fwd_impl(q, k, v, mode, num_extra_tokens)
    return out, _reduce_scores(colsum, mode, q.shape[2], num_extra_tokens)


def _fwd(q, k, v, mode, num_extra_tokens):
    out, colsum = _fused_fwd_impl(q, k, v, mode, num_extra_tokens)
    scores = _reduce_scores(colsum, mode, q.shape[2], num_extra_tokens)
    return (out, scores), (q, k, v)


def _bwd(mode, num_extra_tokens, residuals, cotangents):
    """XLA recompute backward (materializes p once, f32)."""
    q, k, v = residuals
    d_out, d_scores = cotangents
    b, h, n, d = q.shape
    e = num_extra_tokens
    scale = d ** -0.5

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    p = jax.nn.softmax(logits, axis=-1)

    d_p = jnp.einsum("bhqd,bhkd->bhqk", d_out.astype(jnp.float32), vf)
    if d_scores is not None and mode is not None:
        ds = d_scores.astype(jnp.float32)  # (B, N - e)
        if mode == "patch_mean":
            contrib = ds[:, None, None, :] / (h * (n - e))  # (B,1,1,K)
            d_p = d_p.at[:, :, e:, e:].add(
                jnp.broadcast_to(contrib, (b, h, n - e, n - e))
            )
        elif mode == "cls":
            d_p = d_p.at[:, :, 0, e:].add(ds[:, None, :] / h)
    d_logits = p * (d_p - jnp.sum(d_p * p, axis=-1, keepdims=True))
    d_v = jnp.einsum("bhqk,bhqd->bhkd", p, d_out.astype(jnp.float32))
    d_q = jnp.einsum("bhqk,bhkd->bhqd", d_logits, kf) * scale
    d_k = jnp.einsum("bhqk,bhqd->bhkd", d_logits, qf) * scale
    return d_q.astype(q.dtype), d_k.astype(k.dtype), d_v.astype(v.dtype)


fused_attention_with_scores.defvjp(_fwd, _bwd)
