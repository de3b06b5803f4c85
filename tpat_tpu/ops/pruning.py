"""Shape-static TopK token pruning primitives.

The reference prunes by physically shrinking the sequence with
``torch.topk`` + ``torch.gather`` (``/root/reference/audiomae/models_vit.py:
100-135, 198-203``).  On TPU the same math is expressed two ways:

1. **Static path** (`topk_select` + `gather_tokens`): keep-rates are known
   at trace time, so every post-pruning sequence length is a static shape.
   XLA compiles one graph per (dataset, keep-rate) config; ``jax.lax.top_k``
   returns indices sorted by descending score with ties broken toward the
   lower index — the same contract as ``torch.topk(largest=True,
   sorted=True)``, which downstream index-composition analysis relies on
   (``/root/reference/audiomae/extract_stats.py:236-238``).

2. **Masked path** (`masked_refine` + masked attention in the model): during
   the training-time cosine keep-rate anneal the number of kept tokens
   changes every iteration (``engine_finetune.py:29-53``).  Physically
   re-shaping would force an XLA recompile per iteration, so instead tokens
   are *logically* dropped with a key-mask: masked softmax restricted to
   kept tokens produces outputs for kept tokens identical to physical
   removal, and the kept-token count can be a traced scalar.  This is the
   TPU-native form of the reference's own DynamicViT-style masked softmax
   escape hatch (``models_vit.py:81-90``).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def num_left_tokens(keep_rate: float, num_patches: int) -> int:
    """Static kept-token count: ceil(keep_rate * N_patches).

    Mirrors ``models_vit.py:104`` where N includes the extra tokens and the
    count is over patch tokens only.
    """
    n = math.ceil(keep_rate * num_patches)
    if n <= 0:
        raise ValueError(
            f"num_left_tokens must be > 0, got {n} "
            f"(keep_rate={keep_rate}, num_patches={num_patches})"
        )
    return n


def topk_select(scores: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the top-k scores per row, sorted by descending score.

    scores: (B, P) float. Returns (B, k) int32.

    ``jax.lax.top_k`` sorts descending and breaks ties toward lower indices,
    matching ``torch.topk(..., largest=True, sorted=True)``
    (``models_vit.py:114``).
    """
    _, idx = jax.lax.top_k(scores, k)
    return idx


def onehot_take_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row selection as a one-hot matmul — the MXU form of
    ``take_along_axis(x, idx[..., None], axis=1)``.

    Bit-exact: every output element has exactly ONE nonzero product
    (1.0 * x), so matmul accumulation (including the f32 bf16x3 split)
    introduces no rounding; the backward contraction is the transposed
    matmul, i.e. an exact scatter-add.
    """
    n = x.shape[1]
    onehot = (idx[:, :, None] == jnp.arange(n)[None, None, :]).astype(x.dtype)
    return jnp.einsum("bkn,bnc->bkc", onehot, x)


def plain_take_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def take_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``take_along_axis(x, idx[..., None], axis=1)`` for (B, N, C) tokens.

    On TPU the selection runs as ``onehot_take_rows``: XLA's gather
    lowering measured 0.40 ms at the ViT-B block-3 pruning shape
    (B=128, N=257, k=180, C=768) vs 0.15 ms for the one-hot matmul — and
    the gather's backward is a scatter-add where the one-hot backward is
    another matmul (scripts/probe_gather_variants.py).  Elsewhere (CPU
    tests) the O(N*k*C) FLOPs are pointless and the plain gather is used;
    the two forms are bit-identical (see ``onehot_take_rows``).

    The choice is made per LOWERING PLATFORM (``lax.platform_dependent``),
    not from ambient ``jax.default_backend()`` at trace time, so
    cross-platform ``jax.export`` artifacts and deviceless AOT lowerings
    each bake the variant that is right for the platform they target.
    """
    return jax.lax.platform_dependent(
        x, idx, tpu=onehot_take_rows, default=plain_take_rows
    )


def gather_tokens(
    x: jnp.ndarray, idx: jnp.ndarray, num_extra_tokens: int
) -> jnp.ndarray:
    """Keep extra tokens, gather patch tokens at ``idx``.

    x: (B, N, D); idx: (B, k) indices into the patch-token block
    (i.e. into x[:, num_extra_tokens:]).  Returns (B, extra + k, D).

    Mirrors ``models_vit.py:200-203`` /  ``ast_models.py:212-215``.
    """
    extras = x[:, :num_extra_tokens]
    patches = take_rows(x[:, num_extra_tokens:], idx)
    return jnp.concatenate([extras, patches], axis=1)


def gather_scores(scores: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Re-gather a per-patch score vector through a pruning step.

    Used by the custom-rank ablation (``models_vit.py:371-374``) and by the
    analysis pipeline when composing indices across stages
    (``extract_stats.py:236-238``).
    """
    return jnp.take_along_axis(scores, idx, axis=1)


_NEG_INF = -1e30


def masked_refine(
    scores: jnp.ndarray,
    mask: jnp.ndarray,
    num_left: jnp.ndarray,
) -> jnp.ndarray:
    """Refine a boolean keep-mask: among currently-kept tokens, keep the
    ``num_left`` highest-scoring ones.

    scores:   (B, P) float — importance of each patch token.
    mask:     (B, P) bool  — currently-kept tokens.
    num_left: scalar or (B,) int — traced kept count (may vary per step
              without recompilation).

    Rank computation uses a descending stable argsort so ties resolve toward
    the lower index, matching torch.topk's order.
    """
    masked_scores = jnp.where(mask, scores, _NEG_INF)
    order = jnp.argsort(-masked_scores, axis=1, stable=True)  # (B, P)
    iota = jnp.broadcast_to(
        jnp.arange(order.shape[1], dtype=order.dtype)[None, :], order.shape
    )
    # scatter: ranks[b, order[b, i]] = i
    ranks = jnp.zeros_like(order).at[
        jnp.arange(order.shape[0])[:, None], order
    ].set(iota)
    num_left = jnp.asarray(num_left)
    if num_left.ndim == 0:
        num_left = num_left[None]
    new_mask = ranks < num_left[:, None]
    return jnp.logical_and(mask, new_mask)


def masked_num_left(keep_rate: jnp.ndarray, kept_count: jnp.ndarray) -> jnp.ndarray:
    """ceil(keep_rate * kept_count) with traced inputs (int32)."""
    return jnp.ceil(keep_rate * kept_count.astype(jnp.float32)).astype(jnp.int32)


def masked_mean(
    x: jnp.ndarray, mask: jnp.ndarray, axis: int = 1, eps: float = 0.0
) -> jnp.ndarray:
    """Mean over ``axis`` restricted to mask==True positions.

    Equivalent to physically dropping masked entries then taking ``.mean``
    (``models_vit.py:388``).
    """
    m = mask.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    total = jnp.sum(x * m, axis=axis)
    count = jnp.sum(m, axis=axis)
    return total / jnp.maximum(count, 1.0 if eps == 0.0 else eps)


def masked_softmax(
    logits: jnp.ndarray, key_mask: jnp.ndarray
) -> jnp.ndarray:
    """Softmax over the last axis restricted to key_mask==True columns.

    logits:   (..., N) attention logits.
    key_mask: broadcastable to logits, True where the key token is kept.

    For kept queries this is exactly the softmax the reference computes on
    the physically-pruned sequence; the DynamicViT eps-softmax the reference
    carries (``models_vit.py:81-90``) converges to this as eps -> 0, and the
    -inf form is numerically cleaner on TPU.
    """
    logits = jnp.where(key_mask, logits, _NEG_INF)
    logits = logits - jax.lax.stop_gradient(
        jnp.max(logits, axis=-1, keepdims=True)
    )
    unnorm = jnp.exp(logits) * key_mask.astype(logits.dtype)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    return unnorm / jnp.maximum(denom, 1e-30)


def full_token_mask(batch: int, num_patches: int) -> jnp.ndarray:
    return jnp.ones((batch, num_patches), dtype=bool)


def compose_topk_indices(idx_stages) -> jnp.ndarray:
    """Compose per-stage topk indices into indices w.r.t. the original
    patch grid: stage_k indices address the *surviving* tokens of stage_k-1.

    Mirrors ``util/token_reduction_utils.py:8-19`` (get_melspec_idx).
    """
    composed = idx_stages[0]
    for idx in idx_stages[1:]:
        composed = jnp.take_along_axis(composed, idx, axis=1)
    return composed
