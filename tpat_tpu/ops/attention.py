"""Multi-head self-attention that also emits the token-importance scores
needed for EViT-style pruning and for the extract_stats analysis path.

This is the framework's hot op.  The default implementation is pure
XLA (einsum + softmax) which XLA fuses onto the MXU; a Pallas
flash-attention variant that computes the same score reduction without
materializing B*H*N^2 in HBM can be slotted in behind the same signature
(see ``tpat_tpu/ops/pallas_attention.py``).

Importance reductions (the only algorithmic difference between the two
reference model families):

- ``patch_mean``: mean over heads and *patch-query rows* of the
  patch-to-patch attention block — ``attn[:, :, extra:, extra:]
  .mean(dim=(1, 2))`` (``/root/reference/audiomae/models_vit.py:113``).
- ``cls``: CLS-row attention to patch tokens averaged over heads —
  ``attn[:, :, 0, extra:].mean(dim=1)``
  (``/root/reference/ast/src/models/ast_models.py:124``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpat_tpu.ops.pruning import masked_softmax


def attention_with_scores(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    num_extra_tokens: int,
    importance: str,
    token_mask: Optional[jnp.ndarray] = None,
    need_scores: bool = True,
    softmax_dtype: jnp.dtype = jnp.float32,
    impl: str = "xla",
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Scaled-dot-product attention returning (output, importance_scores).

    q, k, v: (B, H, N, Dh).
    token_mask: optional (B, P) bool over *patch* tokens (P = N - extra);
        extra tokens are always kept.  When given, softmax is restricted to
        kept keys and the patch_mean reduction averages over kept queries
        only — exactly the values physical pruning would produce for the
        surviving tokens.
    Returns:
        out:    (B, H, N, Dh)
        scores: (B, P) float32 importance per patch token (None if
                ``need_scores`` is False).
    """
    if impl == "fused" and token_mask is None:
        from tpat_tpu.ops.pallas_attention import fused_attention_with_scores

        mode = importance if need_scores else None
        return fused_attention_with_scores(q, k, v, mode, num_extra_tokens)

    b, h, n, dh = q.shape
    scale = dh ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=softmax_dtype
    )
    logits = logits.astype(softmax_dtype) * scale

    if token_mask is not None:
        extra_mask = jnp.ones(
            (b, num_extra_tokens), dtype=bool
        )
        key_mask = jnp.concatenate([extra_mask, token_mask], axis=1)  # (B, N)
        attn = masked_softmax(logits, key_mask[:, None, None, :])
    else:
        attn = jax.nn.softmax(logits, axis=-1)

    out = jnp.einsum(
        "bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
        preferred_element_type=softmax_dtype,
    ).astype(v.dtype)

    scores = None
    if need_scores:
        e = num_extra_tokens
        if importance == "patch_mean":
            block = attn[:, :, e:, e:]  # (B, H, P, P)
            if token_mask is not None:
                qmask = token_mask.astype(attn.dtype)  # (B, P)
                num = jnp.einsum("bhqk,bq->bk", block, qmask)
                denom = h * jnp.maximum(jnp.sum(qmask, axis=1), 1.0)
                scores = num / denom[:, None]
            else:
                scores = jnp.mean(block, axis=(1, 2))
        elif importance == "cls":
            scores = jnp.mean(attn[:, :, 0, e:], axis=1)
        else:
            raise ValueError(f"unknown importance mode: {importance}")
        scores = scores.astype(jnp.float32)

    return out, scores
