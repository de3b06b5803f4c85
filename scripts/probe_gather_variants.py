"""Probe 2: which half of topk+gather is slow, and what fixes it?

Measurement-harness note (hard-won): a jitted ``fori_loop`` whose body
does not depend on the loop carry gets its body HOISTED by XLA's
loop-invariant code motion — the "loop" then measures one op execution
plus the relay round-trip divided by ITERS, which is why a first version
of this probe read EVERY op (topk, gather, one-hot, LN, matmul) in the
same ~1.1-1.3 ms band.  The shared ``scripts/_bench.py`` harness folds
the carry into the op input and floor-subtracts a null body; every probe
script times through it.

Shapes: block-3 pruning at the headline config
(B=128, N=257, P=256, k=180, C=768, bf16 tokens, f32 scores), plus the
LN-probe anchors re-measured under the fixed harness.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from _bench import Bench
from tpat_tpu.ops import pruning

B, N, P, K, C = 128, 257, 256, 180, 768
bench = Bench(iters=200, name_width=28)


def onehot_gather(x, idx, e):
    """Gather patch tokens via one-hot matmul on the MXU; extras kept."""
    onehot = (idx[:, :, None] == jnp.arange(P)[None, None, :]).astype(x.dtype)
    kept = jnp.einsum("bkp,bpc->bkc", onehot, x[:, e:])
    return jnp.concatenate([x[:, :e], kept], axis=1)


def ln(x):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return (xc * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)


def main():
    key = jax.random.PRNGKey(0)
    gen = jax.jit(
        lambda kk: (
            jax.random.normal(jax.random.fold_in(kk, 0), (B, N, C), jnp.bfloat16),
            jax.random.normal(jax.random.fold_in(kk, 1), (B, P), jnp.float32),
            jax.random.normal(jax.random.fold_in(kk, 2), (C, 3 * C), jnp.bfloat16)
            * 0.02,
        )
    )
    x, scores, w = gen(key)
    idx = jax.jit(lambda s: pruning.topk_select(s, K))(scores)
    float(jnp.sum(idx))

    # floor: token-tensor perturbation + tiny slice (the common overhead)
    bench("null x (floor)", lambda x: x[:2, :2, 0], x, is_floor=True)
    bench("gather", lambda x, i: pruning.gather_tokens(x, i, 1), x, idx)
    bench("onehot_gather", lambda x, i: onehot_gather(x, i, 1), x, idx)

    x2 = x.reshape(B * N, C)
    bench("anchor: qkv matmul", lambda a, b: jnp.dot(a, b), x2, w)
    bench("anchor: LN(x)@W", lambda a, b: jnp.dot(ln(a), b), x2, w)

    # scores-side floor (small tensor, cheaper perturbation)
    bench("null s (floor)", lambda s: s[:2, :2], scores, is_floor=True)
    bench("topk", lambda s: pruning.topk_select(s, K), scores)
    bench(
        "sort_topk",
        lambda s: jnp.argsort(-s, axis=-1)[:, :K].astype(jnp.int32),
        scores,
    )
    bench(
        "topk+gather (prod)",
        lambda s, x: pruning.gather_tokens(x, pruning.topk_select(s, K), 1),
        scores, x,
    )
    bench(
        "topk+onehot",
        lambda s, x: onehot_gather(x, pruning.topk_select(s, K), 1),
        scores, x,
    )


if __name__ == "__main__":
    main()
