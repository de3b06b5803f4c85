"""Probe: what do the TopK + token gathers cost in the eval forward?

BENCH_NOTES' roofline attributes the remaining gap to "LayerNorm/GELU/
residual traffic + pruning gathers"; the LN half was measured removable-
cost-free (scripts/probe_ln_matmul.py).  This times the pruning side at
the ViT-B keep-0.7 ESC-50 headline shapes (batch 128): for each pruning
block, `top_k` over the (B, P) scores plus the descending-score token
gather of the (B, N, C) sequence — exactly what `ops/pruning.topk_select`
+ `gather_tokens` run — and, for scale, one block's qkv matmul.

Timed through the shared hoist-proof harness (scripts/_bench.py): the
loop carry is threaded into the token tensor and a per-stage null-body
floor is subtracted — a first version of this probe lacked both and
read every stage at the same (relay round-trip / iters) band.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from _bench import Bench
from tpat_tpu.ops import pruning

B, C = 128, 768
# (tokens_in, patches_in, kept) at drop blocks 3/6/9, keep 0.7, P=256
STAGES = [(257, 256, 180), (181, 180, 126), (127, 126, 89)]

bench = Bench(iters=200, name_width=34)


def main():
    key = jax.random.PRNGKey(0)
    total = 0.0
    for n, p, k in STAGES:
        gen = jax.jit(
            lambda kk, n=n, p=p: (
                jax.random.normal(jax.random.fold_in(kk, 0), (B, n, C), jnp.bfloat16),
                jax.random.normal(jax.random.fold_in(kk, 1), (B, p), jnp.float32),
            )
        )
        x, scores = gen(key)
        float(jnp.sum(x))

        def prune(x, scores, k=k):
            idx = pruning.topk_select(scores, k)
            return pruning.gather_tokens(x, idx, 1)

        bench(f"null ({n} tokens, floor)", lambda x: x[:2, :2, 0], x,
              is_floor=True)
        total += bench(f"topk+gather ({n}->{k + 1})", prune, x, scores)
    print(f"{'total (3 pruning blocks)':34s} {total:7.3f} ms")

    # scale anchor: one block's qkv projection at the widest shape
    genw = jax.jit(
        lambda kk: (
            jax.random.normal(jax.random.fold_in(kk, 2), (B * 257, C), jnp.bfloat16),
            jax.random.normal(jax.random.fold_in(kk, 3), (C, 3 * C), jnp.bfloat16)
            * 0.02,
        )
    )
    xw, w = genw(key)
    float(jnp.sum(xw))
    bench("null (anchor floor)", lambda a: a[:2, :2], xw, is_floor=True)
    bench("anchor: qkv matmul (257 tokens)", lambda a, b: jnp.dot(a, b), xw, w)


if __name__ == "__main__":
    main()
