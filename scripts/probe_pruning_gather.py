"""Probe: what do the TopK + token gathers cost in the eval forward?

BENCH_NOTES' roofline attributes the remaining gap to "LayerNorm/GELU/
residual traffic + pruning gathers"; the LN half was measured removable-
cost-free (scripts/probe_ln_matmul.py).  This times the pruning side at
the ViT-B keep-0.7 ESC-50 headline shapes (batch 128): for each pruning
block, `top_k` over the (B, P) scores plus the descending-score token
gather of the (B, N, C) sequence — exactly what `ops/pruning.topk_select`
+ `gather_tokens` run — and, for scale, one block's qkv matmul.

Timing per CLAUDE.md: 20 iterations inside one jitted fori_loop, one
scalar fetch per measurement (per-dispatch relay latency is ~20-60 ms).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpat_tpu.ops import pruning

B, C = 128, 768
ITERS = 20
# (tokens_in, patches_in, kept) at drop blocks 3/6/9, keep 0.7, P=256
STAGES = [(257, 256, 180), (181, 180, 126), (127, 126, 89)]


def bench(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(_, acc):
            return acc + jnp.sum(fn(*a).astype(jnp.float32))

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(run(*args))  # compile + warm
    t0 = time.time()
    float(run(*args))
    dt = (time.time() - t0) / ITERS * 1000
    print(f"{name:34s} {dt:7.3f} ms")
    return dt


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
    bench("anchor: qkv matmul (257 tokens)", lambda a, b: jnp.dot(a, b), xw, w)


if __name__ == "__main__":
    main()
