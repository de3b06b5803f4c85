"""Probe 5: fused attention kernel micro-cost at the headline widths.

Hoist-proof loop harness (see probe_gather_variants.py).  Run before and
after kernel tweaks to measure them in isolation; pair with bench.py for
the end-to-end confirmation.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpat_tpu.ops.pallas_attention import fused_qkv_attention

B, C, H = 128, 768, 12
ITERS = 200
FLOOR = [0.0]


def bench(name, fn, x0, *rest, is_floor=False):
    @jax.jit
    def run(x0, *rest):
        def body(_, acc):
            xp = (x0.astype(jnp.float32) + acc * 1e-38).astype(x0.dtype)
            out = fn(xp, *rest)
            if isinstance(out, tuple):
                out = sum(jnp.sum(o.astype(jnp.float32)) for o in out if o is not None)
            else:
                out = jnp.sum(out.astype(jnp.float32))
            return acc + out

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(run(x0, *rest))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(run(x0, *rest))
        best = min(best, (time.time() - t0) / ITERS * 1000)
    if is_floor:
        FLOOR[0] = best
        print(f"{name:34s} {best:7.3f} ms   (floor)")
    else:
        print(f"{name:34s} {best - FLOOR[0]:7.3f} ms   (raw {best:7.3f})")
    return best


def main():
    key = jax.random.PRNGKey(0)
    bt = B if "--train" not in sys.argv else 64
    for w in (257, 181, 127, 90):
        qkv = jax.jit(
            lambda k, w=w: jax.random.normal(k, (bt, w, 3 * C), jnp.bfloat16)
        )(jax.random.fold_in(key, w))
        float(jnp.sum(qkv))
        bench(f"[w={w}] null", lambda q: q[:2, :2, 0], qkv, is_floor=True)
        bench(
            f"[w={w}] fused attn (+scores)",
            lambda q: fused_qkv_attention(q, H, "patch_mean", 1), qkv,
        )
        if "--train" in sys.argv:
            def fwd_bwd(q):
                def loss(q):
                    out, _ = fused_qkv_attention(q, H, "patch_mean", 1)
                    return jnp.sum(out.astype(jnp.float32))

                return jax.grad(loss)(q)

            bench(f"[w={w}] attn fwd+bwd (b{bt})", fwd_bwd, qkv)


if __name__ == "__main__":
    main()
