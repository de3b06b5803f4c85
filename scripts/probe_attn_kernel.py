"""Probe 5: fused attention kernel micro-cost at the headline widths.

Timed through the shared hoist-proof harness (scripts/_bench.py).  Run before and
after kernel tweaks to measure them in isolation; pair with bench.py for
the end-to-end confirmation.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpat_tpu.ops.pallas_attention import fused_qkv_attention
from _bench import Bench

B, C, H = 128, 768, 12

bench = Bench(iters=200, name_width=34)


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

            # jax.grad of sum(out) DCEs the forward pallas_call (its
            # value is unused by the cotangent) — this row times the
            # BACKWARD KERNEL ALONE, same caveat as probe_attn_widths.py
            bench(f"[w={w}] attn bwd kernel (b{bt})", fwd_bwd, qkv)


if __name__ == "__main__":
    main()
