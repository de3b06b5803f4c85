"""Probe 4: GELU epilogue cost — exact erf vs cheap equivalents.

probe_forward_budget.py measured the exact-erf GELU adding ~1.0 ms per
fc1 at full width (8.3 ms per forward, 22% of the headline).  Candidates
at (M=128*257, N=3072) bf16:

  mm            x@W floor
  gelu_exact    jax.nn.gelu approximate=False (erf)
  gelu_tanh     jax.nn.gelu approximate=True
  gelu_poly     0.5 + x*P8(x^2) normal-CDF polynomial (max abs err
                1.3e-4 -> at most one-ulp bf16 flips; see
                ops/fast_gelu.py)

Hoist-proof loop harness (carry threaded into input, null floor).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpat_tpu.ops.fast_gelu import gelu_poly
from _bench import Bench

M, K, N = 128 * 257, 768, 3072


bench = Bench(iters=100, name_width=28)


def main():
    key = jax.random.PRNGKey(0)
    gen = jax.jit(
        lambda k: (
            jax.random.normal(jax.random.fold_in(k, 0), (M, K), jnp.bfloat16),
            jax.random.normal(jax.random.fold_in(k, 1), (K, N), jnp.bfloat16) * 0.05,
        )
    )
    x, w = gen(key)
    float(jnp.sum(x))

    bench("null (floor)", lambda x: x[:2, :2], x, is_floor=True)
    bench("mm", lambda x, w: jnp.dot(x, w), x, w)
    bench(
        "gelu_exact(mm)",
        lambda x, w: jax.nn.gelu(jnp.dot(x, w), approximate=False), x, w,
    )
    bench(
        "gelu_tanh(mm)",
        lambda x, w: jax.nn.gelu(jnp.dot(x, w), approximate=True), x, w,
    )
    bench("gelu_poly(mm)", lambda x, w: gelu_poly(jnp.dot(x, w)), x, w)

    # accuracy spot check on-device.  BOTH sides must take the f32 input:
    # gelu_poly on the bf16 h would round its OUTPUT to bf16 (~0.03 at
    # |out|~4 — two orders above the 1.3e-4 polynomial error this line
    # is validating)
    h32 = jnp.dot(x[:256], w).astype(jnp.float32)
    exact = jax.nn.gelu(h32, approximate=False)
    poly = gelu_poly(h32)
    print("poly vs exact: max abs diff (f32 in):",
          float(jnp.max(jnp.abs(exact - poly))))
    h = h32.astype(jnp.bfloat16)
    hb = h.astype(jnp.bfloat16)
    eb = jax.nn.gelu(hb, approximate=False)
    pb = gelu_poly(hb)
    frac = float(jnp.mean((eb != pb).astype(jnp.float32)))
    print("bf16 one-ulp flip fraction:", frac)


if __name__ == "__main__":
    main()
