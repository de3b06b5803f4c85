"""Polynomial GELU for bf16 compute — the erf epilogue, at bf16 cost.

The reference's GELU is torch's exact-erf flavor (timm ``Mlp`` default,
run under fp16 autocast — ``engine_finetune.py:102``).  XLA lowers
``jax.nn.gelu(approximate=False)`` through an f32-accurate ``erf``
polynomial whose VPU cost measured ~1.0 ms per fc1 epilogue at the
ViT-B headline shape — 8.3 ms (22%) of the whole eval forward
(docs/BENCH_NOTES.md "GELU epilogue", scripts/probe_forward_budget.py).

bf16 activations carry 8 mantissa bits, so an erf accurate to ~1e-4 is
already at the rounding floor: ``gelu_poly`` evaluates the normal CDF as

    Phi(x) ~= 0.5 + c*P8(c^2),   c = clip(x, -4, 4)

a single degree-8 polynomial in x^2 (odd in x, so the negative branch is
free), max abs error of ``x*Phi(x)`` vs exact GELU 1.3e-4 over all of R
(beyond |x|=4 the clipped endpoint value keeps relative error < 4e-5).
No exp, no division, no branch — ~12 VPU ops vs the ~40+ of the erf
lowering.  Against the exact-erf bf16 output it differs by AT MOST ONE
bf16 ulp, on a few percent of activations — the same numerics class as
the bf16 fused-attention kernels (docs/BENCH_NOTES.md "Numerical
property").  Used by ``models/vit.py::Mlp`` only when the compute dtype
is bfloat16; float32 compute keeps the exact erf.
"""

from __future__ import annotations

import jax.numpy as jnp

# Least-squares fit of (Phi(x) - 0.5)/x against x^2 on (0, 4],
# 40001-point grid (scripts/probe_gelu.py documents the derivation);
# highest-degree first, applied by Horner below.
_PHI_COEFFS = (
    1.0437082800930469e-10,
    -8.556417154670983e-09,
    3.133383082177645e-07,
    -6.887952730722726e-06,
    0.00010369028263041697,
    -0.0011557097249377051,
    0.009929856442255788,
    -0.06646679714687166,
    0.39894017033119056,
)


def gelu_poly(x: jnp.ndarray) -> jnp.ndarray:
    """GELU via the degree-8 normal-CDF polynomial (f32 internals)."""
    xf = x.astype(jnp.float32)
    c = jnp.clip(xf, -4.0, 4.0)
    u = c * c
    p = jnp.float32(_PHI_COEFFS[0])
    for coef in _PHI_COEFFS[1:]:
        p = p * u + jnp.float32(coef)
    return (xf * (0.5 + c * p)).astype(x.dtype)
