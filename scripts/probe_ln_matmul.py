"""Probe: is LayerNorm->matmul worth a fused Pallas kernel?

BENCH_NOTES attributes ~2.8 ms/block-LN to XLA's convert_reduce_fusion
at (128, 257, 768) and names LN+matmul fusion as the remaining perf
candidate.  This measures, at the qkv-projection shapes of the ViT-B
inference headline (M = 128*257 rows, K = 768, N = 2304, bf16 IO):

  A  x @ W                      (matmul floor)
  B  LN(x) @ W                  (what the model graph does today, XLA)
  C  pallas ln_matmul(x, W)     (prototype fused kernel)
  D  LN(x)                      (LN alone)

Timing per CLAUDE.md: force execution with a scalar fetch; inputs
generated on device; >=20 calls per fetch.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _bench import Bench

M, K, N = 128 * 257, 768, 2304
EPS = 1e-6

bench = Bench(iters=200, name_width=28)


def ln(x, g, b):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return (xc * jax.lax.rsqrt(var + EPS) * g + b).astype(x.dtype)


def _ln_mm_kernel(x_ref, g_ref, b_ref, w_ref, o_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps) * g_ref[:].astype(jnp.float32)
    y = y + b_ref[:].astype(jnp.float32)
    o_ref[:] = jnp.dot(
        y.astype(x_ref.dtype), w_ref[:], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def ln_matmul(x, g, b, w, bm=256, bn=768):
    m, k = x.shape
    n = w.shape[1]
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn))
    return pl.pallas_call(
        functools.partial(_ln_mm_kernel, eps=EPS),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
    )(x, g.reshape(1, k), b.reshape(1, k), w)


def main():
    key = jax.random.PRNGKey(0)
    gen = jax.jit(
        lambda k: (
            jax.random.normal(jax.random.fold_in(k, 0), (M, K), jnp.bfloat16),
            jax.random.normal(jax.random.fold_in(k, 1), (K,), jnp.float32) * 0.1 + 1.0,
            jax.random.normal(jax.random.fold_in(k, 2), (K,), jnp.float32) * 0.1,
            jax.random.normal(jax.random.fold_in(k, 3), (K, N), jnp.bfloat16) * 0.02,
        )
    )
    x, g, b, w = gen(key)
    float(jnp.sum(x))

    mm = jax.jit(lambda x, w: jnp.dot(x, w))
    lnmm = jax.jit(lambda x, g, b, w: jnp.dot(ln(x, g, b), w))
    ln_only = jax.jit(ln)
    fused = jax.jit(ln_matmul)

    # numerics check (CPU-tolerant): fused vs XLA
    ref = np.asarray(lnmm(x, g, b, w), np.float32)
    got = np.asarray(fused(x, g, b, w), np.float32)
    err = np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-6)
    print(f"fused vs XLA rel err: {err:.2e}")

    bench("null (floor)", lambda x: x[:2, :2], x, is_floor=True)
    a = bench("A x@W", mm, x, w)
    d = bench("D LN(x)", ln_only, x, g, b)
    b_ = bench("B LN(x)@W (XLA)", lnmm, x, g, b, w)
    c = bench("C pallas ln_matmul", fused, x, g, b, w)
    print(f"LN overhead in XLA graph: {b_ - a:.3f} ms; fused vs XLA: {b_ - c:+.3f} ms")


if __name__ == "__main__":
    main()
