"""Shared hoist-proof micro-bench harness — THE canonical timing loop.

Every probe script must time ops through this one implementation so the
two hard-won harness rules (CLAUDE.md "Environment gotchas") cannot
silently regress in a per-script copy:

1. The loop body THREADS the carry into the op input
   (``x + acc * 1e-38`` — a bit-exact no-op on O(1) data that XLA
   cannot constant-fold).  Without it, XLA's loop-invariant code motion
   hoists the body out of the ``fori_loop`` and every op — topk, gather,
   LN, matmul alike — reads as (relay round-trip / iters) ≈ 1.1-1.3 ms.
2. A null body (``is_floor=True``) calibrates the residual floor (the
   perturbation + scalar fetch), which is subtracted from every
   subsequent row.

Return semantics are uniform across all probes: ``bench(...)`` returns
the FLOOR-SUBTRACTED best-of-``repeats`` ms/iter (the raw best is
printed alongside); an ``is_floor=True`` call sets the floor and returns
the raw floor value itself.

Tuple-returning ops have every non-None element folded into the carry so
no output is dead-code-eliminated.  NOTE the converse trap this harness
does NOT fix: ``jax.grad`` of ``sum(fn(x))`` DCEs a forward whose value
the gradient doesn't need (e.g. a custom_vjp attention's forward kernel)
— such rows time the backward alone and must be labeled accordingly
(see probe_attn_widths.py).
"""

import time

import jax
import jax.numpy as jnp


class Bench:
    """One instance per probe: holds iters/format state and the floor."""

    def __init__(self, iters: int = 200, repeats: int = 3,
                 name_width: int = 34):
        self.iters = iters
        self.repeats = repeats
        self.name_width = name_width
        self.floor = 0.0

    def __call__(self, name, fn, x0, *rest, is_floor=False, quiet=False):
        iters = self.iters

        @jax.jit
        def run(x0, *rest):
            def body(_, acc):
                xp = (x0.astype(jnp.float32) + acc * 1e-38).astype(x0.dtype)
                out = fn(xp, *rest)
                if isinstance(out, tuple):
                    out = sum(
                        jnp.sum(o.astype(jnp.float32))
                        for o in out
                        if o is not None
                    )
                else:
                    out = jnp.sum(out.astype(jnp.float32))
                return acc + out

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        float(run(x0, *rest))  # compile + warm
        best = float("inf")
        for _ in range(self.repeats):
            t0 = time.time()
            float(run(x0, *rest))
            best = min(best, (time.time() - t0) / iters * 1000)

        w = self.name_width
        if is_floor:
            self.floor = best
            if not quiet:
                print(f"{name:{w}s} {best:7.3f} ms   (floor)")
            return best
        if not quiet:
            print(f"{name:{w}s} {best - self.floor:7.3f} ms"
                  f"   (raw {best:7.3f})")
        return best - self.floor
