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
            # perf_counter, not time.time(): best-of-N with a wall clock
            # would let an NTP step produce an impossibly fast repeat
            # that silently corrupts the floor
            t0 = time.perf_counter()
            float(run(x0, *rest))
            best = min(best, (time.perf_counter() - t0) / iters * 1000)

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


def device_op_durations(trace_dir: str):
    """Parse the newest Chrome trace under ``trace_dir`` and return
    ``(totals_us, total_us)`` where ``totals_us`` maps op-group name
    (the event name up to the first '.') to summed device-time in
    microseconds — or ``None`` when no trace exists.

    The ONE shared trace parser: profile_step.py and bench_mae_step.py
    each carried a copy whose device-pid heuristics had already diverged
    ("TPU"-only vs "TPU" or "/device"), making their op budgets
    inconsistent on the same trace.  Device pids are announced via
    ``process_name`` metadata events; both spellings are accepted here.
    """
    import glob
    import gzip
    import json
    from collections import defaultdict

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        return None
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    device_pids = {
        ev["pid"]
        for ev in events
        if ev.get("ph") == "M"
        and ev.get("name") == "process_name"
        and (
            "TPU" in str((ev.get("args") or {}).get("name", ""))
            or "/device" in str((ev.get("args") or {}).get("name", "")).lower()
        )
    }
    totals = defaultdict(float)
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0)
        if not name or dur <= 0:
            continue
        totals[name.split(".")[0]] += dur
        total += dur
    return dict(totals), total
