"""Serving latency of the bucketed ``jax.export`` artifact on the TPU.

Exports the flagship config (ViT-B keep 0.7, ESC-50 geometry, bf16,
fused attention) as ONE bucketed artifact (batch buckets 1/8/32/128,
``utils/serving.py``) and times ``load_forward``'s dispatch at request
sizes that hit each path: exact buckets, a padded request (100 -> 128),
and a chunked one (200 -> 128 + 72->128).  Whole-graph timing uses the
queue-N + single-scalar-fetch pattern (docs/BENCH_NOTES.md
"Calibration"); inputs are generated on-device (host->device on the
relay is ~1 MB/s and would swamp every number).

Results are recorded in docs/BENCH_NOTES.md "Serving artifact on the
TPU".

``--device_frontend``: export and time the FUSED waveform->logits
artifact instead (``serving.export_forward(frontend=...)``): inputs are
raw PCM ``(n, 80000)`` (5-s clips; pad-with-min fills the remaining
frames on device), so the number includes the on-device fbank +
normalize — the zero-host-fbank serving path as an AOT artifact rather
than the round-3 in-process jit (BENCH_NOTES "Raw-audio serving path").
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from tpat_tpu.config import audiomae_vit_base
from tpat_tpu.models.vit import AudioViT
from tpat_tpu.utils import serving

BUCKETS = (1, 8, 32, 128)
REQUESTS = (1, 8, 32, 100, 128, 200)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device_frontend", action="store_true",
                    help="bench the fused waveform->logits artifact")
    args = ap.parse_args()

    cfg = audiomae_vit_base(
        target_length=512, num_classes=50, base_keep_rate=0.7,
        drop_loc=(3, 6, 9), drop_path_rate=0.0, compute_dtype="bfloat16",
    )
    model = AudioViT(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 1, 512, 128))
    )["params"]
    kw = {}
    if args.device_frontend:
        from tpat_tpu.ops.frontend import FrontendConfig

        kw["frontend"] = FrontendConfig()  # ESC-50 geometry defaults
        in_shape = (1, 80000)  # 5-s PCM; pad-with-min fills frames 499-512
    else:
        in_shape = (1, 1, 512, 128)
    d = tempfile.mkdtemp(prefix="tpat_serving_")
    t0 = time.perf_counter()
    serving.export_forward(
        model, params, in_shape, d, batch_sizes=BUCKETS, **kw
    )
    print(f"export ({len(BUCKETS)} buckets): {time.perf_counter() - t0:.1f} s")
    fn, meta = serving.load_forward(d)
    print("meta:", meta["batch_sizes"], meta["input_shape"],
          "waveform-input" if args.device_frontend else "mel-input")

    for n in REQUESTS:
        x = jax.jit(
            lambda k: jax.random.normal(
                k, (n,) + tuple(in_shape[1:]), jnp.float32
            )
        )(jax.random.PRNGKey(n))
        float(jnp.sum(x))  # force the input to exist before timing
        out = fn(x)
        float(jnp.sum(out.astype(jnp.float32)))  # compile + execute
        iters = 50 if n <= 8 else 20
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(x)
            float(jnp.sum(out.astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / iters)
        print(
            f"request n={n:4d}: {best * 1000:7.2f} ms "
            f"({n / best:8.1f} clips/s)"
        )


if __name__ == "__main__":
    main()
