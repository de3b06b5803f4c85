"""Serving export: AOT-serialized inference artifacts (beyond-reference).

The reference has no serving story; this module packages the jitted
pruned-eval forward as a portable ``jax.export`` StableHLO artifact plus
an ``.npz`` of the parameters, so a serving process can run inference
without importing the model code (only jax + the artifact).  The pruning
keep-rates are baked statically (ViTConfig), so the exported program is a
single static-shape XLA computation — exactly what a production servo
wants to load.

Layout on disk (a directory):
    forward.jaxexport   serialized StableHLO program  fn(params, x)
    params.npz          flat {'/'-joined path: array} parameter tree
    meta.json           input shape/dtype + framework version notes

Bucketed artifacts (``batch_sizes=(1, 8, 32, 128)``) hold one program
per batch bucket (``forward.b{n}.jaxexport``); the loader pads each
request up to the smallest bucket that fits and slices the logits back
— the standard TPU serving pattern (static shapes, bucketed dispatch),
so one artifact serves any request size while every program stays a
single static-shape XLA computation.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import numpy as np


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out["/".join(prefix)] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def export_forward(
    model,
    params,
    input_shape: Sequence[int],
    out_dir: str,
    *,
    input_dtype=np.float32,
    platforms: Optional[Tuple[str, ...]] = None,
    batch_sizes: Optional[Sequence[int]] = None,
    frontend=None,
    ast_orientation: bool = False,
) -> str:
    """Serialize ``model.apply`` (static-pruned eval forward) + params.

    input_shape: e.g. ``(batch, 1, target_length, num_mel_bins)`` for the
    AudioMAE family or ``(batch, 1, num_mel_bins, t)`` for AST (the same
    orientation the model was built for).  By default the batch size is
    baked — one artifact per serving batch size, as usual for AOT
    serving.

    batch_sizes: optional batch buckets (e.g. ``(1, 8, 32, 128)``).  One
    program per bucket is serialized into the same artifact (the leading
    dim of ``input_shape`` is ignored); ``load_forward`` then pads each
    request to the smallest bucket that fits and slices the outputs back,
    chunking requests larger than the biggest bucket.

    platforms: optional lowering platforms (e.g. ``("tpu", "cpu")``);
    defaults to the current backend.

    frontend: optional ``ops.frontend.FrontendConfig``.  When given, the
    exported program is the FUSED waveform->logits graph: inputs are raw
    PCM ``(batch, num_samples)`` float32 and the on-device fbank +
    pad-with-min + normalize run inside the same XLA computation as the
    forward (the zero-host-fbank serving path, docs/BENCH_NOTES.md
    "Raw-audio serving path").  ``input_shape`` is then
    ``(batch, num_samples)``.  Short-clip contract (documented in
    meta.json): pad short clips to ``num_samples`` with **NaN at the
    tail** — frames a shorter clip cannot produce get the reference's
    ``fbank.min()`` fill (dataset.py:218-225); a NaN **head** encodes
    VoxCeleb lr_pad and must be a multiple of the 160-sample shift
    (ops/frontend.py:88-110).  Fully-finite inputs are unaffected.

    ast_orientation: with ``frontend``, transpose the spectrogram to the
    AST family's ``(B, 1, F, T)`` before the trunk (ast_models.py:434-436).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)

    if frontend is None:
        def fwd(p, x):
            return model.apply({"params": p}, x)
    else:
        from tpat_tpu.ops.frontend import device_frontend

        def fwd(p, wav):
            spec = device_frontend(wav, frontend, train=False)
            if ast_orientation:
                spec = spec.transpose(0, 1, 3, 2)
            return model.apply({"params": p}, spec)

    p_spec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        params,
    )
    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)

    def _export_one(shape):
        x_spec = jax.ShapeDtypeStruct(tuple(shape), jnp.dtype(input_dtype))
        return jexport.export(jax.jit(fwd), **kw)(p_spec, x_spec)

    meta = {"input_dtype": np.dtype(input_dtype).name}
    if frontend is not None:
        meta["frontend"] = {
            "input": "waveform",
            "num_samples": int(input_shape[-1]),
            "sample_rate": frontend.sample_rate,
            "num_mel_bins": frontend.num_mel_bins,
            "target_length": frontend.target_length,
            "norm_mean": frontend.norm_mean,
            "norm_std": frontend.norm_std,
            "ast_orientation": bool(ast_orientation),
            "padding_contract": (
                "pad short clips to num_samples with NaN at the TAIL "
                "(frames the true length cannot produce take the clip's "
                "fbank.min() fill, dataset.py:218-225); an optional NaN "
                "HEAD (VoxCeleb lr_pad) must be a multiple of the "
                "160-sample frame shift; fully-finite inputs unaffected"
            ),
        }
    if batch_sizes is None:
        exported = _export_one(input_shape)
        with open(os.path.join(out_dir, "forward.jaxexport"), "wb") as f:
            f.write(exported.serialize())
        meta["input_shape"] = list(input_shape)
    else:
        buckets = sorted(set(int(b) for b in batch_sizes))
        if not buckets or buckets[0] < 1:
            raise ValueError(f"batch_sizes must be positive ints: {batch_sizes}")
        for b in buckets:
            exported = _export_one((b,) + tuple(input_shape[1:]))
            path = os.path.join(out_dir, f"forward.b{b}.jaxexport")
            with open(path, "wb") as f:
                f.write(exported.serialize())
        meta["input_shape"] = [None] + list(input_shape[1:])
        meta["batch_sizes"] = buckets
    meta["platforms"] = list(exported.platforms)

    np.savez(os.path.join(out_dir, "params.npz"), **_flatten(params))
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return out_dir


def load_forward(out_dir: str):
    """Load a served artifact; returns ``(fn, meta)`` where ``fn(x)``
    runs the exported forward with the packaged parameters.

    Bucketed artifacts dispatch on the request's batch size: pad up to
    the smallest bucket that fits (zero rows, sliced off the logits), or
    chunk by the largest bucket when the request exceeds it.
    """
    import jax.numpy as jnp
    from jax import export as jexport

    flat = np.load(os.path.join(out_dir, "params.npz"))
    params = _unflatten({k: flat[k] for k in flat.files})
    params = _unflatten_cast(params)
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)

    def _load(name):
        with open(os.path.join(out_dir, name), "rb") as f:
            return jexport.deserialize(f.read())

    buckets = meta.get("batch_sizes")
    if buckets is None:
        exported = _load("forward.jaxexport")

        def fn(x):
            return exported.call(params, jnp.asarray(x))

        return fn, meta

    programs = {b: _load(f"forward.b{b}.jaxexport") for b in buckets}
    dtype = jnp.dtype(meta["input_dtype"])

    def _run_padded(chunk):
        # pad on-device (jnp): host round-trips here would dominate the
        # dispatch cost for device-resident request tensors
        chunk = jnp.asarray(chunk, dtype)
        n = chunk.shape[0]
        b = next(bb for bb in buckets if bb >= n)  # buckets are sorted
        if n < b:
            pad = jnp.zeros((b - n,) + chunk.shape[1:], dtype)
            chunk = jnp.concatenate([chunk, pad], axis=0)
        return programs[b].call(params, chunk)[:n]

    def fn(x):
        if not hasattr(x, "shape"):
            x = np.asarray(x, dtype)
        if x.shape[0] == 0:
            raise ValueError("empty batch")
        biggest = buckets[-1]
        outs = [
            _run_padded(x[i : i + biggest])
            for i in range(0, x.shape[0], biggest)
        ]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    return fn, meta


def _unflatten_cast(tree):
    import jax.numpy as jnp

    if isinstance(tree, dict):
        return {k: _unflatten_cast(v) for k, v in tree.items()}
    return jnp.asarray(tree)
