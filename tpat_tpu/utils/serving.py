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
) -> str:
    """Serialize ``model.apply`` (static-pruned eval forward) + params.

    input_shape: e.g. ``(batch, 1, target_length, num_mel_bins)`` for the
    AudioMAE family or ``(batch, 1, num_mel_bins, t)`` for AST (the same
    orientation the model was built for).  The batch size is baked — one
    artifact per serving batch size, as usual for AOT serving.

    platforms: optional lowering platforms (e.g. ``("tpu", "cpu")``);
    defaults to the current backend.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)

    def fwd(p, x):
        return model.apply({"params": p}, x)

    x_spec = jax.ShapeDtypeStruct(tuple(input_shape), jnp.dtype(input_dtype))
    p_spec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        params,
    )
    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)
    exported = jexport.export(jax.jit(fwd), **kw)(p_spec, x_spec)
    with open(os.path.join(out_dir, "forward.jaxexport"), "wb") as f:
        f.write(exported.serialize())

    np.savez(os.path.join(out_dir, "params.npz"), **_flatten(params))
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(
            {
                "input_shape": list(input_shape),
                "input_dtype": np.dtype(input_dtype).name,
                "platforms": list(exported.platforms),
            },
            f,
        )
    return out_dir


def load_forward(out_dir: str):
    """Load a served artifact; returns ``(fn, meta)`` where ``fn(x)``
    runs the exported forward with the packaged parameters."""
    import jax.numpy as jnp
    from jax import export as jexport

    with open(os.path.join(out_dir, "forward.jaxexport"), "rb") as f:
        exported = jexport.deserialize(f.read())
    flat = np.load(os.path.join(out_dir, "params.npz"))
    params = _unflatten({k: flat[k] for k in flat.files})
    params = _unflatten_cast(params)
    meta = json.load(open(os.path.join(out_dir, "meta.json")))

    def fn(x):
        return exported.call(params, jnp.asarray(x))

    return fn, meta


def _unflatten_cast(tree):
    import jax.numpy as jnp

    if isinstance(tree, dict):
        return {k: _unflatten_cast(v) for k, v in tree.items()}
    return jnp.asarray(tree)
