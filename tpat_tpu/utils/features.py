"""Feature-extraction subsystem: per-batch feature dicts written to disk
with the reference's file-naming contract ``{key}.{batch_idx:04d}.pth``
(``/root/reference/audiomae/engine_finetune.py:189-194``), consumed by a
glob+concat combiner (``util/aggregate_features.py:7-39``).

Values are saved with ``torch.save`` when torch is available (so the
reference's analysis scripts can read them unmodified); otherwise ``.npy``
with the same stem.  ``combine_feature_dict`` reads either.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Union

import numpy as np


def _have_torch() -> bool:
    try:
        import torch  # noqa: F401

        return True
    except ImportError:
        return False


class FeatureWriter:
    def __init__(self, path: str, use_torch: bool = True):
        os.makedirs(path, exist_ok=True)
        self.path = path
        self.use_torch = use_torch and _have_torch()

    def __call__(self, feature_dict: Dict, batch_idx: int):
        for key, value in feature_dict.items():
            stem = os.path.join(self.path, f"{key}.{batch_idx:04d}")
            if self.use_torch:
                import torch

                if hasattr(value, "shape"):
                    value = torch.from_numpy(np.asarray(value))
                torch.save(value, stem + ".pth")
            else:
                np.save(stem + ".npy", np.asarray(value, dtype=object)
                        if isinstance(value, list) else np.asarray(value))


def _load_one(fname: str):
    if fname.endswith(".pth"):
        import torch

        v = torch.load(fname, map_location="cpu", weights_only=False)
        if hasattr(v, "numpy"):
            return v.numpy()
        return v
    v = np.load(fname, allow_pickle=True)
    return v


def combine_feature_dict(path: str, key: str) -> Union[np.ndarray, List]:
    """Glob ``{key}.*.pth|npy`` in order and concatenate along axis 0
    (lists of labels concatenate as lists) — aggregate_features.py:7-39."""
    files = sorted(
        glob.glob(os.path.join(path, f"{key}.*.pth"))
        + glob.glob(os.path.join(path, f"{key}.*.npy"))
    )
    if not files:
        return None  # the analysis loops key on this (extract_stats.py:237)
    parts = [_load_one(f) for f in files]
    if isinstance(parts[0], list):
        out: List = []
        for p in parts:
            out.extend(list(p))
        return out
    if parts[0].dtype == object:  # npy-saved label list
        out = []
        for p in parts:
            out.extend(list(p))
        return out
    return np.concatenate(parts, axis=0)
