"""Analysis primitives behind the extract_stats CLI — numpy re-derivations
of ``/root/reference/audiomae/extract_stats.py`` and
``util/token_reduction_utils.py``:

- per-patch mel statistics (mean / std, torch-ddof-1)
- KMeans(5) intensity clustering with ascending remap by cluster min
- Kendall-tau by explicit concordant/discordant pair counting with
  upper-triangular masking (ties count as concordant, matching
  ``extract_stats.py:222-223``)
- topk-index composition across pruning stages (``get_melspec_idx``)
- patch masking for visualization (``util/misc.py:422-437``)
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def patch_stats_np(mel: np.ndarray, patch: int = 16, kind: str = "mean") -> np.ndarray:
    """(B, 1, H, W) -> (B, h*w) per-patch mean/std, row-major patch order
    (einops 'b c (h p) (w q) -> b (c p q) (h w)')."""
    b, c, hh, ww = mel.shape
    gh, gw = hh // patch, ww // patch
    t = mel.reshape(b, c, gh, patch, gw, patch)
    t = t.transpose(0, 1, 3, 5, 2, 4).reshape(b, c * patch * patch, gh * gw)
    if kind == "mean":
        return t.mean(axis=1)
    if kind == "std":
        return t.std(axis=1, ddof=1)
    raise ValueError(kind)


def kmeans_rank(
    stat: np.ndarray, n_clusters: int = 5, random_state: int = 123
) -> Tuple[np.ndarray, List[Tuple[float, float, float]]]:
    """KMeans over the flattened per-patch stat, cluster ids remapped so
    that 0 = lowest-intensity cluster (extract_stats.py:86-88, 159-169).

    Returns (rank (B, P) float array, cluster info [(min, max, frac)] in
    ascending order).
    """
    from sklearn.cluster import KMeans

    km = KMeans(n_clusters=n_clusters, random_state=random_state)
    labels = km.fit_predict(stat.reshape(-1, 1)).reshape(stat.shape)
    info = []
    for cid in range(n_clusters):
        vals = stat[labels == cid]
        if vals.size == 0:
            # fewer distinct values than clusters (e.g. a constant stat):
            # sklearn leaves the centroid memberless — skip it
            continue
        info.append((cid, float(vals.min()), float(vals.max()), vals.size))
    info.sort(key=lambda x: x[1])
    remap = {old: new for new, (old, *_rest) in enumerate(info)}
    out = np.zeros_like(labels, dtype=np.float32)
    for old, new in remap.items():
        out[labels == old] = new
    total = stat.size
    ascending = [(mn, mx, size / total) for (_cid, mn, mx, size) in info]
    return out, ascending


def kendall_tau_pairs(attn_score: np.ndarray, rank: np.ndarray) -> float:
    """Kendall coefficient over a batch: concordant/discordant pair count
    with ties-as-concordant and upper-triangular mask
    (extract_stats.py:205-233).  attn_score, rank: (B, N)."""
    b, n = attn_score.shape
    concordant = 0
    discordant = 0
    iu = np.triu_indices(n, k=1)
    for i in range(b):
        ad = attn_score[i][None, :] - attn_score[i][:, None]
        rd = rank[i][None, :] - rank[i][:, None]
        prod = (ad * rd)[iu]
        concordant += int((prod >= 0).sum())
        discordant += int((prod < 0).sum())
    num_pairs = (n * (n - 1) // 2) * b
    tau = (concordant - discordant) / num_pairs
    assert -1.0 <= tau <= 1.0
    return tau


def compose_melspec_idx(idx_stages: List[np.ndarray]) -> List[np.ndarray]:
    """Cumulative kept-token indices per pruning stage w.r.t. the original
    patch grid (token_reduction_utils.py:8-19): stage i's indices address
    stage i-1's surviving tokens, so each stage gathers through the
    previous composition."""
    out = [np.array(idx_stages[0])]
    for idx in idx_stages[1:]:
        out.append(np.take_along_axis(out[-1], np.array(idx), axis=1))
    return out


def apply_patch_mask(
    img: np.ndarray, idx: np.ndarray, patch_size: int = 16
) -> np.ndarray:
    """Zero every 16x16 patch not in idx (util/misc.py:422-437).

    img: (B, C, H, W); idx: (B, T) patch indices into the (h, w) grid.
    """
    b, c, hh, ww = img.shape
    gh, gw = hh // patch_size, ww // patch_size
    t = img.reshape(b, c, gh, patch_size, gw, patch_size)
    t = t.transpose(0, 1, 3, 5, 2, 4).reshape(
        b, c * patch_size * patch_size, gh * gw
    )
    out = np.zeros_like(t)
    ii = np.arange(b)[:, None]
    out[ii, :, idx] = t[ii, :, idx]
    out = out.reshape(b, c, patch_size, patch_size, gh, gw)
    out = out.transpose(0, 1, 4, 2, 5, 3).reshape(b, c, hh, ww)
    return out


def colorize_mel(mel: np.ndarray) -> np.ndarray:
    """(B, T, F) raw mel -> (B, 3, T, F) viridis RGB like
    extract_stats.py:45-48 (matplotlib colormap over raw values)."""
    from matplotlib.pyplot import get_cmap

    cmap = get_cmap("viridis")
    rgb = cmap(mel)[..., :3]  # (B, T, F, 3)
    return rgb.transpose(0, 3, 1, 2).astype(np.float32)


def save_melspec_batch(
    batch: np.ndarray, path: str, file_name: str, start_idx: int = 0,
    labels: Optional[List[str]] = None,
):
    """Rotate 90 CCW and save each (3, H, W) image
    (util/misc.py:410-419)."""
    import os

    import matplotlib.pyplot as plt

    os.makedirs(path, exist_ok=True)
    for i, img in enumerate(batch):
        img = np.rot90(img.transpose(1, 2, 0), k=1)  # (W, H, 3)
        label = labels[i] if labels is not None else ""
        fname = file_name.format(start_idx + i, label)
        plt.imsave(os.path.join(path, fname), np.clip(img, 0, 1))
