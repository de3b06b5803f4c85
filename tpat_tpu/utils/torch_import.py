"""Importers for the reference's PyTorch ``.pth`` checkpoint layouts.

Two layouts exist in the reference:

- **AudioMAE**: ``{'model': state_dict, 'optimizer': ..., 'epoch': ...,
  'scaler': ..., 'args': ...}`` (``/root/reference/audiomae/util/misc.py:
  306-312``); the pretrained AudioSet checkpoint has a (1, 513, 768)
  pos-embed over an (8, 64)-viewed grid that must be time-cropped for
  shorter targets, and head/fc_norm may be absent or shape-mismatched
  (``main_finetune.py:384-426``).

- **AST**: a bare ``nn.DataParallel`` state_dict with ``module.``-prefixed
  keys; backbone under ``module.v.*``, classifier under ``module.mlp_head.
  {0,1}.*`` (``ast/src/traintest.py:247``, ``ast_models.py:333-381``);
  pos-embed is (1, 514, 768) over an (8, 64) grid, center-cropped in time.

Weight-layout conversions (torch -> flax):
  Linear  weight (out, in)      -> kernel (in, out)      [transpose]
  Conv2d  weight (O, I, kh, kw) -> kernel (kh, kw, I, O) [transpose]
  LayerNorm weight/bias          -> scale/bias
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Tuple

import numpy as np

from tpat_tpu.config import ViTConfig
from tpat_tpu.models import pos_embed as pe


def _np(t) -> np.ndarray:
    """torch.Tensor -> float32 numpy without importing torch at module
    scope (torch is only needed when actually reading a .pth)."""
    if isinstance(t, np.ndarray):
        return np.asarray(t, dtype=np.float32)
    return t.detach().cpu().float().numpy()


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a reference .pth and return a flat {key: np.ndarray} dict.

    Unwraps the AudioMAE ``{'model': ...}`` envelope and strips
    DataParallel ``module.`` prefixes.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k.removeprefix("module.")] = _np(v)
    return out


# ---------------------------------------------------------------------------
# state-dict -> flax params
# ---------------------------------------------------------------------------


def _linear(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _layernorm(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _conv(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    w = sd[f"{prefix}.weight"]  # (O, I, kh, kw)
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _block(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    return {
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
        "attn": {
            "qkv": _linear(sd, f"{prefix}.attn.qkv"),
            "proj": _linear(sd, f"{prefix}.attn.proj"),
        },
        "mlp": {
            "fc1": _linear(sd, f"{prefix}.mlp.fc1"),
            "fc2": _linear(sd, f"{prefix}.mlp.fc2"),
        },
    }


def _depth_of(sd: Mapping[str, np.ndarray], stem: str) -> int:
    ids = {
        int(m.group(1))
        for k in sd
        if (m := re.match(rf"{re.escape(stem)}\.(\d+)\.", k))
    }
    return max(ids) + 1 if ids else 0


def audiomae_params_from_state_dict(
    sd: Mapping[str, np.ndarray],
    cfg: ViTConfig,
    ckpt_grid: Tuple[int, int] = (8, 64),
) -> Dict:
    """AudioMAE state_dict -> flax param tree for ``AudioViT``.

    Applies the reference's checkpoint surgery (main_finetune.py:384-426):
    time-crop of the pos-embed grid, head drop on class-count mismatch
    (callers overlay freshly-initialized head/fc_norm for missing keys).
    Convolutional patch-embed weights pass through untouched; pretrain
    checkpoints that carry RGB kernels should be summed to 1 channel first
    (``util/pos_embed.py:162-167``).
    """
    depth = _depth_of(sd, "blocks")
    params: Dict = {
        "cls_token": sd["cls_token"],
        "patch_embed": {"proj": _conv(sd, "patch_embed.proj")},
    }
    for i in range(depth):
        params[f"blocks_{i}"] = _block(sd, f"blocks.{i}")

    if "pos_embed" in sd:
        pos = sd["pos_embed"]
        new_grid = (cfg.grid_f, cfg.grid_t)  # reference views the 512-token
        # AudioSet grid as (8, 64) = (freq, time) in the crop surgery
        # (main_finetune.py:408-409) regardless of patch flatten order.
        pos = pe.crop_time_audio_pos_embed(
            pos, ckpt_grid, new_grid, num_extra_tokens=1
        )
        expected = cfg.num_patches + 1
        if pos.shape[1] != expected:
            raise ValueError(
                f"pos_embed rows {pos.shape[1]} != expected {expected}; "
                f"check target_length ({cfg.target_length})"
            )
        params["pos_embed"] = pos

    if "fc_norm.weight" in sd:
        params["fc_norm"] = _layernorm(sd, "fc_norm")
    if "head.weight" in sd and sd["head.weight"].shape[0] == cfg.num_classes:
        params["head"] = _linear(sd, "head")
    return params


def ast_params_from_state_dict(
    sd: Mapping[str, np.ndarray],
    cfg: ViTConfig,
) -> Dict:
    """AST (DataParallel, ``v.``-prefixed) state_dict -> flax params.

    Replicates the AudioSet-pretrain surgery (ast_models.py:353-381):
    center time-crop of the (8, 64) pos grid to the target t_dim; the
    mlp_head is kept only if the class count matches.
    """
    v = {k.removeprefix("v."): val for k, val in sd.items() if k.startswith("v.")}
    depth = _depth_of(v, "blocks")
    params: Dict = {
        "cls_token": v["cls_token"],
        "dist_token": v["dist_token"],
        "patch_embed": {"proj": _conv(v, "patch_embed.proj")},
        "norm": _layernorm(v, "norm"),
    }
    for i in range(depth):
        params[f"blocks_{i}"] = _block(v, f"blocks.{i}")

    pos = v["pos_embed"]
    t_dim = cfg.target_length // cfg.patch_size
    if pos.shape[1] - 2 != cfg.num_patches:
        pos = pe.center_crop_time_ast_pos_embed(pos, t_dim, num_extra_tokens=2)
    if pos.shape[1] != cfg.num_patches + 2:
        raise ValueError(
            f"AST pos_embed rows {pos.shape[1]} != {cfg.num_patches + 2}"
        )
    params["pos_embed"] = pos

    if (
        "mlp_head.1.weight" in sd
        and sd["mlp_head.1.weight"].shape[0] == cfg.num_classes
    ):
        params["mlp_head_norm"] = _layernorm(sd, "mlp_head.0")
        params["mlp_head"] = _linear(sd, "mlp_head.1")
    return params


def deit_params_from_state_dict(
    sd: Mapping[str, np.ndarray],
    cfg: ViTConfig,
) -> Dict:
    """timm ``vit_deit_base_distilled_patch16_384`` state_dict -> flax
    params for the AST trunk — the ImageNet-pretrain construction branch
    (``ast_models.py:273-325``, ``audioset_pretrain=False,
    imagenet_pretrain=True``):

    - patch-embed: the RGB conv kernel is summed to 1 input channel
      (``ast_models.py:301-305``), bias kept;
    - pos-embed: the square DeiT grid (24x24 for base384) is adapted to
      (f_dim, t_dim) by the center-cut / torch-BILINEAR surgery
      (``pos_embed.deit_img2audio_pos_embed``);
    - the DeiT classification heads (``head``/``head_dist``) are discarded
      — AST always constructs a fresh LayerNorm+Linear ``mlp_head``
      (``ast_models.py:292``), so this importer never emits one;
    - trunk blocks, ``norm``, ``cls_token``/``dist_token`` pass through.
    """
    v = {k.removeprefix("v."): val for k, val in sd.items()}
    depth = _depth_of(v, "blocks")
    conv = _conv(v, "patch_embed.proj")
    if conv["kernel"].shape[2] != 1:
        conv["kernel"] = pe.sum_rgb_patch_embed(conv["kernel"])
    params: Dict = {
        "cls_token": v["cls_token"],
        "dist_token": v["dist_token"],
        "patch_embed": {"proj": conv},
        "norm": _layernorm(v, "norm"),
    }
    for i in range(depth):
        params[f"blocks_{i}"] = _block(v, f"blocks.{i}")

    pos = pe.deit_img2audio_pos_embed(
        v["pos_embed"], cfg.grid_f, cfg.grid_t, num_extra_tokens=2
    )
    if pos.shape[1] != cfg.num_patches + 2:
        raise ValueError(
            f"DeiT pos_embed rows {pos.shape[1]} != {cfg.num_patches + 2}"
        )
    params["pos_embed"] = pos
    return params


def _swin_v2_cr_block(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    """timm ``SwinTransformerV2CrBlock`` state_dict -> flax ``SwinBlock``
    params.  Key layout per timm ``swin_transformer_v2_cr.py`` (the class the
    reference constructs at ``models_mae.py:93-106``): ``attn.{qkv,proj}``
    linears, per-head ``attn.logit_scale``, log-CPB meta-MLP
    ``attn.meta_mlp.{fc1,fc2}``, post-norm ``norm1/norm2``, ``mlp.{fc1,fc2}``.
    Non-persistent buffers (``relative_coordinates_log``, ``attn_mask``) are
    recomputed statically and ignored here."""
    return {
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
        "attn": {
            "qkv": _linear(sd, f"{prefix}.attn.qkv"),
            "proj": _linear(sd, f"{prefix}.attn.proj"),
            "logit_scale": sd[f"{prefix}.attn.logit_scale"],
            "meta_fc1": _linear(sd, f"{prefix}.attn.meta_mlp.fc1"),
            "meta_fc2": _linear(sd, f"{prefix}.attn.meta_mlp.fc2"),
        },
        "mlp": {
            "fc1": _linear(sd, f"{prefix}.mlp.fc1"),
            "fc2": _linear(sd, f"{prefix}.mlp.fc2"),
        },
    }


def mae_params_from_state_dict(sd: Mapping[str, np.ndarray]) -> Dict:
    """Full MAE (encoder + decoder) state_dict -> flax params for
    ``MaskedAutoencoderViT``.

    Covers the reference pretraining model ``models_mae.py:25-464``:
    encoder (cls/pos/patch-embed/blocks/norm), ``decoder_embed``,
    ``mask_token``, ``decoder_pos_embed``, swin_v2_cr decoder blocks
    (``decoder_mode == 1``) or plain transformer blocks (mode 0),
    ``decoder_norm``, ``decoder_pred``.  No surgery — geometry must match
    (pretraining resumes at the checkpoint's own grid)."""
    depth = _depth_of(sd, "blocks")
    dec_depth = _depth_of(sd, "decoder_blocks")
    params: Dict = {
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "patch_embed": {"proj": _conv(sd, "patch_embed.proj")},
        "norm": _layernorm(sd, "norm"),
        "decoder_embed": _linear(sd, "decoder_embed"),
        "mask_token": sd["mask_token"],
        "decoder_pos_embed": sd["decoder_pos_embed"],
        "decoder_norm": _layernorm(sd, "decoder_norm"),
        "decoder_pred": _linear(sd, "decoder_pred"),
    }
    for i in range(depth):
        params[f"blocks_{i}"] = _block(sd, f"blocks.{i}")
    swin = "decoder_blocks.0.attn.logit_scale" in sd
    for i in range(dec_depth):
        params[f"decoder_blocks_{i}"] = (
            _swin_v2_cr_block(sd, f"decoder_blocks.{i}")
            if swin
            else _block(sd, f"decoder_blocks.{i}")
        )
    return params


def overlay_params(init_params: Dict, imported: Dict) -> Dict:
    """Overlay imported leaves onto a freshly-initialized tree (strict=False
    semantics of main_finetune.py:414: imported keys win, missing keys keep
    their initialization). Shapes must match where both exist."""
    import jax

    def merge(base, over):
        if not isinstance(over, dict):
            if hasattr(base, "shape") and tuple(base.shape) != tuple(over.shape):
                raise ValueError(
                    f"shape mismatch: init {base.shape} vs ckpt {over.shape}"
                )
            return np.asarray(over, dtype=np.float32)
        out = dict(base)
        for k, v in over.items():
            if k not in base:
                raise KeyError(f"imported key {k!r} not in model params")
            out[k] = merge(base[k], v)
        return out

    return merge(jax.tree_util.tree_map(lambda x: x, init_params), imported)
