"""Export flax params back to the reference's PyTorch ``.pth`` layouts —
the inverse of ``torch_import`` — so models finetuned here remain
consumable by the reference's own tooling (its eval drivers, its
``extract_stats.py``, its result reducers).

AudioMAE layout: ``{'model': state_dict, 'epoch': ...}``
(``util/misc.py:306-312``); AST layout: DataParallel state_dict with
``module.v.*`` backbone keys and ``module.mlp_head.{0,1}.*``
(``traintest.py:247``).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _t(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32).T)


def _linear(dst: Dict, prefix: str, p: Mapping):
    dst[f"{prefix}.weight"] = _t(p["kernel"])
    if "bias" in p:
        dst[f"{prefix}.bias"] = np.asarray(p["bias"], dtype=np.float32)


def _layernorm(dst: Dict, prefix: str, p: Mapping):
    dst[f"{prefix}.weight"] = np.asarray(p["scale"], dtype=np.float32)
    dst[f"{prefix}.bias"] = np.asarray(p["bias"], dtype=np.float32)


def _conv(dst: Dict, prefix: str, p: Mapping):
    k = np.asarray(p["kernel"], dtype=np.float32)  # (kh, kw, I, O)
    dst[f"{prefix}.weight"] = np.ascontiguousarray(k.transpose(3, 2, 0, 1))
    if "bias" in p:
        dst[f"{prefix}.bias"] = np.asarray(p["bias"], dtype=np.float32)


def _block(dst: Dict, prefix: str, p: Mapping):
    _layernorm(dst, f"{prefix}.norm1", p["norm1"])
    _layernorm(dst, f"{prefix}.norm2", p["norm2"])
    _linear(dst, f"{prefix}.attn.qkv", p["attn"]["qkv"])
    _linear(dst, f"{prefix}.attn.proj", p["attn"]["proj"])
    _linear(dst, f"{prefix}.mlp.fc1", p["mlp"]["fc1"])
    _linear(dst, f"{prefix}.mlp.fc2", p["mlp"]["fc2"])


def audiomae_state_dict(params: Mapping) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {
        "cls_token": np.asarray(params["cls_token"], dtype=np.float32),
        "pos_embed": np.asarray(params["pos_embed"], dtype=np.float32),
    }
    _conv(sd, "patch_embed.proj", params["patch_embed"]["proj"])
    for name, p in params.items():
        if name.startswith("blocks_"):
            _block(sd, f"blocks.{int(name.split('_')[1])}", p)
    if "fc_norm" in params:
        _layernorm(sd, "fc_norm", params["fc_norm"])
    if "head" in params:
        _linear(sd, "head", params["head"])
    return sd


def ast_state_dict(params: Mapping) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    v: Dict[str, np.ndarray] = {
        "cls_token": np.asarray(params["cls_token"], dtype=np.float32),
        "dist_token": np.asarray(params["dist_token"], dtype=np.float32),
        "pos_embed": np.asarray(params["pos_embed"], dtype=np.float32),
    }
    _conv(v, "patch_embed.proj", params["patch_embed"]["proj"])
    for name, p in params.items():
        if name.startswith("blocks_"):
            _block(v, f"blocks.{int(name.split('_')[1])}", p)
    _layernorm(v, "norm", params["norm"])
    for k, val in v.items():
        sd[f"module.v.{k}"] = val
    _layernorm(sd, "module.mlp_head.0", params["mlp_head_norm"])
    _linear(sd, "module.mlp_head.1", params["mlp_head"])
    return sd


def _swin_v2_cr_block(dst: Dict, prefix: str, p: Mapping):
    """Inverse of torch_import._swin_v2_cr_block: flax SwinBlock params ->
    timm SwinTransformerV2CrBlock key layout."""
    _layernorm(dst, f"{prefix}.norm1", p["norm1"])
    _layernorm(dst, f"{prefix}.norm2", p["norm2"])
    _linear(dst, f"{prefix}.attn.qkv", p["attn"]["qkv"])
    _linear(dst, f"{prefix}.attn.proj", p["attn"]["proj"])
    dst[f"{prefix}.attn.logit_scale"] = np.asarray(
        p["attn"]["logit_scale"], dtype=np.float32
    )
    _linear(dst, f"{prefix}.attn.meta_mlp.fc1", p["attn"]["meta_fc1"])
    _linear(dst, f"{prefix}.attn.meta_mlp.fc2", p["attn"]["meta_fc2"])
    _linear(dst, f"{prefix}.mlp.fc1", p["mlp"]["fc1"])
    _linear(dst, f"{prefix}.mlp.fc2", p["mlp"]["fc2"])


def mae_state_dict(params: Mapping) -> Dict[str, np.ndarray]:
    """Full MAE (encoder + decoder) flax params -> the reference pretraining
    model's state_dict layout (``models_mae.py:25-464``) — the inverse of
    ``torch_import.mae_params_from_state_dict``, so a model pretrained here
    can seed the reference's finetune surgery (main_finetune.py:384-426)."""
    sd: Dict[str, np.ndarray] = {
        "cls_token": np.asarray(params["cls_token"], dtype=np.float32),
        "pos_embed": np.asarray(params["pos_embed"], dtype=np.float32),
        "mask_token": np.asarray(params["mask_token"], dtype=np.float32),
        "decoder_pos_embed": np.asarray(
            params["decoder_pos_embed"], dtype=np.float32
        ),
    }
    _conv(sd, "patch_embed.proj", params["patch_embed"]["proj"])
    _layernorm(sd, "norm", params["norm"])
    _linear(sd, "decoder_embed", params["decoder_embed"])
    _layernorm(sd, "decoder_norm", params["decoder_norm"])
    _linear(sd, "decoder_pred", params["decoder_pred"])
    for name, p in params.items():
        if name.startswith("blocks_"):
            _block(sd, f"blocks.{int(name.split('_')[1])}", p)
        elif name.startswith("decoder_blocks_"):
            i = int(name.rsplit("_", 1)[1])
            if "logit_scale" in p["attn"]:
                _swin_v2_cr_block(sd, f"decoder_blocks.{i}", p)
            else:
                _block(sd, f"decoder_blocks.{i}", p)
    return sd


def save_pth(path: str, params: Mapping, flavor: str = "audiomae", epoch: int = 0):
    """Write a reference-compatible .pth (requires torch)."""
    import torch

    if flavor == "audiomae":
        sd = {k: torch.from_numpy(np.array(v)) for k, v in
              audiomae_state_dict(params).items()}
        torch.save({"model": sd, "epoch": epoch}, path)
    elif flavor == "ast":
        sd = {k: torch.from_numpy(np.array(v)) for k, v in
              ast_state_dict(params).items()}
        torch.save(sd, path)
    elif flavor == "mae":
        sd = {k: torch.from_numpy(np.array(v)) for k, v in
              mae_state_dict(params).items()}
        torch.save({"model": sd, "epoch": epoch}, path)
    else:
        raise ValueError(flavor)
    return path
