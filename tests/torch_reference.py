"""Independent PyTorch re-statement of the reference model math, used only
as a golden fixture for parity tests.

This is NOT framework code and NOT a copy of the reference: it is a compact
executable specification of the behavior documented in SURVEY.md §2
(``/root/reference/audiomae/models_vit.py``, ``/root/reference/ast/src/
models/ast_models.py``), written so the JAX implementation can be checked
against torch numerics (conv, layernorm, erf-GELU, softmax, topk ordering)
without the reference's timm dependency.
"""

import math

import torch
import torch.nn as nn


class RefAttention(nn.Module):
    def __init__(self, dim, num_heads, num_extra_tokens, importance):
        super().__init__()
        self.h = num_heads
        self.e = num_extra_tokens
        self.importance = importance
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, keep_rate):
        b, n, c = x.shape
        qkv = (
            self.qkv(x)
            .reshape(b, n, 3, self.h, c // self.h)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b, n, c)
        x = self.proj(x)

        topk_idx = None
        score = None
        num_left = math.ceil(keep_rate * (n - self.e))
        if keep_rate < 1.0:
            if self.importance == "patch_mean":
                score = attn[:, :, self.e :, self.e :].mean(dim=(1, 2))
            else:  # 'cls'
                score = attn[:, :, 0, self.e :].mean(dim=1)
            _, topk_idx = torch.topk(
                score, num_left, dim=1, largest=True, sorted=True
            )
        return x, topk_idx, score


class RefMlp(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.fc1 = nn.Linear(dim, dim * 4)
        self.fc2 = nn.Linear(dim * 4, dim)

    def forward(self, x):
        return self.fc2(torch.nn.functional.gelu(self.fc1(x)))


class RefPatchEmbed(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = nn.Conv2d(1, dim, kernel_size=16, stride=16)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


class RefBlock(nn.Module):
    def __init__(self, dim, num_heads, num_extra_tokens, importance):
        super().__init__()
        self.e = num_extra_tokens
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = RefAttention(dim, num_heads, num_extra_tokens, importance)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = RefMlp(dim)

    def forward(self, x, keep_rate):
        a, topk_idx, score = self.attn(self.norm1(x), keep_rate)
        x = x + a
        if topk_idx is not None:
            idx = topk_idx.unsqueeze(-1).expand(-1, -1, x.shape[-1])
            kept = torch.gather(x[:, self.e :], dim=1, index=idx)
            x = torch.cat([x[:, : self.e], kept], dim=1)
        x = x + self.mlp(self.norm2(x))
        return x, topk_idx, score


class RefModel(nn.Module):
    """Dense/pruned eval-mode forward for either family."""

    def __init__(
        self,
        dim=192,
        depth=4,
        num_heads=3,
        num_classes=10,
        grid=(8, 8),
        num_extra_tokens=1,
        importance="patch_mean",
        pooling="gap_fcnorm",
        use_final_norm=False,
    ):
        super().__init__()
        self.e = num_extra_tokens
        self.pooling = pooling
        self.grid = grid
        p = grid[0] * grid[1]
        self.patch_embed = RefPatchEmbed(dim)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        if num_extra_tokens == 2:
            self.dist_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, p + num_extra_tokens, dim))
        self.blocks = nn.ModuleList(
            [
                RefBlock(dim, num_heads, num_extra_tokens, importance)
                for _ in range(depth)
            ]
        )
        self.use_final_norm = use_final_norm
        if use_final_norm:
            self.norm = nn.LayerNorm(dim, eps=1e-6)
        if pooling == "gap_fcnorm":
            self.fc_norm = nn.LayerNorm(dim, eps=1e-6)
            self.head = nn.Linear(dim, num_classes)
        else:
            self.mlp_head = nn.Sequential(
                nn.LayerNorm(dim, eps=1e-6), nn.Linear(dim, num_classes)
            )

    def forward(self, x, keep_rates, collect=False):
        b = x.shape[0]
        t = self.patch_embed(x)
        if self.e == 1:
            extras = self.cls_token.expand(b, -1, -1)
        else:
            extras = torch.cat(
                [
                    self.cls_token.expand(b, -1, -1),
                    self.dist_token.expand(b, -1, -1),
                ],
                dim=1,
            )
        x = torch.cat([extras, t], dim=1) + self.pos_embed
        features = {}
        for i, blk in enumerate(self.blocks):
            x, topk_idx, score = blk(x, keep_rates[i])
            if collect:
                if score is not None:
                    features[f"block-{i}.attn_score"] = score
                if topk_idx is not None:
                    features[f"block-{i}.topk_idx"] = topk_idx
        if self.use_final_norm:
            x = self.norm(x)
        if self.pooling == "gap_fcnorm":
            feat = x[:, self.e :].mean(dim=1)
            out = self.head(self.fc_norm(feat))
        else:
            out = self.mlp_head((x[:, 0] + x[:, 1]) / 2)
        if collect:
            return out, features
        return out
