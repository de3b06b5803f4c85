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


class _RefMetaMlp(nn.Module):
    """2-layer ReLU log-CPB meta-MLP with timm's ``fc1``/``fc2`` key names
    (``swin_transformer_v2_cr.py`` WindowMultiHeadAttention.meta_mlp)."""

    def __init__(self, hidden, heads):
        super().__init__()
        self.fc1 = nn.Linear(2, hidden)
        self.fc2 = nn.Linear(hidden, heads)

    def forward(self, x):
        return self.fc2(torch.relu(self.fc1(x)))


class RefWindowAttentionV2(nn.Module):
    """Restatement of timm swin_v2_cr ``WindowMultiHeadAttention`` math:
    cosine attention scaled by a clamped learned per-head logit scale, plus
    a continuous relative-position bias from the meta-MLP over log-spaced
    pairwise window coordinates."""

    def __init__(self, dim, num_heads, window, meta_hidden=384):
        super().__init__()
        self.h = num_heads
        self.window = window
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim, bias=True)
        self.meta_mlp = _RefMetaMlp(meta_hidden, num_heads)
        self.logit_scale = nn.Parameter(torch.log(10 * torch.ones(num_heads)))
        wh, ww = window
        coords = torch.stack(
            torch.meshgrid(torch.arange(wh), torch.arange(ww), indexing="ij")
        ).flatten(1)
        rel = (coords[:, :, None] - coords[:, None, :]).permute(1, 2, 0)
        rel = rel.reshape(-1, 2).float()
        self.register_buffer(
            "relative_coordinates_log",
            torch.sign(rel) * torch.log1p(rel.abs()),
            persistent=False,
        )

    def forward(self, x, mask=None):
        bw, n, c = x.shape
        qkv = (
            self.qkv(x)
            .view(bw, n, 3, self.h, c // self.h)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv.unbind(0)
        attn = torch.nn.functional.normalize(
            q, dim=-1
        ) @ torch.nn.functional.normalize(k, dim=-1).transpose(-2, -1)
        logit_scale = torch.clamp(
            self.logit_scale.reshape(1, self.h, 1, 1), max=math.log(1.0 / 0.01)
        ).exp()
        attn = attn * logit_scale
        bias = (
            self.meta_mlp(self.relative_coordinates_log)
            .transpose(1, 0)
            .reshape(self.h, n, n)
        )
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(bw // nw, nw, self.h, n, n)
            attn = attn + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.h, n, n)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(bw, n, c)
        return self.proj(x)


class RefSwinV2CrBlock(nn.Module):
    """Restatement of timm ``SwinTransformerV2CrBlock`` (the class the
    reference MAE decoder constructs, ``models_mae.py:93-106``): shifted
    windows with region masking and V2 res-post-norm residuals."""

    def __init__(self, dim, num_heads, feat_size, window, shift):
        super().__init__()
        self.feat_size = feat_size
        self.window = window
        self.shift = shift
        self.attn = RefWindowAttentionV2(dim, num_heads, window)
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = RefMlp(dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.register_buffer(
            "attn_mask", self._make_attention_mask(), persistent=False
        )

    def _make_attention_mask(self):
        st, sf = self.shift
        if not (st or sf):
            return None
        t, f = self.feat_size
        wh, ww = self.window
        img = torch.zeros(t, f)
        cnt = 0
        for hsl in (slice(0, -wh), slice(-wh, -st), slice(-st, None)):
            for wsl in (slice(0, -ww), slice(-ww, -sf), slice(-sf, None)):
                img[hsl, wsl] = cnt
                cnt += 1
        win = (
            img.view(t // wh, wh, f // ww, ww)
            .permute(0, 2, 1, 3)
            .reshape(-1, wh * ww)
        )
        diff = win.unsqueeze(1) - win.unsqueeze(2)
        return diff.masked_fill(diff != 0, -100.0)

    def _shifted_window_attn(self, x):
        b, l, c = x.shape
        t, f = self.feat_size
        wh, ww = self.window
        st, sf = self.shift
        x = x.view(b, t, f, c)
        if st or sf:
            x = torch.roll(x, shifts=(-st, -sf), dims=(1, 2))
        x = (
            x.view(b, t // wh, wh, f // ww, ww, c)
            .permute(0, 1, 3, 2, 4, 5)
            .reshape(-1, wh * ww, c)
        )
        x = self.attn(x, mask=self.attn_mask)
        x = (
            x.view(b, t // wh, f // ww, wh, ww, c)
            .permute(0, 1, 3, 2, 4, 5)
            .reshape(b, t, f, c)
        )
        if st or sf:
            x = torch.roll(x, shifts=(st, sf), dims=(1, 2))
        return x.reshape(b, l, c)

    def forward(self, x):
        x = x + self.norm1(self._shifted_window_attn(x))
        x = x + self.norm2(self.mlp(x))
        return x


class RefMAEDecoder(nn.Module):
    """Restatement of the reference MAE decoder path (``models_mae.py:
    357-404``): decoder_embed -> mask-token unshuffle -> +pos-embed ->
    drop CLS -> swin blocks -> norm -> pred.  Key names match the reference
    model's state_dict so the import layout can be checked end to end."""

    def __init__(
        self,
        dim_enc,
        dim_dec,
        depth,
        num_heads,
        feat_size,
        window,
        pred_dim,
    ):
        super().__init__()
        p = feat_size[0] * feat_size[1]
        self.decoder_embed = nn.Linear(dim_enc, dim_dec)
        self.mask_token = nn.Parameter(torch.zeros(1, 1, dim_dec))
        self.decoder_pos_embed = nn.Parameter(
            torch.zeros(1, p + 1, dim_dec), requires_grad=False
        )
        self.decoder_blocks = nn.ModuleList(
            [
                RefSwinV2CrBlock(
                    dim_dec,
                    num_heads,
                    feat_size,
                    window,
                    (0, 0) if i % 2 == 0 else (2, 0),
                )
                for i in range(depth)
            ]
        )
        self.decoder_norm = nn.LayerNorm(dim_dec, eps=1e-6)
        self.decoder_pred = nn.Linear(dim_dec, pred_dim)

    def forward(self, latent, ids_restore):
        x = self.decoder_embed(latent)
        n_mask = ids_restore.shape[1] + 1 - x.shape[1]
        mask_tokens = self.mask_token.repeat(x.shape[0], n_mask, 1)
        x_ = torch.cat([x[:, 1:, :], mask_tokens], dim=1)
        x_ = torch.gather(
            x_,
            dim=1,
            index=ids_restore.unsqueeze(-1).repeat(1, 1, x.shape[2]),
        )
        x = torch.cat([x[:, :1, :], x_], dim=1)
        x = x + self.decoder_pos_embed
        x = x[:, 1:, :]
        for blk in self.decoder_blocks:
            x = blk(x)
        return self.decoder_pred(self.decoder_norm(x))


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
