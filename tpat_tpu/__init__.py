"""tpat_tpu — TPU-native token-pruning audio transformer framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`andylee-24/token-pruning-audio-transformer` (EViT-style TopK token pruning
grafted into AudioMAE and AST audio transformers), built TPU-first:

- Shape-static token pruning via ``jax.lax.top_k`` + gather so XLA compiles
  a single static graph per (dataset, keep-rate) configuration.
- A masked-attention (DynamicViT-style) training path so the cosine
  keep-rate anneal never triggers recompilation.
- Kaldi-compatible log-mel frontend (host numpy reference + batched XLA/TPU
  kernel) replacing torchaudio's native fbank.
- SPMD data parallelism via ``jax.sharding.Mesh`` + ``jit`` sharding
  constraints (psum/all_gather over ICI) replacing NCCL DDP.
- PyTorch checkpoint importers for the reference's ``.pth`` layouts.
"""

__version__ = "0.1.0"

from tpat_tpu.config import (  # noqa: F401
    DATASET_PRESETS,
    DataConfig,
    TrainConfig,
    ViTConfig,
    ast_vit_base,
    audiomae_vit_base,
    audiomae_vit_huge,
    audiomae_vit_large,
    audiomae_vit_small,
    audiomae_vit_tiny,
)
