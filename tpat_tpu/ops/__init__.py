from tpat_tpu.ops.attention import attention_with_scores  # noqa: F401
from tpat_tpu.ops.fbank import FbankConfig, fbank_jax, fbank_numpy  # noqa: F401
from tpat_tpu.ops.frontend import FrontendConfig, device_frontend  # noqa: F401
from tpat_tpu.ops.pallas_attention import fused_qkv_attention  # noqa: F401
from tpat_tpu.ops.pallas_layernorm import fused_layernorm  # noqa: F401
from tpat_tpu.ops.pruning import (  # noqa: F401
    compose_topk_indices,
    gather_tokens,
    masked_mean,
    masked_refine,
    masked_softmax,
    num_left_tokens,
    topk_select,
)
