from tpat_tpu.ops.pruning import (  # noqa: F401
    num_left_tokens,
    topk_select,
    gather_tokens,
    masked_refine,
    masked_mean,
)
