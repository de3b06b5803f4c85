from tpat_tpu.data.datasets import AudiosetDataset, VoxCeleb1Dataset  # noqa: F401
from tpat_tpu.data.loader import DataLoader  # noqa: F401
from tpat_tpu.data.sampler import EpochShardSampler, eval_shard  # noqa: F401
