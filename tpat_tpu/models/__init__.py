from tpat_tpu.models.vit import AudioViT  # noqa: F401
