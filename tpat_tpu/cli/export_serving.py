"""Export a trained model as a serving artifact (beyond-reference).

Packages the static-pruned eval forward as a ``jax.export`` StableHLO
program plus parameters (``utils/serving.py``), loadable without the
model code.  Run it on the platform you will serve on (the artifact is
platform-lowered; pass ``--platforms tpu,cpu`` for a multi-platform
artifact).

Example:
    python -m tpat_tpu.cli.export_serving \\
        --model audiomae_vit_base --dataset esc50 --nb_classes 50 \\
        --base_keep_rate 0.7 --drop_loc "(3, 6, 9)" \\
        --finetuned_model_path exp/best_model \\
        --batch_size 64 --out_dir serving/esc50_b64
"""

from __future__ import annotations

import argparse
import ast as pyast


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="audiomae_vit_base",
                   help="config factory name in tpat_tpu.config, or "
                        "ast_vit_base for the AST family")
    p.add_argument("--dataset", default="esc50")
    p.add_argument("--nb_classes", type=int, required=True)
    p.add_argument("--target_length", type=int, default=None)
    p.add_argument("--base_keep_rate", type=float, default=1.0)
    p.add_argument("--drop_loc", default="(3, 6, 9)", type=str)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--finetuned_model_path", required=True,
                   help="orbax dir saved by this framework, or a "
                        "reference .pth")
    p.add_argument("--batch_size", type=str, default="64",
                   help="one int bakes a single-batch artifact; a comma "
                        "list (e.g. '1,8,32,128') bakes one program per "
                        "bucket and the loader pads/dispatches requests "
                        "to the smallest bucket that fits")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--platforms", default=None,
                   help="comma list, e.g. 'tpu,cpu'; default = current "
                        "backend")
    p.add_argument("--device_frontend", action="store_true",
                   help="export the FUSED waveform->logits graph: inputs "
                        "are raw PCM (batch, num_samples) and the "
                        "on-device fbank/pad/normalize runs inside the "
                        "artifact (NaN head/tail short-clip contract, "
                        "documented in meta.json)")
    p.add_argument("--num_samples", type=int, default=None,
                   help="waveform length for --device_frontend; default = "
                        "exactly target_length frames "
                        "(400 + (target_length-1)*160 samples at 16 kHz)")
    return p


def _parse_batch_sizes(raw) -> list:
    """Validate --batch_size up front, BEFORE the expensive checkpoint
    restore / model init: bad values must fail in milliseconds."""
    try:
        batches = [int(b) for b in str(raw).split(",") if b.strip()]
    except ValueError:
        batches = []
    if not batches or any(b < 1 for b in batches):
        raise SystemExit(
            f"--batch_size must be one or more positive ints "
            f"(comma-separated), got {raw!r}"
        )
    return batches


def main(args):
    batches = _parse_batch_sizes(args.batch_size)

    import jax
    import numpy as np

    from tpat_tpu import config as cfg_lib
    from tpat_tpu.models.vit import AudioViT
    from tpat_tpu.utils import serving
    from tpat_tpu.utils import torch_import as ti
    from tpat_tpu.utils.checkpoint import restore_checkpoint

    preset = cfg_lib.DATASET_PRESETS.get(args.dataset)
    target_length = args.target_length or (
        preset.target_length if preset else 1024
    )
    factory = getattr(cfg_lib, args.model)
    cfg = factory(
        num_classes=args.nb_classes,
        target_length=target_length,
        drop_loc=tuple(pyast.literal_eval(args.drop_loc)),
        base_keep_rate=args.base_keep_rate,
        drop_path_rate=0.0,
        compute_dtype=args.compute_dtype,
    )
    model = AudioViT(cfg)

    path = args.finetuned_model_path
    if path.endswith(".pth"):
        sd = ti.load_torch_state_dict(path)
        if cfg.num_extra_tokens == 2:
            imported = ti.ast_params_from_state_dict(sd, cfg)
        else:
            # finetuned checkpoints carry the model-geometry pos embed;
            # no crop surgery (reference loads them strict=True,
            # main_finetune.py:424-426)
            imported = ti.audiomae_params_from_state_dict(
                sd, cfg, ckpt_grid=(cfg.grid_f, cfg.grid_t)
            )
        import jax.numpy as jnp

        x0 = jnp.zeros((1, 1, cfg.target_length, cfg.num_mel_bins))
        init = model.init({"params": jax.random.PRNGKey(0)}, x0)["params"]
        params = ti.overlay_params(init, imported)
    else:
        params = restore_checkpoint(path)["params"]
    params = jax.tree_util.tree_map(np.asarray, params)

    # input orientation follows the family: AudioMAE (B,1,T,F); AST
    # (B,1,F,T) (ast_models.py:434-436)
    ast_family = cfg.pos_embed_mode != "pre_cls"
    frontend = None
    if args.device_frontend:
        from tpat_tpu.ops.frontend import FrontendConfig

        fcfg = FrontendConfig(
            num_mel_bins=cfg.num_mel_bins,
            target_length=cfg.target_length,
            norm_mean=preset.norm_mean if preset else -6.6268077,
            norm_std=preset.norm_std if preset else 5.358466,
        )
        n_samples = args.num_samples or (
            fcfg.fbank_cfg.window_size
            + (cfg.target_length - 1) * fcfg.fbank_cfg.window_shift
        )
        shape = (batches[0], n_samples)
        frontend = fcfg
    elif ast_family:
        shape = (batches[0], 1, cfg.num_mel_bins, cfg.target_length)
    else:
        shape = (batches[0], 1, cfg.target_length, cfg.num_mel_bins)
    platforms = (
        tuple(args.platforms.split(",")) if args.platforms else None
    )
    out = serving.export_forward(
        model, params, shape, args.out_dir, platforms=platforms,
        batch_sizes=batches if len(batches) > 1 else None,
        frontend=frontend, ast_orientation=ast_family and frontend is not None,
    )
    desc = shape if len(batches) == 1 else (tuple(batches),) + shape[1:]
    print(f"serving artifact written to {out} (input {desc})")
    return out


def cli(argv=None):
    """Console-script entry point (``tpat-export-serving``)."""
    main(get_parser().parse_args(argv))


if __name__ == "__main__":
    cli()
