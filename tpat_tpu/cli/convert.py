"""Convert a tpat_tpu orbax checkpoint to a reference-layout torch .pth.

Completes the migration round-trip (docs/MIGRATION.md "Checkpoints"):
the reference direction (.pth -> here) is built into every driver via
``utils/torch_import.py``, and ``cli.pretrain`` already exports
``mae_pretrained.pth`` — this CLI covers the remaining leg, taking a
finetune/AST ``best_model`` (or any orbax checkpoint saved by
``utils/checkpoint.py``) back to the torch layout the reference's own
tooling loads:

- ``audiomae`` flavor -> ``{"model": state_dict, "epoch": N}``
  (``/root/reference/audiomae/util/misc.py:306-312`` save shape, loadable
  by ``main_finetune.py --finetuned_model_path``),
- ``ast`` flavor -> a bare ``module.``-prefixed DataParallel state_dict
  (``/root/reference/ast/src/traintest.py:247``),
- ``mae`` flavor -> the full pretraining layout (encoder + swin decoder).

Flavor is auto-detected from the params tree (AST carries ``dist_token``,
MAE a ``decoder_embed``) and can be overridden with ``--flavor``.

Example:
    tpat-convert --checkpoint exp/best_model --out best_model.pth
"""

from __future__ import annotations

import argparse
import os


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="orbax checkpoint dir (e.g. the finetune driver's "
                        "best_model) or any dir saved by utils/checkpoint.py")
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument("--flavor", default=None,
                   choices=["audiomae", "ast", "mae"],
                   help="torch layout; default: auto-detect from the "
                        "params tree")
    return p


def detect_flavor(params) -> str:
    if "decoder_embed" in params or "mask_token" in params:
        return "mae"
    if "dist_token" in params:
        return "ast"
    return "audiomae"


def main(args):
    import jax

    # conversion is pure host work — never touch (or wait for) a device.
    # No-op (and harmless) if a backend is already live in this process.
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # noqa: BLE001 — backend already initialized
        pass

    from tpat_tpu.utils.checkpoint import restore_checkpoint
    from tpat_tpu.utils.torch_export import save_pth

    if not os.path.isdir(args.checkpoint):
        raise SystemExit(
            f"--checkpoint must be an orbax checkpoint directory, got "
            f"{args.checkpoint!r} (for the reverse direction, .pth files "
            f"are consumed directly by the drivers' *_model_path flags)"
        )
    restored = restore_checkpoint(args.checkpoint)
    params = restored.get("params", restored)
    flavor = args.flavor or detect_flavor(params)
    out = save_pth(
        args.out, params, flavor=flavor, epoch=int(restored.get("epoch", 0))
    )
    print(f"wrote {out} ({flavor} layout)")
    return out


def cli(argv=None):
    """Console-script entry point (``tpat-convert``)."""
    main(get_parser().parse_args(argv))


if __name__ == "__main__":
    cli()
