"""CLI drivers (finetune, run_ast, pretrain, get_norm_stats)."""

import argparse


def str2bool(v):
    """argparse bool flag parser shared by the drivers (the reference uses
    an equivalent helper in ast/src/run.py and string flags in the bash
    scripts); rejects garbage instead of silently reading it as False."""
    if isinstance(v, bool):
        return v
    s = str(v).lower()
    if s in ("yes", "true", "t", "y", "1"):
        return True
    if s in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError(f"boolean value expected, got {v!r}")
