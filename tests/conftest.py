"""Test configuration: force an 8-device virtual CPU platform so sharding
tests run anywhere (the idiomatic JAX stand-in for a fake collective
backend — SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TPAT_DISABLE_NATIVE", "0")

import jax  # noqa: E402

# The image's sitecustomize registers the axon TPU plugin before conftest
# runs, which overrides JAX_PLATFORMS — force the CPU platform explicitly so
# unit tests never dispatch over the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache for the test suite: the tiny-model jits are
# identical across runs, so re-runs skip most XLA compiles.
os.makedirs("/tmp/jax_cache_tests", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------------------
# Smoke tier: one fast, representative test per subsystem so correctness can
# be sampled quickly (`pytest -m smoke`) instead of the ~50-min full suite.
# Measured r5: 5:34 on this 1-core host while a TPU run's data workers
# were active (the realistic floor here).  The former 14-min reading was
# one pathological test (test_ast_adam_matches_torch building a
# 10**7-entry lr table) — keep new entries to a few seconds each.
# test_multihost is excluded (a real 2-process jax.distributed run, ~3.5 min
# alone) and test_north_star is excluded (three full-size ViT-B CPU
# compiles); run those explicitly when touching their subsystems.
_SMOKE = {
    "test_pruning_ops.py::test_topk_matches_torch_ordering",
    "test_fbank.py::test_sine_tone_peak",
    "test_native_frontend.py::test_native_fbank_matches_numpy",
    "test_frontend.py::test_device_matches_host_eval",
    "test_data_pipeline.py::test_dataset_eval_item",
    "test_model_parity.py::test_audiomae_flavor_parity",
    "test_mae.py::test_mae_forward_and_loss",
    "test_fast_gelu.py::test_gelu_poly_accuracy_envelope",
    "test_pallas_attention.py::test_fused_matches_xla",
    "test_window_attention.py::test_swin_block_fused_matches_xla",
    "test_pallas_layernorm.py::test_fused_ln_matches_flax",
    "test_kernel_partitioning.py::test_fused_vit_grad_matches_on_mesh",
    "test_tensor_parallel.py::test_tp_forward_matches_single_device",
    "test_train_engine.py::test_losses_match_torch",
    "test_train_engine.py::test_train_phases_and_loss_decreases",
    "test_ast_recipe.py::test_ast_adam_matches_torch",
    "test_analysis.py::test_kendall_tau_matches_bruteforce",
    "test_ablations.py::test_custom_rank_selects_by_intensity",
    "test_export_remat.py::test_config_validation",
    "test_packaging.py::test_version_single_sourced",
    "test_reference_layout.py::test_pos_embed_time_crop_matches_reference_function",
    "test_cli_e2e.py::test_keeper_tie_semantics",
    "test_cli_e2e.py::test_run_ast_eval_requires_checkpoint",
}


def pytest_collection_modifyitems(session, items):
    matched = set()
    for item in items:
        # strip any parametrize suffix so "file::func" matches every
        # parameter instance of a parametrized entry
        rel = item.nodeid.split("tests/")[-1].split("[")[0]
        if rel in _SMOKE:
            item.add_marker(pytest.mark.smoke)
            matched.add(rel)
    # A renamed/moved test must fail collection loudly, not silently
    # shrink the smoke tier's subsystem coverage.  Only enforce on
    # whole-file collections: `pytest tests/test_foo.py` legitimately
    # sees a subset of files, and `pytest tests/test_foo.py::test_bar`
    # (nodeid-targeted) a subset of a file's tests.
    if any("::" in str(a) for a in session.config.args):
        return
    collected_files = {item.nodeid.split("tests/")[-1].split("::")[0]
                       for item in items}
    stale = {s for s in _SMOKE - matched
             if s.split("::")[0] in collected_files}
    if stale:
        raise pytest.UsageError(
            f"_SMOKE entries match no collected test (renamed?): {stale}"
        )
