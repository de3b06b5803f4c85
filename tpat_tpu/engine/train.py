"""SPMD training engine.

Mirrors the reference train loop semantics
(``/root/reference/audiomae/engine_finetune.py:57-142`` and
``main_finetune.py:506-589``) on a TPU mesh:

- per-iteration warmup+cosine LR (baked into the optimizer schedule)
- keep-rate phases: dense -> masked anneal (traced keep rates, single
  compilation) -> static pruned (baked keep rates)
- finetune-time 2D time/freq masking in the dense phase; the engine
  disables masking + SpecAug once shrink starts (main_finetune.py:518-522)
- BCE (audioset/spc2) or soft-target CE (esc50/voxceleb1) losses
  (main_finetune.py:473-479)
- NaN-loss hard abort (engine_finetune.py:108-110)
- gradient accumulation via optax.MultiSteps (accum_iter,
  engine_finetune.py:112-117)

Collectives: the batch is sharded over the data axis and params are
replicated, so grad reduction is an XLA psum inserted by jit — the
TPU-native form of DDP's bucketed NCCL all-reduce.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, ClassVar, Dict, Iterable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpat_tpu.config import TrainConfig, ViTConfig
from tpat_tpu.engine import optimizer as opt_lib
from tpat_tpu.engine import schedules
from tpat_tpu.models.vit import AudioViT
from tpat_tpu.parallel import mesh as mesh_lib


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jnp.ndarray


def soft_cross_entropy(logits, targets):
    """torch.nn.CrossEntropyLoss with probability targets: mean over batch
    of -(sum targets * log_softmax(logits))."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(targets * logp, axis=-1))


def bce_with_logits(logits, targets):
    """torch.nn.BCEWithLogitsLoss (mean over every element)."""
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, targets))


def hard_cross_entropy(logits, targets):
    """AST CE path: argmax the one-hot targets first (traintest.py:178-179)."""
    idx = jnp.argmax(targets, axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, idx[:, None], axis=1))


LOSS_FNS = {
    "ce": soft_cross_entropy,
    "bce": bce_with_logits,
    "ce_hard": hard_cross_entropy,
}


@dataclasses.dataclass
class TrainModule:
    """Bundles model + configs + compiled step functions."""

    model: AudioViT
    model_cfg: ViTConfig
    train_cfg: TrainConfig
    loss_type: str
    iters_per_epoch: int
    mesh: Any = None
    # custom-rank ablation (models_vit.py:341-351): replace attention
    # importance with per-patch mel mean/std; static phases only.
    custom_rank: Any = None
    # Optional on-device preprocessing fused into the compiled step:
    # fn(x, rng, specaug: bool, train: bool) -> model input.  Used by the
    # --device_frontend path (waveform -> spectrogram on the TPU).
    preprocess: Any = None

    def _tp_size(self) -> int:
        """Model-axis size of the mesh (1 = pure data parallel)."""
        if self.mesh is None:
            return 1
        from tpat_tpu.parallel import sharding as shd

        if shd.MODEL_AXIS not in self.mesh.axis_names:
            return 1
        return int(self.mesh.shape[shd.MODEL_AXIS])

    def __post_init__(self):
        # Tensor parallelism: a 2-D (data, model) mesh shards the
        # transformer weights Megatron-style (parallel/sharding.py) and
        # GSPMD inserts the row-parallel psums.  The packed-qkv Pallas
        # kernel is a single-device program, so under a model axis the
        # attention auto-selects the XLA path (einsum attention
        # partitions cleanly over heads); param trees are identical, so
        # checkpoints/imports are unaffected.
        if self._tp_size() > 1 and self.model_cfg.attention_impl != "xla":
            self.model_cfg = dataclasses.replace(
                self.model_cfg, attention_impl="xla"
            )
            self.model = AudioViT(self.model_cfg)

        # The schedule's pruning geometry and the model's must be the same
        # object-of-agreement (in the reference one CLI arg feeds both,
        # main_finetune.py:364-366): the anneal path precomposes kept
        # counts from train_cfg.drop_loc but applies them at
        # model_cfg.drop_loc, and the bucketed base-level compare uses
        # train_cfg.base_keep_rate against the model's baked rates — a
        # mismatch would silently corrupt pruning widths.
        if self.train_cfg.base_keep_rate < 1.0:
            if tuple(self.train_cfg.drop_loc) != tuple(self.model_cfg.drop_loc):
                raise ValueError(
                    f"train_cfg.drop_loc {self.train_cfg.drop_loc} != "
                    f"model_cfg.drop_loc {self.model_cfg.drop_loc}"
                )
            if self.train_cfg.base_keep_rate != self.model_cfg.base_keep_rate:
                raise ValueError(
                    f"train_cfg.base_keep_rate {self.train_cfg.base_keep_rate}"
                    f" != model_cfg.base_keep_rate "
                    f"{self.model_cfg.base_keep_rate}"
                )
        if self.train_cfg.optimizer == "ast_adam":
            self.lr_fn = opt_lib.make_ast_lr_fn(
                self.train_cfg,
                max(self.iters_per_epoch, 1),
                accum=self.train_cfg.accum_iter,
            )
        else:
            # eff batch includes the host count (main_finetune.py:437-439:
            # batch_size * accum_iter * world_size feeds the blr rule)
            eff_batch = (
                self.train_cfg.batch_size
                * self.train_cfg.accum_iter
                * self.train_cfg.num_hosts
            )
            self.lr_fn = opt_lib.make_lr_fn(
                self.train_cfg,
                max(self.iters_per_epoch // self.train_cfg.accum_iter, 1),
                eff_batch,
            )
        self._steps: Dict[str, Callable] = {}

    # -- state ----------------------------------------------------------

    def tx(self, params) -> optax.GradientTransformation:
        if self.train_cfg.optimizer == "ast_adam":
            tx = opt_lib.make_ast_optimizer(self.train_cfg, self.lr_fn)
        else:
            tx = opt_lib.make_optimizer(
                params, self.model_cfg, self.train_cfg, self.lr_fn
            )
        if self.train_cfg.accum_iter > 1:
            tx = optax.MultiSteps(tx, self.train_cfg.accum_iter)
        return tx

    # -- steps ----------------------------------------------------------

    def _forward(
        self, params, x, rngs, phase: str, keep_rates, mask_prob: float,
        static_rates=None, num_left=None,
    ):
        model = self.model
        if phase == "anneal":
            assert self.custom_rank is None, (
                "custom-rank ablation is static-phase only"
            )
            if static_rates is not None:
                # hybrid anneal: physical gathers at the bucket's static
                # widths + the exact traced schedule masked inside them
                return model.apply(
                    {"params": params},
                    x,
                    keep_rates,
                    num_left_array=num_left,
                    bucket_rates=static_rates,
                    deterministic=False,
                    method=AudioViT.forward_hybrid,
                    rngs=rngs,
                )
            return model.apply(
                {"params": params},
                x,
                keep_rates,  # traced (depth,) array
                # exact host-computed kept counts (see
                # schedules.masked_kept_counts) — keeps the masked path's
                # pruning widths bit-identical to the static/reference math
                num_left_array=num_left,
                deterministic=False,
                method=AudioViT.forward_masked,
                rngs=rngs,
            )
        if static_rates is not None:
            kr = static_rates  # bucketed anneal: explicit pruned shapes
        else:
            kr = (1.0,) * self.model_cfg.depth if phase == "dense" else None
        return model.apply(
            {"params": params},
            x,
            keep_rates=kr,
            mask_t_prob=mask_prob,
            mask_f_prob=mask_prob,
            custom_rank=self.custom_rank,
            deterministic=False,
            rngs=rngs,
        )

    def make_train_step(
        self, phase: str, mask_prob: float = 0.0, static_rates=None
    ):
        """phase: 'dense' | 'anneal' | 'static'.  The returned function is
        jitted; 'anneal' takes an extra (depth,) keep-rate array input.
        static_rates: explicit per-block keep-rate tuple compiled into a
        physically-pruned graph (the bucketed-anneal variants)."""
        loss_fn = LOSS_FNS[self.loss_type]

        def step(state: TrainState, acc, x, y, keep_rates=None, num_left=None):
            rng, r0, r1, r2, r3 = jax.random.split(
                jax.random.fold_in(state.rng, state.step), 5
            )
            rngs = {"dropout": r0, "droppath": r1, "mask2d": r2}
            if self.preprocess is not None:
                # SpecAug only while dense (augs are disabled once shrink
                # starts, main_finetune.py:518-522); noise stays on.
                x = self.preprocess(
                    x, r3, specaug=(phase == "dense"), train=True
                )

            def compute_loss(params):
                logits = self._forward(
                    params, x, rngs, phase, keep_rates, mask_prob,
                    static_rates, num_left,
                )
                return loss_fn(logits, y)

            loss, grads = jax.value_and_grad(compute_loss)(state.params)
            updates, opt_state = self._tx.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                rng=rng,
            )
            # Device-side metric accumulation: the host never reads a
            # scalar per step, so the loop never blocks on the device.
            # The NaN abort (engine_finetune.py:108-110) becomes a device
            # flag checked at fetch points in train_epoch.
            acc = {
                "loss_sum": acc["loss_sum"] + loss,
                "grad_norm_sum": acc["grad_norm_sum"]
                + opt_lib.global_grad_norm(grads),
                # the lr "in the param groups": the reference adjusts lr
                # at accumulation-WINDOW START (engine_finetune.py:90-91),
                # so mid-window its logged param-group lr is the PENDING
                # update's — which is exactly lr_fn(step // accum).
                # Derived from the optimizer's actual step counter, not
                # host loop indices (which drift after resume).
                "lr_last": self.lr_fn(
                    state.step // max(self.train_cfg.accum_iter, 1)
                ),
                "finite": jnp.logical_and(acc["finite"], jnp.isfinite(loss)),
            }
            return new_state, acc

        return step

    @staticmethod
    def _zero_acc():
        return {
            "loss_sum": jnp.zeros((), jnp.float32),
            "grad_norm_sum": jnp.zeros((), jnp.float32),
            "lr_last": jnp.zeros((), jnp.float32),
            "finite": jnp.asarray(True),
        }

    # Process-level compiled-step memo.  The axon relay compiles remotely
    # (~3-6 min per train-step variant) and the persistent compilation
    # cache does not engage on that backend, so a process that builds
    # several TrainModules with the SAME traced computation (the twin-grid
    # harness: one cli.finetune run per (keep, seed) arm) would otherwise
    # recompile identical programs once per module.  Keyed by everything
    # the trace depends on — model config, loss, schedule-defining train
    # fields (seed normalized out: it only feeds the PRNG input, never the
    # graph), iters/epoch, custom_rank, the preprocess config, the mesh,
    # and the (phase, mask_prob, static_rates) variant — so a hit is a
    # bit-identical program, just not re-lowered.
    _SHARED_STEPS: ClassVar[Dict[tuple, Callable]] = {}
    _SHARED_STEPS_MAX: ClassVar[int] = 64

    def _step_cache_key(self, phase, mask_prob, static_rates):
        pp = self.preprocess
        # CLIs attach .cache_key (the FrontendConfig); an anonymous
        # preprocess falls back to object identity = no cross-module reuse
        pp_key = None if pp is None else getattr(pp, "cache_key", id(pp))
        return (
            self.model_cfg,
            dataclasses.replace(self.train_cfg, seed=0),
            self.loss_type,
            self.iters_per_epoch,
            self.custom_rank,
            pp_key,
            self.mesh,
            phase,
            mask_prob,
            static_rates,
        )

    def compiled_step(
        self, phase: str, mask_prob: float = 0.0, static_rates=None
    ):
        key = (phase, mask_prob, static_rates)
        if key not in self._steps:
            if not hasattr(self, "_tx"):
                raise RuntimeError("call init_state() before compiled_step()")
            gkey = self._step_cache_key(phase, mask_prob, static_rates)
            fn = TrainModule._SHARED_STEPS.get(gkey)
            if fn is None:
                fn = jax.jit(
                    self.make_train_step(phase, mask_prob, static_rates),
                    donate_argnums=(0, 1),
                )
                TrainModule._SHARED_STEPS[gkey] = fn
                while len(TrainModule._SHARED_STEPS) > self._SHARED_STEPS_MAX:
                    TrainModule._SHARED_STEPS.pop(
                        next(iter(TrainModule._SHARED_STEPS))
                    )
            self._steps[key] = fn
        return self._steps[key]

    def _build_state(self, params, rng) -> TrainState:
        """Place params (+ optimizer state) on the mesh and assemble the
        TrainState.  Data-parallel: everything replicated.  2-D mesh:
        params get the Megatron column/row shardings and the optimizer
        state is initialized INSIDE jit so Adam's mu/nu inherit the param
        shardings via GSPMD propagation (the optimizer state of a sharded
        weight must live where the weight lives)."""
        self._tx = self.tx(params)
        if self.mesh is not None and self._tp_size() > 1:
            from tpat_tpu.parallel import sharding as shd

            params = jax.tree_util.tree_map(
                lambda x, s: jax.device_put(jnp.asarray(x), s),
                params,
                shd.param_shardings(params, self.mesh),
            )
            opt_state = jax.jit(self._tx.init)(params)
            rep = mesh_lib.replicated_sharding(self.mesh)
            return TrainState(
                step=jax.device_put(jnp.zeros((), jnp.int32), rep),
                params=params,
                opt_state=opt_state,
                rng=jax.device_put(rng, rep),
            )
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self._tx.init(params),
            rng=rng,
        )
        if self.mesh is not None:
            state = jax.device_put(state, mesh_lib.replicated_sharding(self.mesh))
        return state

    def init(self, sample_x, seed: Optional[int] = None) -> TrainState:
        rng = jax.random.PRNGKey(self.train_cfg.seed if seed is None else seed)
        params = self.model.init({"params": rng}, sample_x[:1])["params"]
        return self._build_state(params, rng)

    def load(self, params, seed: Optional[int] = None) -> TrainState:
        """Build state around imported params (checkpoint finetune path)."""
        params = jax.tree_util.tree_map(jnp.asarray, params)
        rng = jax.random.PRNGKey(self.train_cfg.seed if seed is None else seed)
        return self._build_state(params, rng)

    # -- epoch ----------------------------------------------------------

    def train_epoch(
        self,
        state: TrainState,
        batches: Iterable[Tuple[np.ndarray, np.ndarray]],
        epoch: int,
        log_every: int = 0,
        log_fn: Callable[[str], None] = print,
        nan_check_every: int = 100,
        tb_writer=None,
    ) -> Tuple[TrainState, Dict[str, float]]:
        """One epoch with the reference's phase/aug rules.  ``batches``
        yields host (x, y) with a fixed global batch size.

        Metrics accumulate on device; the host fetches a scalar only every
        ``nan_check_every`` steps (and at log points / epoch end), so the
        loop stays async instead of paying a device round-trip per step.
        The NaN hard abort (engine_finetune.py:108-110) fires at those
        fetch points via a device-side finite flag.

        ``tb_writer``: optional TensorBoard SummaryWriter (anything with
        ``add_scalar``).  Streams intra-epoch train ``loss``/``lr`` points
        at the fractional-epoch ``epoch_1000x`` index the reference uses
        (``engine_finetune.py:131-137``), from the window fetches the
        loop already performs — no extra device traffic.  Values are
        window means rather than single-iteration samples (strictly more
        information at the same x-resolution)."""
        cfg = self.train_cfg
        phase = schedules.schedule_phase(
            epoch,
            shrink_start_epoch=cfg.shrink_start_epoch,
            shrink_epochs=cfg.shrink_epochs,
            base_keep_rate=cfg.base_keep_rate,
        )
        # masking regularization is active only before shrink
        mask_prob = cfg.mask_t_prob if phase == "dense" else 0.0
        if cfg.anneal_mode not in ("masked", "bucketed", "hybrid"):
            raise ValueError(f"unknown anneal_mode {cfg.anneal_mode!r}")
        bucketed_anneal = phase == "anneal" and cfg.anneal_mode in (
            "bucketed", "hybrid"
        )
        if bucketed_anneal and self.custom_rank is not None:
            # same rule the masked path asserts in _forward: the ablation
            # is defined for static phases only (models_vit.py:341-351)
            raise AssertionError("custom-rank ablation is static-phase only")
        # bucketed/hybrid anneal picks its per-bucket step inside the loop
        step_fn = None if bucketed_anneal else self.compiled_step(phase, mask_prob)

        from tpat_tpu.utils.logging import MetricLogger, SmoothedValue

        logger = MetricLogger(print_fn=log_fn)
        logger.add_meter("lr", SmoothedValue(window_size=1, fmt="{value:.6f}"))
        it = epoch * self.iters_per_epoch
        batches = logger.log_every(
            batches, log_every, header=f"Epoch: [{epoch}]"
        ) if log_every else batches

        acc = self._zero_acc()
        if self.mesh is not None:
            acc = jax.device_put(acc, mesh_lib.replicated_sharding(self.mesh))
        n_steps = 0
        check_from = 0
        prev = {"loss_sum": 0.0, "grad_norm_sum": 0.0}

        def fetch_and_check(i):
            """One blocking fetch covering every step since the last check:
            raises like the reference's per-step NaN abort and returns the
            host copy of the accumulator."""
            nonlocal check_from
            host_acc = jax.device_get(acc)
            if not bool(host_acc["finite"]):
                raise FloatingPointError(
                    f"Non-finite loss between iters {check_from}..{i} of "
                    f"epoch {epoch}, stopping training "
                    "(engine_finetune.py:108-110 semantics)"
                )
            check_from = i + 1
            return host_acc

        # loop-invariant anneal constants; (kr, nl) device arrays memoized
        # by rate tuple so per_epoch mode reuses one pair all epoch
        baked = tuple(
            cfg.base_keep_rate if b in cfg.drop_loc else 1.0
            for b in range(self.model_cfg.depth)
        )
        all_ones = (1.0,) * self.model_cfg.depth
        rate_arrays = {}

        def masked_args(rates):
            if rates not in rate_arrays:
                rate_arrays[rates] = (
                    jnp.asarray(rates, dtype=jnp.float32),
                    jnp.asarray(
                        schedules.masked_kept_counts(
                            rates, cfg.drop_loc, self.model_cfg.num_patches
                        ),
                        dtype=jnp.int32,
                    ),
                )
            return rate_arrays[rates]

        for i, (x, y) in enumerate(batches):
            if self.mesh is not None:
                x, y = mesh_lib.shard_batch(self.mesh, (x, y))
            if phase == "anneal":
                sched_it = (
                    it
                    if cfg.keep_rate_iter_mode == "per_epoch"
                    else it + i
                )
                rates = schedules.scheduled_keep_rates(
                    sched_it,
                    epoch,
                    shrink_start_epoch=cfg.shrink_start_epoch,
                    total_epochs=cfg.shrink_start_epoch + cfg.shrink_epochs,
                    iters_per_epoch=self.iters_per_epoch,
                    base_keep_rate=cfg.base_keep_rate,
                    num_blocks=self.model_cfg.depth,
                    drop_loc=cfg.drop_loc,
                )
                if cfg.anneal_mode == "hybrid":
                    if rates == all_ones and self.preprocess is None:
                        # the cosine's t=0 point: scheduled rates are
                        # EXACTLY 1.0, the refine is the identity — the
                        # dense static step is bit-equivalent and skips
                        # all masking machinery (and shares the dense
                        # phase's compile-cache key).  Guarded on
                        # preprocess: the dense-phase step re-enables
                        # on-device SpecAug, which the shrink phase
                        # must keep disabled (main_finetune.py:518-522).
                        state, acc = self.compiled_step(
                            "dense", 0.0
                        )(state, acc, x, y)
                    else:
                        bucketed = schedules.bucket_keep_rates(
                            rates,
                            base_keep_rate=cfg.base_keep_rate,
                            n_buckets=cfg.anneal_buckets,
                        )
                        kr, nl = masked_args(rates)
                        hstep = self.compiled_step(
                            "anneal", 0.0, static_rates=bucketed
                        )
                        state, acc = hstep(state, acc, x, y, kr, nl)
                elif cfg.anneal_mode == "bucketed":
                    bucketed = schedules.bucket_keep_rates(
                        rates,
                        base_keep_rate=cfg.base_keep_rate,
                        n_buckets=cfg.anneal_buckets,
                    )
                    # The base bucket IS the post-shrink static graph (the
                    # model's baked per-block defaults) — share its cache
                    # key so the shrink->static transition costs no extra
                    # TPU compile (~3-4 min each on the remote relay).
                    if bucketed == baked:
                        bstep = self.compiled_step("static", 0.0)
                    elif (
                        bucketed == all_ones
                        and cfg.mask_t_prob == 0.0
                        and self.preprocess is None
                    ):
                        # the top bucket (no pruning yet) is the same
                        # computation as the dense-phase step when that
                        # step carries no 2D masking and no on-device
                        # SpecAug — reuse its compile-cache key instead
                        # of tracing a duplicate all-ones static step
                        bstep = self.compiled_step("dense", 0.0)
                    else:
                        bstep = self.compiled_step(
                            "static", 0.0, static_rates=bucketed
                        )
                    state, acc = bstep(state, acc, x, y)
                else:
                    kr, nl = masked_args(rates)
                    state, acc = step_fn(state, acc, x, y, kr, nl)
            else:
                state, acc = step_fn(state, acc, x, y)
            n_steps += 1
            at_log = log_every and i % log_every == 0
            if at_log:
                # Window means from the device-side sums (one fetch): the
                # meters see every step's contribution, not a subsample.
                host_acc = fetch_and_check(i)
                win = max(n_steps - int(prev.get("n", 0)), 1)
                win_loss = (
                    float(host_acc["loss_sum"]) - prev["loss_sum"]
                ) / win
                lr_last = float(host_acc["lr_last"])
                logger.update(
                    loss=win_loss,
                    lr=lr_last,
                    grad_norm=(
                        float(host_acc["grad_norm_sum"])
                        - prev["grad_norm_sum"]
                    )
                    / win,
                )
                if tb_writer is not None:
                    # fractional-epoch x-index (engine_finetune.py:136)
                    e1000x = int(
                        (i / max(self.iters_per_epoch, 1) + epoch) * 1000
                    )
                    tb_writer.add_scalar("loss", win_loss, e1000x)
                    tb_writer.add_scalar("lr", lr_last, e1000x)
                prev = {
                    "loss_sum": float(host_acc["loss_sum"]),
                    "grad_norm_sum": float(host_acc["grad_norm_sum"]),
                    "n": n_steps,
                }
            elif nan_check_every and (i + 1) % nan_check_every == 0:
                fetch_and_check(i)
        host_acc = fetch_and_check(n_steps - 1) if n_steps else self._zero_acc()
        return state, {
            "loss": float(host_acc["loss_sum"]) / n_steps if n_steps else float("nan"),
            "grad_norm": (
                float(host_acc["grad_norm_sum"]) / n_steps
                if n_steps
                else float("nan")
            ),
            "phase": phase,
        }
