"""Training loop building blocks: LR schedule, masked optimizer, train state,
and the pjit-able train step.

Reference semantics:
  * LambdaLinearScheduler (/root/reference/ldm/lr_scheduler.py:42-98,
    configs/mobi_nusc_512.yaml:54-61): warmup from f_start to f_max over
    warm_up_steps, then linear from f_max to f_min across the cycle (shipped
    configs make it constant after warmup).
  * AdamW on the adapter partition only (ddpm.py:1616-1669), torch defaults
    (b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2).
  * LR scaling rule (main.py:690-694): lr = accumulate * num_devices *
    batch_size * base_lr when scale_lr is set (the shipped MObI run uses the
    base LR directly).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from mobi_tpu.models.diffusion import MobiDiffusion
from mobi_tpu.models.ema import EmaState, ema_init, ema_update

Params = Any


def lambda_linear_schedule(
    base_lr: float,
    warm_up_steps: int = 200,
    f_start: float = 1e-6,
    f_max: float = 1.0,
    f_min: float = 1.0,
    cycle_length: float = 1e13,
) -> optax.Schedule:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = f_start + (f_max - f_start) * step / max(warm_up_steps, 1)
        lin = f_min + (f_max - f_min) * (cycle_length - step) / cycle_length
        factor = jnp.where(step < warm_up_steps, warm, lin)
        return base_lr * factor

    return schedule


def lambda_warmup_cosine_schedule(
    base_lr: float,
    warm_up_steps: int,
    lr_min: float,
    lr_max: float,
    lr_start: float,
    max_decay_steps: int,
) -> optax.Schedule:
    """LambdaWarmUpCosineScheduler (/root/reference/ldm/lr_scheduler.py:4-33):
    linear warmup lr_start->lr_max, then half-cosine decay to lr_min over
    max_decay_steps (clamped after)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr_start + (lr_max - lr_start) * step / max(warm_up_steps, 1)
        t = (step - warm_up_steps) / max(max_decay_steps - warm_up_steps, 1)
        t = jnp.minimum(t, 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1.0 + jnp.cos(t * jnp.pi))
        return base_lr * jnp.where(step < warm_up_steps, warm, cos)

    return schedule


def multi_cycle_schedule(
    base_lr: float,
    warm_up_steps,
    f_min,
    f_max,
    f_start,
    cycle_lengths,
    shape: str = "linear",
) -> optax.Schedule:
    """The reference's list-parameterized repeating schedulers
    (/root/reference/ldm/lr_scheduler.py:36-98): per-cycle linear warmup
    f_start->f_max, then either a linear ramp toward f_min across the cycle
    (LambdaLinearScheduler, :81-97) or a half-cosine from f_max to f_min over
    the post-warmup portion, clamped (LambdaWarmUpCosineScheduler2, :59-75).

    jit-safe: the cycle index is a searchsorted over the precomputed
    cumulative cycle boundaries (the reference's find_in_interval, :52-57,
    whose `n <= boundary` test is searchsorted side='left')."""
    import numpy as np

    warm_up_steps = np.asarray(warm_up_steps, np.float32)
    f_min = np.asarray(f_min, np.float32)
    f_max = np.asarray(f_max, np.float32)
    f_start = np.asarray(f_start, np.float32)
    cycle_lengths = np.asarray(cycle_lengths, np.float32)
    assert (
        warm_up_steps.shape == f_min.shape == f_max.shape
        == f_start.shape == cycle_lengths.shape
    ), "per-cycle parameter lists must have equal lengths"
    if shape not in ("linear", "cosine"):
        raise ValueError(f"unknown schedule shape {shape!r}")
    cum = np.concatenate([[0.0], np.cumsum(cycle_lengths)])

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        cycle = jnp.clip(
            jnp.searchsorted(jnp.asarray(cum[1:]), step, side="left"),
            0, len(cycle_lengths) - 1,
        )
        n = step - jnp.asarray(cum[:-1])[cycle]
        wu = jnp.asarray(warm_up_steps)[cycle]
        fs, fm, fx = (jnp.asarray(f_start)[cycle], jnp.asarray(f_min)[cycle],
                      jnp.asarray(f_max)[cycle])
        cl = jnp.asarray(cycle_lengths)[cycle]
        warm = fs + (fx - fs) * n / jnp.maximum(wu, 1.0)
        if shape == "linear":
            after = fm + (fx - fm) * (cl - n) / cl
        else:
            t = jnp.minimum((n - wu) / jnp.maximum(cl - wu, 1.0), 1.0)
            after = fm + 0.5 * (fx - fm) * (1.0 + jnp.cos(t * jnp.pi))
        return base_lr * jnp.where(n < wu, warm, after)

    return schedule


def schedule_from_config(
    base_lr: float, scheduler_config: Optional[dict]
) -> optax.Schedule:
    """Build the LR schedule named by the config's scheduler_config block
    (e.g. configs/mobi_nusc_512.yaml:54-61). Unset -> the shipped MObI
    default (LambdaLinear, 200 warmup steps)."""
    if not scheduler_config:
        return lambda_linear_schedule(base_lr)
    target = str(scheduler_config.get("target", "")).rsplit(".", 1)[-1]
    p = scheduler_config.get("params", {})
    if target == "LambdaLinearScheduler":
        return multi_cycle_schedule(
            base_lr, p["warm_up_steps"], p["f_min"], p["f_max"],
            p["f_start"], p["cycle_lengths"], shape="linear",
        )
    if target == "LambdaWarmUpCosineScheduler2":
        return multi_cycle_schedule(
            base_lr, p["warm_up_steps"], p["f_min"], p["f_max"],
            p["f_start"], p["cycle_lengths"], shape="cosine",
        )
    if target == "LambdaWarmUpCosineScheduler":
        return lambda_warmup_cosine_schedule(
            base_lr, p["warm_up_steps"], p["lr_min"], p["lr_max"],
            p["lr_start"], p["max_decay_steps"],
        )
    raise ValueError(f"unknown scheduler target {scheduler_config.get('target')!r}")


def make_optimizer(
    model: MobiDiffusion,
    params: Params,
    base_lr: float = 8.0e-5,
    warm_up_steps: int = 200,
    weight_decay: float = 1e-2,
    accumulate_steps: int = 1,
    schedule: Optional[optax.Schedule] = None,
    optimizer: str = "adamw",
    adam_mu_dtype=None,
) -> optax.GradientTransformation:
    """Optimizer restricted to the trainable (adapter) partition.

    `optax.masked` passes mask-False updates through UNCHANGED (they are the
    raw gradients), so the frozen complement must be explicitly zeroed —
    otherwise every frozen leaf (UNet backbone, VAEs, CLIP) would receive its
    gradient as a parameter update each step.

    optimizer: "adamw" (reference parity, main.py's AdamW; 2 fp32 slots per
    trainable param) or "adafactor" (factored second moment, ~sqrt the slot
    memory — full-UNet training of the mini-256 config needs 13.69 GB of
    params+slots with AdamW vs ~6 GB factored; but see PROFILE.md 'Overfit
    learning oracle': adafactor failed to leave the zero-output basin at
    that scale where AdamW descends, so the HBM lever of choice is
    adam_mu_dtype).

    adam_mu_dtype (adamw only): dtype for the first-moment slot, e.g.
    jnp.bfloat16 — halves mu's HBM (optax native low-precision slot;
    update math still runs fp32). The mini-256 full-UNet step: 13.69 GB
    args with fp32 slots (OOM on a 15.75 GB chip) vs ~11.75 GB with bf16
    mu (fits).
    """
    mask = model.trainable_mask(params)
    not_mask = jax.tree_util.tree_map(lambda m: not m, mask)
    lr = schedule or lambda_linear_schedule(base_lr, warm_up_steps)
    if optimizer == "adamw":
        tx = optax.adamw(
            learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=weight_decay, mu_dtype=adam_mu_dtype,
        )
    elif optimizer == "adafactor":
        # Documented-broken for this architecture: on the full-UNet mini-256
        # overfit, adafactor never left the zero-init output basin across 3
        # seeded runs where AdamW descends (PROFILE.md optimizer ledger).
        # It stays available as an HBM lever for other partitions, but
        # selecting it must be loud, not a silent footgun.
        import warnings

        warnings.warn(
            "optimizer='adafactor' failed to train the full-UNet "
            "architecture in every recorded run (PROFILE.md optimizer "
            "ledger: stuck at the zero-output basin). Prefer "
            "optimizer='adamw' with adam_mu_dtype=bfloat16 for HBM "
            "savings; proceed with adafactor only deliberately.",
            stacklevel=2,
        )
        # NO weight_decay_rate here: optax adafactor applies it as a raw
        # per-step multiplicative shrink, NOT lr-scaled like AdamW's
        # decoupled decay — 1e-2/step zeroes the net in a few thousand
        # steps (mini-256 drive: loss marched back to exactly 1.0 = the
        # zero-output point as the lr cosine-decayed below the shrink).
        tx = optax.adafactor(
            learning_rate=lr, multiply_by_parameter_scale=False,
            clipping_threshold=1.0,
        )
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}")
    tx = optax.chain(
        optax.masked(optax.set_to_zero(), not_mask),
        optax.masked(tx, mask),
    )
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Params
    opt_state: Any
    ema: Optional[EmaState]


def create_train_state(
    model: MobiDiffusion,
    rng: jax.Array,
    base_lr: float = 8.0e-5,
    use_ema: bool = False,
    accumulate_steps: int = 1,
    params: Optional[Params] = None,
    scheduler_config: Optional[dict] = None,
    optimizer: str = "adamw",
    schedule: Optional[optax.Schedule] = None,
    adam_mu_dtype=None,
) -> Tuple[TrainState, optax.GradientTransformation]:
    """Build (TrainState, optimizer). Pass `params` to start from existing
    (e.g. torch-imported pretrained) weights instead of a fresh init.
    `schedule` (a raw optax schedule) overrides `scheduler_config`."""
    if params is None:
        params = model.init_params(rng)
    tx = make_optimizer(
        model, params, base_lr, accumulate_steps=accumulate_steps,
        schedule=schedule if schedule is not None else (
            schedule_from_config(base_lr, scheduler_config)
            if scheduler_config else None),
        optimizer=optimizer,
        adam_mu_dtype=adam_mu_dtype,
    )
    opt_state = tx.init(params)
    ema = ema_init(params["unet"]) if use_ema else None
    return TrainState(jnp.zeros((), jnp.int32), params, opt_state, ema), tx


def params_with_ema(state: TrainState) -> Params:
    """The params tree with the UNet subtree swapped for its EMA average —
    the functional equivalent of the reference's `ema_scope`
    (/root/reference/ldm/models/diffusion/ddpm.py:181-194), which copies the
    EMA into the model for validation/sampling and restores after. Identity
    when no EMA is kept (use_ema False), matching the reference's no-op
    scope."""
    if state.ema is None:
        return state.params
    return {**state.params, "unet": state.ema.ema_params}


def make_train_step(
    model: MobiDiffusion,
    tx: optax.GradientTransformation,
    use_ema: bool = False,
) -> Callable[[TrainState, Dict[str, Any], jax.Array], Tuple[TrainState, Dict[str, Any]]]:
    """Returns a pure train step: (state, batch, rng) -> (state, metrics).

    jit/pjit-compatible; gradient all-reduce over the mesh is implicit in the
    sharded jit.
    """

    def loss_fn(params, batch, rng):
        # Freeze semantics match the reference's requires_grad=False
        # (ddpm.py:1616-1669): stop_gradient on every frozen LEAF prunes the
        # whole VAE/CLIP/UNet-backbone weight backward from the program.
        # Without it jax differentiates the full tree and the optimizer only
        # masks the updates afterwards — the pruned-away backward costs
        # ~88 GB of HBM temporaries at the 512 config (v5e OOM, PROFILE.md).
        # Activation gradients still flow THROUGH frozen ops to the adapters.
        mask = model.trainable_mask(params)
        p = jax.tree_util.tree_map(
            lambda x, t: x if t else jax.lax.stop_gradient(x), params, mask
        )
        loss, metrics = model.training_loss(p, batch, rng)
        return loss, metrics

    def train_step(state: TrainState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema
        if use_ema and ema is not None:
            ema = ema_update(ema, params["unet"])
        new_state = TrainState(state.step + 1, params, opt_state, ema)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step
