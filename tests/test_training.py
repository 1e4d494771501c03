"""Train step: masked optimizer, LR schedule, EMA, and 8-device sharding."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobi_tpu.parallel.mesh import (
    create_mesh,
    param_spec,
    shard_batch,
    shard_params,
)
from mobi_tpu.training import (
    create_train_state,
    lambda_linear_schedule,
    make_train_step,
)
from tests.test_diffusion import make_batch, tiny_model_and_params


def test_lambda_linear_schedule_matches_reference():
    """warmup f_start->f_max over 200 steps, constant after
    (mobi_nusc_512.yaml:54-61; lr_scheduler.py:42-98)."""
    sched = lambda_linear_schedule(8e-5, warm_up_steps=200, f_start=1e-6)
    np.testing.assert_allclose(float(sched(0)), 8e-5 * 1e-6, rtol=1e-5)
    np.testing.assert_allclose(
        float(sched(100)), 8e-5 * (1e-6 + (1 - 1e-6) * 0.5), rtol=1e-5
    )
    np.testing.assert_allclose(float(sched(200)), 8e-5, rtol=1e-4)
    np.testing.assert_allclose(float(sched(100000)), 8e-5, rtol=1e-4)


def _reference_lr_module():
    """Import the reference's pure-numpy lr_scheduler.py as a golden oracle."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_lr_scheduler", "/root/reference/ldm/lr_scheduler.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_multi_cycle_linear_matches_reference():
    """Multi-cycle LambdaLinearScheduler golden parity, incl. cycle
    boundaries (lr_scheduler.py:81-97)."""
    ref = _reference_lr_module()
    from mobi_tpu.training import multi_cycle_schedule

    kw = dict(warm_up_steps=[10, 5], f_start=[1e-6, 0.5], f_max=[1.0, 0.8],
              f_min=[0.1, 0.2], cycle_lengths=[100, 200])
    golden = ref.LambdaLinearScheduler(**kw)
    sched = multi_cycle_schedule(1.0, shape="linear", **kw)
    for n in [0, 3, 9, 10, 11, 50, 99, 100, 101, 104, 105, 106, 200, 299, 300]:
        np.testing.assert_allclose(
            float(sched(n)), golden(n), rtol=1e-5, err_msg=f"step {n}"
        )


def test_multi_cycle_cosine_matches_reference():
    """LambdaWarmUpCosineScheduler2 golden parity (lr_scheduler.py:36-78)."""
    ref = _reference_lr_module()
    from mobi_tpu.training import multi_cycle_schedule

    kw = dict(warm_up_steps=[10, 5], f_start=[1e-6, 0.5], f_max=[1.0, 0.8],
              f_min=[0.1, 0.2], cycle_lengths=[100, 200])
    golden = ref.LambdaWarmUpCosineScheduler2(**kw)
    sched = multi_cycle_schedule(1.0, shape="cosine", **kw)
    for n in [0, 9, 10, 11, 55, 99, 100, 101, 105, 106, 150, 299, 300]:
        np.testing.assert_allclose(
            float(sched(n)), golden(n), rtol=1e-5, atol=1e-7, err_msg=f"step {n}"
        )


def test_warmup_cosine_matches_reference():
    """LambdaWarmUpCosineScheduler golden parity incl. the post-decay clamp
    (lr_scheduler.py:4-33)."""
    ref = _reference_lr_module()
    from mobi_tpu.training import lambda_warmup_cosine_schedule

    golden = ref.LambdaWarmUpCosineScheduler(
        warm_up_steps=20, lr_min=0.05, lr_max=1.0, lr_start=1e-4,
        max_decay_steps=200,
    )
    sched = lambda_warmup_cosine_schedule(
        1.0, warm_up_steps=20, lr_min=0.05, lr_max=1.0, lr_start=1e-4,
        max_decay_steps=200,
    )
    for n in [0, 5, 19, 20, 21, 100, 199, 200, 500]:
        np.testing.assert_allclose(
            float(sched(n)), golden(n), rtol=1e-5, err_msg=f"step {n}"
        )


def test_schedule_from_config_selects_and_jits():
    """Config-driven selection (mobi_nusc_512.yaml:54-61 form) and jit
    compatibility (the schedule runs inside the compiled train step)."""
    from mobi_tpu.training import schedule_from_config

    cfg = {
        "target": "ldm.lr_scheduler.LambdaLinearScheduler",
        "params": {"warm_up_steps": [200], "cycle_lengths": [10000000000000],
                   "f_start": [1e-6], "f_max": [1.0], "f_min": [1.0]},
    }
    sched = schedule_from_config(8e-5, cfg)
    np.testing.assert_allclose(float(jax.jit(sched)(200)), 8e-5, rtol=1e-4)
    np.testing.assert_allclose(float(sched(0)), 8e-5 * 1e-6, rtol=1e-4)

    cos = schedule_from_config(1.0, {
        "target": "ldm.lr_scheduler.LambdaWarmUpCosineScheduler2",
        "params": {"warm_up_steps": [10], "cycle_lengths": [100],
                   "f_start": [0.0], "f_max": [1.0], "f_min": [0.0]},
    })
    np.testing.assert_allclose(float(cos(55)), 0.5, atol=1e-4)

    with pytest.raises(ValueError):
        schedule_from_config(1.0, {"target": "nope.NotAScheduler"})


@pytest.fixture(scope="module")
def tiny_setup():
    from tests.helpers import perturb_params

    model, params = tiny_model_and_params()
    # Off the zero-init point: at exact init the zero out_conv blocks all
    # gradients (real runs start from pretrained weights).
    params = perturb_params(params)
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), base_lr=1e-3, params=params
    )
    step_fn = make_train_step(model, tx)
    return model, state, step_fn


def test_train_step_updates_only_adapters(tiny_setup):
    model, state, step_fn = tiny_setup
    batch = make_batch(b=2)
    new_state, metrics = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1

    mask = model.trainable_mask(state.params)
    changed = jax.tree_util.tree_map(
        lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))),
        state.params,
        new_state.params,
    )
    leaves_mask = jax.tree_util.tree_leaves_with_path(mask)
    changed_flat = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(changed)
    )
    # frozen params must be bit-identical; at least some trainables must move
    moved = 0
    for p, trainable in leaves_mask:
        key = jax.tree_util.keystr(p)
        if not trainable:
            assert not changed_flat[key], f"frozen param changed: {key}"
        else:
            moved += changed_flat[key]
    assert moved > 0


def test_adafactor_option_trains_adapters_only(tiny_setup):
    """optimizer="adafactor" (the TPU HBM lever: factored second moment vs
    AdamW's two fp32 slots) must keep the same freeze semantics — frozen
    leaves bit-identical, trainables moving, loss finite."""
    model, state, _ = tiny_setup
    # selecting adafactor must be LOUD: the PROFILE optimizer ledger records
    # it never leaving the zero-output basin on the full-UNet architecture,
    # so create_train_state warns on selection (config footgun guard)
    with pytest.warns(UserWarning, match="adafactor"):
        af_state, af_tx = create_train_state(
            model, jax.random.PRNGKey(0), base_lr=1e-3, params=state.params,
            optimizer="adafactor",
        )
    step_fn = jax.jit(make_train_step(model, af_tx))
    new_state, metrics = step_fn(af_state, make_batch(b=2), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    mask = model.trainable_mask(af_state.params)
    moved = 0
    for (p, trainable), (_, before), (_, after) in zip(
        jax.tree_util.tree_leaves_with_path(mask),
        jax.tree_util.tree_leaves_with_path(af_state.params),
        jax.tree_util.tree_leaves_with_path(new_state.params),
    ):
        changed = bool(np.any(np.asarray(before) != np.asarray(after)))
        if not trainable:
            assert not changed, f"frozen param changed: {jax.tree_util.keystr(p)}"
        else:
            moved += changed
    assert moved > 0


def test_latents_detached_from_input(tiny_setup):
    """The reference DETACHES first-stage encodings (ddpm.py:531,1015) —
    latents are data, not a gradient path. Parity observable: d(loss)/d(GT
    image) through training_loss is exactly zero (and XLA therefore never
    schedules a VAE-encode backward/remat inside the train step — the
    mini-256 OOM root cause, PROFILE.md 'Overfit learning oracle')."""
    model, state, _ = tiny_setup
    batch = make_batch(b=2)

    def loss_wrt_image(img):
        b = dict(batch)
        b["image"] = dict(batch["image"], GT=img)
        loss, _ = model.training_loss(
            state.params, b, jax.random.PRNGKey(3)
        )
        return loss

    g = jax.grad(loss_wrt_image)(jnp.asarray(batch["image"]["GT"]))
    assert float(jnp.abs(g).max()) == 0.0


def test_train_step_sharded_8dev(tiny_setup, cpu_devices):
    """Full dp x fsdp sharded train step on the virtual 8-CPU mesh."""
    model, state, step_fn = tiny_setup
    mesh = create_mesh(dp=4, fsdp=2, devices=cpu_devices)
    batch = make_batch(b=4)  # interleaved batch 8 = divisible by mesh size
    sharded_state = state._replace(
        params=shard_params(mesh, state.params),
        opt_state=jax.device_put(state.opt_state),
    )
    sharded_batch = shard_batch(mesh, batch)
    with mesh:
        new_state, metrics = jax.jit(step_fn)(
            sharded_state, sharded_batch, jax.random.PRNGKey(2)
        )
        loss = float(metrics["loss"])
    assert np.isfinite(loss)


def test_param_spec_sharding_rules():
    from jax.sharding import PartitionSpec as P

    assert param_spec((64, 128), 2) == P(None, "fsdp")
    assert param_spec((3, 3, 16, 32), 2) == P(None, None, None, "fsdp")
    assert param_spec((7,), 2) == P()   # indivisible -> replicated
    assert param_spec((), 2) == P()
    assert param_spec((64,), 1) == P()


def test_ema_warmup_decay():
    from mobi_tpu.models.ema import ema_init, ema_update

    params = {"w": jnp.zeros((4,))}
    state = ema_init(params)
    state = ema_update(state, {"w": jnp.ones((4,))}, decay=0.9999)
    # first update: d = min(0.9999, 2/11)
    d = 2.0 / 11.0
    np.testing.assert_allclose(np.asarray(state.ema_params["w"]), 1 - d, rtol=1e-6)
    assert int(state.num_updates) == 1


def test_params_with_ema_swaps_unet(tiny_setup):
    """ema_scope semantics (reference ddpm.py:181-194): with use_ema the
    validation/sampling tree is params with the UNet subtree replaced by its
    EMA average; without EMA it is the live tree unchanged."""
    from mobi_tpu.models.ema import ema_init
    from mobi_tpu.training import params_with_ema

    model, state, _ = tiny_setup
    # no EMA kept -> identity (the reference's no-op scope)
    assert params_with_ema(state) is state.params

    zeroed = jax.tree_util.tree_map(jnp.zeros_like, state.params["unet"])
    ema_state = state._replace(ema=ema_init(zeroed))
    swapped = params_with_ema(ema_state)
    assert swapped["unet"] is ema_state.ema.ema_params
    for k in state.params:
        if k != "unet":
            assert swapped[k] is state.params[k]


def test_validate_consumes_ema(tiny_setup, cpu_devices):
    """train.py validate() logs val/loss_simple from the live weights and
    val/loss_simple_ema under ema_scope (reference validation_step,
    ddpm.py:370-381); the two must differ when the EMA tree differs."""
    from train import validate

    from mobi_tpu.models.ema import ema_init

    model, state, _ = tiny_setup
    mesh = create_mesh(dp=8, devices=cpu_devices)
    batch = make_batch(b=8)
    loader = [batch]
    rng = jax.random.PRNGKey(3)

    m_live = validate(model, state, loader, lambda b: b, mesh, rng,
                      num_batches=1, t_draws=2)
    assert set(m_live) == {"val/loss_simple", "val/loss_simple_ema"}
    # use_ema off: the _ema entry mirrors the live loss without a 2nd pass
    assert m_live["val/loss_simple_ema"] == m_live["val/loss_simple"]

    zeroed = jax.tree_util.tree_map(jnp.zeros_like, state.params["unet"])
    ema_state = state._replace(ema=ema_init(zeroed))
    m_ema = validate(model, ema_state, loader, lambda b: b, mesh, rng,
                     num_batches=1, t_draws=2)
    assert np.isfinite(m_ema["val/loss_simple_ema"])
    # same rng -> the live entry is unchanged; the EMA entry moved
    np.testing.assert_allclose(m_ema["val/loss_simple"],
                               m_live["val/loss_simple"], rtol=1e-5)
    assert m_ema["val/loss_simple_ema"] != pytest.approx(
        m_ema["val/loss_simple"], rel=1e-3)


def test_extract_ema_state_dict():
    """LitEma buffer layout (reference ldm/modules/ema.py:16-21): shadows
    live under model_ema.<name-with-dots-removed>; copy_to overlays only
    tracked params (ema.py:52-60)."""
    from mobi_tpu.import_torch import extract_ema_state_dict

    live = np.arange(4, dtype=np.float32)
    shadow = live * 10
    buf = np.float32([7.0])  # untracked buffer: stays live
    sd = {
        "model.diffusion_model.in_conv.weight": live,
        "model.diffusion_model.norm.running_var": buf,
        "model_ema.diffusion_modelin_convweight": shadow,
        "model_ema.num_updates": np.int64(123),
        "model_ema.decay": np.float32(0.9999),
        "cond_stage_model.proj.weight": live,  # not under model.: untouched
    }
    out, num_updates = extract_ema_state_dict(sd)
    assert num_updates == 123
    np.testing.assert_array_equal(
        out["model.diffusion_model.in_conv.weight"], shadow)
    np.testing.assert_array_equal(
        out["model.diffusion_model.norm.running_var"], buf)
    assert "cond_stage_model.proj.weight" not in out

    assert extract_ema_state_dict({"model.w": live}) == (None, None)
