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
