"""Tensor-parallel mesh axis: spec rules + a 2x2x2 sharded train step."""
import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mobi_tpu.parallel.mesh import (
    create_mesh,
    param_spec,
    param_shardings,
    shard_batch,
    shard_params,
)


def test_param_spec_tp_rules():
    # col-parallel: QKV projection kernels split their output dim
    assert param_spec((64, 128), 1, 2, "unet/attn1/to_q/kernel") == P(None, "tp")
    # row-parallel: output projections split their input dim
    assert param_spec((128, 64), 1, 2, "unet/attn1/to_out/kernel") == P("tp")
    # out_proj must be row-parallel despite the "proj" suffix overlap
    assert param_spec((128, 64), 1, 2, "clip/self_attn/out_proj/kernel") == P("tp")
    # unknown layers replicate over tp (fsdp may still apply)
    assert param_spec((64, 128), 2, 2, "unet/some_conv/kernel") == P(None, "fsdp")
    # tp + fsdp compose on separate dims
    s = param_spec((64, 128), 2, 2, "unet/attn1/to_q/kernel")
    assert s == P("fsdp", "tp")
    # biases (1-D) never tp-shard
    assert param_spec((128,), 1, 2, "unet/attn1/to_q/bias") == P()


def test_param_spec_backward_compat():
    assert param_spec((64, 128), 2) == P(None, "fsdp")
    assert param_spec((7,), 2) == P()
    assert param_spec((), 2) == P()
    assert param_spec((64,), 1) == P()


def test_three_axis_mesh_shapes(cpu_devices):
    mesh = create_mesh(dp=2, fsdp=2, tp=2, devices=cpu_devices)
    assert mesh.shape == {"dp": 2, "fsdp": 2, "tp": 2}
    # two-axis construction unchanged
    mesh2 = create_mesh(dp=4, fsdp=2, devices=cpu_devices)
    assert mesh2.shape == {"dp": 4, "fsdp": 2}


def test_tp_sharded_train_step(cpu_devices):
    """Full tiny train step over dp=2 x fsdp=2 x tp=2; loss must match the
    unsharded step (same params, same batch, same rng)."""
    from test_diffusion import make_batch, tiny_model_and_params

    from mobi_tpu.training import create_train_state, make_train_step

    model, params = tiny_model_and_params()
    state, tx = create_train_state(model, jax.random.PRNGKey(0), params=params)
    step_fn = make_train_step(model, tx)
    batch = make_batch(b=8)
    rng = jax.random.PRNGKey(3)

    ref_state, ref_metrics = jax.jit(step_fn)(state, batch, rng)
    ref_loss = float(ref_metrics["loss"])

    mesh = create_mesh(dp=2, fsdp=2, tp=2, devices=cpu_devices)
    sh_state = state._replace(
        params=shard_params(mesh, state.params),
        opt_state=jax.device_put(state.opt_state),
    )
    sh_batch = shard_batch(mesh, batch)
    with mesh:
        new_state, metrics = jax.jit(step_fn)(sh_state, sh_batch, rng)
        loss = float(metrics["loss"])
    assert np.isfinite(loss)
    np.testing.assert_allclose(loss, ref_loss, rtol=2e-3)

    # at least one parameter leaf actually carries a "tp" axis
    shardings = param_shardings(mesh, state.params)
    specs = [s.spec for s in jax.tree.leaves(shardings)]
    assert any("tp" in str(s) for s in specs), "no tp-sharded parameter found"


def test_param_spec_exact_names_only():
    """Suffix fragments must not tp-shard replicate-by-Megatron layers:
    emb_proj/bbox_proj (time-embedding / fourier projections) replicate,
    while the CLIP out-projections row-shard (ADVICE r1)."""
    assert param_spec((64, 128), 1, 2, "unet/res/emb_proj/kernel") == P()
    assert param_spec((64, 128), 1, 2, "cond/bbox_embedder/bbox_proj/kernel") == P()
    assert param_spec((128, 64), 1, 2, "xf/block/c_proj/kernel") == P("tp")
    assert param_spec((128, 64), 1, 2, "xf/block/mlp_c_proj/kernel") == P("tp")
    assert param_spec((64, 128), 1, 2, "xf/block/c_fc/kernel") == P(None, "tp")
    # fused qkv is left replicated (a contiguous tp split would cross the
    # q|k|v concatenation boundary)
    assert param_spec((64, 192), 1, 2, "xf/block/c_qkv/kernel") == P()


def test_shard_batch_interleaved_pair_guard(cpu_devices):
    """An interleaved batch axis that divides dp*fsdp but not 2*dp*fsdp
    would split (camera, lidar) pairs across shards: must raise."""
    mesh = create_mesh(dp=4, fsdp=2, devices=cpu_devices)  # 8 shards
    bad = {"x": np.zeros((8, 4), np.float32)}
    with pytest.raises(ValueError, match="pair"):
        shard_batch(mesh, bad, interleaved=True)
    ok = shard_batch(mesh, {"x": np.zeros((16, 4), np.float32)},
                     interleaved=True)
    assert ok["x"].sharding.spec == P(("dp", "fsdp"))
    # default (pair-axis) trees shard at dp*fsdp divisibility as before
    pairs = shard_batch(mesh, {"x": np.zeros((8, 4), np.float32)})
    assert pairs["x"].sharding.spec == P(("dp", "fsdp"))
    # non-divisible leaves replicate rather than raise
    rep = shard_batch(mesh, {"x": np.zeros((3, 4), np.float32)},
                      interleaved=True)
    assert rep["x"].sharding.spec == P()
