"""cached_init: disk round-trip, shape invalidation, legacy migration."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobi_tpu.utils.param_cache import cached_init


@pytest.fixture()
def cache_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("MOBI_PARAM_CACHE_DIR", str(tmp_path))
    monkeypatch.setenv("MOBI_PARAM_CACHE", "1")
    return tmp_path


def _init(r):
    return {"w": jax.random.normal(r, (4, 8)), "b": jnp.zeros((8,))}


def _concrete_counter(calls):
    # NB: cached_init validates via jax.eval_shape, which also CALLS the
    # init fn (abstractly) — count only concrete executions
    def counting(r):
        if not isinstance(r, jax.core.Tracer):
            calls.append(1)
        return _init(r)

    return counting


def test_round_trip_and_hit(cache_dir):
    calls = []
    counting = _concrete_counter(calls)

    rng = jax.random.PRNGKey(3)
    a = cached_init(counting, rng, "cfgA")
    b = cached_init(counting, rng, "cfgA")
    assert len(calls) == 1, "second call must hit the disk cache"
    np.testing.assert_array_equal(np.asarray(a["w"]), np.asarray(b["w"]))


def test_shape_change_invalidates(cache_dir):
    rng = jax.random.PRNGKey(0)
    cached_init(_init, rng, "cfgB")

    def init2(r):
        return {"w": jax.random.normal(r, (5, 8)), "b": jnp.zeros((8,))}

    out = cached_init(init2, rng, "cfgB")
    # same config tag would collide; shape validation must reject the stale
    # tree and re-init
    assert out["w"].shape == (5, 8)


def test_different_seed_misses(cache_dir):
    a = cached_init(_init, jax.random.PRNGKey(1), "cfgC")
    b = cached_init(_init, jax.random.PRNGKey(2), "cfgC")
    assert not np.array_equal(np.asarray(a["w"]), np.asarray(b["w"]))


def test_legacy_migration_only_for_key0(cache_dir):
    import hashlib
    import pickle

    legacy_tree = _init(jax.random.PRNGKey(0))
    tag = hashlib.sha1(b"cfgD").hexdigest()[:12]
    with open(cache_dir / f"mobi_bench_params_{tag}.pkl", "wb") as f:
        pickle.dump(jax.device_get(legacy_tree), f)

    calls = []
    counting = _concrete_counter(calls)

    out0 = cached_init(counting, jax.random.PRNGKey(0), "cfgD")
    assert not calls, "PRNGKey(0) must adopt the legacy tree"
    np.testing.assert_array_equal(
        np.asarray(out0["w"]), np.asarray(legacy_tree["w"])
    )
    cached_init(counting, jax.random.PRNGKey(7), "cfgD")
    assert calls, "non-zero seed must NOT adopt the legacy tree"


def test_opt_out(cache_dir, monkeypatch):
    monkeypatch.setenv("MOBI_PARAM_CACHE", "0")
    calls = []
    counting = _concrete_counter(calls)

    cached_init(counting, jax.random.PRNGKey(0), "cfgE")
    cached_init(counting, jax.random.PRNGKey(0), "cfgE")
    assert len(calls) == 2
    assert not os.listdir(cache_dir)
