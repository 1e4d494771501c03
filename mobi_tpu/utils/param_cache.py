"""Disk cache for freshly-initialized parameter trees.

Flagship-scale `MobiDiffusion.init_params` EXECUTES the full forward pass
eagerly on the host CPU (flax init semantics) — ~20 min on a 1-core host.
Parameter values depend only on (config, PRNG key), so the tree is cached
on disk keyed by a hash of the model config repr + key data, and validated
structurally (eval_shape) before reuse so a stale tree can never be loaded
after a model change.

Used by bench.py and train.py. Opt out with MOBI_PARAM_CACHE=0.
"""
from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Callable, Optional

import jax


def _cache_path(tag: str) -> str:
    root = os.environ.get(
        "MOBI_PARAM_CACHE_DIR", os.path.expanduser("~/.cache")
    )
    return os.path.join(root, f"mobi_bench_params_{tag}.pkl")


def cached_init(
    init_fn: Callable[[jax.Array], Any],
    rng: jax.Array,
    config_repr: str,
    shape_fn: Optional[Callable[[jax.Array], Any]] = None,
) -> Any:
    """init_fn(rng) with a validated on-disk cache.

    shape_fn defaults to tracing init_fn with eval_shape; pass an explicit
    one when init_fn itself is not traceable (e.g. wraps host callbacks).
    """
    if os.environ.get("MOBI_PARAM_CACHE", "1") != "1":
        return init_fn(rng)

    key_bytes = jax.random.key_data(rng).tobytes()
    tag = hashlib.sha1(config_repr.encode() + key_bytes).hexdigest()[:12]
    path = _cache_path(tag)

    def valid(tree) -> bool:
        import chex

        try:
            want = jax.eval_shape(shape_fn or init_fn, rng)
        except Exception:
            if shape_fn is not None:
                # the caller SUPPLIED a shape oracle and it raised — that
                # signals an incompatible model change, not an untraceable
                # init; reject the cache rather than load a stale tree
                return False
            import warnings

            warnings.warn(
                "param_cache: init_fn is not shape-traceable and no "
                "shape_fn was given — accepting the cached tree on the "
                "keyed name alone (pass shape_fn to validate)."
            )
            return True
        try:
            chex.assert_trees_all_equal_shapes(tree, want)
            return True
        except Exception:
            return False

    # legacy naming (pre r4): keyed by config repr only — those trees were
    # all seeded with PRNGKey(0), so only probe/migrate for that exact key
    candidates = [path]
    if key_bytes == b"\x00" * len(key_bytes):
        candidates.append(
            _cache_path(hashlib.sha1(config_repr.encode()).hexdigest()[:12])
        )
    for p in candidates:
        if not os.path.exists(p):
            continue
        try:
            with open(p, "rb") as f:
                tree = pickle.load(f)
        except Exception:
            continue
        if valid(tree):
            if p != path:
                try:
                    os.link(p, path)
                except Exception:
                    pass
            return tree

    params = init_fn(rng)
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(jax.device_get(params), f, protocol=4)
    except Exception:
        pass
    return params
