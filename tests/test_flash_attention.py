"""Flash-attention kernel numerics (interpret mode on CPU) vs the XLA
reference, plus the custom-vjp gradient path and the placement-aware backend
selection."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobi_tpu.ops.attention import dot_product_attention
from mobi_tpu.ops.flash_attention import (
    _flash_fwd_impl,
    _xla_reference,
    flash_attention,
)


@pytest.mark.parametrize("shape", [(2, 256, 4, 40), (1, 1024, 2, 64),
                                   (3, 512, 8, 80)])
def test_flash_kernel_matches_xla(shape):
    b, n, h, d = shape
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], shape, jnp.float32)
    k = jax.random.normal(ks[1], shape, jnp.float32)
    v = jax.random.normal(ks[2], shape, jnp.float32)
    out = _flash_fwd_impl(q, k, v, interpret=True)
    ref = _xla_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_online_softmax_extreme_logits():
    """Online max/sum renormalization must be stable with large logits."""
    shape = (1, 256, 2, 40)
    q = jnp.full(shape, 8.0)
    k = jax.random.normal(jax.random.PRNGKey(1), shape) * 8.0
    v = jax.random.normal(jax.random.PRNGKey(2), shape)
    out = _flash_fwd_impl(q, k, v, interpret=True)
    ref = _xla_reference(q, k, v)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_flash_custom_vjp_bwd_matches_xla_grad():
    """The custom-vjp backward must produce the XLA attention gradients.
    Off-TPU the residual-carrying path dispatches to the XLA recompute via
    platform_dependent; `o=None` residuals (MOBI_FLASH_BWD=xla mode) take
    the recompute branch unconditionally."""
    from mobi_tpu.ops.flash_attention import _bwd

    shape = (1, 128, 2, 32)
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = (jax.random.normal(kk, shape) for kk in ks)
    ct = jax.random.normal(jax.random.PRNGKey(4), shape)

    _, vjp_fn = jax.vjp(_xla_reference, q, k, v)
    g_ref = vjp_fn(ct)
    g_bwd = _bwd((q, k, v, None, None), ct)
    for a, b in zip(g_ref, g_bwd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    out, vjp_fn2 = jax.vjp(flash_attention, q, k, v)
    g_full = vjp_fn2(ct)
    for a, b in zip(g_ref, g_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_auto_backend_grad_through_long_seq_on_cpu():
    """Differentiating the auto-selected attention at >=1024 tokens on CPU
    (the training path off-TPU) must not touch pallas."""
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 1024, 128))

    def loss(x):
        return (dot_product_attention(x, x, x, num_heads=2) ** 2).sum()

    g = jax.jit(jax.grad(loss))(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_auto_backend_runs_on_cpu_for_long_seq():
    """The r1 bench crash: 4096-token auto-backend attention traced on CPU
    must lower through the XLA branch, not pallas."""
    q = jax.random.normal(jax.random.PRNGKey(4), (1, 1024, 2, 64))
    out = jax.jit(
        lambda x: dot_product_attention(
            x.reshape(1, 1024, 128), x.reshape(1, 1024, 128),
            x.reshape(1, 1024, 128), num_heads=2,
        )
    )(q)
    assert np.all(np.isfinite(np.asarray(out)))


def test_transposed_av_kernel_matches_plain():
    """The [D, TQ] transposed-accumulator variant must be numerically
    equivalent to the plain kernel (same online softmax, different AV
    matmul orientation)."""
    import functools

    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mobi_tpu.ops.flash_attention import (
        _flash_kernel,
        _flash_kernel_tav,
        _pick_tile,
    )

    b, n, h, d = 1, 256, 2, 40
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b * h, n, d), jnp.float32)
    k = jax.random.normal(ks[1], (b * h, n, d), jnp.float32)
    v = jax.random.normal(ks[2], (b * h, n, d), jnp.float32)

    tile_q = _pick_tile(n, 512)
    tile_k = _pick_tile(n, 4096)
    outs = []
    for kern in (_flash_kernel, _flash_kernel_tav):
        fn = functools.partial(kern, tile_k=tile_k, scale=d**-0.5)
        out = pl.pallas_call(
            fn,
            grid=(b * h, n // tile_q),
            in_specs=[
                pl.BlockSpec((1, tile_q, d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile_q, d), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
            interpret=True,
        )(q, k, v)
        outs.append(np.asarray(out))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("shape", [(2, 256, 4, 40), (1, 1024, 2, 64),
                                   (2, 512, 3, 80)])
def test_flash_fwd_lse_matches_xla(shape):
    from mobi_tpu.ops.flash_attention import _flash_fwd_lse_impl

    b, n, h, d = shape
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q, k, v = (jax.random.normal(kk, shape, jnp.float32) for kk in ks)
    out, lse = _flash_fwd_lse_impl(q, k, v, interpret=True)
    ref = _xla_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # lse must equal logsumexp of the scaled logits, rowwise
    logits = np.einsum(
        "bqhd,bkhd->bhqk", np.asarray(q), np.asarray(k)
    ) * (d ** -0.5)
    want = np.log(np.exp(
        logits - logits.max(-1, keepdims=True)
    ).sum(-1)) + logits.max(-1)
    np.testing.assert_allclose(
        np.asarray(lse).reshape(b, h, n), want, atol=2e-4
    )


@pytest.mark.parametrize("shape", [(2, 256, 4, 40), (1, 1024, 2, 64),
                                   (2, 512, 3, 80)])
def test_flash_bwd_kernels_match_xla_grads(shape):
    """The streaming dq/dk/dv kernels (interpret mode) vs the XLA attention
    VJP — the memory-critical training path (no N^2 HBM tensor)."""
    from mobi_tpu.ops.flash_attention import (
        _flash_bwd_impl,
        _flash_fwd_lse_impl,
    )

    ks = jax.random.split(jax.random.PRNGKey(6), 4)
    q, k, v = (jax.random.normal(kk, shape, jnp.float32) for kk in ks[:3])
    g = jax.random.normal(ks[3], shape, jnp.float32)
    out, lse = _flash_fwd_lse_impl(q, k, v, interpret=True)
    dq, dk, dv = _flash_bwd_impl(q, k, v, out, lse, g, interpret=True)
    ref_out, vjp = jax.vjp(_xla_reference, q, k, v)
    rdq, rdk, rdv = vjp(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), atol=5e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), atol=5e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), atol=5e-4)


def test_flash_bwd_extreme_logits_stable():
    shape = (1, 256, 2, 40)
    from mobi_tpu.ops.flash_attention import (
        _flash_bwd_impl,
        _flash_fwd_lse_impl,
    )

    q = jnp.full(shape, 8.0)
    k = jax.random.normal(jax.random.PRNGKey(7), shape) * 8.0
    v = jax.random.normal(jax.random.PRNGKey(8), shape)
    g = jax.random.normal(jax.random.PRNGKey(9), shape)
    out, lse = _flash_fwd_lse_impl(q, k, v, interpret=True)
    dq, dk, dv = _flash_bwd_impl(q, k, v, out, lse, g, interpret=True)
    ref_out, vjp = jax.vjp(_xla_reference, q, k, v)
    rdq, rdk, rdv = vjp(g)
    for a, b_ in ((dq, rdq), (dk, rdk), (dv, rdv)):
        assert np.all(np.isfinite(np.asarray(a)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-3)


def test_flash_exp2_mode_matches_exp(monkeypatch):
    """The base-2 online softmax (MOBI_FLASH_EXP=exp2 — scale folds in
    log2(e); max/renorm/sum live in the base-2 log domain; acc/l cancels
    the base) must match the natural-base kernel to fp32 rounding,
    including under extreme logits."""
    import mobi_tpu.ops.flash_attention as fa

    shape = (2, 256, 4, 40)
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], shape, jnp.float32) * 8.0  # extreme logits
    k = jax.random.normal(ks[1], shape, jnp.float32) * 8.0
    v = jax.random.normal(ks[2], shape, jnp.float32)

    monkeypatch.setattr(fa, "_EXP_MODE", "exp")
    base = np.asarray(_flash_fwd_impl(q, k, v, interpret=True))
    monkeypatch.setattr(fa, "_EXP_MODE", "exp2")
    out2 = np.asarray(_flash_fwd_impl(q, k, v, interpret=True))
    ref = np.asarray(_xla_reference(q, k, v))
    np.testing.assert_allclose(out2, base, atol=2e-5)
    np.testing.assert_allclose(out2, ref, atol=2e-5)
