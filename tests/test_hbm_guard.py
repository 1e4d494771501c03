"""HBM pre-flight guard (utils/hbm.py): over-budget programs fail with an
actionable message instead of the tunneled runtime's opaque device fault."""
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import pytest

from mobi_tpu.utils.hbm import HbmOverBudgetError, assert_fits, check_fits


def stats(args=0, temp=0, out=0, code=0, alias=0):
    return SimpleNamespace(
        argument_size_in_bytes=args,
        temp_size_in_bytes=temp,
        output_size_in_bytes=out,
        generated_code_size_in_bytes=code,
        alias_size_in_bytes=alias,
    )


def test_within_budget_passes():
    check_fits(stats(args=4 << 30, temp=8 << 30), 16 << 30)


def test_over_budget_raises_with_breakdown():
    with pytest.raises(HbmOverBudgetError) as e:
        check_fits(stats(args=4 << 30, temp=13 << 30), 16 << 30, "bench")
    msg = str(e.value)
    assert "bench needs 17.00 GiB" in msg
    assert "16.00 GiB" in msg
    assert "MOBI_BENCH_BATCH_PAIRS" in msg


def test_alias_counted_once():
    # donated buffers overlap args and temps; 10+7-2=15 <= 16 fits
    check_fits(stats(args=10 << 30, temp=7 << 30, alias=2 << 30), 16 << 30)


def test_assert_fits_skips_without_budget():
    """CPU devices expose no bytes_limit: the pre-flight reports 'skipped'
    (False), never a false failure."""
    compiled = jax.jit(lambda x: x * 2).lower(jnp.ones((4,))).compile()
    dev = jax.devices("cpu")[0]
    ran = assert_fits(compiled, device=dev)
    if ran:  # some backends do expose a budget — then the tiny fn must fit
        assert True
    else:
        assert ran is False
