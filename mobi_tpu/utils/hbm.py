"""Pre-flight HBM fit check for compiled programs.

The tunneled TPU runtime surfaces an over-budget program as an opaque
`UNAVAILABLE: TPU device error` at execute time (a device fault), not as a
RESOURCE_EXHAUSTED with an allocation breakdown. XLA already knows the
program's exact HBM plan after compilation (`compiled.memory_analysis()`),
so callers that control batch size (bench.py) check the plan against the
device budget BEFORE the first dispatch and raise an actionable error.

Measured on the v5e (15.75 GB): the flagship DDIM-50 pipeline needs
15.73 GB at batch_pairs=20 (fits, 20 MB headroom) and 16.27 GB at 22 —
the "batch 22+ faults the device" ceiling in PROFILE.md's batch-scaling
table is HBM, not a kernel bug.
"""
from __future__ import annotations

from typing import Optional

import jax


class HbmOverBudgetError(RuntimeError):
    pass


def device_hbm_budget(device=None) -> Optional[int]:
    """The device's usable HBM in bytes, or None when unknown (CPU, or a
    runtime without memory_stats)."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats() or {}
    except Exception:
        return None
    return stats.get("bytes_limit")


def check_fits(stats, limit_bytes: int, label: str = "program") -> None:
    """Raise HbmOverBudgetError when a CompiledMemoryStats plan exceeds the
    budget. Arguments, outputs, temps, and generated code coexist at
    execute time; aliased bytes are counted once."""
    need = (
        stats.generated_code_size_in_bytes
        + stats.argument_size_in_bytes
        + stats.output_size_in_bytes
        + stats.temp_size_in_bytes
        - stats.alias_size_in_bytes
    )
    if need > limit_bytes:
        gb = 1024**3
        raise HbmOverBudgetError(
            f"{label} needs {need / gb:.2f} GiB HBM "
            f"(args {stats.argument_size_in_bytes / gb:.2f} + temps "
            f"{stats.temp_size_in_bytes / gb:.2f} + outputs "
            f"{stats.output_size_in_bytes / gb:.2f} + code "
            f"{stats.generated_code_size_in_bytes / gb:.2f}) but the device "
            f"has {limit_bytes / gb:.2f} GiB. Reduce the batch size (bench: "
            "MOBI_BENCH_BATCH_PAIRS) or enable remat/chunking."
        )


def assert_fits(compiled, device=None, label: str = "program") -> bool:
    """Pre-flight a jax AOT `Compiled` against its device's HBM. Returns
    True when the check ran, False when the runtime exposes no memory
    analysis or budget (then the check is skipped, not failed)."""
    limit = device_hbm_budget(device)
    if limit is None:
        return False
    try:
        stats = compiled.memory_analysis()
    except Exception:
        return False
    if stats is None:
        return False
    check_fits(stats, limit, label)
    return True
