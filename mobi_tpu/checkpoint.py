"""Checkpoint save/restore (orbax) + crash-save + torch import glue.

Covers the reference's checkpoint semantics (SURVEY.md §5):
  * periodic + best-metric checkpoints (PL ModelCheckpoint, main.py:567-649)
    -> orbax CheckpointManager with max_to_keep / best_fn;
  * partial/foreign checkpoint load with ignore_keys prefix deletion
    (ddpm.py:196-212) -> `restore_partial`;
  * crash-save on exception / signal (main.py:702-719) -> `install_crash_save`;
  * torch .ckpt import via mobi_tpu.import_torch.
"""
from __future__ import annotations

import os
import signal
from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np


def _manager(ckpt_dir: str, max_to_keep: int = 5, best_fn=None):
    import orbax.checkpoint as ocp

    # orbax rejects best_mode=None even without a best_fn (its own default is
    # 'max'); only pass best_mode when a best_fn is actually set.
    kwargs = {"best_fn": best_fn, "best_mode": "min"} if best_fn else {}
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, **kwargs)
    return ocp.CheckpointManager(os.path.abspath(ckpt_dir), options=options)


class CheckpointManager:
    """Thin orbax wrapper storing (params, opt_state, step, ema)."""

    def __init__(self, ckpt_dir: str, max_to_keep: int = 5,
                 monitor: Optional[str] = None):
        os.makedirs(ckpt_dir, exist_ok=True)
        best_fn = (lambda m: m[monitor]) if monitor else None
        self._mgr = _manager(ckpt_dir, max_to_keep, best_fn)

    def save(self, step: int, state: Any, metrics: Optional[dict] = None):
        import orbax.checkpoint as ocp

        state = jax.tree_util.tree_map(np.asarray, state)
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )

    def restore(self, step: Optional[int] = None, template: Any = None):
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()


def delete_by_prefix(params: Any, ignore_keys: Sequence[str]) -> Any:
    """Drop subtrees whose path starts with any prefix (reference
    ddpm.py:200-205)."""
    if not ignore_keys:
        return params

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            p = f"{path}.{k}" if path else str(k)
            if any(p.startswith(ik) for ik in ignore_keys):
                continue
            out[k] = walk(v, p)
        return out

    return walk(params, "")


def restore_partial(init_params: Any, loaded: Any,
                    ignore_keys: Sequence[str] = ()) -> Any:
    """strict=False load: overlay loaded leaves onto the init tree
    (reference ddpm.py:196-212)."""
    from mobi_tpu.import_torch import merge_imported

    return merge_imported(init_params, delete_by_prefix(loaded, ignore_keys))


def load_torch_checkpoint(path: str) -> dict:
    """Load a Lightning .ckpt / torch .pt state dict as numpy."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    from mobi_tpu.import_torch import to_numpy_state_dict

    return to_numpy_state_dict(sd)


def install_crash_save(save_fn: Callable[[], None],
                       post_mortem_fn: Optional[Callable[[Any], None]] = None):
    """SIGUSR1 -> checkpoint now; SIGTERM -> checkpoint + exit; SIGUSR2 ->
    post-mortem (reference main.py:701-719 melk/divein).

    The reference's divein drops into pudb; the equivalent here dumps every
    thread's stack (so a wedged run can be diagnosed without killing it) and,
    when stdin is a tty or MOBI_PDB=1, opens pdb at the interrupted frame.
    Pass `post_mortem_fn(frame)` to override."""

    def _usr1(signum, frame):
        save_fn()

    def _term(signum, frame):
        save_fn()
        raise SystemExit(143)

    def _usr2(signum, frame):
        if post_mortem_fn is not None:
            post_mortem_fn(frame)
            return
        import faulthandler
        import sys

        print("SIGUSR2: dumping all thread stacks", file=sys.stderr, flush=True)
        faulthandler.dump_traceback(file=sys.stderr)
        if os.environ.get("MOBI_PDB") == "1" or (
            hasattr(sys.stdin, "isatty") and sys.stdin.isatty()
        ):
            import pdb

            pdb.Pdb().set_trace(frame)

    signal.signal(signal.SIGUSR1, _usr1)
    signal.signal(signal.SIGTERM, _term)
    signal.signal(signal.SIGUSR2, _usr2)
