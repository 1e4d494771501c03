"""Pluggable training-metrics logger backends.

The reference wires a PyTorch-Lightning logger chosen by the config's
`lightning.logger` block, defaulting to TestTube with W&B as the shipped
alternative (/root/reference/main.py:539-563). The TPU-native equivalent is a
small fan-out over append-only backends driven directly by the train loop:

  * JsonlLogger — one JSON object per line in metrics.jsonl (the repo's
    native format; every analysis script in docs/ reads it);
  * CsvLogger  — TestTube's on-disk essence: a flat metrics.csv whose header
    grows as new keys appear (rewritten in place on growth);
  * WandbLogger — thin `wandb` adapter, import-gated: constructing it
    without the package raises with the install hint instead of crashing
    mid-run (the package is not shipped here).

`logger_from_config` maps the reference's logger names/targets onto these.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional


class JsonlLogger:
    """Append one JSON object per `log` call to <logdir>/metrics.jsonl."""

    def __init__(self, logdir: str, filename: str = "metrics.jsonl"):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, filename)

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        rec = dict(metrics)
        if step is not None:
            rec.setdefault("step", step)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def close(self):
        pass


class CsvLogger:
    """Flat CSV with a growing header (TestTube-style metrics.csv).

    When a record introduces new keys the file is rewritten with the wider
    header; absent values are left empty. Cheap at training-log rates."""

    def __init__(self, logdir: str, filename: str = "metrics.csv"):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, filename)
        self._keys: List[str] = []
        self._rows: List[Dict[str, Any]] = []

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        rec = dict(metrics)
        if step is not None:
            rec.setdefault("step", step)
        new_keys = [k for k in rec if k not in self._keys]
        self._rows.append(rec)
        if new_keys:
            self._keys.extend(new_keys)
            self._rewrite()
        else:
            with open(self.path, "a") as f:
                f.write(self._format_row(rec) + "\n")

    def _format_row(self, rec):
        return ",".join(
            json.dumps(rec[k]) if isinstance(rec.get(k), str)
            else ("" if rec.get(k) is None else repr(rec[k]))
            for k in self._keys
        )

    def _rewrite(self):
        with open(self.path, "w") as f:
            f.write(",".join(self._keys) + "\n")
            for rec in self._rows:
                f.write(self._format_row(rec) + "\n")

    def close(self):
        pass


class WandbLogger:
    """Weights & Biases adapter (reference main.py:540-548 config surface)."""

    def __init__(self, logdir: str, name: Optional[str] = None,
                 offline: bool = False, project: Optional[str] = None,
                 id: Optional[str] = None):
        try:
            import wandb
        except ImportError as e:  # the package is not baked into this image
            raise ImportError(
                "WandbLogger requires the `wandb` package (pip install "
                "wandb), which is not available in this environment; use "
                "the jsonl/csv backends instead"
            ) from e
        self._run = wandb.init(
            dir=logdir, name=name, id=id, project=project,
            mode="offline" if offline else None,
        )

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        self._run.log(dict(metrics), step=step)

    def close(self):
        self._run.finish()


class NullLogger:
    """Swallows everything — the metrics stack on non-zero ranks of a
    multi-process run (rank-0 IO convention)."""

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        pass

    def close(self):
        pass


class MultiLogger:
    """Fan a `log` call out to every backend."""

    def __init__(self, backends: List[Any]):
        self.backends = list(backends)

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        for b in self.backends:
            b.log(metrics, step=step)

    def close(self):
        for b in self.backends:
            b.close()


_NAMED = {"jsonl": JsonlLogger, "csv": CsvLogger, "testtube": CsvLogger,
          "wandb": WandbLogger}


def logger_from_config(cfg: Optional[dict], logdir: str) -> MultiLogger:
    """Build the metrics logger stack from the config's `lightning.logger`
    block (reference main.py:557-563 merges it over the testtube default).

    Accepted forms:
      lightning.logger: wandb                      # by name
      lightning.logger: {target: ...WandbLogger, params: {...}}
    The jsonl backend is ALWAYS included — metrics.jsonl is this repo's
    native record and other tools read it."""
    backends: List[Any] = [JsonlLogger(logdir)]
    spec = ((cfg or {}).get("lightning") or {}).get("logger")
    if spec:
        if isinstance(spec, str):
            name, params = spec.lower(), {}
        else:
            name = str(spec.get("target", "")).rsplit(".", 1)[-1].lower()
            name = name.replace("logger", "") or "testtube"
            params = dict(spec.get("params", {}))
        if name not in _NAMED:
            raise ValueError(f"unknown logger backend {name!r}; "
                             f"known: {sorted(_NAMED)}")
        cls = _NAMED[name]
        if cls is not JsonlLogger:
            import inspect

            accepted = set(inspect.signature(cls).parameters) - {"logdir"}
            params = {k: v for k, v in params.items() if k in accepted}
            backends.append(cls(logdir, **params))
    return MultiLogger(backends)
