"""Structured metrics & observability.

Replaces the reference's raw-fd `write()` dumps to log/*.txt (SURVEY.md §5
"Metrics / logging"): structured per-cycle records (residual norms,
reduction factor rho, error vs oracle, wall time) as JSONL + stdout.
"""

from __future__ import annotations

import json
import sys
import time
from typing import IO, Any

import jax
import jax.numpy as jnp


def norms(arr: jax.Array, mask: jax.Array | None = None):
    """(L2-mean, Linf, MAE) of arr, optionally restricted to mask==1."""
    a = arr if mask is None else arr * mask
    n = float(a.size) if mask is None else float(jnp.sum(mask))
    l2 = float(jnp.sqrt(jnp.sum(a * a) / n))
    linf = float(jnp.max(jnp.abs(a)))
    mae = float(jnp.sum(jnp.abs(a)) / n)
    return l2, linf, mae


class MetricsLogger:
    """JSONL metrics sink with optional stdout echo."""

    def __init__(
        self,
        path: str | None = None,
        echo: bool = False,
        stream: IO[str] | None = None,
    ):
        self._fh = open(path, "a") if path else None
        self._echo = echo
        self._stream = stream or sys.stdout
        self._t0 = time.time()

    def log(self, event: str, **fields: Any) -> dict:
        rec = {"event": event, "t": round(time.time() - self._t0, 6), **fields}
        line = json.dumps(rec)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self._echo:
            print(line, file=self._stream)
        return rec

    def cycle(
        self,
        i: int,
        residual_l2: float,
        prev_residual_l2: float | None = None,
        **extra: Any,
    ) -> dict:
        rho = (
            residual_l2 / prev_residual_l2
            if prev_residual_l2 and prev_residual_l2 > 0
            else None
        )
        return self.log(
            "cycle", i=i, residual_l2=residual_l2, rho=rho, **extra
        )

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
