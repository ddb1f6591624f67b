"""Observability: named scopes, throughput metrics, profiler hooks.

The reference has no tracing/metrics at all (SURVEY.md section 5); this
module is the rebuild's observability layer: jax.named_scope context
helpers (scopes show up in XLA HLO and profiler traces), a wall-clock
throughput meter emitting the BASELINE metric (audio-sec/sec/chip), and a
thin jax.profiler wrapper for capturing device traces.
"""
from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List

import jax

named_scope = jax.named_scope  # re-export: used by models to annotate stages


@dataclass
class ThroughputMeter:
    """Accumulates processed audio seconds and wall time; reports the
    BASELINE.json metric."""
    audio_sec: float = 0.0
    wall_sec: float = 0.0
    _t0: float = field(default=0.0, repr=False)

    @contextlib.contextmanager
    def measure(self, audio_seconds: float):
        t0 = time.perf_counter()
        yield
        self.wall_sec += time.perf_counter() - t0
        self.audio_sec += audio_seconds

    @property
    def audio_sec_per_sec(self) -> float:
        return self.audio_sec / max(self.wall_sec, 1e-9)

    def report(self) -> str:
        return json.dumps({
            "metric": "audio-sec/sec/chip",
            "value": round(self.audio_sec_per_sec, 2),
            "audio_sec": round(self.audio_sec, 3),
            "wall_sec": round(self.wall_sec, 4),
        })


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler device trace around a region (view with
    tensorboard or xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricsLog:
    """Structured metrics logging (jsonl) for corpus runs."""

    def __init__(self, path: str | None = None):
        self.path = path
        self.rows: List[Dict] = []

    def log(self, **kw) -> None:
        row = dict(ts=time.time(), **kw)
        self.rows.append(row)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(row) + "\n")
