"""Structured metrics and timing.

The reference's observability was putStrLn of step counts and RMSEs
(SURVEY.md section 5: 'no structured logging'); its quantitative outputs
(fit RMSE ref Main.hs:1827, alignment RMSE ref Main.hs:2157, FPS counter
ref Main.hs:943-946) become named metrics here, with JSONL emission and
counters/gauges/timers — the BASELINE.json metrics (frames/sec, ICP RMSE,
TSDF occupancy) are reported through this registry.
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from contextlib import contextmanager
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Union


@dataclass
class Metrics:
    values: Dict[str, List[float]] = field(default_factory=lambda: defaultdict(list))
    sink_path: Optional[Path] = None

    def observe(self, name: str, value: float, **tags) -> None:
        self.values[name].append(float(value))
        if self.sink_path is not None:
            with open(self.sink_path, "a") as f:
                f.write(
                    json.dumps({"ts": time.time(), "metric": name, "value": float(value), **tags})
                    + "\n"
                )

    @contextmanager
    def timer(self, name: str, **tags):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.observe(name, time.perf_counter() - t0, **tags)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self.values.items():
            if not vals:
                continue
            s = sorted(vals)
            out[name] = {
                "count": len(vals),
                "mean": sum(vals) / len(vals),
                "min": s[0],
                "max": s[-1],
                "p50": s[len(s) // 2],
            }
        return out

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.summary().items()):
            lines.append(
                f"{name}: n={s['count']} mean={s['mean']:.4g} "
                f"p50={s['p50']:.4g} min={s['min']:.4g} max={s['max']:.4g}"
            )
        return "\n".join(lines)


GLOBAL_METRICS = Metrics()


def tsdf_occupancy(volume) -> float:
    """Fraction of observed voxels — a BASELINE.json tracked metric."""
    import jax.numpy as jnp

    return float(jnp.mean((volume.weight > 0).astype(jnp.float32)))


@contextmanager
def device_trace(log_dir: Union[str, Path]):
    """jax.profiler trace wrapper (SURVEY.md section 5: tracing becomes a
    first-class subsystem; view with TensorBoard or xprof)."""
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
