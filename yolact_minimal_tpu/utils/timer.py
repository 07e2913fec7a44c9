"""Section timer/profiler with device fencing.

Same API as the reference profiler (/root/reference/utils/timer.py): named
section lists with a rolling window, a start() gate to exclude warm-up
iterations, and derived 'data' time = batch - sum(inner sections). Fencing
replaces torch.cuda.synchronize with a jax.device_get of a caller-provided
fence value (JAX dispatch is async exactly like CUDA streams).
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np

_times: Dict[str, List[float]] = {'batch': [], 'data': []}
_mark = False
_max_len = 100


def reset(length: int = 100):
    global _times, _mark, _max_len
    _times = {'batch': [], 'data': []}
    _mark = False
    _max_len = length


def start():
    global _mark
    _mark = True


def add_batch_time(batch_time: float):
    if not _mark:
        return
    _times['batch'].append(batch_time)
    inner = sum(v[-1] for k, v in _times.items()
                if k not in ('batch', 'data') and v)
    _times['data'].append(batch_time - inner)


def get_times(names) -> List[float]:
    return [float(np.mean(_times[n])) if _times.get(n) else 0.0 for n in names]


class counter:
    """Context manager timing one named section. Pass `fence` a function
    returning the value(s) to block on before reading the clock (typically
    a lambda over the last device output)."""

    def __init__(self, name: str, fence=None):
        self.name = name
        self.fence = fence
        for v in _times.values():
            if len(v) >= _max_len:
                v.pop(0)

    def __enter__(self):
        if _mark:
            _times.setdefault(self.name, [])
            _times[self.name].append(time.perf_counter())
        return self

    def __exit__(self, *exc):
        if _mark:
            if self.fence is not None:
                import jax
                # device_get is the only reliable drain on the tunneled TPU
                # backend — block_until_ready can return before execution
                # finishes there (docs/ARCHITECTURE.md, benchmark
                # methodology). Fence values are small (loss scalars), so
                # the transfer cost is negligible next to a train step.
                jax.device_get(self.fence())
            _times[self.name][-1] = time.perf_counter() - _times[self.name][-1]
