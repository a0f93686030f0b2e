"""Benchmark timing harness — the equivalent of the reference's utils.h
timers + benchmark loop (SURVEY.md §3 component 7, §4 driver contract:
warmup run then N timed runs, mean time).

On TPU, correct timing means block_until_ready around the full dispatch
(compile excluded by the warmup) — the analogue of cudaEventElapsedTime
around kernel launches.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax


@dataclasses.dataclass
class BenchResult:
    name: str
    mean_s: float
    min_s: float
    runs: int
    flops: int = 0
    nnz_out: int = 0

    @property
    def gflops(self) -> float:
        return self.flops / self.mean_s / 1e9 if self.mean_s else 0.0

    @property
    def gflops_best(self) -> float:
        return self.flops / self.min_s / 1e9 if self.min_s else 0.0

    @property
    def nnz_per_s(self) -> float:
        return self.nnz_out / self.mean_s if self.mean_s else 0.0


def _block(tree):
    return jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
        tree,
    )


def bench(
    fn: Callable,
    *args,
    name: str = "bench",
    warmup: int = 2,
    runs: int = 5,
    flops: int = 0,
    nnz_out: int = 0,
) -> BenchResult:
    for _ in range(warmup):
        _block(fn(*args))
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        _block(fn(*args))
        times.append(time.perf_counter() - t0)
    return BenchResult(
        name=name,
        mean_s=sum(times) / len(times),
        min_s=min(times),
        runs=runs,
        flops=flops,
        nnz_out=nnz_out,
    )
