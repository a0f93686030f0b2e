"""Benchmark timing harness — the equivalent of the reference's utils.h
timers + benchmark loop (SURVEY.md §3 component 7, §4 driver contract:
warmup run then N timed runs, mean time).

On TPU, correct timing means block_until_ready around the full dispatch
(compile excluded by the warmup) — the analogue of cudaEventElapsedTime
around kernel launches.

CRITICAL (axon tunnel): re-dispatching a bitwise-identical (executable,
args) pair returns "ready" ~instantly WITHOUT re-executing — repeats of
the same call measure nothing (measured 2026-08-17: identical repeats
0.03 ms, first actual fetch then stalls for the backlog; novel args block
properly at the ~26 ms floor). Every timed run must therefore use distinct
input bits: pass ``vary`` to make per-run args.
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
    vary: Callable[[int], tuple] | None = None,
) -> BenchResult:
    """vary: optional run_index -> args tuple. When given, every warmup and
    timed run calls ``fn(*vary(i))`` with a fresh, never-repeated index so
    each dispatch has distinct input bits (defeats the tunnel's
    identical-dispatch caching — see module docstring). The per-run args
    are built and blocked OUTSIDE the timed region."""
    idx = 0
    for _ in range(warmup):
        run_args = _block(vary(idx)) if vary else args
        idx += 1
        _block(fn(*run_args))
    times = []
    for _ in range(runs):
        run_args = _block(vary(idx)) if vary else args
        idx += 1
        t0 = time.perf_counter()
        _block(fn(*run_args))
        times.append(time.perf_counter() - t0)
    return BenchResult(
        name=name,
        mean_s=sum(times) / len(times),
        min_s=min(times),
        runs=runs,
        flops=flops,
        nnz_out=nnz_out,
    )
