"""Ring-schedule overlap evidence (VERDICT r3 next #8): capture a
jax.profiler trace of dist_spgemm_ring on the 8-device virtual CPU mesh and
report whether the ppermute collective ISSUES before the step's expansion
compute completes (the double-buffering claim at dist._ring_exec), or
whether XLA:CPU serializes them.

Output: a trace directory under results_traces/ + a parsed summary of
collective-vs-compute event timestamps printed and appended to
results.jsonl. The structural argument (collective depends only on the
held block, so it CAN issue first) is in dist.py; this script turns it
into artifact + measurement on the only multi-device surface available.

Run alone: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
"""
import glob
import gzip
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.sharding import Mesh

from benchmark_spgemm_using_csr_tpu import CSR
from benchmark_spgemm_using_csr_tpu.parallel import dist
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.results import write_result

TRACE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "results_traces", "ring_cpu8",
)


def main():
    devs = jax.devices()
    n = 8
    mesh = Mesh(np.array(devs[:n]), ("rows",))
    a = CSR.from_scipy(generators.erdos_renyi(4096, 4096, 8.0, seed=3))
    a_sh = dist.shard_rows(a, n)
    b_sh = dist.shard_rows(a, n)
    rplan = dist.make_ring_plan(a, a, n)
    run = lambda: dist.dist_spgemm_ring(
        a_sh, b_sh, a.rowptr, mesh, axis="rows", ring_plan=rplan
    )
    jax.block_until_ready(run())  # compile outside the trace

    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            jax.block_until_ready(run())

    # ---- parse the trace: collective vs compute event intervals ----------
    paths = sorted(glob.glob(
        os.path.join(TRACE_DIR, "**", "*.trace.json.gz"), recursive=True
    ))
    assert paths, f"no trace under {TRACE_DIR}"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = [
        e for e in trace.get("traceEvents", [])
        if e.get("ph") == "X" and "name" in e
    ]
    def sel(substrs):
        out = []
        for e in events:
            nm = e["name"].lower()
            if any(s in nm for s in substrs):
                out.append((e["ts"], e["ts"] + e.get("dur", 0), e["name"]))
        return sorted(out)

    coll = sel(["ppermute", "collective-permute", "all-to-all"])
    comp = sel(["fusion", "while", "sort", "scatter", "gather", "dot"])
    print(f"trace: {paths[-1]}")
    print(f"collective events: {len(coll)}, compute events: {len(comp)}")
    overlap_us = 0.0
    for cs, ce, _ in coll:
        for ps, pe, _ in comp:
            lo, hi = max(cs, ps), min(ce, pe)
            if hi > lo:
                overlap_us += hi - lo
    coll_us = sum(ce - cs for cs, ce, _ in coll)
    frac = overlap_us / coll_us if coll_us else 0.0
    concl = (
        "collectives overlap compute"
        if frac > 0.25 else
        "XLA:CPU serializes collectives against compute on this trace"
    )
    print(f"collective time {coll_us:.0f} us, overlapped {overlap_us:.0f} us"
          f" ({frac:.0%}) -> {concl}")
    for ts, te, nm in coll[:6]:
        print(f"  coll {nm[:60]} [{ts:.0f}, {te:.0f}]")
    write_result(
        "results.jsonl",
        {"config": "trace/ring_cpu8", "trace_path": paths[-1],
         "collective_events": len(coll), "collective_us": coll_us,
         "overlapped_us": overlap_us, "overlap_frac": round(frac, 3),
         "conclusion": concl},
    )


if __name__ == "__main__":
    main()
