"""A/B: distributed local kernel vs the tuned single-chip core (VERDICT r1
item 4 done-criterion: per-shard exec time within ~1.5x of the tuned
single-device path on the same shard-sized problem).

Runs on the 8-device virtual CPU mesh (the only multi-device surface on
this machine). CPU executes the shards of a shard_map program
SEQUENTIALLY on the one host core, so per-shard time is estimated as
total_exec / P; the comparison is therefore about the LOCAL KERNEL's work
content (plan quality), which is exactly what item 4 targets. Also prints
the legacy fixed-k=8 kernel so the improvement is visible.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python scripts/ab_dist_parity.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon PJRT sitecustomize force-sets jax_platforms="axon,cpu" and
# overrides the env var; this A/B's contract is the 8-device virtual CPU
# mesh (same dance as __graft_entry__.dryrun_multichip)
jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.sharding import Mesh

from benchmark_spgemm_using_csr_tpu.ops.chunked import (
    ChunkedPlan, make_chunked_plan, pad_gentle, spgemm_chunked,
)
from benchmark_spgemm_using_csr_tpu.parallel import dist
from benchmark_spgemm_using_csr_tpu.sparse.csr import CSR
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.oracle import (
    assert_csr_equal, spgemm_reference,
)


def timeit(fn, reps=3):
    fn()  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    P = 8
    a = CSR.from_scipy(generators.erdos_renyi(16384, 16384, 12.0, seed=3))
    mesh = Mesh(np.array(jax.devices()[:P]), ("rows",))
    a_sh = dist.shard_rows(a, P)

    # single-device tuned path on ONE shard-sized problem (rows 0..m_loc)
    import scipy.sparse as sp

    a_sp = a.to_scipy().tocsr()
    blk = sp.vstack([a_sp[: a_sh.m_loc]]).tocsr()
    a_blk = CSR.from_scipy(blk)
    plan_1 = make_chunked_plan(a_blk, a)
    t_single = timeit(lambda: spgemm_chunked(a_blk, a, plan_1))

    # tuned distributed local kernel (this round)
    lp = dist.make_dist_local_plan(a, a, P)
    t_tuned = timeit(
        lambda: dist.dist_spgemm_replicated(a_sh, a, mesh, plan=lp)
    )
    c = dist.unshard(dist.dist_spgemm_replicated(a_sh, a, mesh, plan=lp))
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)

    # legacy fixed-k=8 local kernel (round 1)
    nnz_ct = np.add.reduceat(
        np.diff(np.asarray(a.rowptr))[np.asarray(a.colidx)[: int(np.asarray(a.rowptr)[-1])]],
        np.asarray(a.rowptr)[:-1][np.diff(np.asarray(a.rowptr)) > 0],
    )
    prod_cap = pad_gentle(int(nnz_ct.max() * a_sh.m_loc))  # loose
    legacy = ChunkedPlan(
        k=8,
        chunks_cap=pad_gentle(lp.prod_cap // 8 + a_sh.cap + 1),
        out_cap=lp.out_cap,
    )
    t_legacy = timeit(
        lambda: dist.dist_spgemm_replicated(a_sh, a, mesh, plan=legacy)
    )

    per_shard = t_tuned / P
    print(f"single-device tuned (1 shard-sized problem): {t_single*1e3:.1f} ms")
    print(f"mesh tuned total {t_tuned*1e3:.1f} ms -> per-shard ~{per_shard*1e3:.1f} ms"
          f"  ratio vs single {per_shard/t_single:.2f}x")
    print(f"mesh legacy k=8 total {t_legacy*1e3:.1f} ms "
          f"({t_legacy/t_tuned:.2f}x of tuned)")


if __name__ == "__main__":
    main()
