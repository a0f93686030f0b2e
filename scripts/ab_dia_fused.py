"""On-chip A/B: fused Pallas DIA kernel vs the XLA gather form.

    python scripts/ab_dia_fused.py [matrix ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from benchmark_spgemm_using_csr_tpu.ops.dia import dia_spgemm
from benchmark_spgemm_using_csr_tpu.sparse.dia import DIA
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.timing import (
    bench_delta_stats,
    runtime_zero_probe,
)

K1 = 8


def main():
    names = [x for x in sys.argv[1:] if not x.startswith("--")] or [
        "poisson2d_256", "banded_16k", "stencil27_32", "mc2depi_524k",
    ]
    for name in names:
        a_sp = generators.SUITE[name]()
        a_d = DIA.from_scipy(a_sp.todia())
        golden = None
        for fused in (False, True):
            c = jax.block_until_ready(dia_spgemm(a_d, a_d, fused=fused))
            dat = np.asarray(c.data)
            if golden is None:
                golden = (c.offsets, dat)
            else:
                assert c.offsets == golden[0]
                np.testing.assert_allclose(
                    dat, golden[1], rtol=1e-4, atol=1e-5
                )

            def kfac(k=K1, fused=fused):
                @jax.jit
                def run(plane):
                    def body(pl_c, _):
                        a_i = DIA(pl_c, a_d.offsets, a_d.shape)
                        ci = dia_spgemm(a_i, a_i, fused=fused)
                        eps = runtime_zero_probe(
                            ci.data.reshape(-1)
                        ).astype(pl_c.dtype)
                        return pl_c + eps, ci.data[0, 0]
                    _, outs = jax.lax.scan(body, plane, None, length=k)
                    return outs
                return run

            r = bench_delta_stats(
                kfac, lambda i: (a_d.data + jnp.float32(1e-6 * i),),
                k1=K1, name=f"{name}:fused={fused}", runs=2,
            )
            print(
                f"{name}: fused={int(fused)} nd={a_d.ndiag} "
                f"-> {r.per_s*1e6:9.1f} us (spread {r.spread:.1%}, "
                f"k2={r.k2})",
                flush=True,
            )


if __name__ == "__main__":
    main()
