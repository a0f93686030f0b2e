"""Packed vs unpacked merge key paths must agree."""
import numpy as np
import pytest

from benchmark_spgemm_using_csr_tpu import CSR
from benchmark_spgemm_using_csr_tpu.ops.chunked import (
    _expand_chunks,
    _rc_pack_bits,
    make_chunked_plan,
    merge_products,
)
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.oracle import (
    assert_csr_equal,
    spgemm_reference,
)


@pytest.mark.parametrize("pack", [True, False])
def test_merge_pack_paths_agree(pack):
    a = CSR.from_scipy(generators.erdos_renyi(300, 300, 6.0, seed=7))
    plan = make_chunked_plan(a, a)
    row, col, val = _expand_chunks(a, a, plan.k, plan.chunks_cap)
    c = merge_products(row, col, val, a.m, a.n, plan.out_cap,
                       plan.max_run, pack=pack)
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)


def test_pack_bits_limits():
    assert _rc_pack_bits(16384, 16384) > 0
    assert _rc_pack_bits(65536, 65536) == 0
    assert _rc_pack_bits(1 << 14, 1 << 16) == 0  # (m+1)<<17 >= 2^31


def test_pack_forced_on_too_large_raises():
    import jax.numpy as jnp

    z = jnp.zeros(8, jnp.int32)
    with pytest.raises(ValueError):
        merge_products(z, z, z.astype(jnp.float32), 1 << 16, 1 << 16, 8,
                       pack=True)
