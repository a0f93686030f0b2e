"""Headline benchmark: C = A @ A GFlops on the synthetic SuiteSparse-regime
suite, 1 TPU chip. Prints ONE JSON line.

Metric definitions (BASELINE.md): flops = 2 * sum_i nnzCt[i] (stage-1
intermediate-product count), GFlops = flops / time / 1e9. The timed call is
the full 4-stage pipeline (symbolic + on-device binning/chunk-mapping +
numeric + compaction). The shape plan (static buffer capacities) is built
once per matrix profile outside the loop — the analogue of the reference's
compile-time common.h bin constants + initData allocation, which its timed
loop also excludes.

Timing methodology: the reported number is **device execution time**,
measured by scanning K back-to-back full-pipeline iterations inside one
jitted dispatch (with a runtime data dependency between iterations so XLA
cannot CSE them). This machine reaches its TPU through the experimental
axon tunnel, which adds a ~26 ms host round-trip per dispatch
(scripts/micro_bench2.py). For slow pipelines (body >= ~15 ms) dividing
the K=8 wall by K leaves a <5 % residual and is reported directly. For
fast pipelines (DIA/BSR/dense bodies run in well under a millisecond) the
residual would DOMINATE, so the harness times a second scan of the same
body at a larger K2 (sized so K2 x body ~ 150 ms) and reports
(wall(K2) - wall(K)) / (K2 - K): the per-dispatch constant cancels
exactly — the same two-length in-graph delta CLAUDE.md mandates for all
on-chip stage timing, and the analogue of the reference's
cudaEventElapsedTime, which also excludes launch/driver latency
(SURVEY.md §3 component 7). Per-dispatch wall-clock (tunnel included) is
reported alongside in results.jsonl.

vs_baseline: no numbers could be extracted from the reference (BASELINE.md:
"published": {}); we normalize against 1.0 GFlops — the order-of-magnitude
center of the JPDC15 GTX-Titan-era results — so vs_baseline == value.

Delivery robustness (round 5 — VERDICT r4 #1: round 4's completed suite
produced a NULL official capture because this file buffered everything to
one end-of-run print and the driver's timeout killed it first):

- The headline line is emitted by a SIGTERM/SIGINT/SIGALRM handler too —
  a killed run flushes a ``"partial": true`` headline from whatever points
  have completed (round 4's rc=124 would have captured 20/20 points).
- ``BENCH_BUDGET_S=<seconds>``: a soft wall-clock budget. Sets an alarm
  at budget−45 s (flush margin), trims per-point repeats (3 → 2 → 1 as
  elapsed crosses 50% / 75% of budget), and skips the non-scored extras
  (ooc / f64 / RAP — they only feed results.jsonl + detail) when less
  than 15% of budget remains. The scored suite is never trimmed in
  membership, only in repeats.
- After every completed point the would-be headline is snapshotted to
  ``.bench_partial.json`` (gitignored) — recoverable even after SIGKILL.
- Observed full-run wall on this host: ~26-30 min warm (the old "35 s"
  note measured a 7-point suite in 2026-08-16; fem DIA points alone run
  minutes). Budget accordingly.
"""
from __future__ import annotations

import json
import sys

K_ITERS = 8  # residual floor bias = ~26 ms / K per pipeline; 8 keeps it <5%


class _Skip(Exception):
    """Point excluded by BENCH_ONLY (debug scoping)."""


def main() -> None:
    import jax

    # persistent compile cache: the K-scan executables cost ~75 s each to
    # build; cached across driver runs when supported by the backend
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from benchmark_spgemm_using_csr_tpu import (
        BSR,
        CSR,
        DIA,
        make_chunked_plan,
        spgemm_chunked,
        spgemm_flops,
    )
    from benchmark_spgemm_using_csr_tpu.ops.bsr import (
        bsr_spgemm,
        make_bsr_plan,
    )
    from benchmark_spgemm_using_csr_tpu.ops.dia import dia_spgemm
    from benchmark_spgemm_using_csr_tpu.ops.dense import (
        make_dense_plan,
        spgemm_dense,
    )
    from benchmark_spgemm_using_csr_tpu.ops.dispatch import choose_method
    from benchmark_spgemm_using_csr_tpu.utils import generators
    from benchmark_spgemm_using_csr_tpu.utils.timing import bench_delta_stats
    from benchmark_spgemm_using_csr_tpu.utils.results import write_result

    # ---- delivery robustness state (module docstring, round 5) ----
    import os as _os
    import signal as _signal
    import time as _time

    t_start = _time.perf_counter()
    budget_s = float(_os.environ.get("BENCH_BUDGET_S", "0") or 0.0)
    per_matrix: dict = {}
    f64_detail: dict = {}
    rap_detail: dict = {}
    _emitted = [False]

    def _elapsed() -> float:
        return _time.perf_counter() - t_start

    def _runs_now() -> int:
        """Repeat count under budget pressure: 3 (median) normally, 2 past
        half budget, 1 past three-quarters — membership is never trimmed."""
        if not budget_s:
            return 3
        frac = _elapsed() / budget_s
        return 3 if frac < 0.5 else (2 if frac < 0.75 else 1)

    def _budget_left(frac: float = 0.85) -> bool:
        """True while elapsed < frac x budget (always True without one)."""
        return (not budget_s) or _elapsed() < frac * budget_s

    def _headline_json(partial: bool = False) -> str:
        scored = {
            k: v for k, v in per_matrix.items() if not k.endswith("_ooc")
        }
        if scored:
            gmean = float(np.exp(np.mean(
                [np.log(max(v["gflops"], 1e-12)) for v in scored.values()]
            )))
        else:
            gmean = 0.0
        r1_names = ["er_medium", "powerlaw_medium", "poisson2d_256",
                    "banded_16k", "stencil27_32", "circuit_64k",
                    "dense_rows_2k"]
        r2_names = r1_names + ["webbase_1m", "econ_206k", "mc2depi_524k",
                               "scircuit_256k", "dense_rows_8k"]

        def _basis(names):
            vals = [np.log(per_matrix[k]["gflops"])
                    for k in names if k in per_matrix]
            return float(np.exp(np.mean(vals))) if vals else 0.0

        detail = {
            **{k: round(v["gflops"], 4) for k, v in per_matrix.items()},
            **f64_detail,
            **rap_detail,
            "n_scored": len(scored),
            "spread_max": round(
                max((v.get("spread", 0.0)
                     for v in per_matrix.values()), default=0.0), 4
            ),
            # earlier-round suite-basis gmeans for cross-round continuity
            # (each round widened the suite, so headline gmeans across
            # rounds only compare on a fixed basis)
            "gmean_r1suite": round(_basis(r1_names), 4),
            "gmean_r2suite": round(_basis(r2_names), 4),
        }
        if partial:
            detail["partial"] = True
            detail["elapsed_s"] = round(_elapsed(), 1)
        return json.dumps({
            "metric": "spgemm_gflops_gmean_1chip",
            "value": round(gmean, 4),
            "unit": "GFlops",
            "vs_baseline": round(gmean / 1.0, 4),
            "detail": detail,
        })

    def _emit(partial: bool = False) -> None:
        if _emitted[0]:
            return
        _emitted[0] = True
        # raw fd write: a signal handler must not trip over Python-level
        # stdout buffering/locks mid-print
        _os.write(1, (_headline_json(partial) + "\n").encode())

    def _snapshot() -> None:
        """Per-point crash insurance (SIGKILL leaves no handler)."""
        try:
            with open(".bench_partial.json", "w") as f:
                f.write(_headline_json(partial=True) + "\n")
        except OSError:
            pass

    def _flush_handler(signum, frame):  # pragma: no cover - signal path
        _emit(partial=True)
        _os._exit(0 if signum == _signal.SIGALRM else 128 + signum)

    for _sig in (_signal.SIGTERM, _signal.SIGINT, _signal.SIGALRM):
        _signal.signal(_sig, _flush_handler)
    if budget_s:
        _signal.alarm(int(max(60.0, budget_s - 45.0)))

    suite = {
        "er_medium": generators.SUITE["er_medium"],
        "powerlaw_medium": generators.SUITE["powerlaw_medium"],
        "poisson2d_256": generators.SUITE["poisson2d_256"],
        "banded_16k": generators.SUITE["banded_16k"],
        # reference-suite regime analogues (SURVEY.md §8): FEM / circuit /
        # dense-row stress
        "stencil27_32": generators.SUITE["stencil27_32"],
        "circuit_64k": generators.SUITE["circuit_64k"],
        "dense_rows_2k": generators.SUITE["dense_rows_2k"],
        # reference-SCALE points (VERDICT r1 #3): 1M rows (webbase-1M
        # analogue) and the 200-525k-row members of the published suite
        "webbase_1m": generators.SUITE["webbase_1m"],
        "econ_206k": generators.SUITE["econ_206k"],
        "mc2depi_524k": generators.SUITE["mc2depi_524k"],
        "scircuit_256k": generators.SUITE["scircuit_256k"],
        # >=100M-product point (1.2e9 products): block-dense at 4.7% element
        # density, so the dispatcher routes it to the full-MXU dense path
        "dense_rows_8k": generators.SUITE["dense_rows_8k"],
        # FEM-irregular family (VERDICT r2 #8): cant/consph/pdb1HYS
        # analogues — irregular ~40-80 nnz rows, no regular diagonals
        "fem_17k": generators.SUITE["fem_17k"],
        "fem_32k": generators.SUITE["fem_32k"],
        "pdb_8k": generators.SUITE["pdb_8k"],
        # irregular-mesh FEM (round 4): the regular fem members ride DIA
        # (~99 distinct diagonals, 64-122x measured — scripts/ab_fem_dia.py)
        # so this node-permuted variant keeps the unstructured-mesh mid-row
        # ESC regime represented in the suite
        "femirr_17k": generators.SUITE["femirr_17k"],
        # round-4 breadth (VERDICT r3 next #6): pattern-mtx end-to-end
        # (values synthesized by the reader), mouse_gene-like hub-row skew,
        # consph-scale FEM
        "pattern_circuit_64k": generators.SUITE["pattern_circuit_64k"],
        "hubrows_32k": generators.SUITE["hubrows_32k"],
        "fem_46k": generators.SUITE["fem_46k"],
        # round-5 breadth (VERDICT r4 missing #2): road-network ultra-
        # short rows, small-world graph, consph-scale second FEM density
        "road_1m": generators.SUITE["road_1m"],
        "smallworld_400k": generators.SUITE["smallworld_400k"],
        "consph_83k": generators.SUITE["consph_83k"],
    }
    # BENCH_ONLY=name1,name2 scopes a debug run to named points (suite
    # members, 'er_small_f64', 'rap_poisson2d_256', '*_ooc'); the headline
    # gmean is only meaningful on the full suite
    _only = _os.environ.get("BENCH_ONLY", "")
    _keep = set(filter(None, _only.split(",")))
    if _keep:
        suite = {k: v for k, v in suite.items() if k in _keep}
    # out-of-core demonstration on the same >=100M-product matrix: FORCED
    # through the row-batched path (the dispatcher would pick dense
    # in-core, see above) and timed as WALL CLOCK of the full
    # host-orchestrated call — reported in `detail` but EXCLUDED from the
    # gmean, which scores dispatcher-chosen paths only
    batched_suite = {"dense_rows_8k_ooc": generators.SUITE["dense_rows_8k"]}
    if _keep:
        batched_suite = {
            k: v for k, v in batched_suite.items() if k in _keep
        }

    from benchmark_spgemm_using_csr_tpu.utils.timing import runtime_zero_probe

    def k_loop_chunked(a, plan, k=K_ITERS):
        """K full pipelines in one dispatch; iteration i+1's A values carry
        a runtime-zero probe of EVERY output array of iteration i, so XLA
        cannot collapse the scan into one iteration NOR dead-code-eliminate
        stages (probing only rowptr[-1] silently dropped the compaction
        sort + run-sum — see utils/timing.runtime_zero_probe)."""

        @jax.jit
        def run(a):
            def body(a_c, _):
                c = spgemm_chunked(a_c, a_c, plan)
                eps = runtime_zero_probe(
                    c.rowptr, c.colidx, c.vals
                ).astype(a_c.vals.dtype)
                a_next = CSR(
                    a_c.rowptr, a_c.colidx, a_c.vals + eps, a_c.shape
                )
                return a_next, c.rowptr[-1]
            _, outs = jax.lax.scan(body, a, None, length=k)
            return outs

        return run

    def k_loop_dia(a_d, k=K_ITERS):
        """DIA path: like the BSR loop, the product stays in the format's
        own container (diagonal planes == C's values; offsets are static
        structure, the rowptr/colidx analogue)."""

        @jax.jit
        def run(a_plane):
            def body(plane, _):
                a_i = DIA(plane, a_d.offsets, a_d.shape)
                c = dia_spgemm(a_i, a_i)
                eps = runtime_zero_probe(c.data.reshape(-1)).astype(plane.dtype)
                return plane + eps, c.data[0, 0]
            _, outs = jax.lax.scan(body, a_plane, None, length=k)
            return outs

        return run

    def k_loop_dense(dplan, k=K_ITERS):
        # the plan is a jit ARGUMENT, not a closure capture: closed-over
        # arrays are baked into the HLO as constants, and at dense_rows_8k
        # scale the kept/disp slot maps are ~335 MB — over the axon
        # remote_compile request limit (HTTP 413, 2026-08-19)
        @jax.jit
        def run(a, plan):
            def body(a_c, _):
                c = spgemm_dense(a_c, a_c, plan)
                eps = runtime_zero_probe(c.vals).astype(a_c.vals.dtype)
                a_next = CSR(
                    a_c.rowptr, a_c.colidx, a_c.vals + eps, a_c.shape
                )
                return a_next, c.vals[0]
            _, outs = jax.lax.scan(body, a, None, length=k)
            return outs

        return lambda a: run(a, dplan)

    def k_loop_tilepack(sched, k=K_ITERS):
        from benchmark_spgemm_using_csr_tpu.ops.tilepack import (
            spgemm_tilepack,
        )

        @jax.jit
        def run(a):
            def body(a_c, _):
                c = spgemm_tilepack(a_c, a_c, sched)
                eps = runtime_zero_probe(
                    c.rowptr, c.colidx, c.vals
                ).astype(a_c.vals.dtype)
                a_next = CSR(
                    a_c.rowptr, a_c.colidx, a_c.vals + eps, a_c.shape
                )
                return a_next, c.rowptr[-1]
            _, outs = jax.lax.scan(body, a, None, length=k)
            return outs

        return run

    def k_loop_grouped(gsched, k=K_ITERS):
        from benchmark_spgemm_using_csr_tpu.ops.grouped import (
            spgemm_grouped,
        )

        @jax.jit
        def run(a):
            def body(a_c, _):
                c = spgemm_grouped(a_c, a_c, gsched)
                eps = runtime_zero_probe(
                    c.rowptr, c.colidx, c.vals
                ).astype(a_c.vals.dtype)
                a_next = CSR(
                    a_c.rowptr, a_c.colidx, a_c.vals + eps, a_c.shape
                )
                return a_next, c.rowptr[-1]
            _, outs = jax.lax.scan(body, a, None, length=k)
            return outs

        return run

    def k_loop_bsr(a_b, b_b, bplan, k=K_ITERS):
        @jax.jit
        def run(a_blocks):
            def body(blocks, _):
                a_i = BSR(a_b.rowptr, a_b.colidx, blocks, a_b.shape)
                c = bsr_spgemm(a_i, b_b, bplan)
                eps = runtime_zero_probe(
                    c.rowptr, c.colidx, c.blocks.reshape(-1)
                ).astype(blocks.dtype)
                return blocks + eps, c.rowptr[-1]
            _, outs = jax.lax.scan(body, a_blocks, None, length=k)
            return outs

        return run

    for name, factory in suite.items():
        a_sp = factory()
        a = CSR.from_scipy(a_sp)
        flops = spgemm_flops(a, a)
        method = choose_method(a)
        use_dia = method == "dia"
        use_bsr = method == "bsr"
        use_dense = method == "dense"
        if method == "tilepack":
            from benchmark_spgemm_using_csr_tpu.ops.tilepack import (
                make_tilepack_plan,
                spgemm_tilepack,
            )

            sched = make_tilepack_plan(a, a)
            if sched is None:  # cost model raced the regime gate
                method = "chunked"
            else:
                nnz_c = sched.plan.nnz_c
                kfac = lambda k=K_ITERS: k_loop_tilepack(sched, k)
                arg = a
        if method == "grouped":
            from benchmark_spgemm_using_csr_tpu.ops.grouped import (
                make_grouped_plan,
            )

            gsched = make_grouped_plan(a, a)
            if gsched is None:  # cost model raced the regime gate
                method = "chunked"
            else:
                nnz_c = gsched.plan.nnz_c
                kfac = lambda k=K_ITERS: k_loop_grouped(gsched, k)
                arg = a
        if method in ("tilepack", "grouped"):
            pass
        elif use_dia:
            a_d = DIA.from_scipy(a_sp)
            c_d = dia_spgemm(a_d, a_d)
            roof_extra = (a_d.data.shape[0], c_d.data.shape[0])
            csp = c_d.to_scipy().tocsr()
            csp.eliminate_zeros()  # in-plane zeros are not true C entries
            nnz_c = int(csp.nnz)
            kfac = lambda k=K_ITERS: k_loop_dia(a_d, k)
            arg = a_d.data
        elif use_dense:
            dplan = make_dense_plan(a, a)
            nnz_c = dplan.nnz_c
            kfac = lambda k=K_ITERS: k_loop_dense(dplan, k)
            arg = a
        elif use_bsr:
            a_b = BSR.from_scipy(a_sp, block_shape=(8, 128))
            b_b = BSR.from_scipy(a_sp, block_shape=(128, 128))
            bplan = make_bsr_plan(a_b, b_b)
            csp = bsr_spgemm(a_b, b_b, bplan).to_scipy().tocsr()
            csp.eliminate_zeros()  # in-block zeros are not true C entries
            nnz_c = int(csp.nnz)
            nnzb_c = len({(i // 8, j // 128)
                          for i, j in zip(*csp.nonzero())})
            roof_extra = (bplan.pairs_cap,
                          int(np.asarray(a_b.rowptr)[-1]),
                          int(np.asarray(b_b.rowptr)[-1]),
                          nnzb_c)
            kfac = lambda k=K_ITERS: k_loop_bsr(a_b, b_b, bplan, k)
            arg = a_b.blocks
        else:
            if method == "hash":
                # dense-accumulator path is host-orchestrated (multi-tile
                # dispatches); it has no winning regime on this chip
                # (ops/dispatch.estimate_hash_s) but if the model ever
                # picks it, time it honestly as wall clock instead
                method = "chunked"
            plan = make_chunked_plan(a, a)
            nnz_c = int(np.asarray(spgemm_chunked(a, a, plan).rowptr)[-1])
            kfac = lambda k=K_ITERS: k_loop_chunked(a, plan, k)
            arg = a

        # each run gets distinct value bits: the axon tunnel short-circuits
        # bitwise-identical re-dispatches without executing them
        # (utils/timing.py docstring), so repeats of one arg measure nothing
        if use_dia or use_bsr:
            vary = lambda i: (arg + jnp.float32(1e-6) * i,)
        else:  # chunked and dense carry the CSR itself
            vary = lambda i: (
                CSR(arg.rowptr, arg.colidx,
                    arg.vals + jnp.asarray(1e-6 * i, arg.vals.dtype),
                    arg.shape),
            )
        # fast bodies get the two-length delta so the ~26 ms dispatch
        # residual cancels exactly (module docstring; utils/timing.py);
        # the reported figure is the MEDIAN of >= 3 per-run estimates with
        # (max-min)/median spread recorded (VERDICT r2 weak #2)
        dres = bench_delta_stats(
            kfac, vary, k1=K_ITERS, name=name, flops=flops,
            runs=_runs_now(),
        )
        device_s, k2 = dres.per_s, dres.k2
        if dres.unstable:
            print(
                f"SPREAD ALERT {name}: {dres.spread:.1%} over"
                f" {len(dres.samples)} runs {dres.samples}",
                file=sys.stderr,
            )

        # speed-of-light fraction (analytic minimum HBM traffic / measured)
        from benchmark_spgemm_using_csr_tpu.utils.roofline import (
            bsr_stage_models,
            chunked_stage_models,
            dense_stage_models,
            dia_stage_models,
            grouped_stage_models,
            roofline_report,
            tilepack_stage_models,
        )

        nnz_a = int(np.asarray(a.rowptr)[-1])
        # plan-aware speed-of-light: each backend is measured against the
        # minimum time of the pipeline ITS PLAN selects, at the measured
        # platform-ceiling rates (roofline.ChipSpec docstring) — VERDICT r1
        # required every suite fraction <= 1.0
        if use_dia:
            models = dia_stage_models(*roof_extra, n=a.n)
        elif use_bsr:
            models = bsr_stage_models(*roof_extra)
        elif use_dense:
            models = dense_stage_models(
                a.m, a.n, a.n, nnz_a=nnz_a, nnz_c=nnz_c
            )
        elif method == "tilepack":
            models = tilepack_stage_models(
                sched.plan, nnz_a=nnz_a, nnz_b=nnz_a, m=a.m, nnz_c=nnz_c
            )
        elif method == "grouped":
            models = grouped_stage_models(
                gsched.plan, nnz_a=nnz_a, nnz_b=nnz_a, m=a.m, nnz_c=nnz_c
            )
        else:
            models = chunked_stage_models(
                plan, nnz_a=nnz_a, nnz_b=nnz_a, m=a.m, nnz_c=nnz_c
            )
        sol = roofline_report(models, total_time_s=device_s)["_total"]
        per_matrix[name] = {
            "gflops": flops / device_s / 1e9,
            "device_s": device_s,
            "nnz_per_s": nnz_c / device_s,
            "flops": flops,
            "nnz_c": nnz_c,
            "method": method,
            "k2_delta": k2,
            "spread": round(dres.spread, 4),
            "sol_fraction": round(float(sol.get("sol_fraction", 0.0)), 4),
        }
        write_result(
            "results.jsonl",
            {"matrix": name,
             "config": (f"C=A*A 1chip K{K_ITERS}-amortized" if not k2
                        else f"C=A*A 1chip delta(K{k2},K{K_ITERS})"),
             **per_matrix[name]},
        )
        _snapshot()

    # ---- rectangular A @ B pair points (round 4, VERDICT r3 next #6):
    # three distinct dims through the pair-aware dispatch; SCORED in the
    # headline gmean. BOTH operands ride the scan carry with the probe eps
    # so B-dependent plan work (aligned table build) stays inside the
    # timed body — closing B over the scan would let XLA hoist it.
    for name, pfactory in generators.SUITE_PAIRS.items():
        if _keep and name not in _keep:
            continue
        a_sp, b_sp = pfactory()
        a = CSR.from_scipy(a_sp)
        b = CSR.from_scipy(b_sp)
        flops = spgemm_flops(a, b)
        from benchmark_spgemm_using_csr_tpu.ops import dispatch as _D

        est = {
            "chunked": _D.estimate_chunked_s(a, b),
            "grouped": _D.estimate_grouped_s(a, b),
            "tilepack": _D.estimate_tilepack_s(a, b),
        }
        meth = min(est, key=est.get)
        fn = None
        if meth == "grouped":
            from benchmark_spgemm_using_csr_tpu.ops.grouped import (
                make_grouped_plan, spgemm_grouped,
            )

            sched_p = make_grouped_plan(a, b)
            if sched_p is not None:
                nnz_c = sched_p.plan.nnz_c
                fn = lambda u, v, s=sched_p: spgemm_grouped(u, v, s)
        if fn is None and meth == "tilepack":
            from benchmark_spgemm_using_csr_tpu.ops.tilepack import (
                make_tilepack_plan, spgemm_tilepack,
            )

            sched_p = make_tilepack_plan(a, b)
            if sched_p is not None:
                nnz_c = sched_p.plan.nnz_c
                fn = lambda u, v, s=sched_p: spgemm_tilepack(u, v, s)
        if fn is None:
            meth = "chunked"
            plan_p = make_chunked_plan(a, b)
            nnz_c = int(np.asarray(
                spgemm_chunked(a, b, plan_p).rowptr)[-1])
            fn = lambda u, v, s=plan_p: spgemm_chunked(u, v, s)

        def k_loop_pair(k=K_ITERS, fn=fn, b=b):
            @jax.jit
            def run(a_c, b_c):
                def body(carry, _):
                    a_i, b_i = carry
                    c = fn(a_i, b_i)
                    eps = runtime_zero_probe(
                        c.rowptr, c.colidx, c.vals
                    ).astype(a_i.vals.dtype)
                    a_n = CSR(a_i.rowptr, a_i.colidx, a_i.vals + eps,
                              a_i.shape)
                    b_n = CSR(b_i.rowptr, b_i.colidx, b_i.vals + eps,
                              b_i.shape)
                    return (a_n, b_n), c.rowptr[-1]
                _, outs = jax.lax.scan(body, (a_c, b_c), None, length=k)
                return outs

            return lambda a_c: run(a_c, b)

        dres = bench_delta_stats(
            k_loop_pair,
            lambda i: (CSR(a.rowptr, a.colidx,
                           a.vals + jnp.asarray(1e-6 * i, a.vals.dtype),
                           a.shape),),
            k1=K_ITERS, name=name, flops=flops, runs=_runs_now(),
        )
        sol_pair = 0.0
        try:
            from benchmark_spgemm_using_csr_tpu.utils.roofline import (
                chunked_stage_models as _csm,
                grouped_stage_models as _gsm,
                roofline_report as _rr,
                tilepack_stage_models as _tsm,
            )

            nnz_a_p = int(np.asarray(a.rowptr)[-1])
            nnz_b_p = int(np.asarray(b.rowptr)[-1])
            mdl = {"grouped": _gsm, "tilepack": _tsm, "chunked": _csm}[meth]
            models_p = mdl(
                sched_p.plan if meth in ("grouped", "tilepack") else plan_p,
                nnz_a=nnz_a_p, nnz_b=nnz_b_p, m=a.m, nnz_c=nnz_c,
            )
            sol_pair = _rr(models_p, total_time_s=dres.per_s)[
                "_total"]["sol_fraction"]
        except Exception as e:  # pragma: no cover
            print(f"pair roofline failed: {e!r}", file=sys.stderr)
        per_matrix[name] = {
            "gflops": flops / dres.per_s / 1e9,
            "device_s": dres.per_s,
            "nnz_per_s": nnz_c / dres.per_s,
            "flops": flops,
            "nnz_c": nnz_c,
            "method": meth,
            "k2_delta": dres.k2,
            "spread": round(dres.spread, 4),
            "sol_fraction": round(float(sol_pair), 4),
        }
        write_result(
            "results.jsonl",
            {"matrix": name,
             "config": f"C=A@B rectangular 1chip delta(K{dres.k2},K{K_ITERS})",
             **per_matrix[name]},
        )
        _snapshot()

    # ---- scored suite complete: everything below is non-scored extras
    # (ooc wall / f64 mini-suite / RAP) that feed results.jsonl + detail
    # only. Under a tight budget, emit the headline NOW and skip them —
    # the official capture must never ride on the extras finishing
    # (VERDICT r4 #1).
    if not _budget_left(0.85):
        print(f"budget: {_elapsed():.0f}s of {budget_s:.0f}s used — "
              "emitting headline, skipping extras", file=sys.stderr)
        _emit()

    from benchmark_spgemm_using_csr_tpu.ops.batched import spgemm_batched

    if not _budget_left(0.85):
        batched_suite = {}
    for name, factory in batched_suite.items():
        a = CSR.from_scipy(factory())
        flops = spgemm_flops(a, a)
        walls = []
        nnz_c = 0
        for i in range(3):  # first call compiles (persistent cache amortizes)
            a_i = CSR(
                a.rowptr, a.colidx,
                a.vals + jnp.asarray(1e-6 * i, a.vals.dtype), a.shape,
            )
            t0 = _time.perf_counter()
            # as_scipy=None: C lands on device when it fits HBM — forcing a
            # host copy added ~80 s of axon-tunnel D2H to the measurement
            c = spgemm_batched(a_i, a_i, as_scipy=None)
            if isinstance(c, CSR):
                # VALUE fetch, not block_until_ready: the tunnel defers
                # dispatches without executing (CLAUDE.md trap). ROUND-4
                # CORRECTION: the old guard was `hasattr(c, "nnz")` —
                # but CSR has an .nnz property too, so the device path
                # NEVER synced and rounds 2-3 recorded only the
                # dispatch-ISSUE cost (~4 x 26 ms ≈ the whole 21.8-23.2
                # GF "wall") while the real MXU work ran deferred after
                # the timer stopped. This fetch makes the wall honest.
                float(np.asarray(c.vals[:1])[0])
            walls.append(_time.perf_counter() - t0)
            nnz_c = int(np.asarray(c.rowptr)[-1]) if isinstance(
                c, CSR
            ) else int(c.nnz)
        wall = min(walls[1:])  # exclude the compile run
        # OOC roofline (VERDICT r3 next #7): price the batched plan's
        # per-block dense-MXU stages + one-pass assembly against the wall
        # clock (host orchestration included, so this is a lower bound on
        # the sol fraction)
        sol_b = 0.0
        try:
            from benchmark_spgemm_using_csr_tpu.ops.batched import (
                _cached_plan,
            )
            from benchmark_spgemm_using_csr_tpu.utils.roofline import (
                batched_dense_stage_models,
                roofline_report,
            )

            bplan_ooc = _cached_plan(a, a, 64 * 1024 * 1024, None)
            if bplan_ooc.method == "dense":
                models_b = batched_dense_stage_models(
                    bplan_ooc, kdim=a.n, n=a.n,
                    nnz_a=int(np.asarray(a.rowptr)[-1]),
                )
                sol_b = roofline_report(
                    models_b, total_time_s=wall
                )["_total"]["sol_fraction"]
        except Exception as e:  # pragma: no cover
            print(f"ooc roofline failed: {e!r}", file=sys.stderr)
        per_matrix[name] = {
            "gflops": flops / wall / 1e9,
            "device_s": wall,
            "nnz_per_s": nnz_c / wall,
            "flops": flops,
            "nnz_c": nnz_c,
            "method": "batched",
            "k2_delta": 0,
            "sol_fraction": round(float(sol_b), 4),
        }
        write_result(
            "results.jsonl",
            {"matrix": name,
             "config": "C=A*A 1chip wall-clock batched (out-of-core)",
             **per_matrix[name]},
        )

    # ---- measured FP64 mini-suite (VERDICT r2 #7 / r3 next #3): one
    # grouped double-word-lane point + two DIA plane-FMA points, each
    # verified vs the x64 scipy oracle at rtol 1e-12 (with atol 1e-12 for
    # cancellation-tiny entries: TPU f64 is double-double-emulated,
    # ~2^-48/op — measured abs error <= 9e-14 on fem's 73-term rows).
    # Reported in `detail` with per-point f32-sibling ratios and an f64
    # mini-gmean; EXCLUDED from the f32 headline gmean.
    f64_points = {
        "er_small_f64": ("grouped",
                         lambda: generators.erdos_renyi(4096, 4096, 8.0)),
        "poisson2d_256_f64": ("dia",
                              lambda: generators.SUITE["poisson2d_256"]()),
        "fem_17k_f64": ("dia", lambda: generators.SUITE["fem_17k"]()),
        # dense (not bsr): the f64-emulated block einsum loses the
        # streaming fusion and materializes the (P,128,128) f64 b-block
        # gather — a 34 GB allocation at dense_rows_2k's 65k pairs
        # (compile-time HBM OOM, measured 2026-08-21); BSR-f64 only fits
        # small-pairs regimes like banded_16k_f64
        "dense_rows_2k_f64": ("dense",
                              lambda: generators.SUITE["dense_rows_2k"]()),
        # round 5 (VERDICT r4 #4): an at-scale irregular point on the
        # grouped dd lane and the new BSR emulated-f64 einsum lane
        "scircuit_f64": ("grouped",
                         lambda: generators.SUITE["scircuit_256k"]()),
        "banded_16k_f64": ("bsr",
                           lambda: generators.SUITE["banded_16k"]()),
    }
    try:
        jax.config.update("jax_enable_x64", True)
        for name64, (meth64, fac64) in f64_points.items():
            if _keep and name64 not in _keep:
                continue
            if not _budget_left(0.9):
                _emit()
                break
            try:
                a_sp64 = fac64().astype(np.float64)
                rng64 = np.random.default_rng(0)
                a_sp64.data = a_sp64.data * (
                    1.0 + 1e-8 * rng64.standard_normal(a_sp64.nnz)
                )
                a64 = CSR.from_scipy(a_sp64, dtype=jnp.float64)
                flops64 = spgemm_flops(a64, a64)
                want = (a_sp64 @ a_sp64).tocsr()
                want.sort_indices()
                want.eliminate_zeros()
                if meth64 == "dia":
                    a_d64 = DIA.from_scipy(a_sp64)
                    c64 = jax.block_until_ready(dia_spgemm(a_d64, a_d64))
                    csp64 = c64.to_scipy().tocsr()
                    csp64.eliminate_zeros()
                    nnz_c64 = int(csp64.nnz)
                    assert nnz_c64 == want.nnz, (nnz_c64, want.nnz)
                    np.testing.assert_allclose(
                        csp64.data, want.data, rtol=1e-12, atol=1e-12
                    )
                    kfac64 = lambda k=K_ITERS: k_loop_dia(a_d64, k)
                    vary64 = lambda i: (
                        a_d64.data + jnp.float64(1e-9) * i,
                    )
                elif meth64 == "bsr":
                    a_b64 = BSR.from_scipy(a_sp64, block_shape=(8, 128))
                    b_b64 = BSR.from_scipy(a_sp64, block_shape=(128, 128))
                    bplan64 = make_bsr_plan(a_b64, b_b64)
                    c64 = jax.block_until_ready(
                        bsr_spgemm(a_b64, b_b64, bplan64)
                    )
                    csp64 = c64.to_scipy().tocsr()
                    csp64.eliminate_zeros()
                    nnz_c64 = int(csp64.nnz)
                    # structure-union compare: in-block explicit zeros are
                    # eliminated, so diff against the golden via sparse
                    # subtraction (handles any cancelled-entry asymmetry)
                    diff = abs(csp64 - want).tocoo()
                    scale = float(np.abs(want.data).max()) if want.nnz else 1.0
                    assert diff.nnz == 0 or float(diff.data.max()) <= (
                        1e-12 * max(scale, 1.0)
                    ), float(diff.data.max())
                    kfac64 = lambda k=K_ITERS: k_loop_bsr(
                        a_b64, b_b64, bplan64, k
                    )
                    vary64 = lambda i: (
                        a_b64.blocks + jnp.float64(1e-9) * i,
                    )
                elif meth64 == "dense":
                    # f64 MXU: XLA's emulated-f64 matmul measured 1.89
                    # TF/s on-chip (16x under f32-HIGHEST's 30.3 —
                    # scripts/ab_f64.py) — still far above any sort path
                    dplan64 = make_dense_plan(a64, a64)
                    c64 = jax.block_until_ready(
                        spgemm_dense(a64, a64, dplan64)
                    )
                    # dense keeps explicit zeros at structural positions,
                    # matching scipy's unpruned structural product
                    want_np = (a_sp64 @ a_sp64).tocsr()
                    want_np.sort_indices()
                    nnz_c64 = dplan64.nnz_c
                    assert nnz_c64 == want_np.nnz, (nnz_c64, want_np.nnz)
                    np.testing.assert_allclose(
                        np.asarray(c64.vals)[:nnz_c64], want_np.data,
                        rtol=1e-12, atol=1e-12,
                    )
                    kfac64 = lambda k=K_ITERS: k_loop_dense(dplan64, k)
                    vary64 = lambda i: (
                        CSR(a64.rowptr, a64.colidx,
                            a64.vals + jnp.asarray(
                                1e-9 * i, a64.vals.dtype),
                            a64.shape),
                    )
                else:
                    from benchmark_spgemm_using_csr_tpu.ops.grouped import (
                        make_grouped_plan as _mk_g64,
                        spgemm_grouped as _sp_g64,
                    )

                    gsched64 = _mk_g64(a64, a64)
                    c64 = jax.block_until_ready(
                        _sp_g64(a64, a64, gsched64)
                    )
                    nnz_c64 = int(np.asarray(c64.rowptr)[-1])
                    assert nnz_c64 == want.nnz, (nnz_c64, want.nnz)
                    np.testing.assert_allclose(
                        np.asarray(c64.vals)[:nnz_c64], want.data,
                        rtol=1e-12, atol=1e-12,
                    )
                    kfac64 = lambda k=K_ITERS: k_loop_grouped(gsched64, k)
                    vary64 = lambda i: (
                        CSR(a64.rowptr, a64.colidx,
                            a64.vals + jnp.asarray(
                                1e-9 * i, a64.vals.dtype),
                            a64.shape),
                    )
                dres64 = bench_delta_stats(
                    kfac64, vary64, k1=K_ITERS, name=name64, flops=flops64,
                    runs=_runs_now(),
                )
                f64_detail[name64] = round(
                    flops64 / dres64.per_s / 1e9, 4
                )
                write_result(
                    "results.jsonl",
                    {"matrix": name64,
                     "config": ("C=A*A 1chip f64 (emulated) K-scan; vs "
                                "x64 scipy rtol 1e-12 atol 1e-12"),
                     "gflops": flops64 / dres64.per_s / 1e9,
                     "device_s": dres64.per_s, "flops": flops64,
                     "nnz_c": nnz_c64, "method": f"{meth64}-f64",
                     "k2_delta": dres64.k2,
                     "spread": round(dres64.spread, 4),
                     "verified_rtol": 1e-12},
                )
            except Exception as e:  # pragma: no cover
                print(f"f64 point {name64} failed: {e!r}", file=sys.stderr)
        if f64_detail:
            f64_detail["gmean_f64"] = round(float(np.exp(np.mean(
                [np.log(v) for v in f64_detail.values()]
            ))), 4)
    finally:
        jax.config.update("jax_enable_x64", False)

    # ---- Galerkin R·A·P point (VERDICT r2 next #2): the general A@B
    # dispatch exercised as a benchmark — two chained rectangular SpGEMMs
    # (A@P then R@(AP)) in ONE jitted K-scan. Each product's method is
    # cost-model-chosen among the CSR-native backends (format backends
    # would force a mid-chain conversion). Reported in `detail`; excluded
    # from the C=A·A gmean (different op).
    try:
        if _keep and "rap_poisson2d_256" not in _keep:
            raise _Skip
        if not _budget_left(0.9):
            _emit()
            raise _Skip
        from benchmark_spgemm_using_csr_tpu.models.amg import (
            aggregation_prolongator,
        )
        from benchmark_spgemm_using_csr_tpu.ops import dispatch as D

        a_sp = generators.SUITE["poisson2d_256"]()
        p_sp = aggregation_prolongator(a_sp).astype(np.float32).tocsr()
        a_r = CSR.from_scipy(a_sp)
        p_r = CSR.from_scipy(p_sp)
        r_r = CSR.from_scipy(p_sp.T.tocsr())

        def _csr_stage(x, y):
            """Dispatch one chained product among the CSR-in/CSR-out
            backends; returns (method, jit-able fn bound to its plan)."""
            est = {
                "chunked": D.estimate_chunked_s(x, y),
                "grouped": D.estimate_grouped_s(x, y),
                "tilepack": D.estimate_tilepack_s(x, y),
            }
            meth = min(est, key=est.get)
            if meth == "grouped":
                from benchmark_spgemm_using_csr_tpu.ops.grouped import (
                    make_grouped_plan, spgemm_grouped,
                )

                sched = make_grouped_plan(x, y)
                if sched is not None:
                    return "grouped", (
                        lambda u, v, s=sched: spgemm_grouped(u, v, s)
                    )
            if meth == "tilepack":
                from benchmark_spgemm_using_csr_tpu.ops.tilepack import (
                    make_tilepack_plan, spgemm_tilepack,
                )

                sched = make_tilepack_plan(x, y)
                if sched is not None:
                    return "tilepack", (
                        lambda u, v, s=sched: spgemm_tilepack(u, v, s)
                    )
            plan = make_chunked_plan(x, y)
            return "chunked", lambda u, v, s=plan: spgemm_chunked(u, v, s)

        # fused Galerkin numeric (round 4, VERDICT r3 next #5): one
        # gather + segmented-scan dispatch on the precomputed triple plan
        # vs the chained two-pipeline product — both verified, both
        # recorded; the headline rap number takes the faster (fused).
        from benchmark_spgemm_using_csr_tpu.ops.reuse import (
            make_triple_plan, spgemm_triple,
        )

        tsched = make_triple_plan(r_r, a_r, p_r)
        m1, f1 = _csr_stage(a_r, p_r)
        c1 = jax.block_until_ready(f1(a_r, p_r))  # fixes AP structure
        m2, f2 = _csr_stage(r_r, c1)
        # correctness gate: the timed pipeline must match scipy
        want_rap = (p_sp.T @ (a_sp @ p_sp)).tocsr()
        want_rap.sort_indices()
        want_rap.eliminate_zeros()
        got_rap = f2(r_r, c1).to_scipy().tocsr()
        got_rap.sort_indices()
        got_rap.eliminate_zeros()
        assert got_rap.nnz == want_rap.nnz, (got_rap.nnz, want_rap.nnz)
        np.testing.assert_allclose(
            got_rap.data, want_rap.data, rtol=1e-3, atol=1e-4
        )
        flops_rap = spgemm_flops(a_r, p_r) + spgemm_flops(r_r, c1)

        def k_loop_rap(k=K_ITERS):
            @jax.jit
            def run(a_c):
                def body(a_i, _):
                    ap_i = f1(a_i, p_r)
                    c_i = f2(r_r, ap_i)
                    eps = runtime_zero_probe(
                        ap_i.rowptr, ap_i.colidx, ap_i.vals,
                        c_i.rowptr, c_i.colidx, c_i.vals,
                    ).astype(a_c.vals.dtype)
                    a_next = CSR(
                        a_i.rowptr, a_i.colidx, a_i.vals + eps, a_i.shape
                    )
                    return a_next, c_i.rowptr[-1]
                _, outs = jax.lax.scan(body, a_c, None, length=k)
                return outs

            return run

        dres_rap = bench_delta_stats(
            k_loop_rap,
            lambda i: (CSR(a_r.rowptr, a_r.colidx,
                           a_r.vals + jnp.asarray(1e-6 * i, a_r.vals.dtype),
                           a_r.shape),),
            k1=K_ITERS, name="rap_poisson2d_256", flops=flops_rap,
        )
        write_result(
            "results.jsonl",
            {"matrix": "rap_poisson2d_256",
             "config": f"RAP Galerkin 1chip K-scan [{m1}+{m2}]",
             "gflops": flops_rap / dres_rap.per_s / 1e9,
             "device_s": dres_rap.per_s, "flops": flops_rap,
             "nnz_c": int(want_rap.nnz), "method": f"{m1}+{m2}",
             "k2_delta": dres_rap.k2, "spread": round(dres_rap.spread, 4)},
        )
        best_rap_s, best_rap_m = dres_rap.per_s, f"{m1}+{m2}"
        if tsched is not None:
            got_t = spgemm_triple(r_r, a_r, p_r, tsched).to_scipy().tocsr()
            got_t.sort_indices()
            got_t.eliminate_zeros()
            assert got_t.nnz == want_rap.nnz, (got_t.nnz, want_rap.nnz)
            np.testing.assert_allclose(
                got_t.data, want_rap.data, rtol=1e-3, atol=1e-4
            )

            def k_loop_triple(k=K_ITERS):
                @jax.jit
                def run(a_c):
                    def body(a_i, _):
                        c_i = spgemm_triple(r_r, a_i, p_r, tsched)
                        eps = runtime_zero_probe(c_i.vals).astype(
                            a_c.vals.dtype
                        )
                        a_next = CSR(
                            a_i.rowptr, a_i.colidx, a_i.vals + eps,
                            a_i.shape
                        )
                        # triple plans carry C's structure as CONSTANTS:
                        # the per-iteration output must be data-dependent
                        # (vals[0]) or XLA DCEs the whole scan — returning
                        # rowptr[-1] here measured 1.4 us for a ~ms body
                        # (the utils/timing probe trap, round 4)
                        return a_next, c_i.vals[0]
                    _, outs = jax.lax.scan(body, a_c, None, length=k)
                    return outs

                return run

            dres_t = bench_delta_stats(
                k_loop_triple,
                lambda i: (CSR(a_r.rowptr, a_r.colidx,
                               a_r.vals + jnp.asarray(
                                   1e-6 * i, a_r.vals.dtype),
                               a_r.shape),),
                k1=K_ITERS, name="rap_triple", flops=flops_rap,
            )
            write_result(
                "results.jsonl",
                {"matrix": "rap_poisson2d_256",
                 "config": "RAP fused triple-plan 1chip K-scan",
                 "gflops": flops_rap / dres_t.per_s / 1e9,
                 "device_s": dres_t.per_s, "flops": flops_rap,
                 "nnz_c": int(want_rap.nnz), "method": "triple",
                 "k2_delta": dres_t.k2,
                 "spread": round(dres_t.spread, 4)},
            )
            if dres_t.per_s < best_rap_s:
                best_rap_s, best_rap_m = dres_t.per_s, "triple"
        # aggregation-structured fast path (round 5, VERDICT r4 #7): P is
        # a piecewise-constant aggregation, so RAP is a relabel-and-merge
        # of A's entries — plan-constant keys/scales, zero gathers, one
        # small sort (ops/aggrap docstring)
        from benchmark_spgemm_using_csr_tpu.ops.aggrap import (
            make_aggrap_plan, rap_aggregation,
        )

        agsched = make_aggrap_plan(r_r, a_r, p_r)
        if agsched is not None:
            got_g = rap_aggregation(a_r, agsched).to_scipy().tocsr()
            got_g.sort_indices()
            got_g.eliminate_zeros()
            assert got_g.nnz == want_rap.nnz, (got_g.nnz, want_rap.nnz)
            np.testing.assert_allclose(
                got_g.data, want_rap.data, rtol=1e-3, atol=1e-4
            )

            def k_loop_agg(k=K_ITERS):
                @jax.jit
                def run(a_c):
                    def body(a_i, _):
                        c_i = rap_aggregation(a_i, agsched)
                        eps = runtime_zero_probe(c_i.vals).astype(
                            a_c.vals.dtype
                        )
                        a_next = CSR(
                            a_i.rowptr, a_i.colidx, a_i.vals + eps,
                            a_i.shape
                        )
                        # C structure is a plan constant — the probe must
                        # be data-dependent (vals[0]), as with triple
                        return a_next, c_i.vals[0]
                    _, outs = jax.lax.scan(body, a_c, None, length=k)
                    return outs

                return run

            dres_g = bench_delta_stats(
                k_loop_agg,
                lambda i: (CSR(a_r.rowptr, a_r.colidx,
                               a_r.vals + jnp.asarray(
                                   1e-6 * i, a_r.vals.dtype),
                               a_r.shape),),
                k1=K_ITERS, name="rap_aggrap", flops=flops_rap,
                runs=_runs_now(),
            )
            write_result(
                "results.jsonl",
                {"matrix": "rap_poisson2d_256",
                 "config": "RAP aggregation relabel-merge 1chip K-scan",
                 "gflops": flops_rap / dres_g.per_s / 1e9,
                 "device_s": dres_g.per_s, "flops": flops_rap,
                 "nnz_c": int(want_rap.nnz), "method": "aggrap",
                 "k2_delta": dres_g.k2,
                 "spread": round(dres_g.spread, 4)},
            )
            if dres_g.per_s < best_rap_s:
                best_rap_s, best_rap_m = dres_g.per_s, "aggrap"
        rap_detail["rap_poisson2d_256"] = round(
            flops_rap / best_rap_s / 1e9, 4
        )
    except _Skip:
        pass
    except Exception as e:  # pragma: no cover - report, don't sink the suite
        print(f"RAP point failed: {e!r}", file=sys.stderr)

    # one official headline line (a no-op if the budget path or a signal
    # already emitted — at most ONE line ever reaches stdout), plus a
    # results.jsonl copy of the full headline for the record
    _signal.alarm(0)
    _emit()
    write_result(
        "results.jsonl",
        {"matrix": "_headline", "config": "bench.py full run",
         "headline": json.loads(_headline_json()),
         "wall_s": round(_elapsed(), 1)},
    )
    try:
        _os.remove(".bench_partial.json")
    except OSError:
        pass


if __name__ == "__main__":
    sys.exit(main())
