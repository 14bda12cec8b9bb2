"""Compile-only HBM audit of every production-scale device kernel.

For each hot jit in the fold path this lowers the function at REAL production
shapes (CCS m=2^17, t=125, K=15 -> 95-MLE fold stack, 126-MLE lin stack),
compiles it on the attached TPU and prints XLA's buffer-assignment numbers
(argument/output/temp/alias sizes).  No large arrays are ever allocated, so
the audit itself cannot OOM; it tells us exactly which kernel's temp budget
blew the 16 GB v5e in BENCH_r01 (RESOURCE_EXHAUSTED mid-fold).

Usage: python scripts/mem_audit.py [kernel ...]
  kernels: sums_fold fold_round sums_lin build_g matvecs eqT witness
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/latticeum_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def gb(x):
    return f"{x / (1 << 30):.3f} GB"


def report(name, compiled, t0):
    try:
        ma = compiled.memory_analysis()
        print(f"[{name}] compile {time.time()-t0:.1f}s  "
              f"args={gb(ma.argument_size_in_bytes)} "
              f"out={gb(ma.output_size_in_bytes)} "
              f"temp={gb(ma.temp_size_in_bytes)} "
              f"alias={gb(ma.alias_size_in_bytes)} "
              f"gen={gb(ma.generated_code_size_in_bytes)}", flush=True)
        total = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
        print(f"[{name}] PEAK(program) ~ {gb(total)}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[{name}] memory_analysis failed: {e}", flush=True)


def main():
    sel = set(sys.argv[1:]) or {
        "sums_fold", "fold_round", "sums_lin", "build_g", "lin_g_t",
        "matvecs", "eqT", "witness"}

    import jax
    from jax import ShapeDtypeStruct as SDS
    import latticeum_tpu.backend as B
    from latticeum_tpu.zkvm.prover import ZkVmProver
    from latticeum_tpu.zkvm import accel_t
    from latticeum_tpu.nifs import folding as fold

    t_all = time.time()
    prover = ZkVmProver(device=True, t_layout=True)
    dn = prover.dn
    ccs = prover.ccs
    print(f"prover built in {time.time()-t_all:.1f}s  "
          f"m={ccs.m} n={ccs.n} t={ccs.t}", flush=True)

    u32 = np.uint32
    m = ccs.m
    K = prover.params.K
    TAU = 3
    k_fold = 5 + 2 * K * TAU          # 95
    k_lin = ccs.t + 1                 # 126
    deg_fold = 2 * prover.params.B_SMALL
    deg_lin = ccs.d + 1

    def pair(*shape):
        return (SDS(shape, u32), SDS(shape, u32))

    def lower_compile(name, fn, *args, donate_argnums=()):
        t0 = time.time()
        with B.jax_mode():
            jf = jax.jit(fn, donate_argnums=donate_argnums)
            lowered = jf.lower(*args)
            compiled = lowered.compile()
        report(name, compiled, t0)

    def chunks_for(k, n):
        chunk_budget = int(os.environ.get("SUM_CHUNK_BYTES", 192 << 20))
        bytes_half = k * 24 * (n // 2) * 8
        chunks = 1
        while (bytes_half // chunks > chunk_budget
               and (n // 2) % (chunks * 2) == 0):
            chunks *= 2
        return chunks

    if "probe" in sel or True:
        # layout probe: does the backend pad a minor dim of 24 to 128 lanes?
        for shape in [(131072, 24), (24, 131072), (30, 3, 131072, 24)]:
            t0 = time.time()
            with B.jax_mode():
                jf = jax.jit(lambda x: (x[0] + 1, x[1] + 1))
                compiled = jf.lower(pair(*shape)).compile()
            logical = 2 * np.prod(shape) * 4
            try:
                ma = compiled.memory_analysis()
                print(f"[probe {shape}] logical={gb(logical)} "
                      f"arg={gb(ma.argument_size_in_bytes)} "
                      f"out={gb(ma.output_size_in_bytes)} "
                      f"temp={gb(ma.temp_size_in_bytes)}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"[probe {shape}] failed: {e}", flush=True)

    if "sums_fold" in sel:
        comb = dn._fold_comb_t
        ch = chunks_for(k_fold, m)
        print(f"sums_fold: k={k_fold} n={m} deg={deg_fold} chunks={ch}",
              flush=True)

        def sums_fn(ps, consts):
            return accel_t.sumcheck_sums_parts(ps, deg_fold, comb, consts,
                                               chunks=ch)

        lower_compile("sums_fold", sums_fn,
                      [pair(5, 24, m), pair(2 * K * TAU, 24, m)],
                      pair(2 * K, 3))

    if "fold_round" in sel:
        r3 = (pair(), pair(), pair())
        lower_compile("fold_round", accel_t.fold_round_parts, r3,
                      SDS((5, 24, m), u32), SDS((5, 24, m), u32),
                      SDS((2 * K * TAU, 24, m), u32),
                      SDS((2 * K * TAU, 24, m), u32),
                      donate_argnums=(1, 2, 3, 4))

    if "sums_lin" in sel:
        comb = dn._lin_comb_t
        ch = chunks_for(k_lin, m)
        print(f"sums_lin: k={k_lin} n={m} deg={deg_lin} chunks={ch}",
              flush=True)

        def sums_fn(c, consts):
            return accel_t.sumcheck_sums_t(c, deg_lin, comb, consts,
                                           chunks=ch)

        lower_compile("sums_lin", sums_fn, pair(k_lin, 24, m),
                      pair(len(ccs.c), 24))

    if "build_g" in sel:
        # replicate _build_g's jitted fn at abstract shapes
        import types

        zeta_shape = (2 * K, ccs.t, 3)
        alpha_shape = (2 * K * TAU, 3)

        captured = {}

        def run(fhats, zs, eq1, eq2, eqb, alpha, zeta):
            fn = dn._build_g_fn()
            return fn(fhats, zs, eq1, eq2, eqb, alpha, zeta)

        if hasattr(dn, "_build_g_fn"):
            lower_compile(
                "build_g", run,
                pair(2 * K, TAU, m, 24), pair(2 * K, ccs.n, 24),
                pair(m, 24), pair(m, 24), pair(m, 24),
                pair(*alpha_shape), pair(*zeta_shape), donate_argnums=(0,))
        else:
            print("build_g: dn._build_g_fn not exposed; skipping", flush=True)

    if "lin_g_t" in sel:
        from latticeum_tpu.zkvm.accel_t import bitrev_indices
        mm = dn._cap_pow2
        brev = bitrev_indices(int(np.log2(mm)))
        with B.jax_mode():
            dn._brev_rows = [
                B.xp.asarray(brev[np.asarray(M["rows"])])
                for M in dn.e.M_dev]
            dn._brev_idx = B.xp.asarray(brev)
        # reuse the method's inner fn by lowering through a wrapper jit
        from latticeum_tpu.field import goldilocks as gl
        from latticeum_tpu.ring import rq

        def fn(z, e):
            outs = []
            for M, br in zip(dn.e.M_dev, dn._brev_rows):
                zg = (z[0][M["cols"]], z[1][M["cols"]])
                if M["vals"][0].ndim == 1:
                    sv = (M["vals"][0][:, None], M["vals"][1][:, None])
                    prod = gl.mul(sv, zg)
                else:
                    prod = rq.ntt_mul(M["vals"], zg)
                s = B.segment_sum(
                    B.xp.moveaxis(B.xp.stack(
                        [prod[0] & gl.MASK16, prod[0] >> 16,
                         prod[1] & gl.MASK16, prod[1] >> 16]), 0, -1),
                    br, mm)
                mz = gl._combine_cols_small(B.xp.moveaxis(s, -1, 0))
                outs.append((B.xp.moveaxis(mz[0], 0, 1),
                             B.xp.moveaxis(mz[1], 0, 1)))
            eqt = (B.xp.moveaxis(e[0], 0, 1)[:, dn._brev_idx],
                   B.xp.moveaxis(e[1], 0, 1)[:, dn._brev_idx])
            outs.append(eqt)
            return (B.xp.stack([o[0] for o in outs]),
                    B.xp.stack([o[1] for o in outs]))

        lower_compile("lin_g_t", fn, pair(ccs.n, 24), pair(mm, 24))

    if "matvecs" in sel:
        cap = dn._cap_pow2

        def fn(z):
            from latticeum_tpu.field import goldilocks as gl
            from latticeum_tpu.ring import rq
            outs = []
            for M in dn.e.M_dev:
                zg = (z[0][M["cols"]], z[1][M["cols"]])
                if M["vals"][0].ndim == 1:
                    sv = (M["vals"][0][:, None], M["vals"][1][:, None])
                    prod = gl.mul(sv, zg)
                else:
                    prod = rq.ntt_mul(M["vals"], zg)
                s = B.segment_sum(
                    B.xp.moveaxis(B.xp.stack(
                        [prod[0] & gl.MASK16, prod[0] >> 16,
                         prod[1] & gl.MASK16, prod[1] >> 16]), 0, -1),
                    M["rows"], cap)
                outs.append(gl._combine_cols_small(B.xp.moveaxis(s, -1, 0)))
            return (B.xp.stack([o[0] for o in outs]),
                    B.xp.stack([o[1] for o in outs]))

        lower_compile("matvecs", fn, pair(ccs.n, 24))

    if "eqT" in sel:
        def fn(e):
            from latticeum_tpu.field import goldilocks as gl
            from latticeum_tpu.ring import rq
            outs = []
            for M in dn.e.M_dev:
                yg = (e[0][M["rows"]], e[1][M["rows"]])
                if M["vals"][0].ndim == 1:
                    sv = (M["vals"][0][:, None], M["vals"][1][:, None])
                    prod = gl.mul(sv, yg)
                else:
                    prod = rq.ntt_mul(M["vals"], yg)
                s = B.segment_sum(
                    B.xp.moveaxis(B.xp.stack(
                        [prod[0] & gl.MASK16, prod[0] >> 16,
                         prod[1] & gl.MASK16, prod[1] >> 16]), 0, -1),
                    M["cols"], ccs.n)
                outs.append(gl._combine_cols_small(B.xp.moveaxis(s, -1, 0)))
            return (B.xp.stack([o[0] for o in outs]),
                    B.xp.stack([o[1] for o in outs]))

        lower_compile("eqT", fn, pair(dn._cap, 24))

    if "witness" in sel:
        from latticeum_tpu.ring import decompose as dc, rq
        from latticeum_tpu.nifs.structs import Witness
        Bp, L = prover.params.B, prover.params.L

        def fn(w):
            w_coeff = rq.icrt(w)
            f_coeff = dc.gadget_decompose(w_coeff, Bp, L)
            f = rq.crt(f_coeff)
            f_hat = Witness.build_fhat(f_coeff)
            return f_coeff, f, f_hat

        lower_compile("witness", fn, pair(prover.layout.w_size, 24))

    print(f"total {time.time()-t_all:.1f}s", flush=True)


if __name__ == "__main__":
    main()
