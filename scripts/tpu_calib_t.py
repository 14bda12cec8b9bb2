"""TPU calibration: production-scale sum-check rounds with the BATCHED combs
and the fixed-buffer kernel (one compile per comb, reused every round).
Measures compile time + steady-state per round for both sum-checks."""

import faulthandler
import signal
import sys
import time

faulthandler.register(signal.SIGUSR1)
sys.path.insert(0, "/root/repo")

import numpy as np

t0 = time.time()


def log(m):
    print(f"[{time.time()-t0:.1f}s] {m}", flush=True)


from latticeum_tpu import backend as B
from latticeum_tpu.field import goldilocks as gl
from latticeum_tpu.zkvm import accel_t
from latticeum_tpu.zkvm.accel import DeviceEngine
from latticeum_tpu.zkvm.builder import create_riscv_ccs
from latticeum_tpu.zkvm.layout import CCSLayout
from latticeum_tpu.zkvm.params import default_params


def sync(engine, x):
    return np.asarray(engine.jax.tree_util.tree_leaves(x)[0])


def main():
    p = default_params()
    ccs = create_riscv_ccs(CCSLayout(p))
    cap = max(M.max_row for M in ccs.M) + 1
    cap_pow2 = min(1 << (cap - 1).bit_length(), ccs.m)
    log(f"ccs built; max_row+1={cap} cap_pow2={cap_pow2} m={ccs.m}")
    eng = DeviceEngine(ccs, p, tail_threshold=1024)
    log("engine ready")

    comb_t = accel_t.make_comb_lin_batched(
        tuple(tuple(s) for s in ccs.S), ccs.t)
    with B.numpy_mode():
        consts = gl.from_int(np.array([list(c) for c in ccs.c],
                                      dtype=object))
    consts_dev = eng.put(consts)

    rng = np.random.default_rng(0)
    g_lo = rng.integers(0, 1 << 32, size=(ccs.t + 1, 24, cap_pow2),
                        dtype=np.uint32)
    g_hi = rng.integers(0, 0xFFFFFFFE, size=(ccs.t + 1, 24, cap_pow2),
                        dtype=np.uint32)
    g = eng.put((g_lo, g_hi))
    log(f"lin g uploaded ({g_lo.nbytes*2/1e9:.1f} GB)")

    def round_fn(c, consts):
        return accel_t.sumcheck_round_t(c, ccs.d + 1, comb_t, consts)

    jf = eng._jit(("lin_cal", ccs.t + 1, cap_pow2), round_fn)
    with B.jax_mode():
        out = jf(g, consts_dev)
    sync(eng, out[0])
    log("lin round COMPILED+ran")
    t1 = time.time()
    with B.jax_mode():
        out = jf(g, consts_dev)
    sync(eng, out[0])
    log(f"lin round steady: {time.time()-t1:.3f}s")

    # interleave-fold kernel
    ff = eng._jit(("foldk_cal", ccs.t + 1, cap_pow2),
                  accel_t.interleave_fold_t)
    with B.numpy_mode():
        from latticeum_tpu.poly import mle as mle_mod
        r_limbs = mle_mod.fq3_const((3, 5, 7))
    with B.jax_mode():
        nxt = ff(out[1], out[2], eng.put_small(r_limbs))
    sync(eng, nxt)
    log("interleave-fold COMPILED+ran")
    t1 = time.time()
    with B.jax_mode():
        nxt = ff(out[1], out[2], eng.put_small(r_limbs))
    sync(eng, nxt)
    log(f"interleave-fold steady: {time.time()-t1:.3f}s")

    # folding sum-check round at full m
    K = p.K
    nmles = 5 + 2 * K * 3
    m = ccs.m
    comb_f = accel_t.make_comb_fold_batched(p.B_SMALL, K)
    with B.numpy_mode():
        from latticeum_tpu.nifs import folding as fold
        mu = [(i + 2, i + 3, i + 4) for i in range(2 * K)]
        mu_c = fold.mu_consts(mu)
    mu_dev = eng.put(mu_c)
    f_lo = rng.integers(0, 1 << 32, size=(nmles, 24, m), dtype=np.uint32)
    f_hi = rng.integers(0, 0xFFFFFFFE, size=(nmles, 24, m), dtype=np.uint32)
    gf = eng.put((f_lo, f_hi))
    log(f"fold g uploaded ({f_lo.nbytes*2/1e9:.1f} GB)")

    def fround(c, consts):
        return accel_t.sumcheck_round_t(c, 2 * p.B_SMALL, comb_f, consts)

    jf2 = eng._jit(("fold_cal", nmles, m), fround)
    with B.jax_mode():
        out = jf2(gf, mu_dev)
    sync(eng, out[0])
    log("fold round COMPILED+ran")
    t1 = time.time()
    with B.jax_mode():
        out = jf2(gf, mu_dev)
    sync(eng, out[0])
    log(f"fold round steady: {time.time()-t1:.3f}s")


if __name__ == "__main__":
    main()
