"""Probe the fold-round comb body at production shape: where do the
~0.46 s/round go, vs the ~2 Tops/s VPU rate a single fused gl.mul chain
achieves (scripts/tpu_op_rates.py)?

Variants at the r0 shape (rows=90, 24, n): single packed ring-mul, a
comp-split comb-like chain, and the comb with the row-sum + Tb weighting.
Slope timing (ITERS_HI - ITERS_LO inside one jit) cancels dispatch/fetch.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

IT_LO, IT_HI = 2, 10


def slope_time(make_fn, args, reps=3):
    f_lo, f_hi = make_fn(IT_LO), make_fn(IT_HI)
    np.asarray(jax.device_get(f_lo(*args)))
    np.asarray(jax.device_get(f_hi(*args)))
    best = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(jax.device_get(f_lo(*args)))
        t_lo = time.time() - t0
        t0 = time.time()
        np.asarray(jax.device_get(f_hi(*args)))
        t_hi = time.time() - t0
        best.append((t_hi - t_lo) / (IT_HI - IT_LO))
    return min(best)


def report(name, seconds, gmul=None):
    row = {"name": name, "ms_per_iter": round(seconds * 1e3, 3)}
    if gmul:
        row["eff_G_glmul_per_s"] = round(gmul / max(seconds, 1e-12) / 1e9, 1)
    print(json.dumps(row), flush=True)


def main():
    from latticeum_tpu import backend as B
    B.use_jax()
    from latticeum_tpu.field import goldilocks as gl, fq3
    from latticeum_tpu.ring import rq

    rows, n = 90, 1 << 16
    rng = np.random.default_rng(0)
    tl = (jnp.asarray(rng.integers(0, 1 << 32, (rows, 24, n),
                                   dtype=np.uint32)),
          jnp.asarray(rng.integers(0, 1 << 31, (rows, 24, n),
                                   dtype=np.uint32)))
    elems = rows * 24 * n          # Fq values
    ring_gmul = elems * (7 / 3)    # fq3 Karatsuba: ~7 gl.mul per 3 Fq vals

    # A: one packed ring mul per iteration (x <- x*x elementwise per slot)
    def make_A(iters):
        @jax.jit
        def f(x0, x1):
            def body(i, acc):
                return rq.ntt_mul_t(acc, (x0, x1))
            out = jax.lax.fori_loop(0, iters, body, (x0, x1))
            return jnp.sum(out[0][..., :4].astype(jnp.float32))
        return f

    report("A_ntt_mul_t_packed", slope_time(make_A, tl), gmul=ring_gmul)

    # B: comp-split chain — square + (f^2 - 1) * mu*f (the comb's per-point
    # work), carried in component form
    def make_B(iters):
        @jax.jit
        def f(x0, x1):
            f3 = rq._as_slots_t((x0, x1))

            def body(i, acc):
                fsq = fq3.square(acc)
                one = tuple((jnp.uint32(b == 0) + 0 * fsq[b][0],
                             0 * fsq[b][1]) for b in range(3))
                fac = fq3.sub(fsq, one)
                return fq3.mul(acc, fac)
            out = jax.lax.fori_loop(0, iters, body, f3)
            return jnp.sum(out[0][0][..., :4].astype(jnp.float32))
        return f

    report("B_compsplit_sq_mul", slope_time(make_B, tl),
           gmul=elems / 3 * (5 + 7))

    # C: B + row-sum + Tb weight + column-sum (one full comb point)
    Tb = (jnp.asarray(rng.integers(0, 1 << 32, (24, n), dtype=np.uint32)),
          jnp.asarray(rng.integers(0, 1 << 31, (24, n), dtype=np.uint32)))

    def make_C(iters):
        @jax.jit
        def f(x0, x1, t0, t1):
            f3 = rq._as_slots_t((x0, x1))
            Tb3 = rq._as_slots_t((t0, t1))

            def body(i, carry):
                acc3, s = carry
                fsq = fq3.square(acc3)
                one = tuple((jnp.uint32(b == 0) + 0 * fsq[b][0],
                             0 * fsq[b][1]) for b in range(3))
                ev = fq3.mul(acc3, fq3.sub(fsq, one))
                evs = tuple(gl.sum_axis(ev[c], axis=0) for c in range(3))
                evs = fq3.mul(evs, Tb3)
                s3 = tuple(gl.sum_axis(evs[c], axis=-1) for c in range(3))
                s = gl.add(s, s3[0])
                return (fq3.add(acc3, acc3), s)
            z = (jnp.zeros((8,), jnp.uint32), jnp.zeros((8,), jnp.uint32))
            out = jax.lax.fori_loop(0, iters, body, (f3, z))
            return jnp.sum(out[1][0].astype(jnp.float32))
        return f

    report("C_full_comb_point", slope_time(make_C, tl + Tb),
           gmul=elems / 3 * (5 + 7 + 7) + elems)

    # D: pure gl.mul chain on the same packed buffer (reference fused rate)
    def make_D(iters):
        @jax.jit
        def f(x0, x1):
            def body(i, acc):
                return gl.mul(acc, (x0, x1))
            out = jax.lax.fori_loop(0, iters, body, (x0, x1))
            return jnp.sum(out[0][..., :4].astype(jnp.float32))
        return f

    report("D_gl_mul_packed", slope_time(make_D, tl), gmul=elems)

    # E: D with the chunked-fori structure the round kernels use
    chunks = 4
    cs = n // chunks

    def make_E(iters):
        @jax.jit
        def f(x0, x1):
            def body(i, acc):
                j = i % chunks
                a = (jax.lax.dynamic_slice(x0, (0, 0, j * cs),
                                           (rows, 24, cs)),
                     jax.lax.dynamic_slice(x1, (0, 0, j * cs),
                                           (rows, 24, cs)))
                m = gl.mul(a, a)
                m = gl.mul(m, a)
                s = gl.sum_axis(m, axis=-1)
                return (acc[0] + s[0], acc[1] + s[1])
            z = (jnp.zeros((rows, 24), jnp.uint32),
                 jnp.zeros((rows, 24), jnp.uint32))
            out = jax.lax.fori_loop(0, iters * chunks, body, z)
            return jnp.sum(out[0].astype(jnp.float32))
        return f

    report("E_chunked_2glmul_sum", slope_time(make_E, tl),
           gmul=elems * 2)


if __name__ == "__main__":
    main()
