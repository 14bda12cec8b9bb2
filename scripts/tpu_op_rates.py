"""Measure the REAL primitive op rates on the attached TPU chip.

Settles the round-kernel roofline question (VERDICT r04 weak #1): the
sum-check comb kernels are built from uint32 limb arithmetic — if the
VPU's effective u32 multiply rate is the ceiling, the path to a faster
step is a different *representation* (f32 digit planes) or *algorithm*
(fewer field muls), not kernel scheduling.

Timing method: the axon link's `block_until_ready` is unreliable (the
first version of this script measured 42 TB/s "bandwidth"), so every
measurement loops the op inside ONE jit via `lax.fori_loop` (dependent
iterations) and is forced by a scalar fetch; the per-iteration time is
the SLOPE between ITERS_HI and ITERS_LO runs, which cancels dispatch,
fetch, and any constant overhead exactly.
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

IT_LO, IT_HI = 4, 36


def slope_time(make_fn, x, reps=3):
    """make_fn(iters) -> jitted fn(x) that loops the body `iters` times and
    returns a small forcing value.  Returns seconds per iteration."""
    f_lo, f_hi = make_fn(IT_LO), make_fn(IT_HI)
    np.asarray(jax.device_get(f_lo(x)))  # compile + warm
    np.asarray(jax.device_get(f_hi(x)))
    best = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(jax.device_get(f_lo(x)))
        t_lo = time.time() - t0
        t0 = time.time()
        np.asarray(jax.device_get(f_hi(x)))
        t_hi = time.time() - t0
        best.append((t_hi - t_lo) / (IT_HI - IT_LO))
    return min(best)


def report(name, seconds, ops=None, bytes_=None):
    row = {"name": name, "ms_per_iter": round(seconds * 1e3, 4)}
    if ops:
        row["Gops"] = round(ops / max(seconds, 1e-12) / 1e9, 1)
    if bytes_:
        row["GBps"] = round(bytes_ / max(seconds, 1e-12) / 1e9, 1)
    print(json.dumps(row), flush=True)


def main():
    from latticeum_tpu import backend as B
    B.use_jax()
    from latticeum_tpu.field import goldilocks as gl, fq3
    from latticeum_tpu.ring import rq

    N = 1 << 23  # 8M elements, 32 MB per u32 array
    rng = np.random.default_rng(0)
    a32 = jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.uint32))
    b32 = jnp.asarray(rng.integers(1, 1 << 32, N, dtype=np.uint32))
    af = jnp.asarray(rng.random(N, dtype=np.float32) + 1.0)
    bf = jnp.asarray(rng.random(N, dtype=np.float32) + 1.0)

    def loop(body):
        def make(iters):
            @jax.jit
            def f(x):
                out = jax.lax.fori_loop(0, iters, body, x)
                if isinstance(out, tuple):
                    return sum(jnp.sum(o[..., :8].astype(jnp.float32))
                               if hasattr(o, "astype") else 0.0
                               for o in jax.tree_util.tree_leaves(out))
                return jnp.sum(out[..., :8].astype(jnp.float32))
            return f
        return make

    # u32 elementwise: acc = acc * b + b (data-dependent chain, no folding)
    report("u32_muladd", slope_time(
        loop(lambda i, acc: acc * b32 + b32), a32), ops=2 * N)
    report("u32_add", slope_time(
        loop(lambda i, acc: (acc + b32) ^ jnp.uint32(1)), a32), ops=2 * N)
    report("u32_mul16bit", slope_time(
        loop(lambda i, acc: (acc & jnp.uint32(0xFFFF)) * (b32 >> 16)
             + b32), a32), ops=3 * N)
    report("f32_fma", slope_time(
        loop(lambda i, acc: acc * bf + bf), af), ops=2 * N)
    report("f32_carry", slope_time(
        loop(lambda i, acc: acc - jnp.floor(acc * (1.0 / 256.0)) * 256.0
             + bf), af), ops=4 * N)

    # field ops
    ap = (a32, b32 >> jnp.uint32(1))

    def gl_mul_body(i, acc):
        return gl.mul(acc, ap)

    def gl_add_body(i, acc):
        return gl.add(acc, ap)

    report("gl_mul", slope_time(loop(gl_mul_body), ap), ops=N)
    report("gl_add", slope_time(loop(gl_add_body), ap), ops=N)

    # fq3 on component triples
    M = N // 4
    a3 = tuple((a32[:M], b32[:M] >> jnp.uint32(1)) for _ in range(3))

    def fq3_mul_body(i, acc):
        return fq3.mul(acc, a3)

    def fq3_sq_body(i, acc):
        return fq3.square(acc)

    report("fq3_mul", slope_time(loop(fq3_mul_body), a3), ops=M)
    report("fq3_square", slope_time(loop(fq3_sq_body), a3), ops=M)

    # packed t-layout ring mul (the round kernels' workhorse)
    rows, m = 90, 1 << 14
    tl = (jnp.asarray(rng.integers(0, 1 << 32, (rows, 24, m),
                                   dtype=np.uint32)),
          jnp.asarray(rng.integers(0, 1 << 31, (rows, 24, m),
                                   dtype=np.uint32)))

    def ntt_body(i, acc):
        return rq.ntt_mul_t(acc, tl)

    ring_elems = rows * 24 * m
    report("ntt_mul_t_90x24x16384", slope_time(loop(ntt_body), tl),
           ops=ring_elems, bytes_=3 * 2 * ring_elems * 4)

    # HBM stream: out = in + 1 on 128 MB
    big = jnp.asarray(rng.integers(0, 1 << 32, (1 << 25,), dtype=np.uint32))
    report("hbm_stream", slope_time(
        loop(lambda i, acc: acc + jnp.uint32(1)), big),
        bytes_=2 * big.size * 4)

    # dispatch floor: chained trivial kernels, forced once
    tiny = jnp.zeros((8, 128), jnp.uint32)

    @jax.jit
    def bump(x):
        return x + jnp.uint32(1)

    np.asarray(jax.device_get(bump(tiny)))
    for it in (10, 50):
        t0 = time.time()
        r = tiny
        for _ in range(it):
            r = bump(r)
        np.asarray(jax.device_get(r))
        if it == 10:
            t10 = time.time() - t0
        else:
            t50 = time.time() - t0
    report("dispatch_chained", (t50 - t10) / 40)

    # fetch RTT: single tiny fetch
    ts = []
    for _ in range(10):
        t0 = time.time()
        np.asarray(jax.device_get(bump(tiny)))
        ts.append(time.time() - t0)
    report("dispatch_plus_fetch_rtt", min(ts))


if __name__ == "__main__":
    main()
