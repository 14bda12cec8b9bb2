"""Measure jit compile time of the sum-check building blocks on the current
backend (run with JAX_PLATFORMS=cpu or default axon/TPU).

Isolates: (a) a pure comb round (fori + group products, no challenger),
(b) a single Poseidon2 perm16 scan, (c) a full challenger round-trip
(observe 96 + sample + re-observe), (d) the combined per-round kernel.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/probe_cache_none")

import numpy as np  # noqa: E402

t0 = time.time()


def log(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)


import jax  # noqa: E402

plat = jax.default_backend()
log(f"backend: {plat} devices={jax.devices()}")

from latticeum_tpu import backend as B  # noqa: E402
from latticeum_tpu.field import fq3, goldilocks as gl  # noqa: E402
from latticeum_tpu.zkvm import accel_fs  # noqa: E402
from latticeum_tpu.zkvm.accel_fs import DevChallenger, WIDTH  # noqa: E402

B.use_jax()

N = int(os.environ.get("PROBE_N", "1024"))
T_ROWS = int(os.environ.get("PROBE_T", "126"))

rng = np.random.default_rng(0)
mz_lo = rng.integers(0, 1 << 31, (T_ROWS, 8, N), dtype=np.uint32)
mz_hi = rng.integers(0, 1 << 31, (T_ROWS, 8, N), dtype=np.uint32)
st = (np.zeros((1, WIDTH), np.uint32), np.zeros((1, WIDTH), np.uint32))
vals96 = (rng.integers(0, 1 << 31, (96,), dtype=np.uint32),
          rng.integers(0, 1 << 31, (96,), dtype=np.uint32))


def timeit(name, fn, *args):
    t = time.time()
    out = jax.block_until_ready(jax.jit(fn)(*args))
    log(f"{name}: compile+run {time.time()-t:.2f}s")
    t = time.time()
    out = jax.block_until_ready(jax.jit(fn)(*args))
    log(f"{name}: cached run {time.time()-t:.3f}s")
    return out


# (a) pure comb round: 3-point eval fori over products of 4-row groups
def comb_round(lo, hi):
    import jax.numpy as jnp
    half = lo.shape[-1] // 2
    groups = [np.arange(i, i + 4, dtype=np.int32) for i in range(0, 24, 4)]

    def body(t, acc):
        tl = t.astype(jnp.uint32)
        tz = jnp.zeros((), jnp.uint32)
        v0 = (lo[..., :half], hi[..., :half])
        v1 = (lo[..., half:], hi[..., half:])
        step = gl.sub(v1, v0)
        vals = gl.add(v0, gl.mul(step, (tl, tz)))
        tot = None
        for g in groups:
            prod = (vals[0][g[0]], vals[1][g[0]])
            for j in g[1:]:
                prod = gl.mul(prod, (vals[0][j], vals[1][j]))
            tot = prod if tot is None else gl.add(tot, prod)
        s = gl.sum_axis(tot, axis=-1)
        return (acc[0].at[t].set(s[0]), acc[1].at[t].set(s[1]))

    init = (jnp.zeros((3, 8), jnp.uint32), jnp.zeros((3, 8), jnp.uint32))
    return jax.lax.fori_loop(0, 3, body, init)


timeit("comb_round(fori, no challenger)", comb_round, mz_lo, mz_hi)


# (b) one perm16 (scan form)
def perm16(s):
    return accel_fs._perm16_scan(s)


timeit("perm16_scan", perm16, st)


# (b2) eight chained perm16s (scan form) in one jit
def perm16_x8(s):
    for _ in range(8):
        s = accel_fs._perm16_scan(s)
    return s


timeit("perm16_scan x8", perm16_x8, st)


# (c) challenger round-trip: observe 96 values, draw challenge, observe 24
def chal_round(s, v):
    ch = DevChallenger(s, [], [])
    ch.observe_array(v)
    c3 = ch.get_challenge()
    post = (B.xp.stack([c3[j][0] for j in range(3)] * 8),
            B.xp.stack([c3[j][1] for j in range(3)] * 8))
    ch.observe_array(post)
    return ch.state


timeit("challenger_round (96+3+24)", chal_round, st, vals96)


# (d) combined: comb + challenger in one kernel
def combined(lo, hi, s, v):
    sums = comb_round(lo, hi)
    ch = DevChallenger(s, [], [])
    ch.observe_array((sums[0].reshape(-1), sums[1].reshape(-1)))
    c3 = ch.get_challenge()
    half = lo.shape[-1] // 2
    r3 = tuple((x[0], x[1]) for x in c3)
    v0 = (lo[..., :half], hi[..., :half])
    v1 = (lo[..., half:], hi[..., half:])
    comps = tuple((v0[0][..., c::3, :][0], v0[1][..., c::3, :][0])
                  for c in range(3))
    _ = comps
    step = gl.sub(v1, v0)
    from latticeum_tpu.ring import rq
    folded = gl.add(v0, rq.ntt_scalar_mul_t(step, r3))
    return folded, ch.state


timeit("combined round", combined, mz_lo, mz_hi, st, vals96)
log("done")
