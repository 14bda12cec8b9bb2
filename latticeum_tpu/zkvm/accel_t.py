"""Transposed-layout (TPU-native) sum-check kernels.

Two layout decisions driven by TPU tiling (see accel.py for the host/device
split):
  * ring coordinates on axis -2, hypercube on the minor axis — the 24-wide
    ring axis on lanes padded 24->128 and OOM'd HBM at production scale;
  * the hypercube is stored BIT-REVERSED (variable 0 = top bit), so each
    sum-check round splits the array into two contiguous halves instead of
    stride-2 gathers; Mz rows are bit-reversed statically in the COO and eq
    tables are built in reversed variable order.  All round messages are
    bit-exact with the host path.
"""

from __future__ import annotations

import numpy as np

from .. import backend as B
from ..field import goldilocks as gl, host as H
from ..poly import mle as mle_mod
from ..ring import rq


def bitrev_indices(n_bits: int) -> np.ndarray:
    n = 1 << n_bits
    idx = np.arange(n)
    out = np.zeros(n, dtype=np.int64)
    for b in range(n_bits):
        out |= ((idx >> b) & 1) << (n_bits - 1 - b)
    return out


def build_eq_table_rev(r_fq3_list, max_rows=None):
    """eq table with bit-REVERSED index order: bit (nv-1-i) = x_i.

    Same doubling as mle.build_eq_table but processing variables in reverse
    so variable 0 lands on the top bit."""
    cur = mle_mod.from_rings([H.ntt_from_u64(1)], 0)
    for r in reversed(r_fq3_list):
        rd = mle_mod.fq3_const(r)
        one_minus = mle_mod.fq3_const(H.fq3_sub((1, 0, 0), r))
        low = rq.ntt_scalar_mul(cur, one_minus)
        high = rq.ntt_scalar_mul(cur, rd)
        cur = (B.xp.concatenate([low[0], high[0]]),
               B.xp.concatenate([low[1], high[1]]))
    if max_rows is not None:
        cur = (cur[0][:max_rows], cur[1][:max_rows])
    return cur


def make_comb_lin_t(S):
    """Linearization comb for (k, 24, n)-layout stacks."""
    def comb(vals, consts):
        lo, hi = vals
        total = None
        for i, S_i in enumerate(S):
            had = None
            for j in S_i:
                term = (lo[j], hi[j])
                had = term if had is None else rq.ntt_mul_t(had, term)
            ci = (consts[0][i][:, None], consts[1][i][:, None])
            term = gl.mul(had, ci) if False else rq.ntt_mul_t(
                had, (B.xp.broadcast_to(ci[0], had[0].shape),
                      B.xp.broadcast_to(ci[1], had[1].shape)))
            total = term if total is None else gl.add(total, term)
        return rq.ntt_mul_t(total, (lo[-1], hi[-1]))
    return comb


def make_comb_fold_t(b_small, K, TAU=3):
    def comb(vals, consts):
        lo, hi = vals
        result = gl.add(rq.ntt_mul_t((lo[0], hi[0]), (lo[1], hi[1])),
                        rq.ntt_mul_t((lo[2], hi[2]), (lo[3], hi[3])))
        eq_b = (lo[4], hi[4])
        for k in range(2 * K):
            mu_dev = ((consts[0][k, 0], consts[1][k, 0]),
                      (consts[0][k, 1], consts[1][k, 1]),
                      (consts[0][k, 2], consts[1][k, 2]))
            inter = gl.zeros(lo[0].shape)
            for d in range(TAU - 1, -1, -1):
                f_i = (lo[5 + k * TAU + d], hi[5 + k * TAU + d])
                f_sq = rq.ntt_mul_t(f_i, f_i)
                ev = eq_b
                for b in range(1, b_small):
                    bb = gl.from_int(np.array(H.ntt_from_u64(b * b),
                                              dtype=object))
                    bbt = (B.xp.broadcast_to(B.xp.asarray(bb[0])[:, None],
                                             f_sq[0].shape),
                           B.xp.broadcast_to(B.xp.asarray(bb[1])[:, None],
                                             f_sq[1].shape))
                    ev = rq.ntt_mul_t(ev, gl.sub(f_sq, bbt))
                ev = rq.ntt_mul_t(ev, f_i)
                inter = rq.ntt_scalar_mul_t(gl.add(inter, ev), mu_dev)
            result = gl.add(result, inter)
        return result
    return comb


def sumcheck_round_t(cur, degree, comb_fn, consts):
    """One round in transposed+bit-reversed layout.

    cur: (k, 24, n).  v0 = first half (top bit 0), v1 = second half.
    Returns (sums (deg+1, 24), v0, step).

    Under jax the deg+1 evaluation points run through ONE traced comb inside
    a fori_loop (vals(t) = v0 + t*step) — the remote TPU compiler was
    OOM-killed by deg+1 inlined copies of the 126-mle comb graph.
    """
    lo, hi = cur
    n = lo.shape[-1]
    half = n // 2
    v0 = (lo[..., :half], hi[..., :half])
    v1 = (lo[..., half:], hi[..., half:])
    step = gl.sub(v1, v0)

    if B.is_jax():
        import jax
        import jax.numpy as jnp

        def body(t, sums):
            tl = t.astype(jnp.uint32)
            tz = jnp.zeros((), jnp.uint32)
            vals = gl.add(v0, gl.mul(step, (tl, tz)))
            e = comb_fn(vals, consts)
            s = gl.sum_axis(e, axis=-1)
            return (sums[0].at[t].set(s[0]), sums[1].at[t].set(s[1]))

        init = (jnp.zeros((degree + 1, 24), jnp.uint32),
                jnp.zeros((degree + 1, 24), jnp.uint32))
        out = jax.lax.fori_loop(0, degree + 1, body, init)
        return out, v0, step

    sums = []
    vals = v0
    e = comb_fn(v0, consts)
    sums.append(gl.sum_axis(e, axis=-1))
    vals = v1
    e = comb_fn(v1, consts)
    sums.append(gl.sum_axis(e, axis=-1))
    for _t in range(2, degree + 1):
        vals = gl.add(vals, step)
        e = comb_fn(vals, consts)
        sums.append(gl.sum_axis(e, axis=-1))
    out = (B.xp.stack([s[0] for s in sums]), B.xp.stack([s[1] for s in sums]))
    return out, v0, step


def fold_mles_t(v0, step, r_limbs):
    return gl.add(v0, rq.ntt_scalar_mul_t(step, r_limbs))


def run_sumcheck_t(engine, transcript, mles_t, nv, degree, comb_key, comb_fn,
                   consts_dev, eq_info_rev=None, log=None):
    """Device sum-check in transposed bit-reversed layout; numpy tail.

    mles_t: (k, 24, n) with bit-reversed hypercube; eq_info_rev:
    (beta_list, eq_index) for truncated-tail reconstruction.
    """
    import time
    transcript.absorb_u64(nv)
    transcript.absorb_u64(degree)
    proof, chals = [], []
    cur = mles_t
    rounds_done = 0

    def round_jit(cur):
        n = int(cur[0].shape[-1])
        k = int(cur[0].shape[0])

        def fn(c, consts):
            return sumcheck_round_t(c, degree, comb_fn, consts)

        return engine._jit((comb_key, "t", k, n, degree), fn)

    while rounds_done < nv and int(cur[0].shape[-1]) // 2 >= engine.tail:
        t0 = time.time()
        jf = round_jit(cur)
        with B.jax_mode():
            sums, v0, step = jf(cur, consts_dev)
        ints = gl.to_int(engine.get(sums))
        msg = [[int(v) for v in row] for row in ints]
        transcript.absorb_slice(msg)
        proof.append(msg)
        r = transcript.get_challenge()
        transcript.absorb_fq3(r)
        chals.append(r)
        shape = tuple(int(s) for s in v0[0].shape)
        ff = engine._jit(("fold_t", shape), fold_mles_t)
        with B.numpy_mode():
            r_limbs = mle_mod.fq3_const(r)
        with B.jax_mode():
            cur = ff(v0, step, engine.put_small(r_limbs))
        rounds_done += 1
        if log:
            log(f"dev round {rounds_done-1}: {time.time()-t0:.2f}s")

    if rounds_done < nv:
        # numpy tail in the STANDARD layout: transpose + un-bit-reverse
        cur_host = engine.get(cur)
        n = cur_host[0].shape[-1]
        nv_left = nv - rounds_done
        assert n == 1 << nv_left or n <= (1 << nv_left)
        brev = bitrev_indices(int(np.log2(n))) if n > 1 else np.array([0])
        lo = np.moveaxis(cur_host[0], -1, -2)[..., brev, :] \
            if False else np.moveaxis(cur_host[0], 1, 2)[:, brev, :]
        hi = np.moveaxis(cur_host[1], 1, 2)[:, brev, :]
        consts_host = engine.jax.tree_util.tree_map(np.asarray, consts_dev)
        from .accel import _numpy_tail
        from ..nifs import linearization as lin_mod

        # rebuild the standard-layout comb for the tail
        std_comb = _STD_COMBS[comb_key]
        with B.numpy_mode():
            tail_proof, tail_chals, _ = _numpy_tail(
                transcript, (lo, hi), nv, rounds_done, degree,
                lambda vals: std_comb(vals, consts_host),
                eq_info=eq_info_rev, prior_chals=chals)
        proof.extend(tail_proof)
        chals.extend(tail_chals)
    return proof, chals


_STD_COMBS = {}


def register_std_comb(key, fn):
    _STD_COMBS[key] = fn
