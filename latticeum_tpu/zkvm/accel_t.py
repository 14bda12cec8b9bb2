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
            term = rq.ntt_mul_t(
                had, (B.xp.broadcast_to(ci[0], had[0].shape),
                      B.xp.broadcast_to(ci[1], had[1].shape)))
            total = term if total is None else gl.add(total, term)
        return rq.ntt_mul_t(total, (lo[-1], hi[-1]))
    return comb


def make_comb_lin_batched(S, t):
    """Linearization comb as a handful of BATCHED tensor ops.

    The unrolled per-multiset comb produces an HLO graph with ~50k ops that
    the remote TPU compiler chews on for ~10 min (and OOMs at the fold
    comb's size).  Since every matrix index appears in exactly one multiset
    (builder invariant, asserted in tests), grouping multisets by size and
    gathering turns the whole comb into one gather + (size-1) batched ring
    muls per group — a graph of ~100 large ops.  Exact mod-p arithmetic, so
    reassociation is bit-exact.
    """
    groups = {}
    for i, S_i in enumerate(S):
        groups.setdefault(len(S_i), []).append((i, list(S_i)))
    group_list = [
        (np.array([m[0] for m in members], np.int32),
         np.array([m[1] for m in members], np.int32))
        for size, members in sorted(groups.items())
    ]

    def comb(vals, consts):
        lo, hi = vals
        eq = (lo[t], hi[t])
        total = None
        for iidx, jidx in group_list:
            glo, ghi = lo[jidx], hi[jidx]          # (g, size, 24, n)
            prod = (glo[:, 0], ghi[:, 0])
            for s in range(1, jidx.shape[1]):
                prod = rq.ntt_mul_t(prod, (glo[:, s], ghi[:, s]))
            ci = (consts[0][iidx][..., None], consts[1][iidx][..., None])
            term = rq.ntt_mul_t(prod, ci)          # (g, 24, n)
            part = gl.sum_axis(term, axis=0)
            total = part if total is None else gl.add(total, part)
        return rq.ntt_mul_t(total, eq)
    return comb


def make_comb_fold_batched(b_small, K, TAU=3):
    """Folding comb batched over the 2K*TAU f_hat axis (one ring-mul chain
    on a (2K*TAU, 24, n) tensor instead of 90 unrolled chains; the unrolled
    version OOM-killed the TPU compile helper).  Same consts as the host
    comb: (2K, 3) Fq3 components of mu; powers computed on device.

    Takes PARTS vals: [head (5, 24, n), tail (2K*TAU, 24, n)] — the split
    keeps the f_hat tail byte-identical to the donated fhats input of
    build_g (see accel_nifs._build_g_fn)."""
    from ..field import fq3

    def comb(vals, consts):
        (lo, hi), (tlo, thi) = vals
        result = gl.add(rq.ntt_mul_t((lo[0], hi[0]), (lo[1], hi[1])),
                        rq.ntt_mul_t((lo[2], hi[2]), (lo[3], hi[3])))
        eq_b = (lo[4:5], hi[4:5])
        f = (tlo, thi)                             # (2K*TAU, 24, n)
        f_sq = rq.ntt_mul_t(f, f)
        ev = None
        for b in range(1, b_small):
            bb = gl.from_int(np.array(H.ntt_from_u64(b * b), dtype=object))
            bbt = (B.xp.asarray(bb[0])[:, None], B.xp.asarray(bb[1])[:, None])
            factor = gl.sub(f_sq, (B.xp.broadcast_to(bbt[0], f_sq[0].shape),
                                   B.xp.broadcast_to(bbt[1], f_sq[1].shape)))
            ev = factor if ev is None else rq.ntt_mul_t(ev, factor)
        ev = f if ev is None else rq.ntt_mul_t(ev, f)
        ev = rq.ntt_mul_t(ev, (B.xp.broadcast_to(eq_b[0], ev[0].shape),
                               B.xp.broadcast_to(eq_b[1], ev[1].shape)))
        # mu powers mu_k^{d+1}, laid out k-major to match the f_hat stack
        mu1 = tuple((consts[0][:, c], consts[1][:, c]) for c in range(3))
        pows, cur_p = [], mu1
        for _d in range(TAU):
            pows.append(cur_p)
            if _d + 1 < TAU:
                cur_p = fq3.mul(cur_p, mu1)
        mu_pow = tuple(
            (B.xp.stack([p[c][0] for p in pows], axis=1).reshape(-1),
             B.xp.stack([p[c][1] for p in pows], axis=1).reshape(-1))
            for c in range(3))
        ev = rq.ntt_scalar_mul_t(ev, mu_pow)
        return gl.add(result, gl.sum_axis(ev, axis=0))
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


def to_t_layout(engine, mles_dev, key=None):
    """(k, n, 24) standard-layout stack -> (k, 24, n) bit-reversed.

    Bit reversal over log2(n) bits of the (possibly lazily-truncated) array
    is a pure permutation, so values computed in the standard layout remain
    correct; one device gather + transpose.
    """
    n = int(mles_dev[0].shape[-2])
    nbits = int(np.log2(n))
    assert (1 << nbits) == n, "t-layout needs a power-of-two row count"
    brev = B.xp.asarray(bitrev_indices(nbits))

    def fn(m):
        return (B.xp.moveaxis(m[0][..., brev, :], -2, -1),
                B.xp.moveaxis(m[1][..., brev, :], -2, -1))

    k = tuple(int(s) for s in mles_dev[0].shape)
    jf = engine._jit(("to_t", k), fn)
    with B.jax_mode():
        return jf(mles_dev)


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
        lo = np.moveaxis(cur_host[0], 1, 2)[:, brev, :]
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


def interleave_fold_t(v0, step, r_limbs):
    """folded = v0 + r*step, re-spread into a full-size buffer.

    Fixed-buffer invariant: the active array (size L) lives at stride n/L
    positions of an n-buffer, zeros elsewhere.  Folding halves L; writing
    the folded half-buffer back at even positions doubles the stride and
    keeps the gaps exactly zero."""
    folded = gl.add(v0, rq.ntt_scalar_mul_t(step, r_limbs))
    z0 = B.xp.zeros_like(folded[0])
    lo = B.xp.stack([folded[0], z0], axis=-1)
    hi = B.xp.stack([folded[1], z0], axis=-1)
    return (lo.reshape(folded[0].shape[:-1] + (-1,)),
            hi.reshape(folded[1].shape[:-1] + (-1,)))


def sumcheck_sums_parts(parts, degree, comb_fn, consts, chunks=1):
    """Round sums only (no v0/step outputs — the fold kernel recomputes the
    split, keeping peak HBM at one buffer + transients).

    parts: list of (lo, hi) stacks, each (k_i, 24, n) — comb_fn receives the
    list of per-part chunk values.  chunks > 1 tiles the half-buffer along
    the minor axis inside the traced fori (dynamic slices), bounding comb
    transients to half/chunks columns — at production scale the un-chunked
    per-point transients OOM'd the chip on top of the resident buffer.
    Still ONE comb instance in the graph (point and chunk share a flattened
    fori)."""
    n = parts[0][0].shape[-1]
    half = n // 2
    assert half % chunks == 0 or chunks == 1
    cs = half // chunks

    if B.is_jax():
        import jax
        import jax.numpy as jnp

        def body(i, sums):
            t = i // chunks
            j = i % chunks
            tl = t.astype(jnp.uint32)
            tz = jnp.zeros((), jnp.uint32)
            vals = []
            for lo, hi in parts:
                pre = (0,) * (lo.ndim - 1)
                k24 = lo.shape[:-1]
                v0c = (jax.lax.dynamic_slice(lo, pre + (j * cs,),
                                             k24 + (cs,)),
                       jax.lax.dynamic_slice(hi, pre + (j * cs,),
                                             k24 + (cs,)))
                v1c = (jax.lax.dynamic_slice(lo, pre + (half + j * cs,),
                                             k24 + (cs,)),
                       jax.lax.dynamic_slice(hi, pre + (half + j * cs,),
                                             k24 + (cs,)))
                stepc = gl.sub(v1c, v0c)
                vals.append(gl.add(v0c, gl.mul(stepc, (tl, tz))))
            e = comb_fn(vals, consts)
            s = gl.sum_axis(e, axis=-1)
            prev = (sums[0][t], sums[1][t])
            acc = gl.add(prev, s)
            return (sums[0].at[t].set(acc[0]), sums[1].at[t].set(acc[1]))

        init = (jnp.zeros((degree + 1, 24), jnp.uint32),
                jnp.zeros((degree + 1, 24), jnp.uint32))
        return jax.lax.fori_loop(0, (degree + 1) * chunks, body, init)

    sums = None
    for t in range(degree + 1):
        vals = []
        for lo, hi in parts:
            v0 = (lo[..., :half], hi[..., :half])
            v1 = (lo[..., half:], hi[..., half:])
            step = gl.sub(v1, v0)
            tt = (B.xp.asarray(np.uint32(t)), B.xp.asarray(np.uint32(0)))
            vals.append(gl.add(v0, gl.mul(step, tt)))
        e = comb_fn(vals, consts)
        s = gl.sum_axis(e, axis=-1)
        if sums is None:
            sums = ([s[0]], [s[1]])
        else:
            sums[0].append(s[0])
            sums[1].append(s[1])
    return (B.xp.stack(sums[0]), B.xp.stack(sums[1]))


def sumcheck_sums_t(cur, degree, comb_fn, consts, chunks=1):
    """Single-stack wrapper around sumcheck_sums_parts (comb takes (lo, hi))."""
    return sumcheck_sums_parts(
        [cur], degree, lambda vals, c: comb_fn(vals[0], c), consts,
        chunks=chunks)


def fold_round_parts(r_limbs, *bufs):
    """Fold the top variable at challenge r and re-interleave, in place
    (donated buffers): pairs of (lo, hi) flattened into bufs."""
    outs = []
    for i in range(0, len(bufs), 2):
        cur_lo, cur_hi = bufs[i], bufs[i + 1]
        n = cur_lo.shape[-1]
        half = n // 2
        v0 = (cur_lo[..., :half], cur_hi[..., :half])
        v1 = (cur_lo[..., half:], cur_hi[..., half:])
        step = gl.sub(v1, v0)
        outs.append(interleave_fold_t(v0, step, r_limbs))
    return tuple(outs)


def fold_round_t(cur_lo, cur_hi, r_limbs):
    """Fold the top variable at challenge r and re-interleave, in place
    (donated buffers): (k, 24, n) -> (k, 24, n)."""
    return fold_round_parts(r_limbs, cur_lo, cur_hi)[0]


def run_sumcheck_fixed(engine, transcript, mles_t, nv, degree, comb_key,
                       comb_fn, consts_dev, eq_info_rev=None, log=None):
    """Device sum-check with FIXED-SIZE buffers: one compile per comb.

    Per-round recompilation (shapes halve every round) costs ~10 min per
    round on the remote TPU compiler; instead every round runs the same
    (k, 24, n) kernel.  The active array shrinks by striding inside the
    zero-padded buffer; inactive positions are exactly zero and contribute
    zero to the round sums because every comb term contains a zero MLE
    factor (Mz/f_hat are zero there; eq-only products never occur).
    Compute cost is n per round instead of n/2^i — bounded 2x of the total
    shrinking-buffer work, invisible next to compile time.

    mles_t: either a single (lo, hi) stack (k, 24, n) or a LIST of such
    parts (the fold path passes [head(5), f_hat tail(2K*TAU)] so the tail
    stays byte-compatible with the donated build_g input).  With parts the
    comb_fn receives the list; single-stack combs receive (lo, hi).
    Bit-reversed hypercube; transcript-identical to the host path.
    """
    import time
    # single stack = (lo, hi) arrays; parts = sequence of such pairs
    is_parts = not hasattr(mles_t[0], "shape")
    parts = list(mles_t) if is_parts else [mles_t]
    part_comb = comb_fn if is_parts else (
        lambda vals, c: comb_fn(vals[0], c))

    transcript.absorb_u64(nv)
    transcript.absorb_u64(degree)
    proof, chals = [], []
    n = int(parts[0][0].shape[-1])
    k = sum(int(p[0].shape[0]) for p in parts)
    active = n
    rounds_done = 0

    # chunk the per-point comb transients to ~<=192 MB (OOM headroom)
    chunk_budget = getattr(engine, "sum_chunk_bytes", 192 << 20)
    bytes_half = k * 24 * (n // 2) * 8
    chunks = 1
    while bytes_half // chunks > chunk_budget and (n // 2) % (chunks * 2) == 0:
        chunks *= 2

    def sums_fn(ps, consts):
        return sumcheck_sums_parts(ps, degree, part_comb, consts,
                                   chunks=chunks)

    jf = engine._jit((comb_key, "fixed", k, n, degree), sums_fn)
    # fold kernel donates the buffers: peak HBM stays ~one buffer set
    nb = len(parts)
    ff = engine._jit(("fold_fixed", k, n, nb), fold_round_parts,
                     donate_argnums=tuple(range(1, 2 * nb + 1)))

    while rounds_done < nv and active // 2 >= engine.tail:
        t0 = time.time()
        with B.jax_mode():
            sums = jf(parts, consts_dev)
        ints = gl.to_int(engine.get(sums))
        msg = [[int(v) for v in row] for row in ints]
        transcript.absorb_slice(msg)
        proof.append(msg)
        r = transcript.get_challenge()
        transcript.absorb_fq3(r)
        chals.append(r)
        with B.numpy_mode():
            r_limbs = mle_mod.fq3_const(r)
        flat = [a for p in parts for a in p]
        with B.jax_mode():
            parts = list(ff(engine.put_small(r_limbs), *flat))
        active //= 2
        rounds_done += 1
        if log:
            log(f"dev round {rounds_done-1}: {time.time()-t0:.2f}s")

    final = None
    if rounds_done < nv:
        hosts = [engine.get(p) for p in parts]
        stride = n // active
        act = (np.concatenate([h[0][..., ::stride] for h in hosts]),
               np.concatenate([h[1][..., ::stride] for h in hosts]))
        tail_proof, tail_chals, final = _host_tail_from_t(
            engine, transcript, act, nv, rounds_done, degree, comb_key,
            consts_dev, eq_info_rev, chals)
        proof.extend(tail_proof)
        chals.extend(tail_chals)
    else:
        # fully folded on device: final MLE values sit at buffer position 0
        hosts = [engine.get(p) for p in parts]
        final = (np.concatenate([np.asarray(h[0][..., 0]).reshape(-1, 24)
                                 for h in hosts]),
                 np.concatenate([np.asarray(h[1][..., 0]).reshape(-1, 24)
                                 for h in hosts]))
    # final: (k, 24) == each MLE evaluated at the challenge point (gives
    # the theta/evaluation claims for free)
    final = (np.asarray(final[0]).reshape(-1, 24),
             np.asarray(final[1]).reshape(-1, 24))
    return proof, chals, final


def fold_shrink_parts(r_limbs, *bufs):
    """folded = v0 + r*step with CONTIGUOUS halves: (k, 24, n) -> (k, 24, n/2).

    No interleave: the shrink sum-check keeps the active array contiguous,
    so the fold is two slices + one scalar mul (the fixed-buffer interleave
    cost 5.3 GB of stack/reshape temps at production scale — mem_audit)."""
    outs = []
    for i in range(0, len(bufs), 2):
        cur_lo, cur_hi = bufs[i], bufs[i + 1]
        half = cur_lo.shape[-1] // 2
        v0 = (cur_lo[..., :half], cur_hi[..., :half])
        v1 = (cur_lo[..., half:], cur_hi[..., half:])
        step = gl.sub(v1, v0)
        outs.append(gl.add(v0, rq.ntt_scalar_mul_t(step, r_limbs)))
    return tuple(outs)


def run_sumcheck_shrink(engine, transcript, mles_t, nv, degree, comb_key,
                        comb_fn, consts_dev, eq_info_rev=None, log=None):
    """Device sum-check with SHRINKING buffers (one compile per round shape,
    persistently cached): halves memory and total compute vs the fixed-buffer
    variant (sum_i n/2^i = 2n work instead of rounds*n), at the cost of
    ~log2(n/tail) cached compiles per comb.

    Same parts/comb conventions and transcript as run_sumcheck_fixed."""
    import time
    is_parts = not hasattr(mles_t[0], "shape")
    parts = list(mles_t) if is_parts else [mles_t]
    part_comb = comb_fn if is_parts else (
        lambda vals, c: comb_fn(vals[0], c))

    transcript.absorb_u64(nv)
    transcript.absorb_u64(degree)
    proof, chals = [], []
    k = sum(int(p[0].shape[0]) for p in parts)
    rounds_done = 0
    chunk_budget = getattr(engine, "sum_chunk_bytes", 192 << 20)
    nb = len(parts)

    while rounds_done < nv and int(parts[0][0].shape[-1]) // 2 >= engine.tail:
        t0 = time.time()
        n = int(parts[0][0].shape[-1])
        bytes_half = k * 24 * (n // 2) * 8
        chunks = 1
        while (bytes_half // chunks > chunk_budget
               and (n // 2) % (chunks * 2) == 0):
            chunks *= 2

        def sums_fn(ps, consts, _c=chunks):
            return sumcheck_sums_parts(ps, degree, part_comb, consts,
                                       chunks=_c)

        jf = engine._jit((comb_key, "shrink", k, n, degree), sums_fn)
        with B.jax_mode():
            sums = jf(parts, consts_dev)
        ints = gl.to_int(engine.get(sums))
        msg = [[int(v) for v in row] for row in ints]
        transcript.absorb_slice(msg)
        proof.append(msg)
        r = transcript.get_challenge()
        transcript.absorb_fq3(r)
        chals.append(r)
        with B.numpy_mode():
            r_limbs = mle_mod.fq3_const(r)
        # no donation: the halved output can never alias the input buffer
        ff = engine._jit(("fold_shrink", k, n, nb), fold_shrink_parts)
        flat = [a for p in parts for a in p]
        with B.jax_mode():
            parts = list(ff(engine.put_small(r_limbs), *flat))
        rounds_done += 1
        if log:
            log(f"dev round {rounds_done-1}: {time.time()-t0:.2f}s")

    final = None
    if rounds_done < nv:
        hosts = [tuple(np.asarray(a) for a in engine.get(p))
                 for p in parts]
        tail_proof, tail_chals, final = _host_tail_t(
            engine, transcript, hosts, nv, rounds_done, degree, comb_key,
            part_comb, consts_dev, eq_info_rev, chals, log=log)
        proof.extend(tail_proof)
        chals.extend(tail_chals)
    else:
        hosts = [engine.get(p) for p in parts]
        final = (np.concatenate([np.asarray(h[0][..., 0]).reshape(-1, 24)
                                 for h in hosts]),
                 np.concatenate([np.asarray(h[1][..., 0]).reshape(-1, 24)
                                 for h in hosts]))
    final = (np.asarray(final[0]).reshape(-1, 24),
             np.asarray(final[1]).reshape(-1, 24))
    return proof, chals, final


def _host_tail_t(engine, transcript, parts, nv, rounds_done, degree,
                 comb_key, part_comb, consts_dev, eq_info_rev, chals,
                 log=None):
    """Host tail IN t-layout with the BATCHED comb (numpy backend): one comb
    call per eval point per round instead of the std comb's per-instance
    loops (which cost ~15 s/step at production scale).  Falls back to the
    std-layout tail only for the truncated-MLE reconstruction rounds (the
    lin path's lazy-trunc eq rebuild) once the arrays are exhausted."""
    import time
    consts_host = engine.jax.tree_util.tree_map(np.asarray, consts_dev)
    proof, out_chals = [], []
    with B.numpy_mode():
        while rounds_done < nv and parts[0][0].shape[-1] > 1:
            t0 = time.time()
            sums = sumcheck_sums_parts(parts, degree, part_comb, consts_host)
            ints = gl.to_int(sums)
            msg = [[int(v) for v in row] for row in ints]
            transcript.absorb_slice(msg)
            proof.append(msg)
            r = transcript.get_challenge()
            transcript.absorb_fq3(r)
            out_chals.append(r)
            r_limbs = mle_mod.fq3_const(r)
            flat = [a for p in parts for a in p]
            parts = list(fold_shrink_parts(r_limbs, *flat))
            rounds_done += 1
            if log:
                log(f"host round {rounds_done-1}: {time.time()-t0:.2f}s")
    if rounds_done < nv:
        # arrays exhausted before nv (truncated MLEs): reconstruction
        # rounds via the std-layout numpy tail
        act = (np.concatenate([np.asarray(p[0]) for p in parts]),
               np.concatenate([np.asarray(p[1]) for p in parts]))
        tp, tc, final = _host_tail_from_t(
            engine, transcript, act, nv, rounds_done, degree, comb_key,
            consts_dev, eq_info_rev, list(chals) + out_chals)
        proof.extend(tp)
        out_chals.extend(tc)
    else:
        final = (np.concatenate([np.asarray(p[0][..., 0]).reshape(-1, 24)
                                 for p in parts]),
                 np.concatenate([np.asarray(p[1][..., 0]).reshape(-1, 24)
                                 for p in parts]))
    return proof, out_chals, final


def _host_tail_from_t(engine, transcript, cur_host, nv, rounds_done, degree,
                      comb_key, consts_dev, eq_info_rev, chals):
    """Un-bit-reverse + transpose a (k, 24, L) t-layout array and finish the
    remaining rounds with the standard-layout numpy tail."""
    n = cur_host[0].shape[-1]
    brev = bitrev_indices(int(np.log2(n))) if n > 1 else np.array([0])
    lo = np.moveaxis(np.asarray(cur_host[0]), 1, 2)[:, brev, :]
    hi = np.moveaxis(np.asarray(cur_host[1]), 1, 2)[:, brev, :]
    consts_host = engine.jax.tree_util.tree_map(np.asarray, consts_dev)
    from .accel import _numpy_tail
    std_comb = _STD_COMBS[comb_key]
    with B.numpy_mode():
        tail_proof, tail_chals, final = _numpy_tail(
            transcript, (lo, hi), nv, rounds_done, degree,
            lambda vals: std_comb(vals, consts_host),
            eq_info=eq_info_rev, prior_chals=chals)
    return tail_proof, tail_chals, final


_STD_COMBS = {}


def register_std_comb(key, fn):
    _STD_COMBS[key] = fn
