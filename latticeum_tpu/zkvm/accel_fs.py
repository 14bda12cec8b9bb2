"""Fiat-Shamir ON DEVICE: a traced duplex challenger + the full sum-check
in ONE jit dispatch.

The per-round host loop (sums -> host -> absorb -> challenge -> device)
costs 2 tunnel round-trips per round (~50 ms each on the axon link) times
~31 rounds per fold step.  Since the duplex challenger's buffer lengths are
data-INDEPENDENT for a fixed absorb/squeeze schedule, the whole transcripted
sum-check traces statically: round sums feed a device Poseidon2 width-16
duplex (bit-exact mirror of poseidon2_ref.DuplexChallenger /
native/poseidon2.cpp state layout), the Fq3 challenge comes out as traced
scalars, and the fold happens in-graph.  The host replays the returned round
messages through its own challenger afterwards — same math, same state — so
the rest of the protocol continues on the canonical host transcript.

Mirrors the reference's sum-check + transcript pair
(latticefold/src/utils/sumcheck/prover.rs:112-162, zkvm/src/fiat_shamir.rs:
20-114) as a single compiled TPU program.
"""

from __future__ import annotations

import numpy as np

from .. import backend as B
from ..crypto import poseidon2 as p2dev
from ..field import goldilocks as gl
from ..poly import mle as mle_mod
from ..ring import rq
from . import accel_t

RATE = 12
WIDTH = 16


def _perm16_scan(state):
    """perm16 with lax.scan bodies (one external-round body + one
    internal-round body in the graph instead of 30 unrolled rounds): the
    challenger runs ~20 permutations per sum-check round, so graph size per
    permutation decides whether the whole sum-check is traceable."""
    import jax
    from ..crypto import consts

    def split_c(a):
        a = np.asarray(a, dtype=np.uint64)
        return (B.xp.asarray((a & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
                B.xp.asarray((a >> np.uint64(32)).astype(np.uint32)))

    wi = split_c(consts.W16_EXTERNAL_INITIAL)    # (4, 16)
    wt = split_c(consts.W16_EXTERNAL_TERMINAL)   # (4, 16)
    i22 = split_c(consts.INTERNAL_22)            # (22,)

    def ext_body(st, rc):
        s = gl.add(st, (B.xp.broadcast_to(rc[0][None], st[0].shape),
                        B.xp.broadcast_to(rc[1][None], st[1].shape)))
        return p2dev._mds_light(p2dev._sbox(s), WIDTH), None

    def int_body(st, rc):
        s0 = p2dev._sbox(gl.add(p2dev._col(st, 0), rc))
        st = (B.at_set(st[0], (..., 0), s0[0]),
              B.at_set(st[1], (..., 0), s0[1]))
        return p2dev._matmul_internal(st, consts.DIAG_16), None

    state = p2dev._mds_light(state, WIDTH)
    state, _ = jax.lax.scan(ext_body, state, wi)
    state, _ = jax.lax.scan(int_body, state, i22)
    state, _ = jax.lax.scan(ext_body, state, wt)
    return state


class DevChallenger:
    """Trace-time mirror of the duplex challenger.

    state: ((1, 16) lo, hi) traced limb arrays; ibuf/obuf: python lists of
    traced scalar (lo, hi) pairs.  List lengths are static under tracing —
    the absorb/squeeze schedule of a sum-check is fixed."""

    def __init__(self, state, ibuf, obuf):
        self.state = state
        self.ibuf = list(ibuf)
        self.obuf = list(obuf)

    def _duplex(self):
        lo, hi = self.state
        for i, (vl, vh) in enumerate(self.ibuf):
            lo = B.at_set(lo, (0, i), vl)
            hi = B.at_set(hi, (0, i), vh)
        self.ibuf = []
        self.state = _perm16_scan((lo, hi))
        self.obuf = [(self.state[0][0, i], self.state[1][0, i])
                     for i in range(RATE)]

    def observe_array(self, vals):
        """Bulk absorb of a flat ((n,) lo, hi) array: unrolled observes up
        to block alignment, then ONE lax.scan over the full 12-value blocks
        (one duplex body in the graph), then unrolled remainder."""
        import jax
        n = int(vals[0].shape[0])
        fill = min((RATE - len(self.ibuf)) % RATE, n) if self.ibuf else 0
        for j in range(fill):
            self.observe((vals[0][j], vals[1][j]))
        blocks = (n - fill) // RATE
        rem = n - fill - blocks * RATE
        if blocks:
            bl = vals[0][fill:fill + blocks * RATE].reshape(blocks, RATE)
            bh = vals[1][fill:fill + blocks * RATE].reshape(blocks, RATE)

            def body(st, blk):
                lo = B.at_set(st[0], (0, slice(0, RATE)), blk[0])
                hi = B.at_set(st[1], (0, slice(0, RATE)), blk[1])
                return _perm16_scan((lo, hi)), None

            assert not self.ibuf
            self.state, _ = jax.lax.scan(body, self.state, (bl, bh))
            self.obuf = [(self.state[0][0, i], self.state[1][0, i])
                         for i in range(RATE)]
        for j in range(n - rem, n):
            self.observe((vals[0][j], vals[1][j]))

    def observe(self, v):
        """v: (lo, hi) traced uint32 scalars, canonical (< p)."""
        self.obuf = []
        self.ibuf.append(v)
        if len(self.ibuf) == RATE:
            self._duplex()

    def observe_const(self, value: int):
        self.observe((np.uint32(value & 0xFFFFFFFF), np.uint32(value >> 32)))

    def observe_ring24(self, row):
        """row: ((24,) lo, hi) — one RqNTT element, slot-major."""
        for i in range(24):
            self.observe((row[0][i], row[1][i]))

    def observe_u64_embed(self, c: int):
        """absorb_u64: scalar embedded at every slot's c0 (host.py:73-79)."""
        for _s in range(8):
            self.observe_const(c)
            self.observe_const(0)
            self.observe_const(0)

    def sample(self):
        if self.ibuf or not self.obuf:
            self._duplex()
        return self.obuf.pop()

    def get_challenge(self):
        """-> 3 traced scalars (c0, c1, c2); samples then re-observes."""
        c = [self.sample() for _ in range(3)]
        for x in c:
            self.observe(x)
        return tuple(c)

    def observe_fq3_embed(self, c3):
        """absorb_fq3: (c0,c1,c2) at every slot (host.py:82-87)."""
        for _s in range(8):
            for x in c3:
                self.observe(x)


def snapshot_challenger(ch):
    """Host challenger -> (state16, ibuf, obuf) u64 arrays (+ static lens)."""
    if hasattr(ch, "st"):                       # NativeChallenger layout
        st = np.asarray(ch.st, dtype=np.uint64)
        ilen, olen = int(st[16]), int(st[17])
        return st[:16].copy(), st[18:18 + ilen].copy(), st[30:30 + olen].copy()
    state = np.array(ch.state, dtype=np.uint64)
    return (state, np.array(ch.input_buffer, dtype=np.uint64),
            np.array(ch.output_buffer, dtype=np.uint64))


def _split64(arr):
    arr = np.asarray(arr, dtype=np.uint64)
    return ((arr & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (arr >> np.uint64(32)).astype(np.uint32))


def _lagrange_ext_consts(npts: int, n_targets: int):
    """(n_targets, npts) int matrix: row t gives Σ_j M[t,j]·S(j) = S(t) for a
    degree-(npts-1) polynomial known at points 0..npts-1.  Exact mod p."""
    P = gl.P
    M = np.empty((n_targets, npts), dtype=object)
    for t in range(n_targets):
        for j in range(npts):
            num, den = 1, 1
            for m in range(npts):
                if m == j:
                    continue
                num = num * (t - m) % P
                den = den * (j - m) % P
            M[t, j] = num * pow(den, P - 2, P) % P
    return M


def _const_key(obj) -> str:
    """Digest of per-proof constants baked into a monolith closure.

    The all-rounds-in-one-dispatch runners below trace proof-dependent
    values (betas, eqf tables, reconstruction eq tables) as compile-time
    constants; caching those closures by shape alone made the 2nd proof
    with identical shapes silently reuse the 1st proof's constants
    (round-3 advisor finding, high).  Including this digest in the jit key
    makes the cache correct — at the cost of a recompile per proof, which
    is why accel_rounds (constants as arguments) is the default path."""
    import hashlib
    return hashlib.sha1(repr(obj).encode()).hexdigest()[:16]


def _split_obj(arr):
    """object int array mod p -> (lo, hi) uint32 numpy arrays."""
    flat = np.array([int(v) % gl.P for v in np.asarray(arr).reshape(-1)],
                    dtype=np.uint64)
    return ((flat & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            .reshape(np.asarray(arr).shape),
            (flat >> np.uint64(32)).astype(np.uint32)
            .reshape(np.asarray(arr).shape))


def run_fold_fulldev_factored(engine, transcript, parts, nv, degree,
                              comb_key, consts_dev, eq_points, b_small, K,
                              TAU=3, log=None):
    """Eq-factored folding sum-check: all rounds + challenger in ONE dispatch.

    The fold g = eq_r1·c1 + eq_r2·c2 + eq_β·h with h = Σ_kd μ_k^{d+1}
    (f̂·Π_b(f̂²−b²))_kd (folding/utils.rs:196-321).  Each term's eq factor
    splits per round as eq(β, (r_<i, t, x)) = E_i · eqf(β_i, t) ·
    eq(β_{>i}, x), so (Gruen's trick):

      * the eq tables never enter the comb — they fold by PAIR-SUMS
        (T_{i+1}[x] = T_i[0,x] + T_i[1,x], one add instead of muls at every
        evaluation point), and the scalar prefix E accumulates per round;
      * h is evaluated at only deg(h)+1 = 2·B_SMALL points (the c rows at
        2), weighted by T and contracted over x, then Lagrange-extended to
        the full degree+1 message points POST-contraction (exact, tiny);
      * the μ weighting moves outside the Σ_x contraction.

    ~45% less VPU work per round than the direct 5-point comb; round
    messages are bit-identical (same polynomial, exact arithmetic).

    parts: [head (5, 24, n), tail (2K·TAU, 24, n)] in bit-reversed t-layout,
    head rows = [eq_r1, c1, eq_r2, c2, eq_β] (accel_nifs._build_head).
    eq_points: (r1, r2, beta) host Fq3 coordinate lists (len nv each).
    consts_dev: μ components (2K, 3) limb pair.
    Returns (proof, chals, final) like run_sumcheck_fulldev; final rows keep
    the [eq1, c1, eq2, c2, eqβ, f̂...] layout (eq finals = Π eqf(β_i, r_i)).
    """
    import time

    from ..field import fq3, host as Hh
    from ..ring import rq

    t_start = time.time()
    head, tail = parts
    n0 = int(tail[0].shape[-1])
    assert n0 == 1 << nv, "factored fold runner needs full-width MLEs"
    rows = int(tail[0].shape[0])
    npts_h = 2 * b_small                   # deg(h) + 1
    n_msg = degree + 1
    chunk_budget = getattr(engine, "sum_chunk_bytes", 192 << 20)

    state16, ibuf, obuf = snapshot_challenger(transcript.ch)
    ilen, olen = len(ibuf), len(obuf)

    embeds = np.array([Hh.ntt_from_u64(nv), Hh.ntt_from_u64(degree)],
                      dtype=object).reshape(-1)
    embeds = _split64(np.array([int(v) for v in embeds], dtype=np.uint64))

    # host consts: eqf(β_i, t) per (table, round, point); Lagrange extension
    # matrices; b² range constants
    eqf = np.empty((3, nv, n_msg, 3), dtype=object)
    for c, pts in enumerate(eq_points):
        for i, b in enumerate(pts):
            for t in range(n_msg):
                # eqf(b, t) = (1-b)(1-t) + b·t  evaluated at integer t
                eqf[c, i, t] = [
                    (x * (2 * t - 1) + (1 - t if j == 0 else 0)) % gl.P
                    for j, x in enumerate(b)]
    eqf_l = _split_obj(eqf)
    ext_h = _split_obj(_lagrange_ext_consts(npts_h, n_msg))   # (n_msg, npts)
    ext_c = _split_obj(_lagrange_ext_consts(2, n_msg))        # (n_msg, 2)
    betas_l = _split_obj(np.array(
        [[list(b) for b in pts] for pts in eq_points], dtype=object))
    bsq = [_split_obj(np.array(Hh.ntt_from_u64(b * b), dtype=object))
           for b in range(1, b_small)]

    def fn(head_, tail_, consts, st, ib, ob):
        # COMPONENT-SPLIT layout: every Fq3 component lives in its own
        # (rows, 8, n) array (split once at entry), so ring muls are pure
        # elementwise fq3.mul with no 24->(8,3) reshape/relayout inside the
        # hot loop (the packed layout pays a TPU retiling per ntt_mul_t;
        # measured 1.5x on the comb).  All values/packing identical.
        xp = B.xp
        ch = DevChallenger(
            (st[0].reshape(1, WIDTH), st[1].reshape(1, WIDTH)),
            [(ib[0][i], ib[1][i]) for i in range(ilen)],
            [(ob[0][i], ob[1][i]) for i in range(olen)])
        ch.observe_array((xp.asarray(embeds[0]), xp.asarray(embeds[1])))

        # μ powers μ_k^{d+1}, k-major (matches the f̂ row order)
        mu1 = tuple((consts[0][:, c], consts[1][:, c]) for c in range(3))
        pows, cur_p = [], mu1
        for _d in range(TAU):
            pows.append(cur_p)
            if _d + 1 < TAU:
                cur_p = fq3.mul(cur_p, mu1)
        mu3 = tuple(
            (xp.stack([p[c][0] for p in pows], axis=1).reshape(-1)
             [:, None, None],
             xp.stack([p[c][1] for p in pows], axis=1).reshape(-1)
             [:, None, None])
            for c in range(3))                          # comps (rows, 1, 1)

        one32 = np.uint32(1)
        zero32 = np.uint32(0)
        E = [((one32, zero32), (zero32, zero32), (zero32, zero32))
             for _ in range(3)]

        def split3(lo, hi):
            return tuple((lo[..., c::3, :], hi[..., c::3, :])
                         for c in range(3))

        t3 = split3(tail_[0], tail_[1])                 # comps (rows, 8, n)
        c3r = split3(head_[0][1:4:2], head_[1][1:4:2])  # comps (2, 8, n)
        eq3 = [split3(head_[0][j], head_[1][j]) for j in (0, 2, 4)]
        eqf_d = tuple(xp.asarray(a) for a in eqf_l)
        ext_h_d = tuple(xp.asarray(a) for a in ext_h)
        ext_c_d = tuple(xp.asarray(a) for a in ext_c)
        betas_d = tuple(xp.asarray(a) for a in betas_l)
        bsq_c0 = [(np.uint32(int(b[0][0]) & 0xFFFFFFFF),
                   np.uint32(int(b[1][0]))) for b in bsq]

        def lo3(x3, half):
            return tuple((x3[c][0][..., :half], x3[c][1][..., :half])
                         for c in range(3))

        def hi3(x3, half):
            return tuple((x3[c][0][..., half:], x3[c][1][..., half:])
                         for c in range(3))

        msgs_lo, msgs_hi = [], []
        for r in range(nv):
            import jax
            import jax.numpy as jnp
            n_r = int(t3[0][0].shape[-1])
            half = n_r // 2
            # next-level eq tables = pair sums (the contraction weights)
            Tn3 = [fq3.add(lo3(e, half), hi3(e, half)) for e in eq3]
            # heads: S_c(0), S_c(1) per table (c1·T1, c2·T2)
            Tc3 = tuple((xp.stack([Tn3[0][c][0], Tn3[1][c][0]]),
                         xp.stack([Tn3[0][c][1], Tn3[1][c][1]]))
                        for c in range(3))              # comps (2, 8, half)
            p0 = fq3.mul(Tc3, lo3(c3r, half))
            p1 = fq3.mul(Tc3, hi3(c3r, half))
            Sc0 = tuple(gl.sum_axis(p0[c], axis=-1) for c in range(3))
            Sc1 = tuple(gl.sum_axis(p1[c], axis=-1) for c in range(3))

            # tail: h at npts_h points, T_β-weighted, chunked over x
            bytes_half = rows * 24 * half * 8
            chunks = 1
            while (bytes_half // chunks > chunk_budget
                   and half % (chunks * 2) == 0):
                chunks *= 2
            cs = half // chunks
            Tb3 = Tn3[2]

            def body(i, acc):
                # rows μ-combined INSIDE (commutes with Σ_x): reduction
                # output is one (8, cs) component row; T-weight = ONE fq3
                # mul per point
                pt = i // chunks
                j = i % chunks
                tl = pt.astype(jnp.uint32)
                tz = jnp.zeros((), jnp.uint32)

                def dsl(x, off):
                    return jax.lax.dynamic_slice(x, (0, 0, off),
                                                 (rows, 8, cs))

                v0c = tuple((dsl(t3[c][0], j * cs), dsl(t3[c][1], j * cs))
                            for c in range(3))
                v1c = tuple((dsl(t3[c][0], half + j * cs),
                             dsl(t3[c][1], half + j * cs))
                            for c in range(3))
                st3 = fq3.sub(v1c, v0c)
                vals = tuple(gl.add(v0c[c], gl.mul(st3[c], (tl, tz)))
                             for c in range(3))
                f_sq = fq3.mul(vals, vals)
                ev = None
                for bb0 in bsq_c0:
                    factor = (gl.sub(f_sq[0], bb0), f_sq[1], f_sq[2])
                    ev = factor if ev is None else fq3.mul(ev, factor)
                ev = vals if ev is None else fq3.mul(ev, vals)
                ev = fq3.mul(ev, mu3)                   # per-row μ_k^{d+1}
                evs = tuple(gl.sum_axis(ev[c], axis=0) for c in range(3))
                Tbc = tuple((jax.lax.dynamic_slice(
                                 Tb3[c][0], (0, j * cs), (8, cs)),
                             jax.lax.dynamic_slice(
                                 Tb3[c][1], (0, j * cs), (8, cs)))
                            for c in range(3))
                evs = fq3.mul(evs, Tbc)
                s3 = tuple(gl.sum_axis(evs[c], axis=-1) for c in range(3))
                outs = []
                for c in range(3):
                    prev = (acc[c][0][pt], acc[c][1][pt])
                    nxt = gl.add(prev, s3[c])
                    outs.append((acc[c][0].at[pt].set(nxt[0]),
                                 acc[c][1].at[pt].set(nxt[1])))
                return tuple(outs)

            init = tuple((jnp.zeros((npts_h, 8), jnp.uint32),
                          jnp.zeros((npts_h, 8), jnp.uint32))
                         for _ in range(3))
            Sh3 = jax.lax.fori_loop(0, npts_h * chunks, body, init)

            # Lagrange-extend all terms to the n_msg message points
            def extend(S, ext):
                # S: (npts, ...), ext: (n_msg, npts) limb consts
                e0 = ext[0].reshape(ext[0].shape + (1,) * (S[0].ndim - 1))
                e1 = ext[1].reshape(ext[1].shape + (1,) * (S[1].ndim - 1))
                prod = gl.mul((S[0][None], S[1][None]), (e0[:, :], e1[:, :]))
                return gl.sum_axis(prod, axis=1)       # (n_msg, ...)

            Sh_ext = tuple(extend(Sh3[c], ext_h_d)
                           for c in range(3))           # comps (n_msg, 8)
            Sc_ext = tuple(extend((xp.stack([Sc0[c][0], Sc1[c][0]]),
                                   xp.stack([Sc0[c][1], Sc1[c][1]])),
                                  ext_c_d)
                           for c in range(3))           # comps (n_msg, 2, 8)

            # message s(t) = Σ_tables E_tbl · eqf(β_i, t) · S_tbl(t)
            msg3 = None
            for tbl in range(3):
                w = fq3.mul(E[tbl],
                            tuple((eqf_d[0][tbl, r, :, c],
                                   eqf_d[1][tbl, r, :, c])
                                  for c in range(3)))  # (n_msg,) fq3
                if tbl == 2:
                    S3 = Sh_ext
                else:
                    S3 = tuple((Sc_ext[c][0][:, tbl], Sc_ext[c][1][:, tbl])
                               for c in range(3))
                wb = tuple((w[c][0][:, None], w[c][1][:, None])
                           for c in range(3))
                term = fq3.mul(S3, wb)
                msg3 = term if msg3 is None else fq3.add(msg3, term)

            # pack comps -> (n_msg, 24) slot-major for the transcript
            msg = (xp.stack([msg3[c][0] for c in range(3)],
                            axis=-1).reshape(n_msg, 24),
                   xp.stack([msg3[c][1] for c in range(3)],
                            axis=-1).reshape(n_msg, 24))
            ch.observe_array((msg[0].reshape(-1), msg[1].reshape(-1)))
            msgs_lo.append(msg[0])
            msgs_hi.append(msg[1])
            c3 = ch.get_challenge()
            post = (xp.stack([c3[j][0] for j in range(3)] * 8),
                    xp.stack([c3[j][1] for j in range(3)] * 8))
            ch.observe_array(post)
            r3 = tuple((x[0], x[1]) for x in c3)

            # folds (comp-wise): tail + c rows at r; eq tables already
            # pair-summed
            tstep = fq3.sub(hi3(t3, half), lo3(t3, half))
            t3 = fq3.add(lo3(t3, half), fq3.mul(tstep, r3))
            cstep = fq3.sub(hi3(c3r, half), lo3(c3r, half))
            c3r = fq3.add(lo3(c3r, half), fq3.mul(cstep, r3))
            eq3 = Tn3
            # E_tbl *= eqf(β_i, r) = 1 - β - r + 2βr
            for tbl in range(3):
                b3 = tuple((betas_d[0][tbl, r, c], betas_d[1][tbl, r, c])
                           for c in range(3))
                br = fq3.mul(b3, r3)
                one3 = ((one32, zero32), (zero32, zero32), (zero32, zero32))
                eqf_r = fq3.add(fq3.sub(fq3.sub(one3, b3), r3),
                                fq3.add(br, br))
                E[tbl] = fq3.mul(E[tbl], eqf_r)

        # final rows in the [eq1, c1, eq2, c2, eqβ, f̂...] layout
        def embed(x3):
            return (xp.stack([x3[c][0] for c in range(3)] * 8),
                    xp.stack([x3[c][1] for c in range(3)] * 8))

        def pack_fin(x3):
            # comps (k, 8, 1) -> (k, 24)
            return (xp.stack([x3[c][0][..., 0] for c in range(3)],
                             axis=-1).reshape(-1, 24),
                    xp.stack([x3[c][1][..., 0] for c in range(3)],
                             axis=-1).reshape(-1, 24))

        c_fin = pack_fin(c3r)
        t_fin = pack_fin(t3)
        fin_lo = xp.stack(
            [embed(E[0])[0], c_fin[0][0], embed(E[1])[0],
             c_fin[0][1], embed(E[2])[0]])
        fin_hi = xp.stack(
            [embed(E[0])[1], c_fin[1][0], embed(E[1])[1],
             c_fin[1][1], embed(E[2])[1]])
        final = (xp.concatenate([fin_lo, t_fin[0]]),
                 xp.concatenate([fin_hi, t_fin[1]]))
        return (xp.stack(msgs_lo), xp.stack(msgs_hi)), final

    jf = engine._jit((comb_key, "fulldev_factored", rows, n0, degree, nv,
                      ilen, olen, _const_key(eq_points)), fn)
    with B.jax_mode():
        msgs, final = jf(head, tail, consts_dev,
                         engine.put(_split64(state16)),
                         engine.put(_split64(ibuf)),
                         engine.put(_split64(obuf)))
    msgs_host = gl.to_int(engine.get(msgs))
    final = engine.get(final)
    if log:
        log(f"factored fold sumcheck dispatch+fetch: "
            f"{time.time()-t_start:.2f}s")

    transcript.absorb_u64(nv)
    transcript.absorb_u64(degree)
    proof, chals = [], []
    for r in range(nv):
        msg = [[int(v) for v in row] for row in msgs_host[r]]
        transcript.absorb_slice(msg)
        proof.append(msg)
        c = transcript.get_challenge()
        transcript.absorb_fq3(c)
        chals.append(c)
    final = (np.asarray(final[0]).reshape(-1, 24),
             np.asarray(final[1]).reshape(-1, 24))
    return proof, chals, final


def run_lin_fulldev_factored(engine, transcript, g_t, nv, degree, comb_key,
                             consts_dev, S, beta_s, log=None):
    """Eq-factored linearization sum-check: all rounds + challenger in ONE
    dispatch (the lin analog of run_fold_fulldev_factored).

    The lin g = eq(β, x) · q(x) with q = Σ_i c_i Π_{j∈S_i} Mz_j(x)
    (linearization/utils.rs:66-107).  Gruen's split: per round
    eq(β, (r_<i, t, x)) = E_i · eqf(β_i, t) · eq(β_{>i}, x), so

      * the eq table folds by PAIR-SUMS and never enters the comb;
      * q is evaluated at only deg(q)+1 = degree points (one fewer than the
        degree+1 message points), Lagrange-extended POST-contraction;
      * COMPONENT-SPLIT layout: every Fq3 component in its own (rows, 8, x)
        array, so the multiset product chains are pure fq3.mul with no
        24→(8,3) retile per op (measured 1.5x on the fold comb).

    g_t: (t+1, 24, n0) bit-reversed t-layout stack, eq row LAST (lin_g_t
    output, reused verbatim).  Truncated stacks (n0 < 2^nv) reconstruct the
    remaining-variable eq table from the host betas mid-dispatch, exactly
    like run_sumcheck_fulldev's recon path (E carries the device-round
    eqf prefix).  Round messages are bit-identical to the direct comb —
    same polynomial, exact mod-p arithmetic.
    """
    import time

    from ..field import fq3, host as Hh

    t_start = time.time()
    t_rows = int(g_t[0].shape[0]) - 1
    n0 = int(g_t[0].shape[-1])
    rounds_dev = min(nv, int(np.log2(n0)) if n0 > 1 else 0)
    npts_q = degree                      # deg(q) = degree - 1
    n_msg = degree + 1
    chunk_budget = getattr(engine, "sum_chunk_bytes", 192 << 20)

    assert all(len(S_i) >= 1 for S_i in S), \
        "factored lin comb needs non-empty multisets (builder invariant)"
    groups = {}
    for i, S_i in enumerate(S):
        groups.setdefault(len(S_i), []).append((i, list(S_i)))
    group_list = [
        (np.array([m[0] for m in members], np.int32),
         np.array([m[1] for m in members], np.int32))
        for size, members in sorted(groups.items())]

    state16, ibuf, obuf = snapshot_challenger(transcript.ch)
    ilen, olen = len(ibuf), len(obuf)

    embeds = np.array([Hh.ntt_from_u64(nv), Hh.ntt_from_u64(degree)],
                      dtype=object).reshape(-1)
    embeds = _split64(np.array([int(v) for v in embeds], dtype=np.uint64))

    # host consts: eqf(β_i, t) per (round, message point); Lagrange
    # extension deg(q)+1 -> degree+1; raw betas for the E update
    eqf = np.empty((nv, n_msg, 3), dtype=object)
    for i, b in enumerate(beta_s):
        for t in range(n_msg):
            eqf[i, t] = [(x * (2 * t - 1) + (1 - t if j == 0 else 0)) % gl.P
                         for j, x in enumerate(b)]
    eqf_l = _split_obj(eqf)
    ext_q = _split_obj(_lagrange_ext_consts(npts_q, n_msg))
    betas_l = _split_obj(np.array([list(b) for b in beta_s], dtype=object))

    recon = rounds_dev < nv
    if recon:
        rest = 1 << (nv - rounds_dev)
        with B.numpy_mode():
            tab_std = accel_t.build_eq_table_rev(beta_s[rounds_dev:])
            tab_t = (np.moveaxis(np.asarray(tab_std[0]), 0, 1),
                     np.moveaxis(np.asarray(tab_std[1]), 0, 1))   # (24, rest)

    def fn(g_, consts, st, ib, ob):
        import jax
        import jax.numpy as jnp
        xp = B.xp
        ch = DevChallenger(
            (st[0].reshape(1, WIDTH), st[1].reshape(1, WIDTH)),
            [(ib[0][i], ib[1][i]) for i in range(ilen)],
            [(ob[0][i], ob[1][i]) for i in range(olen)])
        ch.observe_array((xp.asarray(embeds[0]), xp.asarray(embeds[1])))

        one32, zero32 = np.uint32(1), np.uint32(0)
        one3 = ((one32, zero32), (zero32, zero32), (zero32, zero32))

        def split3(lo, hi):
            return tuple((lo[..., c::3, :], hi[..., c::3, :])
                         for c in range(3))

        def lo3(x3, half):
            return tuple((x3[c][0][..., :half], x3[c][1][..., :half])
                         for c in range(3))

        def hi3(x3, half):
            return tuple((x3[c][0][..., half:], x3[c][1][..., half:])
                         for c in range(3))

        mz3 = split3(g_[0][:t_rows], g_[1][:t_rows])     # comps (t, 8, n)
        eq3 = split3(g_[0][t_rows], g_[1][t_rows])       # comps (8, n)
        eqf_d = tuple(xp.asarray(a) for a in eqf_l)
        ext_q_d = tuple(xp.asarray(a) for a in ext_q)
        betas_d = tuple(xp.asarray(a) for a in betas_l)
        qn = int(consts[0].shape[0])
        c_comp = tuple(
            (consts[0].reshape(qn, 8, 3)[..., c],
             consts[1].reshape(qn, 8, 3)[..., c]) for c in range(3))
        E = one3

        def extend(Sv, ext):
            e0 = ext[0].reshape(ext[0].shape + (1,) * (Sv[0].ndim - 1))
            e1 = ext[1].reshape(ext[1].shape + (1,) * (Sv[1].ndim - 1))
            prod = gl.mul((Sv[0][None], Sv[1][None]), (e0[:, :], e1[:, :]))
            return gl.sum_axis(prod, axis=1)             # (n_msg, ...)

        msgs_lo, msgs_hi = [], []

        def one_round(mz3, eq3, E, ridx):
            n_r = int(mz3[0][0].shape[-1])
            half = n_r // 2
            Tn3 = fq3.add(lo3(eq3, half), hi3(eq3, half))  # comps (8, half)
            bytes_half = t_rows * 24 * half * 8
            chunks = 1
            while (bytes_half // chunks > chunk_budget
                   and half % (chunks * 2) == 0):
                chunks *= 2
            cs = half // chunks

            def body(i, acc):
                pt = i // chunks
                j = i % chunks
                tl = pt.astype(jnp.uint32)
                tz = jnp.zeros((), jnp.uint32)

                def dsl(x, off):
                    return jax.lax.dynamic_slice(x, (0, 0, off),
                                                 (t_rows, 8, cs))

                v0c = tuple((dsl(mz3[c][0], j * cs), dsl(mz3[c][1], j * cs))
                            for c in range(3))
                v1c = tuple((dsl(mz3[c][0], half + j * cs),
                             dsl(mz3[c][1], half + j * cs))
                            for c in range(3))
                st3 = fq3.sub(v1c, v0c)
                vals = tuple(gl.add(v0c[c], gl.mul(st3[c], (tl, tz)))
                             for c in range(3))
                total = None
                for iidx, jidx in group_list:
                    g3 = tuple((vals[c][0][jidx], vals[c][1][jidx])
                               for c in range(3))        # (g, sz, 8, cs)
                    prod = tuple((g3[c][0][:, 0], g3[c][1][:, 0])
                                 for c in range(3))
                    for s in range(1, jidx.shape[1]):
                        prod = fq3.mul(prod,
                                       tuple((g3[c][0][:, s], g3[c][1][:, s])
                                             for c in range(3)))
                    cw = tuple((c_comp[c][0][iidx][..., None],
                                c_comp[c][1][iidx][..., None])
                               for c in range(3))        # (g, 8, 1)
                    term = fq3.mul(prod, cw)
                    part = tuple(gl.sum_axis(term[c], axis=0)
                                 for c in range(3))      # (8, cs)
                    total = part if total is None else fq3.add(total, part)
                Tc = tuple((jax.lax.dynamic_slice(
                                Tn3[c][0], (0, j * cs), (8, cs)),
                            jax.lax.dynamic_slice(
                                Tn3[c][1], (0, j * cs), (8, cs)))
                           for c in range(3))
                tot = fq3.mul(total, Tc)
                s3 = tuple(gl.sum_axis(tot[c], axis=-1) for c in range(3))
                outs = []
                for c in range(3):
                    prev = (acc[c][0][pt], acc[c][1][pt])
                    nxt = gl.add(prev, s3[c])
                    outs.append((acc[c][0].at[pt].set(nxt[0]),
                                 acc[c][1].at[pt].set(nxt[1])))
                return tuple(outs)

            init = tuple((jnp.zeros((npts_q, 8), jnp.uint32),
                          jnp.zeros((npts_q, 8), jnp.uint32))
                         for _ in range(3))
            Sq3 = jax.lax.fori_loop(0, npts_q * chunks, body, init)

            Sq_ext = tuple(extend(Sq3[c], ext_q_d)
                           for c in range(3))            # (n_msg, 8)
            w3 = fq3.mul(E, tuple((eqf_d[0][ridx, :, c],
                                   eqf_d[1][ridx, :, c])
                                  for c in range(3)))    # (n_msg,)
            wb = tuple((w3[c][0][:, None], w3[c][1][:, None])
                       for c in range(3))
            msg3 = fq3.mul(Sq_ext, wb)
            msg = (xp.stack([msg3[c][0] for c in range(3)],
                            axis=-1).reshape(n_msg, 24),
                   xp.stack([msg3[c][1] for c in range(3)],
                            axis=-1).reshape(n_msg, 24))
            ch.observe_array((msg[0].reshape(-1), msg[1].reshape(-1)))
            msgs_lo.append(msg[0])
            msgs_hi.append(msg[1])
            c3 = ch.get_challenge()
            post = (xp.stack([c3[j][0] for j in range(3)] * 8),
                    xp.stack([c3[j][1] for j in range(3)] * 8))
            ch.observe_array(post)
            r3 = tuple((x[0], x[1]) for x in c3)
            mstep = fq3.sub(hi3(mz3, half), lo3(mz3, half))
            mz3 = fq3.add(lo3(mz3, half), fq3.mul(mstep, r3))
            b3 = tuple((betas_d[0][ridx, c], betas_d[1][ridx, c])
                       for c in range(3))
            br = fq3.mul(b3, r3)
            eqf_r = fq3.add(fq3.sub(fq3.sub(one3, b3), r3),
                            fq3.add(br, br))
            return mz3, Tn3, fq3.mul(E, eqf_r)

        for r in range(rounds_dev):
            mz3, eq3, E = one_round(mz3, eq3, E, r)
        if recon:
            st_lo = xp.zeros((t_rows, 8, rest), np.uint32)
            st_hi = xp.zeros((t_rows, 8, rest), np.uint32)
            mz3 = tuple(
                (st_lo.at[:, :, 0].set(mz3[c][0][:, :, 0]),
                 st_hi.at[:, :, 0].set(mz3[c][1][:, :, 0]))
                for c in range(3))
            tab3 = split3(xp.asarray(tab_t[0]), xp.asarray(tab_t[1]))
            eq3 = tab3
            for r in range(rounds_dev, nv):
                mz3, eq3, E = one_round(mz3, eq3, E, r)

        # final rows [Mz..., eq] matching the unfactored stack order
        fin_lo = xp.concatenate(
            [xp.stack([mz3[c][0][..., 0] for c in range(3)],
                      axis=-1).reshape(t_rows, 24),
             xp.stack([E[c][0] for c in range(3)] * 8)[None]])
        fin_hi = xp.concatenate(
            [xp.stack([mz3[c][1][..., 0] for c in range(3)],
                      axis=-1).reshape(t_rows, 24),
             xp.stack([E[c][1] for c in range(3)] * 8)[None]])
        return (xp.stack(msgs_lo), xp.stack(msgs_hi)), (fin_lo, fin_hi)

    jf = engine._jit((comb_key, "fulldev_lin_factored", t_rows, n0, degree,
                      nv, ilen, olen, _const_key(beta_s)), fn)
    with B.jax_mode():
        msgs, final = jf(g_t, consts_dev,
                         engine.put(_split64(state16)),
                         engine.put(_split64(ibuf)),
                         engine.put(_split64(obuf)))
    msgs_host = gl.to_int(engine.get(msgs))
    final = engine.get(final)
    if log:
        log(f"factored lin sumcheck dispatch+fetch: "
            f"{time.time()-t_start:.2f}s")

    transcript.absorb_u64(nv)
    transcript.absorb_u64(degree)
    proof, chals = [], []
    for r in range(nv):
        msg = [[int(v) for v in row] for row in msgs_host[r]]
        transcript.absorb_slice(msg)
        proof.append(msg)
        c = transcript.get_challenge()
        transcript.absorb_fq3(c)
        chals.append(c)
    final = (np.asarray(final[0]).reshape(-1, 24),
             np.asarray(final[1]).reshape(-1, 24))
    return proof, chals, final


def run_sumcheck_fulldev(engine, transcript, mles_t, nv, degree, comb_key,
                         comb_fn, consts_dev, eq_info_rev=None, log=None):
    """All array rounds of the sum-check in ONE device dispatch (traced
    challenger), then host replay of the messages.  Transcript-identical to
    run_sumcheck_shrink."""
    import time
    t_start = time.time()
    is_parts = not hasattr(mles_t[0], "shape")
    parts0 = list(mles_t) if is_parts else [mles_t]
    part_comb = comb_fn if is_parts else (
        lambda vals, c: comb_fn(vals[0], c))

    n0 = int(parts0[0][0].shape[-1])
    k = sum(int(p[0].shape[0]) for p in parts0)
    rounds_dev = min(nv, int(np.log2(n0)) if n0 > 1 else 0)
    chunk_budget = getattr(engine, "sum_chunk_bytes", 192 << 20)

    state16, ibuf, obuf = snapshot_challenger(transcript.ch)
    ilen, olen = len(ibuf), len(obuf)

    from ..field import host as Hh
    embeds = np.array([Hh.ntt_from_u64(nv), Hh.ntt_from_u64(degree)],
                      dtype=object).reshape(-1)
    embeds = _split64(np.array([int(v) for v in embeds], dtype=np.uint64))

    # reconstruction-round constants (truncated MLEs, the lin path): the
    # remaining-variable eq table is a HOST constant (betas known); only the
    # Π eqf(β_j, r_j) prefix over the device rounds is traced
    recon = rounds_dev < nv and eq_info_rev is not None
    if recon:
        from ..field import fq3
        beta_list, eq_index = eq_info_rev
        rest = 1 << (nv - rounds_dev)
        with B.numpy_mode():
            tab_std = accel_t.build_eq_table_rev(beta_list[rounds_dev:])
            tab_t = (np.moveaxis(np.asarray(tab_std[0]), 0, 1),
                     np.moveaxis(np.asarray(tab_std[1]), 0, 1))  # (24, rest)
            betas_dev = _split_obj(np.array(
                [[c % gl.P for c in b] for b in beta_list[:rounds_dev]],
                dtype=object))                                   # (rd, 3)

    def fn(ps, consts, st, ib, ob):
        ch = DevChallenger(
            (st[0].reshape(1, WIDTH), st[1].reshape(1, WIDTH)),
            [(ib[0][i], ib[1][i]) for i in range(ilen)],
            [(ob[0][i], ob[1][i]) for i in range(olen)])
        ch.observe_array((B.xp.asarray(embeds[0]),
                          B.xp.asarray(embeds[1])))
        msgs_lo, msgs_hi = [], []
        cur = ps
        chals3 = []

        def one_round(cur, k_):
            n = int(cur[0][0].shape[-1])
            bytes_half = k_ * 24 * (n // 2) * 8
            chunks = 1
            while (bytes_half // chunks > chunk_budget
                   and (n // 2) % (chunks * 2) == 0):
                chunks *= 2
            sums = accel_t.sumcheck_sums_parts(cur, degree, part_comb,
                                               consts, chunks=chunks)
            ch.observe_array((sums[0].reshape(-1), sums[1].reshape(-1)))
            msgs_lo.append(sums[0])
            msgs_hi.append(sums[1])
            c3 = ch.get_challenge()          # samples + observes back
            # absorb_fq3: (c0,c1,c2) embedded at every slot (24 values)
            post = (B.xp.stack([c3[j][0] for j in range(3)] * 8),
                    B.xp.stack([c3[j][1] for j in range(3)] * 8))
            ch.observe_array(post)
            chals3.append(c3)
            r_limbs = tuple((x[0], x[1]) for x in c3)
            flat = [a for p in cur for a in p]
            return list(accel_t.fold_shrink_parts(r_limbs, *flat))

        for r in range(rounds_dev):
            cur = one_round(cur, k)
        if recon:
            from ..field import fq3
            xp = B.xp
            one32, zero32 = np.uint32(1), np.uint32(0)
            one3 = ((one32, zero32), (zero32, zero32), (zero32, zero32))
            bd = tuple(xp.asarray(a) for a in betas_dev)
            scale = one3
            for j, c3 in enumerate(chals3):
                b3 = tuple((bd[0][j, c], bd[1][j, c]) for c in range(3))
                r3 = tuple((x[0], x[1]) for x in c3)
                br = fq3.mul(b3, r3)
                eqf = fq3.add(fq3.sub(fq3.sub(one3, b3), r3),
                              fq3.add(br, br))
                scale = fq3.mul(scale, eqf)
            tab = rq.ntt_scalar_mul_t(
                (xp.asarray(tab_t[0]), xp.asarray(tab_t[1])), scale)
            # padded stack: folded row values at index 0, zeros elsewhere;
            # the (stale, lazily-truncated) eq row is OVERWRITTEN with the
            # reconstructed remaining-variable table (accel._numpy_tail
            # semantics, on device)
            row = 0
            st_lo = xp.zeros((k, 24, rest), np.uint32)
            st_hi = xp.zeros((k, 24, rest), np.uint32)
            for p in cur:
                kp = int(p[0].shape[0])
                st_lo = st_lo.at[row:row + kp, :, 0].set(p[0][:, :, 0])
                st_hi = st_hi.at[row:row + kp, :, 0].set(p[1][:, :, 0])
                row += kp
            st_lo = st_lo.at[eq_index].set(tab[0])
            st_hi = st_hi.at[eq_index].set(tab[1])
            cur = [(st_lo, st_hi)]
            for r in range(rounds_dev, nv):
                cur = one_round(cur, k)
        return (B.xp.stack(msgs_lo), B.xp.stack(msgs_hi)), cur

    jf = engine._jit((comb_key, "fulldev", k, n0, degree, nv, ilen, olen,
                      _const_key(eq_info_rev[0]) if recon else ""),
                     fn)
    with B.jax_mode():
        msgs, cur = jf(parts0, consts_dev,
                       engine.put(_split64(state16)),
                       engine.put(_split64(ibuf)),
                       engine.put(_split64(obuf)))
    msgs_host = gl.to_int(engine.get(msgs))        # (R, deg+1, 24)
    if log:
        log(f"fulldev sumcheck dispatch+fetch: {time.time()-t_start:.2f}s")

    # host replay: same absorbs -> same challenges -> canonical transcript
    rounds_replay = nv if recon else rounds_dev
    transcript.absorb_u64(nv)
    transcript.absorb_u64(degree)
    proof, chals = [], []
    for r in range(rounds_replay):
        msg = [[int(v) for v in row] for row in msgs_host[r]]
        transcript.absorb_slice(msg)
        proof.append(msg)
        c = transcript.get_challenge()
        transcript.absorb_fq3(c)
        chals.append(c)

    final = None
    if rounds_replay < nv:
        # truncated MLEs without reconstruction info: host tail fallback
        hosts = [tuple(np.asarray(a) for a in engine.get(p)) for p in cur]
        tail_proof, tail_chals, final = accel_t._host_tail_t(
            engine, transcript, hosts, nv, rounds_dev, degree, comb_key,
            part_comb, consts_dev, eq_info_rev, chals, log=log)
        proof.extend(tail_proof)
        chals.extend(tail_chals)
    else:
        hosts = [engine.get(p) for p in cur]
        final = (np.concatenate([np.asarray(h[0][..., 0]).reshape(-1, 24)
                                 for h in hosts]),
                 np.concatenate([np.asarray(h[1][..., 0]).reshape(-1, 24)
                                 for h in hosts]))
    final = (np.asarray(final[0]).reshape(-1, 24),
             np.asarray(final[1]).reshape(-1, 24))
    return proof, chals, final
