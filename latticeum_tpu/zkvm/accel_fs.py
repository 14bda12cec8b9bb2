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

    def fn(ps, consts, st, ib, ob):
        ch = DevChallenger(
            (st[0].reshape(1, WIDTH), st[1].reshape(1, WIDTH)),
            [(ib[0][i], ib[1][i]) for i in range(ilen)],
            [(ob[0][i], ob[1][i]) for i in range(olen)])
        ch.observe_array((B.xp.asarray(embeds[0]),
                          B.xp.asarray(embeds[1])))
        msgs_lo, msgs_hi = [], []
        cur = ps
        for r in range(rounds_dev):
            n = int(cur[0][0].shape[-1])
            bytes_half = k * 24 * (n // 2) * 8
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
            r_limbs = tuple((x[0], x[1]) for x in c3)
            flat = [a for p in cur for a in p]
            cur = list(accel_t.fold_shrink_parts(r_limbs, *flat))
        return (B.xp.stack(msgs_lo), B.xp.stack(msgs_hi)), cur

    jf = engine._jit((comb_key, "fulldev", k, n0, degree, nv, ilen, olen),
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
    transcript.absorb_u64(nv)
    transcript.absorb_u64(degree)
    proof, chals = [], []
    for r in range(rounds_dev):
        msg = [[int(v) for v in row] for row in msgs_host[r]]
        transcript.absorb_slice(msg)
        proof.append(msg)
        c = transcript.get_challenge()
        transcript.absorb_fq3(c)
        chals.append(c)

    final = None
    if rounds_dev < nv:
        # truncated MLEs (lin path): reconstruction rounds on host
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
