"""Device-side Fiat-Shamir: the Poseidon2 duplex challenger as traced JAX
(fori-loop compact, exact uint32 limb arithmetic), and a fixed-width
sum-check phase that runs ALL remaining rounds — comb sums, message
absorption, challenge squeezing, fold — in ONE device dispatch.

Why: with the host transcript (accel_rounds.py default), every sum-check
round pays a ~25-30 ms tunnel round trip; the two fixed phases alone are
~20 rounds = ~0.6 s/step of pure RTT (step_breakdown_r04/r05).  The r03
attempt at a device challenger inlined the Poseidon2 perm16 as straight-line
XLA — ~7 s of compile PER INSTANCE, tens of minutes per monolith (rc=124).
This module avoids that failure mode structurally:

  * perm16 is built from `lax.fori_loop`s over the round constants (4 ext +
    22 internal + 4 ext as three loops, constants in device arrays), so one
    challenger step traces ~a few k primitives instead of ~120k;
  * the whole fixed phase is ONE `lax.scan` over rounds (fixed-width
    interleaved buffers, accel_t.interleave_fold_t invariant), so the
    challenger body is traced once per protocol, not once per round.

Bit-exactness: the duplex state machine is replicated exactly
(crypto/poseidon2_ref.DuplexChallenger / native/poseidon2.cpp:165-188,
mirroring Plonky3 DuplexChallenger<Goldilocks, 16, 12> as used by the
reference zkvm, fiat_shamir.rs:20-114).  Per sum-check round the sequence
is: observe 3 pending values (previous challenge) + (degree+1)*24 message
coefficients, then sample 3 (one duplex with the leftover input buffer —
output buffer is always stale-cleared at that point because an observe
precedes every sample), then the 3 samples become the next round's pending
observes.  All buffer positions are static, so the machine unrolls into
the scan with no data-dependent control flow.

The host transcript syncs at the phase boundary via export/import of
(state16, input_buffer) — see crypto/transcript.py.
"""

from __future__ import annotations

import numpy as np

from .. import backend as B
from ..crypto import consts
from ..field import fq3, goldilocks as gl
from ..ring import rq
from . import accel_t

P = gl.P


# -- device constants --------------------------------------------------------

def _pair_const(vals):
    """host ints -> ((...,) lo, (...,) hi) uint32 device arrays."""
    a = np.asarray(vals, dtype=np.uint64)
    return (B.xp.asarray((a & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            B.xp.asarray((a >> np.uint64(32)).astype(np.uint32)))


def _p2_consts():
    return {
        "ext_i": _pair_const(consts.W16_EXTERNAL_INITIAL),   # (4, 16)
        "ext_t": _pair_const(consts.W16_EXTERNAL_TERMINAL),  # (4, 16)
        "int22": _pair_const(consts.INTERNAL_22),            # (22,)
        "diag": _pair_const(consts.DIAG_16),                 # (16,)
    }


# -- Poseidon2 width-16 permutation (vectorized over the 16 lanes) -----------

def _mds16(s):
    """mds_light for width 16 on a (..., 16) limb pair (poseidon2_ref)."""
    lo, hi = s
    blk = (lo.reshape(lo.shape[:-1] + (4, 4)),
           hi.reshape(hi.shape[:-1] + (4, 4)))
    c = [(blk[0][..., k], blk[1][..., k]) for k in range(4)]
    t01 = gl.add(c[0], c[1])
    t23 = gl.add(c[2], c[3])
    alls = gl.add(t01, t23)
    d0 = gl.add(alls, gl.add(c[0], gl.add(c[1], c[1])))
    d1 = gl.add(alls, gl.add(c[1], gl.add(c[2], c[2])))
    d2 = gl.add(alls, gl.add(c[2], gl.add(c[3], c[3])))
    d3 = gl.add(alls, gl.add(c[3], gl.add(c[0], c[0])))
    dm = (B.xp.stack([d0[0], d1[0], d2[0], d3[0]], axis=-1),
          B.xp.stack([d0[1], d1[1], d2[1], d3[1]], axis=-1))  # (..., 4b, 4k)
    s01 = gl.add((dm[0][..., 0, :], dm[1][..., 0, :]),
                 (dm[0][..., 1, :], dm[1][..., 1, :]))
    s23 = gl.add((dm[0][..., 2, :], dm[1][..., 2, :]),
                 (dm[0][..., 3, :], dm[1][..., 3, :]))
    sums = gl.add(s01, s23)                                   # (..., 4)
    out = gl.add(dm, (sums[0][..., None, :], sums[1][..., None, :]))
    return (out[0].reshape(lo.shape), out[1].reshape(hi.shape))


def _sbox(x):
    x2 = gl.mul(x, x)
    x3 = gl.mul(x2, x)
    x4 = gl.mul(x2, x2)
    return gl.mul(x4, x3)


def perm16_dev(state, pc):
    """Poseidon2 width-16 permutation on a ((16,) lo, (16,) hi) state."""
    import jax

    def ext_body(cs):
        def body(r, st):
            rc = (jax.lax.dynamic_slice(cs[0], (r, 0), (1, 16))[0],
                  jax.lax.dynamic_slice(cs[1], (r, 0), (1, 16))[0])
            return _mds16(_sbox(gl.add(st, rc)))
        return body

    state = _mds16(state)
    state = jax.lax.fori_loop(0, 4, ext_body(pc["ext_i"]), state)

    def int_body(r, st):
        rc = (jax.lax.dynamic_slice(pc["int22"][0], (r,), (1,)),
              jax.lax.dynamic_slice(pc["int22"][1], (r,), (1,)))
        s0 = _sbox(gl.add((st[0][:1], st[1][:1]), rc))
        st = (B.xp.concatenate([s0[0], st[0][1:]]),
              B.xp.concatenate([s0[1], st[1][1:]]))
        tot = gl.sum_axis(st, axis=0)                          # scalar
        return gl.add(gl.mul(st, pc["diag"]),
                      (B.xp.broadcast_to(tot[0], (16,)),
                       B.xp.broadcast_to(tot[1], (16,))))

    state = jax.lax.fori_loop(0, 22, int_body, state)
    state = jax.lax.fori_loop(0, 4, ext_body(pc["ext_t"]), state)
    return state


def challenger_step(state, buf, pc):
    """Observe the L values in `buf` (pending-first), then sample 3.

    state: ((16,) lo, (16,) hi); buf: ((L,) lo, (L,) hi), L static.
    Exactly DuplexChallenger: full 12-value chunks overwrite state[0:12]
    and permute; the sample duplexes once more with the leftover r = L%12
    values (the output buffer is stale at that point — an observe always
    precedes the sample in the sum-check round sequence).
    Returns (state', (c0, c1, c2)) with c_i scalar limb pairs; the caller
    must observe (c0, c1, c2) next (they are the next pending values)."""
    import jax
    L = int(buf[0].shape[0])
    nfull = L // 12
    r = L % 12

    def chunk(k, st):
        vals = (jax.lax.dynamic_slice(buf[0], (k * 12,), (12,)),
                jax.lax.dynamic_slice(buf[1], (k * 12,), (12,)))
        st = (B.xp.concatenate([vals[0], st[0][12:]]),
              B.xp.concatenate([vals[1], st[1][12:]]))
        return perm16_dev(st, pc)

    if nfull:
        state = jax.lax.fori_loop(0, nfull, chunk, state)
    if r:
        tail = (buf[0][nfull * 12:], buf[1][nfull * 12:])
        state = (B.xp.concatenate([tail[0], state[0][r:]]),
                 B.xp.concatenate([tail[1], state[1][r:]]))
        state = perm16_dev(state, pc)
    # else L % 12 == 0: the last absorb chunk's duplex already refilled the
    # output buffer (observe clears it BEFORE appending, so the duplex runs
    # after the clear) — sample pops without permuting again
    chal = tuple((state[0][i], state[1][i]) for i in (11, 10, 9))
    # post-sample observes (_transcript_round): get_challenge re-observes
    # (c0, c1, c2), then absorb_fq3 embeds the challenge into a full ring —
    # 8 slots x 3 comps = 24 more values.  27 period-3 observes = two full
    # duplex chunks of the tiled (c0, c1, c2) pattern + 3 pending.
    tiled = (B.xp.stack([c[0] for c in chal] * 4),
             B.xp.stack([c[1] for c in chal] * 4))
    for _ in range(2):
        state = (B.xp.concatenate([tiled[0], state[0][12:]]),
                 B.xp.concatenate([tiled[1], state[1][12:]]))
        state = perm16_dev(state, pc)
    return state, chal


def _eqf_dev(b3, r3):
    """eqf(b, r) = 1 - b - r + 2br for Fq3 scalar limb-pair triples."""
    br = fq3.mul(b3, r3)
    one = (gl.ones(br[0][0].shape), gl.zeros(br[0][0].shape),
           gl.zeros(br[0][0].shape))
    return fq3.add(fq3.sub(fq3.sub(one, b3), r3), fq3.add(br, br))


# -- the device-FS fixed phase ----------------------------------------------

def _scan_rounds(state, pend, parts, n_rounds, degree, part_comb, consts,
                 pc):
    """lax.scan over `n_rounds` fixed-width sum-check rounds with the
    challenger inline.  Returns (state, pend, parts, msgs, chals) where
    msgs is ((T, degree+1, 24) lo, hi) and chals ((T, 3) lo, hi)."""
    import jax

    def body(carry, _):
        st, pd, ps = carry
        sums = accel_t.sumcheck_sums_parts(ps, degree, part_comb, consts,
                                           chunks=1)
        msg_flat = (sums[0].reshape(-1), sums[1].reshape(-1))
        buf = (B.xp.concatenate([pd[0], msg_flat[0]]),
               B.xp.concatenate([pd[1], msg_flat[1]]))
        st, chal = challenger_step(st, buf, pc)
        pd = (B.xp.stack([c[0] for c in chal]),
              B.xp.stack([c[1] for c in chal]))
        r3 = tuple((c[0], c[1]) for c in chal)
        flat = [a for p in ps for a in p]
        ps = list(accel_t.fold_round_parts(r3, *flat))
        return (st, pd, ps), (sums, pd)

    (state, pend, parts), (msgs, chals) = jax.lax.scan(
        body, (state, pend, parts), None, length=n_rounds)
    return state, pend, parts, msgs, chals


def run_fixed_phase_dev(engine, transcript, parts, nv, r0, degree, comb_key,
                        part_comb, consts_dev, eq_info_rev, chals,
                        log=None, dev_state=None, dev_chals=None,
                        return_device=False):
    """Drop-in replacement for accel_rounds._fixed_phase: one dispatch.

    Finishes rounds r0..nv on device with fixed-width buffers AND the
    Fiat-Shamir challenger on device; includes the lin path's truncated-MLE
    eq reconstruction tail (betas are host constants; the traced challenges
    feed the eqf scale product).  One fetch at the end returns all round
    messages, challenges, finals, and the challenger state; the host
    transcript is then synced (absorptions list + challenger import).

    Device-chained entry (accel_rounds chain mode): `dev_state` =
    (state16_pair, pend_pair) device challenger state from the chained
    shrink rounds (skips the host transcript export), `dev_chals` =
    ((T0, 3) lo, hi) device array of the shrink-round challenges (replaces
    the host `chals` list in the recon eqf-scale product), and
    `return_device=True` defers the fetch + host bookkeeping to the caller
    (finish_fixed_phase_host) so the entire sum-check is one device chain
    with a single fetch."""
    import time as _time
    import jax as _jax

    t_fx = _time.time()
    k = sum(int(p[0].shape[0]) for p in parts)
    F = int(parts[0][0].shape[-1])
    nb = len(parts)
    n_msg = degree + 1
    T1 = min(nv - r0, max(F.bit_length() - 1, 0))
    r1 = r0 + T1
    recon = r1 < nv
    dev_mode = dev_state is not None
    if recon:
        assert eq_info_rev is not None, \
            "actives exhausted before nv but no eq reconstruction info"
        beta_list, eq_index = eq_info_rev
        rest = 1 << (nv - r1)
        T2 = nv - r1
        # host-known pieces: eq table of the remaining betas; the scale
        # prefix over the HOST challenges (rounds before this phase)
        from ..field import host as H
        with B.numpy_mode():
            tab_std = accel_t.build_eq_table_rev(beta_list[r1:])
            tab_np = (np.moveaxis(np.asarray(tab_std[0]), 0, 1),
                      np.moveaxis(np.asarray(tab_std[1]), 0, 1))  # (24, rest)
            scale0 = (1, 0, 0)
            if not dev_mode:
                for rj, bj in zip(chals, beta_list):
                    from .accel_rounds import _eqf_at
                    scale0 = H.fq3_mul(scale0, _eqf_at(bj, rj))
        if dev_mode:
            # the shrink challenges are device-resident: fold ALL rounds'
            # eqf factors (0..r1) into the traced fori instead
            betas_dev_np = np.asarray(
                [[int(x) % P for x in beta_list[i]] for i in range(r1)],
                dtype=np.uint64)                               # (r1, 3)
        else:
            betas_dev_np = np.asarray(
                [[int(x) % P for x in beta_list[r0 + i]] for i in range(T1)],
                dtype=np.uint64)                               # (T1, 3)

    # challenger export: the host transcript state enters the graph as
    # runtime inputs (NOT baked into the trace — kernels are shape-keyed)
    if dev_mode:
        state0, pend0_dev = dev_state
        b = int(pend0_dev[0].shape[0])
    else:
        state_h, inbuf_h = transcript.export_for_device()
        b = len(inbuf_h)
    pc = _p2_consts()
    T0 = int(dev_chals[0].shape[0]) if (dev_mode and dev_chals is not None) \
        else 0

    def fn(state, pend0, parts, consts, chals0=None):
        # round r0: pending = the host's input buffer (b values, static)
        sums0 = accel_t.sumcheck_sums_parts(parts, degree, part_comb,
                                            consts, chunks=1)
        buf0 = (B.xp.concatenate([pend0[0], sums0[0].reshape(-1)]),
                B.xp.concatenate([pend0[1], sums0[1].reshape(-1)]))
        state, chal = challenger_step(state, buf0, pc)
        pend = (B.xp.stack([c[0] for c in chal]),
                B.xp.stack([c[1] for c in chal]))
        r3 = tuple((c[0], c[1]) for c in chal)
        flat = [a for p in parts for a in p]
        parts = list(accel_t.fold_round_parts(r3, *flat))
        chal0 = pend

        if T1 > 1:
            state, pend, parts, msgs_s, chals_s = _scan_rounds(
                state, pend, parts, T1 - 1, degree, part_comb, consts, pc)
            msgs = (B.xp.concatenate([sums0[0][None], msgs_s[0]]),
                    B.xp.concatenate([sums0[1][None], msgs_s[1]]))
            chals_d = (B.xp.concatenate([chal0[0][None], chals_s[0]]),
                       B.xp.concatenate([chal0[1][None], chals_s[1]]))
        else:
            msgs = (sums0[0][None], sums0[1][None])
            chals_d = (chal0[0][None], chal0[1][None])

        finals = (B.xp.concatenate([p[0][..., 0] for p in parts]),
                  B.xp.concatenate([p[1][..., 0] for p in parts]))

        if recon:
            # scale = scale0 * prod_i eqf(beta_i, r_i) over the traced
            # challenges (dev_mode: ALL rounds' challenges — the shrink
            # ones arrive as the chals0 input; else: this phase's only,
            # with the host rounds folded into scale0)
            betas = _pair_const(betas_dev_np)
            sc = tuple(gl.const(x) for x in scale0)
            if dev_mode and chals0 is not None:
                ch_all = (B.xp.concatenate([chals0[0], chals_d[0]]),
                          B.xp.concatenate([chals0[1], chals_d[1]]))
                n_sc = T0 + T1
            else:
                ch_all = chals_d
                n_sc = T1

            def sc_body(i, s3):
                b3 = tuple((betas[0][i, c], betas[1][i, c])
                           for c in range(3))
                r3_ = tuple((ch_all[0][i, c], ch_all[1][i, c])
                            for c in range(3))
                e = _eqf_dev(b3, r3_)
                return fq3.mul(s3, e)

            sc = _jax.lax.fori_loop(0, n_sc, sc_body, sc)
            tab_c = (B.xp.asarray(tab_np[0]), B.xp.asarray(tab_np[1]))
            tab = rq.ntt_scalar_mul_t(tab_c, sc)
            st_lo = B.xp.zeros((k, 24, rest), B.xp.uint32)
            st_hi = B.xp.zeros((k, 24, rest), B.xp.uint32)
            st_lo = st_lo.at[:, :, 0].set(finals[0].reshape(k, 24))
            st_hi = st_hi.at[:, :, 0].set(finals[1].reshape(k, 24))
            st_lo = st_lo.at[eq_index].set(tab[0])
            st_hi = st_hi.at[eq_index].set(tab[1])
            state, pend, parts2, msgs2, chals2 = _scan_rounds(
                state, pend, [(st_lo, st_hi)], T2, degree, part_comb,
                consts, pc)
            finals = (parts2[0][0][..., 0], parts2[0][1][..., 0])
            return (msgs, chals_d, msgs2, chals2, finals, state, pend)
        return (msgs, chals_d, finals, state, pend)

    jf = engine._jit((comb_key, "devfs", k, F, nb, r0, nv, degree, b,
                      bool(recon), dev_mode, T0), fn, donate_argnums=(2,))
    if dev_mode:
        pend0, state0 = pend0_dev, state0
    else:
        pend0 = _pair_const([int(v) % P for v in inbuf_h])
        state0 = _pair_const([int(v) % P for v in state_h])
    with B.jax_mode():
        if dev_mode and dev_chals is not None:
            out = jf(state0, pend0, parts, consts_dev, dev_chals)
        else:
            out = jf(state0, pend0, parts, consts_dev)
    meta = {"recon": recon, "r0": r0, "nv": nv, "t_fx": t_fx}
    if return_device:
        return out, meta
    out = _jax.device_get(out)
    return finish_fixed_phase_host(transcript, out, meta, log=log)


def finish_fixed_phase_host(transcript, out, meta, log=None):
    """Host bookkeeping for a fetched run_fixed_phase_dev output: proof
    rows, transcript absorptions + recorded samples, challenger resync."""
    import time as _time

    if meta["recon"]:
        msgs, chals_d, msgs2, chals2, finals, state_f, pend_f = out
        msg_rows = [np.asarray(msgs[0]), np.asarray(msgs[1])]
        msg_rows2 = [np.asarray(msgs2[0]), np.asarray(msgs2[1])]
        all_msgs = (np.concatenate([msg_rows[0], msg_rows2[0]]),
                    np.concatenate([msg_rows[1], msg_rows2[1]]))
        all_chals = (np.concatenate([np.asarray(chals_d[0]),
                                     np.asarray(chals2[0])]),
                     np.concatenate([np.asarray(chals_d[1]),
                                     np.asarray(chals2[1])]))
    else:
        msgs, chals_d, finals, state_f, pend_f = out
        all_msgs = (np.asarray(msgs[0]), np.asarray(msgs[1]))
        all_chals = (np.asarray(chals_d[0]), np.asarray(chals_d[1]))

    # host bookkeeping: proof rows, transcript absorptions, challenger sync
    msgs_int = gl.to_int(all_msgs)        # (T, n_msg, 24) object ints
    chals_int = gl.to_int(all_chals)      # (T, 3)
    proof, out_chals = [], []
    for t in range(msgs_int.shape[0]):
        msg = [[int(v) for v in row] for row in msgs_int[t]]
        transcript.absorptions.append([list(r_) for r_ in msg])
        proof.append(msg)
        ch3 = tuple(int(v) for v in chals_int[t])
        out_chals.append(ch3)
        if transcript.samples is not None:
            # keep the recorded sample stream complete for ReplayTranscript
            # (device-derived challenges never pass through host _sample)
            transcript.samples.extend(ch3)
    transcript.import_from_device(
        [int(v) for v in gl.to_int((np.asarray(state_f[0]),
                                    np.asarray(state_f[1])))],
        [int(v) for v in gl.to_int((np.asarray(pend_f[0]),
                                    np.asarray(pend_f[1])))])
    final = tuple(np.asarray(a) for a in finals)
    if log:
        log(f"      devfs fixed r{meta['r0']}..{meta['nv']} "
            f"({len(proof)} rounds, 1 dispatch): "
            f"{_time.time()-meta['t_fx']:.3f}s")
    return proof, out_chals, final
