"""Per-round eq-factored sum-check: small shape-keyed kernels + host FS.

Replaces the monolithic all-rounds-in-ONE-dispatch kernels (accel_fs.run_*)
on the default path.  Measured facts that drive the design (compile_probe
on the axon TPU link, round-3/4 post-mortems):

  * XLA compile cost is dominated by the DEVICE-side Fiat-Shamir
    challenger: each Poseidon2 perm16 instance in a graph costs ~7 s of
    compile (a Pallas embed ~13 s per program), so 17-round monoliths with
    ~60 perm instances compile for tens of minutes from a cold cache
    (BENCH_r03 rc=124) — and the host<->device round trip is only ~25 ms,
    so a HOST transcript costs ~0.5 s per fold step in RTTs;
  * the monolith's component-split Fq3 layout (one array per extension
    component) is pathological for the XLA:CPU pipeline — tiny kernels
    compile for minutes / livelock (the r03 "first test_accel case took
    ~18 min" symptom).  The packed (rows, 24, n) t-layout with rq.ntt_mul_t
    ops compiles in seconds on both backends — the round kernels below use
    ONLY that proven pattern.

So: the transcript stays on HOST (crypto/transcript.py, native C++ core),
and each sum-check round is ONE small jitted kernel of pure array math —
fold the previous challenge in, pair-sum the eq table, evaluate the comb
products at the few needed points, contract.  Gruen's eq split makes every
proof-dependent scalar (eq prefix E, eqf(beta, t) message weights, the
Lagrange extension to the message points) a tiny HOST integer computation
on the fetched contraction sums, so the kernels are keyed by SHAPE ONLY
and are reused across proofs and IVC steps — nothing proof-dependent is
ever baked into a traced closure (the round-3 advisor's high-severity
finding against the monoliths).

Once arrays shrink below engine.tail the remaining rounds run in a
FIXED-width device phase (_fixed_phase): two kernels per protocol, reused
for every remaining round, over interleaved zero-padded buffers — the
factored state converts exactly at the handoff because the unfactored eq
row equals E * T, where T is the carried pair-sum table
(T_i(x) = eq(beta_{>=i}, x)).  Only the truncated-MLE reconstruction
rounds (trivial sizes) finish on host numpy.

Math matches the reference's sum-checks exactly:
linearization g = eq(beta, x) * sum_i c_i prod_{j in S_i} Mz_j(x)
(latticefold/src/nifs/linearization/utils.rs:66-107); folding g = eq_r1*c1
+ eq_r2*c2 + eq_beta * sum_kd mu_k^{d+1} (f_hat prod_b (f_hat^2 - b^2))_kd
(nifs/folding/utils.rs:196-321); transcript pair sumcheck.rs:51-112 +
zkvm/src/fiat_shamir.rs:20-114.  Round messages are bit-identical to the
unfactored path: same polynomial, exact mod-p arithmetic — the factored
evaluation uses deg(q)+1 / deg(h)+1 points and recovers the full
degree+1-point message by exact Lagrange extension on host integers.
"""

from __future__ import annotations

import os

import numpy as np

from .. import backend as B
from ..field import fq3, goldilocks as gl, host as H
from ..ring import rq
from . import accel_t
from .accel_fs import _lagrange_ext_consts

P = gl.P


def _chain_enabled(engine):
    """Device-chained shrink rounds (default ON): every shrink round's
    Lagrange extension, eq weighting, Fiat-Shamir absorb/sample, and E
    update run as small shared device kernels chained through device
    arrays — no host fetch until the whole sum-check (shrink + fixed
    phase) has been enqueued.  Kills the ~25-60 ms/round fetch+dispatch
    floor of the host-FS loop (~10 rounds/step)."""
    return (getattr(engine, "device_fs", True)
            and os.environ.get("LATTICEUM_CHAIN", "1") == "1")


# -- host-side Fq3 / extension helpers --------------------------------------

def _eqf_host(b, t):
    """eqf(b, t) = (1-b)(1-t) + b*t at integer point t, b an Fq3 triple."""
    return tuple((x * (2 * t - 1) + ((1 - t) if j == 0 else 0)) % P
                 for j, x in enumerate(b))


def _eqf_at(b, r):
    """eqf(b, r) = 1 - b - r + 2br for Fq3 b, r."""
    br = H.fq3_mul(b, r)
    return H.fq3_sub(H.fq3_add(H.fq3_add(br, br), (1, 0, 0)),
                     H.fq3_add(b, r))


def _fq3_limbs(c):
    """Fq3 int triple -> 3-tuple of (lo, hi) uint32 scalars (kernel arg)."""
    return tuple((np.uint32(int(x) % P & 0xFFFFFFFF),
                  np.uint32((int(x) % P) >> 32)) for x in c)


def _rings_to_int(s):
    """Fetched (npts, 24) limb pair -> [pt][slot] Fq3 int triples."""
    lo = np.asarray(s[0]).astype(np.uint64)
    hi = np.asarray(s[1]).astype(np.uint64)
    v = lo + (hi << np.uint64(32))
    npts = v.shape[0]
    return [[(int(v[t, 3 * sl]), int(v[t, 3 * sl + 1]),
              int(v[t, 3 * sl + 2])) for sl in range(8)]
            for t in range(npts)]


def _extend_host(S_pts, ext):
    """S_pts: [pt][slot] Fq3 triples at points 0..npts-1; ext: (n_msg, npts)
    object-int Lagrange matrix -> [t][slot] triples at points 0..n_msg-1."""
    npts = len(S_pts)
    n_msg = ext.shape[0]
    out = []
    for t in range(n_msg):
        row = []
        for sl in range(8):
            acc = [0, 0, 0]
            for j in range(npts):
                w = int(ext[t, j])
                v = S_pts[j][sl]
                for c in range(3):
                    acc[c] = (acc[c] + w * v[c]) % P
            row.append(tuple(acc))
        out.append(row)
    return out


def _weighted_msg(terms, n_msg):
    """terms: list of (per-point Fq3 weight list, S_ext [t][slot]) -> round
    message rows [t] = 24 slot-major ints (sum_tbl w_tbl(t) * S_tbl(t))."""
    msg = []
    for t in range(n_msg):
        slots = [(0, 0, 0)] * 8
        for w_t, S_ext in terms:
            w = w_t[t]
            row = S_ext[t]
            slots = [H.fq3_add(slots[sl], H.fq3_mul(w, row[sl]))
                     for sl in range(8)]
        msg.append([int(v) for sl in slots for v in sl])
    return msg


def _chunks_for(bytes_half, half, budget):
    chunks = 1
    while bytes_half // chunks > budget and half % (chunks * 2) == 0:
        chunks *= 2
    return chunks


def _transcript_round(transcript, msg):
    transcript.absorb_slice(msg)
    c = transcript.get_challenge()
    transcript.absorb_fq3(c)
    return c


def _fold_t(x, r3):
    """Packed (…, 24, n) fold at challenge: v0 + r*(v1-v0)."""
    half = int(x[0].shape[-1]) // 2
    v0 = (x[0][..., :half], x[1][..., :half])
    v1 = (x[0][..., half:], x[1][..., half:])
    return gl.add(v0, rq.ntt_scalar_mul_t(gl.sub(v1, v0), r3))


def _pair_sum(x):
    half = int(x[0].shape[-1]) // 2
    return gl.add((x[0][..., :half], x[1][..., :half]),
                  (x[0][..., half:], x[1][..., half:]))


def _fixed_phase(engine, transcript, parts, nv, r0, degree, comb_key,
                 part_comb, consts_dev, eq_info_rev, chals, log=None):
    """Finish rounds r0.. on device with FIXED-width interleaved buffers.

    One sums kernel + one interleaving fold kernel per protocol, reused
    for EVERY remaining round (the numpy host tail cost ~7 s/step per
    protocol at production scale; per-round shrink kernels would cost a
    cold compile each).  parts: device (lo, hi) stacks of width F with the
    UNFACTORED row semantics (eq row already E-scaled), dense at entry.
    Fold re-spreads the halved actives at doubled stride with exact zeros
    between (accel_t.interleave_fold_t invariant) so the sums over the
    full buffer stay exact: every comb term contains a zero MLE factor at
    inactive positions (run_sumcheck_fixed's argument).

    Returns (proof, chals, final) — finishing the truncated-MLE
    reconstruction rounds on host when the actives run out before nv
    (trivial sizes)."""
    if getattr(engine, "device_fs", True):
        # one-dispatch path: all remaining rounds + the Fiat-Shamir
        # challenger on device (accel_dev_fs) — kills ~20 tunnel RTTs/step
        from . import accel_dev_fs
        return accel_dev_fs.run_fixed_phase_dev(
            engine, transcript, parts, nv, r0, degree, comb_key,
            part_comb, consts_dev, eq_info_rev, chals, log=log)
    k = sum(int(p[0].shape[0]) for p in parts)
    F = int(parts[0][0].shape[-1])
    nb = len(parts)
    sums_jf = engine._jit(
        (comb_key, "fixr", k, F, degree),
        lambda ps, c: accel_t.sumcheck_sums_parts(ps, degree, part_comb, c,
                                                  chunks=1))
    fold_jf = engine._jit(("fixr_fold", comb_key, k, F, nb),
                          accel_t.fold_round_parts,
                          donate_argnums=tuple(range(1, 2 * nb + 1)))
    import time as _time
    t_fx = _time.time()
    active = F
    r = r0
    proof, out_chals = [], []
    while r < nv and active > 1:
        with B.jax_mode():
            sums = sums_jf(parts, consts_dev)
        import jax as _jax
        ints = gl.to_int(_jax.device_get(sums))
        msg = [[int(v) for v in row] for row in ints]
        c = _transcript_round(transcript, msg)
        proof.append(msg)
        out_chals.append(c)
        flat = [a for p in parts for a in p]
        with B.jax_mode():
            parts = list(fold_jf(engine.put_small(_fq3_limbs(c)), *flat))
        active //= 2
        r += 1
    if log:
        log(f"      fixed phase r{r0}..{r}: {_time.time()-t_fx:.3f}s")
    # actives exhausted: the single live element of each row sits at
    # buffer position 0 (stride invariant) — slice it out ON DEVICE before
    # fetching (the full fixed-width buffers are ~10 MB and the tunnel
    # moves ~20 MB/s; the finals are 24 KB)
    fin_jf = engine._jit(
        ("fix_fin", comb_key, k, F, nb),
        lambda ps: (B.xp.concatenate([p[0][..., 0] for p in ps]),
                    B.xp.concatenate([p[1][..., 0] for p in ps])))
    import jax as _jax
    with B.jax_mode():
        final = fin_jf(parts)
    final = tuple(np.asarray(a) for a in _jax.device_get(final))
    if log:
        log(f"      fixed finals fetched r{r} at +{_time.time()-t_fx:.3f}s")
    if r < nv:
        # truncated-MLE reconstruction (the lin path's lazy truncation):
        # rebuild the remaining-variable eq table on host — betas AND all
        # challenges are host-known under host FS — scale by the
        # prod eqf(beta_j, r_j) prefix, pad the finals to the remaining
        # width, and finish with a recursive tiny fixed phase ON DEVICE
        # (the numpy std-comb tail this replaces cost ~0.6 s/step)
        assert eq_info_rev is not None, \
            "actives exhausted before nv but no eq reconstruction info " \
            "(padded/truncated fold parts need eq_info_rev)"
        beta_list, eq_index = eq_info_rev
        rest = 1 << (nv - r)
        all_ch = list(chals) + out_chals
        with B.numpy_mode():
            scale = (1, 0, 0)
            for rj, bj in zip(all_ch, beta_list):
                scale = H.fq3_mul(scale, _eqf_at(bj, rj))
            tab_std = accel_t.build_eq_table_rev(beta_list[r:])
            tab_t = (np.moveaxis(np.asarray(tab_std[0]), 0, 1),
                     np.moveaxis(np.asarray(tab_std[1]), 0, 1))  # (24, rest)
            tab_t = rq.ntt_scalar_mul_t(tab_t, _fq3_limbs(scale))
        st_lo = np.zeros((k, 24, rest), np.uint32)
        st_hi = np.zeros((k, 24, rest), np.uint32)
        st_lo[:, :, 0] = final[0].reshape(k, 24)
        st_hi[:, :, 0] = final[1].reshape(k, 24)
        st_lo[eq_index] = np.asarray(tab_t[0])
        st_hi[eq_index] = np.asarray(tab_t[1])
        with B.jax_mode():
            stack = engine.put((st_lo, st_hi))
        tp, tc, final = _fixed_phase(
            engine, transcript, [stack], nv, r, degree, comb_key,
            part_comb, consts_dev, None, all_ch, log=log)
        proof.extend(tp)
        out_chals.extend(tc)
        if log:
            log(f"      recon fixed tail done at +{_time.time()-t_fx:.3f}s")
    return proof, out_chals, final


# -- device-chained round tails ---------------------------------------------
#
# Shared small kernels (one compile each, reused for EVERY round and every
# step): Lagrange-extend the fetched-free contraction sums to the message
# points, weight by E*eqf(beta_r, t), absorb + sample via the device duplex
# challenger (accel_dev_fs.challenger_step), and update the running eq
# prefix E.  All exact uint32 limb math — messages are bit-identical to the
# host-FS path (same field ops, same order).

def _limbs_dev(obj_arr):
    """Host object-int array -> device (lo, hi) pair (built on host)."""
    with B.numpy_mode():
        limbs = gl.from_int(np.asarray(obj_arr, dtype=object))
    return (B.xp.asarray(np.asarray(limbs[0])),
            B.xp.asarray(np.asarray(limbs[1])))


def _eqf_t_dev(b3, t):
    """eqf(b, t) at static integer t for a device fq3 triple."""
    s = (2 * t - 1) % P
    e0 = gl.add(gl.mul_const(b3[0], s), gl.const((1 - t) % P))
    return (e0, gl.mul_const(b3[1], s), gl.mul_const(b3[2], s))


def _make_weight_lin(n_msg, npts):
    def fn(Sq, E, beta, ext):
        # Sq ((npts, 24) lo, hi) -> S_ext (n_msg, 24) via the static
        # Lagrange matrix; rows then get the E*eqf(beta_r, t) fq3 weight
        prod = gl.mul((ext[0][:, :, None], ext[1][:, :, None]),
                      (Sq[0][None], Sq[1][None]))
        S_ext = gl.sum_axis(prod, axis=1)
        E3 = tuple((E[0][c], E[1][c]) for c in range(3))
        b3 = tuple((beta[0][c], beta[1][c]) for c in range(3))
        rows_lo, rows_hi = [], []
        for t in range(n_msg):
            w = fq3.mul(E3, _eqf_t_dev(b3, t))
            row = rq.ntt_scalar_mul_t(
                (S_ext[0][t][:, None], S_ext[1][t][:, None]), w)
            rows_lo.append(row[0][:, 0])
            rows_hi.append(row[1][:, 0])
        return (B.xp.stack(rows_lo), B.xp.stack(rows_hi))
    return fn


def _make_weight_fold(n_msg, npts_h):
    def fn(S_all, Es, eqp, exth, extc):
        # S_all ((npts_h + 4, 24)): h sums at npts_h points, then the two
        # c-term rows at point 0, then at point 1.  Es/eqp: ((3, 3) lo, hi)
        # [table][comp] — tables (r1, r2, beta).
        Sh = (S_all[0][:npts_h], S_all[1][:npts_h])
        exts = []
        for tbl in range(2):
            Spts = (B.xp.stack([S_all[0][npts_h + tbl],
                                S_all[0][npts_h + 2 + tbl]]),
                    B.xp.stack([S_all[1][npts_h + tbl],
                                S_all[1][npts_h + 2 + tbl]]))
            prod = gl.mul((extc[0][:, :, None], extc[1][:, :, None]),
                          (Spts[0][None], Spts[1][None]))
            exts.append((tbl, gl.sum_axis(prod, axis=1)))
        prod = gl.mul((exth[0][:, :, None], exth[1][:, :, None]),
                      (Sh[0][None], Sh[1][None]))
        exts.append((2, gl.sum_axis(prod, axis=1)))
        rows_lo, rows_hi = [], []
        for t in range(n_msg):
            acc = None
            for tbl, S_ext in exts:
                E3 = tuple((Es[0][tbl, c], Es[1][tbl, c]) for c in range(3))
                b3 = tuple((eqp[0][tbl, c], eqp[1][tbl, c])
                           for c in range(3))
                w = fq3.mul(E3, _eqf_t_dev(b3, t))
                row = rq.ntt_scalar_mul_t(
                    (S_ext[0][t][:, None], S_ext[1][t][:, None]), w)
                acc = row if acc is None else gl.add(acc, row)
            rows_lo.append(acc[0][:, 0])
            rows_hi.append(acc[1][:, 0])
        return (B.xp.stack(rows_lo), B.xp.stack(rows_hi))
    return fn


def _make_chal_fn():
    from . import accel_dev_fs as DFS

    def fn(state, pend, msg):
        pc = DFS._p2_consts()
        buf = (B.xp.concatenate([pend[0], msg[0].reshape(-1)]),
               B.xp.concatenate([pend[1], msg[1].reshape(-1)]))
        st, chal = DFS.challenger_step(state, buf, pc)
        pend2 = (B.xp.stack([c[0] for c in chal]),
                 B.xp.stack([c[1] for c in chal]))
        return st, pend2
    return fn


def _eupd_fn(E, beta, chal):
    from .accel_dev_fs import _eqf_dev
    E3 = tuple((E[0][c], E[1][c]) for c in range(3))
    b3 = tuple((beta[0][c], beta[1][c]) for c in range(3))
    r3 = tuple((chal[0][c], chal[1][c]) for c in range(3))
    En = fq3.mul(E3, _eqf_dev(b3, r3))
    return (B.xp.stack([x[0] for x in En]), B.xp.stack([x[1] for x in En]))


def _eupd3_fn(Es, eqp, chal):
    from .accel_dev_fs import _eqf_dev
    r3 = tuple((chal[0][c], chal[1][c]) for c in range(3))
    lo_rows, hi_rows = [], []
    for tbl in range(3):
        E3 = tuple((Es[0][tbl, c], Es[1][tbl, c]) for c in range(3))
        b3 = tuple((eqp[0][tbl, c], eqp[1][tbl, c]) for c in range(3))
        En = fq3.mul(E3, _eqf_dev(b3, r3))
        lo_rows.append(B.xp.stack([x[0] for x in En]))
        hi_rows.append(B.xp.stack([x[1] for x in En]))
    return (B.xp.stack(lo_rows), B.xp.stack(hi_rows))


def _pallas_row_tile(rows):
    """Largest row-tile <= 18 dividing `rows` (None never happens for
    rows >= 1; 1-row tiles are legal, just less efficient)."""
    for rt in range(min(rows, 18), 0, -1):
        if rows % rt == 0:
            return rt
    return None


def _make_round_pallas(rows, n_in, fold_first, npts_h, b_small):
    """Fold-round wrapper: c-terms + eq pair-sums in XLA, the 90-row tail
    comb via the Pallas kernel (pallas_comb), all inside one jit.  The
    tail travels as c-layout halves (tA, tB); sums repack to the packed
    (npts_h + 4, 24) S_all the downstream weight kernel expects."""
    from . import pallas_comb as PC
    n_cur = n_in // 2 if fold_first else n_in
    half = n_cur // 2
    rt = _pallas_row_tile(rows)
    ct = min(256, half)

    def fn(tA, tB, c2r, eqs, mu_c, r3, r3p):
        if fold_first:
            c2r = _fold_t(c2r, r3)
        Tn = _pair_sum(eqs)                          # (3, 24, half)
        Tr = (Tn[0][:2], Tn[1][:2])
        p0 = rq.ntt_mul_t(Tr, (c2r[0][..., :half], c2r[1][..., :half]))
        p1 = rq.ntt_mul_t(Tr, (c2r[0][..., half:], c2r[1][..., half:]))
        Sc0 = gl.sum_axis(p0, axis=-1)               # (2, 24)
        Sc1 = gl.sum_axis(p1, axis=-1)
        Tbc = PC.to_c_layout((Tn[0][2][None], Tn[1][2][None]))
        Tbc = (Tbc[0][0], Tbc[1][0])                 # (3, 8, half)
        if fold_first:
            sums_c, tA, tB = PC.fold_roundr_pallas(
                tA, tB, Tbc, mu_c, r3p, b_small=b_small,
                row_tile=rt, col_tile=ct)
        else:
            sums_c = PC.fold_round0_pallas(
                tA, tB, Tbc, mu_c, b_small=b_small,
                row_tile=rt, col_tile=ct)
        Sh = (B.xp.moveaxis(sums_c[0], 1, 2).reshape(npts_h, 24),
              B.xp.moveaxis(sums_c[1], 1, 2).reshape(npts_h, 24))
        S_all = (B.xp.concatenate([Sh[0], Sc0[0], Sc1[0]]),
                 B.xp.concatenate([Sh[1], Sc0[1], Sc1[1]]))
        return tA, tB, c2r, Tn, S_all
    return fn


def _make_lin_round_pallas(n_in, fold_first, npts_q, S_t, signs):
    """Lin-round wrapper: eq pair-sum in XLA, the 125-row Mz comb via the
    Pallas kernel; Mz rows travel as c-layout halves (mA, mB)."""
    from . import pallas_comb as PC
    n_cur = n_in // 2 if fold_first else n_in
    half = n_cur // 2

    def fn(mA, mB, eq, r3, r3p):
        Tn = _pair_sum(eq)                           # (24, half)
        Tcc = PC.to_c_layout((Tn[0][None], Tn[1][None]))
        Tcc = (Tcc[0][0], Tcc[1][0])                 # (3, 8, half)
        if fold_first:
            sums_c, mA, mB = PC.lin_roundr_pallas(
                mA, mB, Tcc, r3p, S_t, signs, npts_q)
        else:
            sums_c = PC.lin_round0_pallas(mA, mB, Tcc, S_t, signs, npts_q)
        Sq = (B.xp.moveaxis(sums_c[0], 1, 2).reshape(npts_q, 24),
              B.xp.moveaxis(sums_c[1], 1, 2).reshape(npts_q, 24))
        return mA, mB, Tn, Sq
    return fn


def lin_c_signs(c_rings):
    """If every lin comb constant is the +-1 scalar ring the zkvm builder
    emits ([s, 0, 0] x 8 slots with s in {1, p-1}), return the sign tuple
    for the Pallas lin kernel; else None (falls back to the XLA path)."""
    signs = []
    for c in c_rings:
        vals = [int(v) % P for v in c]
        if any(vals[i] != 0 for i in range(24) if i % 3 != 0):
            return None
        s0 = vals[0]
        if any(vals[i] != s0 for i in range(0, 24, 3)):
            return None
        if s0 == 1:
            signs.append(1)
        elif s0 == P - 1:
            signs.append(-1)
        else:
            return None
    return tuple(signs)


def _chain_export(transcript):
    from . import accel_dev_fs as DFS
    state_h, inbuf_h = transcript.export_for_device()
    state = DFS._pair_const([int(v) % P for v in state_h])
    pend = DFS._pair_const([int(v) % P for v in inbuf_h])
    return state, pend


def _chain_bookkeep(transcript, msgs_np, chals_np):
    """Fetched shrink-round messages/challenges -> proof rows + transcript
    absorptions + recorded samples (order matters: before the fixed
    phase's finish_fixed_phase_host)."""
    proof, chals = [], []
    for i in range(len(msgs_np)):
        mi = gl.to_int((np.asarray(msgs_np[i][0]),
                        np.asarray(msgs_np[i][1])))
        msg = [[int(v) for v in row] for row in mi]
        transcript.absorptions.append([list(x) for x in msg])
        proof.append(msg)
        ci = gl.to_int((np.asarray(chals_np[i][0]),
                        np.asarray(chals_np[i][1])))
        ch3 = tuple(int(v) for v in ci)
        chals.append(ch3)
        if transcript.samples is not None:
            transcript.samples.extend(ch3)
    return proof, chals


# ---------------------------------------------------------------------------
# linearization
# ---------------------------------------------------------------------------

def run_lin_rounds_factored(engine, transcript, g_t, nv, degree, comb_key,
                            consts_dev, S, beta_s, comb_t=None, log=None,
                            c_signs=None):
    """Eq-factored linearization sum-check, one small kernel per round.

    g_t: (t+1, 24, n0) bit-reversed t-layout stack, eq row LAST.  Each round
    kernel folds the previous challenge into the Mz rows, pair-sums the eq
    table (it never enters the comb), evaluates q = sum_i c_i prod Mz_j at
    deg(q)+1 = degree points, T-weights and contracts; the host extends the
    sums to the degree+1 message points and applies the E*eqf(beta_r, t)
    weight exactly (ints mod p).  Truncated stacks (n0 < 2^nv) and the
    small-round tail run on the host path, which also handles the eq-table
    reconstruction (accel_t._host_tail_t -> _numpy_tail).

    Returns (proof, chals, final) with final rows in [Mz..., eq] order.
    """
    import time
    t_start = time.time()
    t_rows = int(g_t[0].shape[0]) - 1
    n0 = int(g_t[0].shape[-1])
    npts_q = degree                      # deg(q) = degree - 1
    n_msg = degree + 1
    budget = getattr(engine, "sum_chunk_bytes", 192 << 20)
    assert all(len(S_i) >= 1 for S_i in S), \
        "factored lin comb needs non-empty multisets (builder invariant)"

    # component-form comb bodies only off-CPU (XLA:CPU compiles that form
    # pathologically at production scale — minutes/livelock; packed
    # ntt_mul_t ops there).  engine.force_comp_split overrides for the
    # small-shape CPU equality test of the TPU branch (advisor r04 #4).
    comp_split = getattr(engine, "force_comp_split", None)
    if comp_split is None:
        comp_split = engine.jax.default_backend() != "cpu"
    groups = {}
    for i, S_i in enumerate(S):
        groups.setdefault(len(S_i), []).append((i, list(S_i)))
    group_list = [
        (np.array([m[0] for m in members], np.int32),
         np.array([m[1] for m in members], np.int32))
        for size, members in sorted(groups.items())]

    ext_q = _lagrange_ext_consts(npts_q, n_msg)

    transcript.absorb_u64(nv)
    transcript.absorb_u64(degree)

    def entry_fn(g_):
        return (g_[0][:t_rows], g_[1][:t_rows]), (g_[0][t_rows],
                                                  g_[1][t_rows])

    jentry = engine._jit((comb_key, "linfr_entry", t_rows, n0), entry_fn)
    with B.jax_mode():
        mz, eq = jentry(g_t)

    def make_round(n_in, fold_first):
        n_cur = n_in // 2 if fold_first else n_in
        half = n_cur // 2
        chunks = _chunks_for(t_rows * 24 * half * 8, half, budget)
        cs = half // chunks

        def fn(mz, eq, consts, r3):
            import jax
            import jax.numpy as jnp
            if fold_first:
                # Mz rows fold at the challenge; the eq table advances by
                # pair sums only (Gruen) — one per round, below
                mz = _fold_t(mz, r3)
            Tn = _pair_sum(eq)                        # (24, half)

            def body(j, acc):
                # chunk-major + incremental point evaluation (see the fold
                # body): v0/v1 loaded once, vals advances by exact adds —
                # at deg(q)+1 = 9 points the per-point eval multiply was
                # ~1/3 of the comb's base-field multiplies.
                def dsl(x, off):
                    return jax.lax.dynamic_slice(x, (0, 0, off),
                                                 (t_rows, 24, cs))

                from ..field import fq3
                v0 = (dsl(mz[0], j * cs), dsl(mz[1], j * cs))
                v1 = (dsl(mz[0], half + j * cs), dsl(mz[1], half + j * cs))
                step = gl.sub(v1, v0)
                Tc = (jax.lax.dynamic_slice(Tn[0], (0, j * cs), (24, cs)),
                      jax.lax.dynamic_slice(Tn[1], (0, j * cs), (24, cs)))
                # inner fori over points with the CURRENT evaluation values
                # carried — one comb instance in the trace (the 9-point
                # unrolled form compiled for ~5 min per shape), advancing
                # vals by exact adds (vals_0 = v0; vals_{t+1} = vals_t +
                # step — equals v1 at t=1 by construction)
                if comp_split:
                    # TPU: split Fq3 components ONCE (reshape-based) and
                    # run the product chain in component form — saves the
                    # 24->(8,3) retile every ntt_mul_t pays.  XLA:CPU
                    # compiles this form pathologically (minutes/livelock,
                    # r03-r04 post-mortems), so CPU keeps the packed ops.
                    c3 = rq._as_slots_t((consts[0][..., None],
                                         consts[1][..., None]))
                    Tc3 = rq._as_slots_t(Tc)
                    step3 = rq._as_slots_t(step)
                    v03 = rq._as_slots_t(v0)

                    def body_pt(t, carry):
                        vals3, acc = carry
                        total = None
                        for iidx, jidx in group_list:
                            g3 = tuple((vals3[c][0][jidx], vals3[c][1][jidx])
                                       for c in range(3))
                            prod = tuple((g3[c][0][:, 0], g3[c][1][:, 0])
                                         for c in range(3))
                            for s in range(1, jidx.shape[1]):
                                prod = fq3.mul(
                                    prod,
                                    tuple((g3[c][0][:, s], g3[c][1][:, s])
                                          for c in range(3)))
                            cw = tuple((c3[c][0][iidx], c3[c][1][iidx])
                                       for c in range(3))
                            term = fq3.mul(prod, cw)
                            part = tuple(gl.sum_axis(term[c], axis=0)
                                         for c in range(3))
                            total = (part if total is None
                                     else fq3.add(total, part))
                        tot = fq3.mul(total, Tc3)
                        s3 = tuple(gl.sum_axis(tot[c], axis=-1)
                                   for c in range(3))
                        s = rq._from_slots_t(tuple(
                            ((x[0][..., None]), (x[1][..., None]))
                            for x in s3))
                        s = (s[0][..., 0], s[1][..., 0])  # (24,)
                        prev = (acc[0][t], acc[1][t])
                        nxt = gl.add(prev, s)
                        acc = (acc[0].at[t].set(nxt[0]),
                               acc[1].at[t].set(nxt[1]))
                        vals3 = fq3.add(vals3, step3)
                        return (vals3, acc)

                    _, acc = jax.lax.fori_loop(0, npts_q, body_pt,
                                               (v03, acc))
                else:
                    def body_pt(t, carry):
                        vals, acc = carry
                        total = None
                        for iidx, jidx in group_list:
                            glo, ghi = vals[0][jidx], vals[1][jidx]
                            prod = (glo[:, 0], ghi[:, 0])
                            for s in range(1, jidx.shape[1]):
                                prod = rq.ntt_mul_t(prod,
                                                    (glo[:, s], ghi[:, s]))
                            ci = (consts[0][iidx][..., None],
                                  consts[1][iidx][..., None])
                            term = rq.ntt_mul_t(prod, ci)
                            part = gl.sum_axis(term, axis=0)
                            total = (part if total is None
                                     else gl.add(total, part))
                        tot = rq.ntt_mul_t(total, Tc)
                        s = gl.sum_axis(tot, axis=-1)     # (24,)
                        prev = (acc[0][t], acc[1][t])
                        nxt = gl.add(prev, s)
                        acc = (acc[0].at[t].set(nxt[0]),
                               acc[1].at[t].set(nxt[1]))
                        return (gl.add(vals, step), acc)

                    _, acc = jax.lax.fori_loop(0, npts_q, body_pt,
                                               (v0, acc))
                return acc

            init = (jnp.zeros((npts_q, 24), jnp.uint32),
                    jnp.zeros((npts_q, 24), jnp.uint32))
            Sq = jax.lax.fori_loop(0, chunks, body, init)
            return mz, Tn, Sq

        return fn

    chain = _chain_enabled(engine)
    if chain:
        # device-chained rounds: weights, challenger, and E live on device;
        # nothing is fetched until the fixed phase has been enqueued too
        from . import accel_dev_fs as DFS
        import jax as _jax
        use_pallas = (engine.jax.default_backend() != "cpu"
                      and os.environ.get("LATTICEUM_PALLAS", "1") == "1"
                      and c_signs is not None
                      and n0 >= 1024 and (n0 & (n0 - 1)) == 0)
        with B.jax_mode():
            state, pend = _chain_export(transcript)
            ext_l = _limbs_dev(ext_q)
            betas_l = _limbs_dev(np.array(
                [[int(x) % P for x in b] for b in beta_s], dtype=object))
            E_d = (B.xp.asarray(np.array([1, 0, 0], np.uint32)),
                   B.xp.zeros(3, np.uint32))
            r3_d = tuple((B.xp.zeros((), np.uint32),
                          B.xp.zeros((), np.uint32)) for _ in range(3))
            r3p_d = (B.xp.zeros((1, 3), np.uint32),
                     B.xp.zeros((1, 3), np.uint32))
        wjf = engine._jit(("linw_chain", n_msg, npts_q),
                          _make_weight_lin(n_msg, npts_q))
        ejf = engine._jit(("eupd_chain",), _eupd_fn)
        if use_pallas:
            from . import pallas_comb as PC

            def pentry(mz_):
                half = mz_[0].shape[-1] // 2
                mA = PC.to_c_layout((mz_[0][..., :half],
                                     mz_[1][..., :half]))
                mB = PC.to_c_layout((mz_[0][..., half:],
                                     mz_[1][..., half:]))
                return mA, mB

            pej = engine._jit((comb_key, "plin_entry", t_rows, n0),
                              pentry, donate_argnums=(0,))
            with B.jax_mode():
                mA, mB = pej(mz)
            mz = None
            S_t = tuple(tuple(s) for s in S)
        msgs_d, chals_d = [], []
        n_cur, r = n0, 0
        while r < nv:
            n_eff = n_cur // 2 if r > 0 else n_cur
            if n_eff < 2 or n_eff // 2 < max(engine.tail, 1):
                break
            fold_first = r > 0
            t_r = time.time()
            if use_pallas:
                # mA/mB not donated (pallas-output aliasing fault)
                jf = engine._jit(
                    (comb_key, "plinr", t_rows, n_cur, fold_first),
                    _make_lin_round_pallas(n_cur, fold_first, npts_q,
                                           S_t, c_signs),
                    donate_argnums=(2,))
                with B.jax_mode():
                    mA, mB, eq, Sq = jf(mA, mB, eq, r3_d, r3p_d)
            else:
                jf = engine._jit((comb_key, "linfr", t_rows, n_cur,
                                  fold_first, budget, comp_split),
                                 make_round(n_cur, fold_first),
                                 donate_argnums=(0, 1))
                with B.jax_mode():
                    mz, eq, Sq = jf(mz, eq, consts_dev, r3_d)
            with B.jax_mode():
                beta_r = (betas_l[0][r], betas_l[1][r])
                msg = wjf(Sq, E_d, beta_r, ext_l)
                L = int(pend[0].shape[0]) + n_msg * 24
                cjf = engine._jit(("chal_chain", L), _make_chal_fn())
                state, pend = cjf(state, pend, msg)
                E_d = ejf(E_d, beta_r, pend)
                r3_d = tuple((pend[0][c], pend[1][c]) for c in range(3))
                r3p_d = (pend[0][None, :], pend[1][None, :])
            msgs_d.append(msg)
            chals_d.append(pend)
            if log:
                log(f"      lin chain r{r} (n={n_eff}) enqueued "
                    f"+{time.time()-t_r:.3f}s")
            if fold_first:
                n_cur //= 2
            r += 1

        fold_pending = r > 0

        if use_pallas:
            from . import pallas_comb as PC

            def fix_entry(mA, mB, eq, r3, E3):
                lo = PC.from_c_layout(mA)
                hi = PC.from_c_layout(mB)
                if fold_pending:
                    mz_ = gl.add(lo, rq.ntt_scalar_mul_t(gl.sub(hi, lo),
                                                         r3))
                else:
                    mz_ = (B.xp.concatenate([lo[0], hi[0]], axis=-1),
                           B.xp.concatenate([lo[1], hi[1]], axis=-1))
                eqr = rq.ntt_scalar_mul_t(eq, E3)
                return (B.xp.concatenate([mz_[0], eqr[0][None]]),
                        B.xp.concatenate([mz_[1], eqr[1][None]]))

            jfix = engine._jit((comb_key, "pfixlin", t_rows, n_cur,
                                fold_pending), fix_entry,
                               donate_argnums=(0, 1, 2))
            with B.jax_mode():
                E3_d = tuple((E_d[0][c], E_d[1][c]) for c in range(3))
                stack = jfix(mA, mB, eq, r3_d, E3_d)
                dev_chals = ((B.xp.stack([c[0] for c in chals_d]),
                              B.xp.stack([c[1] for c in chals_d]))
                             if chals_d else None)
        else:
            def fix_entry(mz, eq, r3, E3):
                if fold_pending:
                    mz = _fold_t(mz, r3)
                eqr = rq.ntt_scalar_mul_t(eq, E3)
                return (B.xp.concatenate([mz[0], eqr[0][None]]),
                        B.xp.concatenate([mz[1], eqr[1][None]]))

            jfix = engine._jit((comb_key, "fixentry", t_rows, n_cur,
                                fold_pending), fix_entry,
                               donate_argnums=(0, 1))
            with B.jax_mode():
                E3_d = tuple((E_d[0][c], E_d[1][c]) for c in range(3))
                stack = jfix(mz, eq, r3_d, E3_d)
                dev_chals = ((B.xp.stack([c[0] for c in chals_d]),
                              B.xp.stack([c[1] for c in chals_d]))
                             if chals_d else None)
        part_comb = (lambda vals, c: comb_t(vals[0], c))
        out_dev, meta = DFS.run_fixed_phase_dev(
            engine, transcript, [stack], nv, r, degree, comb_key,
            part_comb, consts_dev, (beta_s, t_rows), None, log=log,
            dev_state=(state, pend), dev_chals=dev_chals,
            return_device=True)
        if log:
            log(f"        lin chain fully enqueued at "
                f"{time.time()-t_start:.2f}s")
        msgs_np, chals_np, out_np = _jax.device_get(
            (msgs_d, chals_d, out_dev))
        proof, chals = _chain_bookkeep(transcript, msgs_np, chals_np)
        tp, tc, final = DFS.finish_fixed_phase_host(transcript, out_np,
                                                    meta, log=log)
        proof.extend(tp)
        chals.extend(tc)
        final = (np.asarray(final[0]).reshape(-1, 24),
                 np.asarray(final[1]).reshape(-1, 24))
        if log:
            log(f"lin rounds chained ({r} dev + {nv-r} fixed): "
                f"{time.time()-t_start:.2f}s")
        return proof, chals, final

    E = (1, 0, 0)
    proof, chals = [], []
    r3_prev = _fq3_limbs((0, 0, 0))
    n_cur = n0          # on-device array size at kernel entry (pre-fold)
    r = 0
    while r < nv:
        n_eff = n_cur // 2 if r > 0 else n_cur
        if n_eff < 2 or n_eff // 2 < max(engine.tail, 1):
            break
        fold_first = r > 0
        # mz/eq are consumed every round (rebound to the outputs): donate
        # so the fold reuses their HBM instead of holding both generations
        jf = engine._jit((comb_key, "linfr", t_rows, n_cur, fold_first,
                          budget, comp_split), make_round(n_cur, fold_first),
                         donate_argnums=(0, 1))
        t_r = time.time()
        with B.jax_mode():
            mz, eq, Sq = jf(mz, eq, consts_dev, r3_prev)
        import jax as _jax
        S_pts = _rings_to_int(_jax.device_get(Sq))
        if log:
            log(f"      lin dev r{r} (n={n_eff}): {time.time()-t_r:.3f}s")
        S_ext = _extend_host(S_pts, ext_q)
        w_t = [H.fq3_mul(E, _eqf_host(beta_s[r], t)) for t in range(n_msg)]
        msg = _weighted_msg([(w_t, S_ext)], n_msg)
        c = _transcript_round(transcript, msg)
        proof.append(msg)
        chals.append(c)
        E = H.fq3_mul(E, _eqf_at(beta_s[r], c))
        r3_prev = _fq3_limbs(c)
        if fold_first:
            n_cur //= 2
        r += 1

    # handoff to the fixed-width device phase: fold the pending challenge,
    # scale the pair-sum table by E (the unfactored eq row equals E * T),
    # and stack back into the [Mz..., eq] layout — all in one kernel
    fold_pending = r > 0

    def fix_entry(mz, eq, r3, E3):
        if fold_pending:
            mz = _fold_t(mz, r3)
        eqr = rq.ntt_scalar_mul_t(eq, E3)
        return (B.xp.concatenate([mz[0], eqr[0][None]]),
                B.xp.concatenate([mz[1], eqr[1][None]]))

    jfix = engine._jit((comb_key, "fixentry", t_rows, n_cur, fold_pending),
                       fix_entry, donate_argnums=(0, 1))
    with B.jax_mode():
        stack = jfix(mz, eq, r3_prev, _fq3_limbs(E))

    if log:
        log(f"        lin pre-fixed handoff at {time.time()-t_start:.2f}s")
    part_comb = (lambda vals, c: comb_t(vals[0], c))
    tail_proof, tail_chals, final = _fixed_phase(
        engine, transcript, [stack], nv, r, degree, comb_key, part_comb,
        consts_dev, (beta_s, t_rows), chals, log=log)
    proof.extend(tail_proof)
    chals.extend(tail_chals)
    final = (np.asarray(final[0]).reshape(-1, 24),
             np.asarray(final[1]).reshape(-1, 24))
    if log:
        log(f"lin rounds ({r} dev + {nv-r} fixed): "
            f"{time.time()-t_start:.2f}s")
    return proof, chals, final


# ---------------------------------------------------------------------------
# folding
# ---------------------------------------------------------------------------

def run_fold_rounds_factored(engine, transcript, parts, nv, degree,
                             comb_key, consts_dev, eq_points, b_small, K,
                             TAU=3, comb_t=None, log=None):
    """Eq-factored folding sum-check, one small kernel per round.

    parts: [head (5, 24, n), tail (2K*TAU, 24, n)] bit-reversed t-layout,
    head rows = [eq_r1, c1, eq_r2, c2, eq_beta]; eq_points: (r1, r2, beta)
    host Fq3 coordinate lists; consts_dev: mu components (2K, 3) limbs.
    Each round kernel folds the challenge into the f_hat/c rows, pair-sums
    the three eq tables, evaluates h = sum_kd mu_k^{d+1} f(f^2-b^2)... at
    deg(h)+1 = 2*B_SMALL points (T_beta-weighted) and the two linear c
    terms at {0, 1} (T_r-weighted); the host Lagrange-extends and applies
    the E_tbl*eqf weights.  Returns final rows in the
    [eq1, c1, eq2, c2, eq_beta, f_hat...] order.
    """
    import time
    t_start = time.time()
    head, tail = parts
    n0 = int(tail[0].shape[-1])
    assert n0 == 1 << nv, "factored fold runner needs full-width MLEs"
    rows = int(tail[0].shape[0])
    npts_h = 2 * b_small
    n_msg = degree + 1
    budget = getattr(engine, "sum_chunk_bytes", 192 << 20)

    ext_h = _lagrange_ext_consts(npts_h, n_msg)
    ext_c = _lagrange_ext_consts(2, n_msg)
    # b^2 range constants: base-field embeds live at slot component 0 only
    bsq_c0 = [(np.uint32((b * b) % P & 0xFFFFFFFF),
               np.uint32(((b * b) % P) >> 32)) for b in range(1, b_small)]
    comp_split = getattr(engine, "force_comp_split", None)  # see lin runner
    if comp_split is None:
        comp_split = engine.jax.default_backend() != "cpu"

    transcript.absorb_u64(nv)
    transcript.absorb_u64(degree)

    # prologue: split rows + mu powers mu_k^{d+1} (k-major) from the arg
    def entry_fn(head_, tail_, consts):
        from ..field import fq3
        xp = B.xp
        c2r = (head_[0][1:4:2], head_[1][1:4:2])      # (2, 24, n)
        eqs = (head_[0][0::2], head_[1][0::2])        # (3, 24, n) r1, r2, b
        mu1 = tuple((consts[0][:, c], consts[1][:, c]) for c in range(3))
        pows, cur_p = [], mu1
        for _d in range(TAU):
            pows.append(cur_p)
            if _d + 1 < TAU:
                cur_p = fq3.mul(cur_p, mu1)
        mu_pow = tuple(
            (xp.stack([p[c][0] for p in pows], axis=1).reshape(-1),
             xp.stack([p[c][1] for p in pows], axis=1).reshape(-1))
            for c in range(3))                         # comps (2K*TAU,)
        return tail_, c2r, eqs, mu_pow

    jentry = engine._jit((comb_key, "foldfr_entry", rows, n0), entry_fn)
    with B.jax_mode():
        t_s, c2r, eqs, mu_pow = jentry(head, tail, consts_dev)

    def make_round(n_in, fold_first):
        n_cur = n_in // 2 if fold_first else n_in
        half = n_cur // 2
        chunks = _chunks_for(rows * 24 * half * 8, half, budget)
        cs = half // chunks
        # Round 0 only: the tail rows are the BALANCED DIGITS of the K
        # decomposed witnesses (|digit| <= b_small/2 <= b_small-1), so
        # h(f) = mu*f*prod_b(f^2-b^2) vanishes IDENTICALLY at the
        # hypercube points t=0,1 (every digit is a root of f*prod(f^2-b^2))
        # — S_h(0) = S_h(1) = 0 exactly for the honest decomposed witness;
        # only the 2*b_small-2 off-hypercube points need computing.  Rounds
        # >= 1 fold in challenges and lose the digit structure.
        pt0 = 2 if not fold_first else 0

        def fn(t_s, c2r, eqs, mu_pow, r3):
            import jax
            import jax.numpy as jnp
            if fold_first:
                # f_hat/c rows fold at the challenge; the eq tables advance
                # by pair sums only (Gruen)
                t_s = _fold_t(t_s, r3)
                c2r = _fold_t(c2r, r3)
            Tn = _pair_sum(eqs)                        # (3, 24, half)
            # c terms at points {0, 1}: T_r-weighted contractions
            Tr = (Tn[0][:2], Tn[1][:2])
            p0 = rq.ntt_mul_t(Tr, (c2r[0][..., :half], c2r[1][..., :half]))
            p1 = rq.ntt_mul_t(Tr, (c2r[0][..., half:], c2r[1][..., half:]))
            Sc0 = gl.sum_axis(p0, axis=-1)             # (2, 24)
            Sc1 = gl.sum_axis(p1, axis=-1)
            Tb = (Tn[0][2], Tn[1][2])

            def body(j, acc):
                # chunk-major: load v0/v1 ONCE, evaluate ALL npts_h points
                # by incremental adds (f_{t+1} = f_t + step — exact, no
                # per-point eval multiply, 1/npts the HBM traffic), and
                # restructure h = mu*f*prod(f^2-b^2) as (mu*f)-precompute +
                # 5-mul Fq3 squares: ~33% fewer base-field multiplies than
                # the point-major form (bit-identical results: exact field
                # ops commute/associate).
                def dsl(x, off):
                    return jax.lax.dynamic_slice(x, (0, 0, off),
                                                 (rows, 24, cs))

                from ..field import fq3
                v0 = (dsl(t_s[0], j * cs), dsl(t_s[1], j * cs))
                v1 = (dsl(t_s[0], half + j * cs), dsl(t_s[1], half + j * cs))
                Tbc = (jax.lax.dynamic_slice(Tb[0], (0, j * cs), (24, cs)),
                       jax.lax.dynamic_slice(Tb[1], (0, j * cs), (24, cs)))
                # inner fori over points with (f, mu*f) carried — one comb
                # instance in the trace; both advance by exact adds
                # (f_{t+1} = f_t + step, (mu*f)_{t+1} = (mu*f)_t + mu*step)
                if comp_split:
                    f0 = rq._as_slots_t(v0)
                    f1 = rq._as_slots_t(v1)
                    step3 = fq3.sub(f1, f0)
                    mu3 = tuple((mu_pow[c][0][:, None, None],
                                 mu_pow[c][1][:, None, None])
                                for c in range(3))
                    a3 = fq3.mul(mu3, f0)              # mu*v0
                    b3 = fq3.mul(mu3, step3)           # mu*step
                    Tb3 = rq._as_slots_t(Tbc)
                    for _ in range(pt0):               # skip t=0,1 (zeros)
                        f0 = fq3.add(f0, step3)
                        a3 = fq3.add(a3, b3)

                    def body_pt(t, carry):
                        f, mf, acc = carry
                        t = t + pt0
                        fsq = fq3.square(f)
                        ev = mf
                        for bb0 in bsq_c0:
                            # b^2 embeds at slot component 0 only
                            factor = (gl.sub(fsq[0], bb0), fsq[1], fsq[2])
                            ev = fq3.mul(ev, factor)
                        evs = tuple(gl.sum_axis(ev[c], axis=0)
                                    for c in range(3))   # comps (8, cs)
                        evs = fq3.mul(evs, Tb3)
                        s3 = tuple(gl.sum_axis(evs[c], axis=-1)
                                   for c in range(3))
                        s = rq._from_slots_t(tuple(
                            ((x[0][..., None]), (x[1][..., None]))
                            for x in s3))
                        s = (s[0][..., 0], s[1][..., 0])  # (24,)
                        prev = (acc[0][t], acc[1][t])
                        nxt = gl.add(prev, s)
                        acc = (acc[0].at[t].set(nxt[0]),
                               acc[1].at[t].set(nxt[1]))
                        return (fq3.add(f, step3), fq3.add(mf, b3), acc)

                    _, _, acc = jax.lax.fori_loop(0, npts_h - pt0,
                                                  body_pt, (f0, a3, acc))
                else:
                    step = gl.sub(v1, v0)
                    if pt0:                            # skip t=0,1 (zeros)
                        v0 = gl.add(v1, step)

                    def body_pt(t, carry):
                        vals, acc = carry
                        t = t + pt0
                        f_sq = rq.ntt_mul_t(vals, vals)
                        ev = None
                        for bb0 in bsq_c0:
                            bb24 = (jnp.zeros((24, 1), jnp.uint32)
                                    .at[0::3].set(bb0[0]),
                                    jnp.zeros((24, 1), jnp.uint32)
                                    .at[0::3].set(bb0[1]))
                            factor = gl.sub(
                                f_sq,
                                (jnp.broadcast_to(bb24[0], f_sq[0].shape),
                                 jnp.broadcast_to(bb24[1], f_sq[1].shape)))
                            ev = (factor if ev is None
                                  else rq.ntt_mul_t(ev, factor))
                        ev = vals if ev is None else rq.ntt_mul_t(ev, vals)
                        ev = rq.ntt_scalar_mul_t(ev, mu_pow)
                        evs = gl.sum_axis(ev, axis=0)    # (24, cs)
                        evs = rq.ntt_mul_t(evs, Tbc)
                        s = gl.sum_axis(evs, axis=-1)    # (24,)
                        prev = (acc[0][t], acc[1][t])
                        nxt = gl.add(prev, s)
                        acc = (acc[0].at[t].set(nxt[0]),
                               acc[1].at[t].set(nxt[1]))
                        return (gl.add(vals, step), acc)

                    _, acc = jax.lax.fori_loop(0, npts_h - pt0, body_pt,
                                               (v0, acc))
                return acc

            init = (jnp.zeros((npts_h, 24), jnp.uint32),
                    jnp.zeros((npts_h, 24), jnp.uint32))
            Sh = jax.lax.fori_loop(0, chunks, body, init)
            # one packed sums output -> ONE host fetch per round (each
            # separate fetch is a ~25 ms tunnel round trip)
            S_all = (jnp.concatenate([Sh[0], Sc0[0], Sc1[0]]),
                     jnp.concatenate([Sh[1], Sc0[1], Sc1[1]]))
            return t_s, c2r, Tn, S_all

        return fn

    chain = _chain_enabled(engine)
    if chain:
        from . import accel_dev_fs as DFS
        import jax as _jax
        # Pallas comb kernels for the 90-row tail (measured 3.5x vs the
        # XLA round kernels at production shape, bit-exact —
        # scripts/pallas_ab.py); the tail is carried as c-layout halves
        # between rounds, c-terms/eq stay XLA in the same jit
        use_pallas = (engine.jax.default_backend() != "cpu"
                      and os.environ.get("LATTICEUM_PALLAS", "1") == "1"
                      and _pallas_row_tile(rows) is not None
                      and n0 >= 1024 and (n0 & (n0 - 1)) == 0)
        with B.jax_mode():
            state, pend = _chain_export(transcript)
            exth_l = _limbs_dev(ext_h)
            extc_l = _limbs_dev(ext_c)
            # eq points as a (3, nv, 3) limb pair [table][round][comp]
            eqp_l = _limbs_dev(np.array(
                [[[int(x) % P for x in pt] for pt in tbl]
                 for tbl in eq_points], dtype=object))
            Es_d = (B.xp.asarray(np.tile(np.array([1, 0, 0], np.uint32),
                                         (3, 1))),
                    B.xp.zeros((3, 3), np.uint32))
            r3_d = tuple((B.xp.zeros((), np.uint32),
                          B.xp.zeros((), np.uint32)) for _ in range(3))
            r3p_d = (B.xp.zeros((1, 3), np.uint32),
                     B.xp.zeros((1, 3), np.uint32))
        wjf = engine._jit(("foldw_chain", n_msg, npts_h),
                          _make_weight_fold(n_msg, npts_h))
        ejf = engine._jit(("eupd3_chain",), _eupd3_fn)
        if use_pallas:
            # entry: split the packed tail into c-layout halves + mu rows
            from . import pallas_comb as PC

            def pentry(ts, mu):
                half = ts[0].shape[-1] // 2
                tA = PC.to_c_layout((ts[0][..., :half], ts[1][..., :half]))
                tB = PC.to_c_layout((ts[0][..., half:], ts[1][..., half:]))
                mu_c = (B.xp.stack([mu[c][0] for c in range(3)], axis=1),
                        B.xp.stack([mu[c][1] for c in range(3)], axis=1))
                return tA, tB, mu_c

            pej = engine._jit((comb_key, "pfold_entry", rows, n0), pentry,
                              donate_argnums=(0,))
            with B.jax_mode():
                t_A, t_B, mu_c = pej(t_s, mu_pow)
            t_s = None
        msgs_d, chals_d = [], []
        n_cur, r = n0, 0
        while r < nv:
            n_eff = n_cur // 2 if r > 0 else n_cur
            if n_eff < 2 or n_eff // 2 < max(engine.tail, 1):
                break
            fold_first = r > 0
            t_r = time.time()
            if use_pallas:
                # NOTE: tA/tB must NOT be donated — XLA aliasing a
                # donated buffer with a pallas_call output faults the TPU
                # worker (reproduced; scripts/pallas_step_check.py).  Only
                # the XLA-consumed c2r/eqs are donated.
                jf = engine._jit(
                    (comb_key, "pfoldr", rows, n_cur, fold_first),
                    _make_round_pallas(rows, n_cur, fold_first, npts_h,
                                       b_small),
                    donate_argnums=(2, 3))
                with B.jax_mode():
                    t_A, t_B, c2r, eqs, S_all = jf(
                        t_A, t_B, c2r, eqs, mu_c, r3_d, r3p_d)
            else:
                jf = engine._jit((comb_key, "foldfr", rows, n_cur,
                                  fold_first, budget, comp_split),
                                 make_round(n_cur, fold_first),
                                 donate_argnums=(0, 1, 2))
                with B.jax_mode():
                    t_s, c2r, eqs, S_all = jf(t_s, c2r, eqs, mu_pow, r3_d)
            with B.jax_mode():
                eqp_r = (eqp_l[0][:, r], eqp_l[1][:, r])      # (3, 3)
                msg = wjf(S_all, Es_d, eqp_r, exth_l, extc_l)
                L = int(pend[0].shape[0]) + n_msg * 24
                cjf = engine._jit(("chal_chain", L), _make_chal_fn())
                state, pend = cjf(state, pend, msg)
                Es_d = ejf(Es_d, eqp_r, pend)
                r3_d = tuple((pend[0][c], pend[1][c]) for c in range(3))
                r3p_d = (pend[0][None, :], pend[1][None, :])
            msgs_d.append(msg)
            chals_d.append(pend)
            if log:
                log(f"      fold chain r{r} (n={n_eff}) enqueued "
                    f"+{time.time()-t_r:.3f}s")
            if fold_first:
                n_cur //= 2
            r += 1

        fold_pending = r > 0

        if use_pallas:
            # repack the c-layout halves for the fixed phase (+ pending
            # fold), in one jit
            from . import pallas_comb as PC

            def pfix(tA, tB, c2r, eqs, r3, E3s):
                lo = PC.from_c_layout(tA)
                hi = PC.from_c_layout(tB)
                if fold_pending:
                    t_s = gl.add(lo, rq.ntt_scalar_mul_t(gl.sub(hi, lo),
                                                         r3))
                    c2r = _fold_t(c2r, r3)
                else:
                    t_s = (B.xp.concatenate([lo[0], hi[0]], axis=-1),
                           B.xp.concatenate([lo[1], hi[1]], axis=-1))
                eqr = [rq.ntt_scalar_mul_t((eqs[0][i], eqs[1][i]), E3s[i])
                       for i in range(3)]
                head = (B.xp.stack([eqr[0][0], c2r[0][0], eqr[1][0],
                                    c2r[0][1], eqr[2][0]]),
                        B.xp.stack([eqr[0][1], c2r[1][0], eqr[1][1],
                                    c2r[1][1], eqr[2][1]]))
                return head, t_s

            jfix = engine._jit((comb_key, "pfixentry", rows, n_cur,
                                fold_pending), pfix,
                               donate_argnums=(0, 1, 2, 3))
            with B.jax_mode():
                E3s_d = [tuple((Es_d[0][tbl, c], Es_d[1][tbl, c])
                               for c in range(3)) for tbl in range(3)]
                head_f, tail_f = jfix(t_A, t_B, c2r, eqs, r3_d, E3s_d)
                dev_chals = ((B.xp.stack([c[0] for c in chals_d]),
                              B.xp.stack([c[1] for c in chals_d]))
                             if chals_d else None)
            out_dev, meta = DFS.run_fixed_phase_dev(
                engine, transcript, [head_f, tail_f], nv, r, degree,
                comb_key, comb_t, consts_dev, None, None, log=log,
                dev_state=(state, pend), dev_chals=dev_chals,
                return_device=True)
            if log:
                log(f"        fold chain fully enqueued at "
                    f"{time.time()-t_start:.2f}s")
            msgs_np, chals_np, out_np = _jax.device_get(
                (msgs_d, chals_d, out_dev))
            proof, chals = _chain_bookkeep(transcript, msgs_np, chals_np)
            tp, tc, final = DFS.finish_fixed_phase_host(
                transcript, out_np, meta, log=log)
            proof.extend(tp)
            chals.extend(tc)
            final = (np.asarray(final[0]).reshape(-1, 24),
                     np.asarray(final[1]).reshape(-1, 24))
            if log:
                log(f"fold rounds chained+pallas ({r} dev + {nv-r} "
                    f"fixed): {time.time()-t_start:.2f}s")
            return proof, chals, final

        def fix_entry(t_s, c2r, eqs, r3, E3s):
            if fold_pending:
                t_s = _fold_t(t_s, r3)
                c2r = _fold_t(c2r, r3)
            eqr = [rq.ntt_scalar_mul_t((eqs[0][i], eqs[1][i]), E3s[i])
                   for i in range(3)]
            head = (B.xp.stack([eqr[0][0], c2r[0][0], eqr[1][0],
                                c2r[0][1], eqr[2][0]]),
                    B.xp.stack([eqr[0][1], c2r[1][0], eqr[1][1],
                                c2r[1][1], eqr[2][1]]))
            return head, t_s

        jfix = engine._jit((comb_key, "fixentry", rows, n_cur,
                            fold_pending), fix_entry,
                           donate_argnums=(0, 1, 2))
        with B.jax_mode():
            E3s_d = [tuple((Es_d[0][tbl, c], Es_d[1][tbl, c])
                           for c in range(3)) for tbl in range(3)]
            head_f, tail_f = jfix(t_s, c2r, eqs, r3_d, E3s_d)
            dev_chals = ((B.xp.stack([c[0] for c in chals_d]),
                          B.xp.stack([c[1] for c in chals_d]))
                         if chals_d else None)
        out_dev, meta = DFS.run_fixed_phase_dev(
            engine, transcript, [head_f, tail_f], nv, r, degree, comb_key,
            comb_t, consts_dev, None, None, log=log,
            dev_state=(state, pend), dev_chals=dev_chals,
            return_device=True)
        if log:
            log(f"        fold chain fully enqueued at "
                f"{time.time()-t_start:.2f}s")
        msgs_np, chals_np, out_np = _jax.device_get(
            (msgs_d, chals_d, out_dev))
        proof, chals = _chain_bookkeep(transcript, msgs_np, chals_np)
        tp, tc, final = DFS.finish_fixed_phase_host(transcript, out_np,
                                                    meta, log=log)
        proof.extend(tp)
        chals.extend(tc)
        final = (np.asarray(final[0]).reshape(-1, 24),
                 np.asarray(final[1]).reshape(-1, 24))
        if log:
            log(f"fold rounds chained ({r} dev + {nv-r} fixed): "
                f"{time.time()-t_start:.2f}s")
        return proof, chals, final

    E = [(1, 0, 0), (1, 0, 0), (1, 0, 0)]
    proof, chals = [], []
    r3_prev = _fq3_limbs((0, 0, 0))
    n_cur = n0
    r = 0
    while r < nv:
        n_eff = n_cur // 2 if r > 0 else n_cur
        if n_eff < 2 or n_eff // 2 < max(engine.tail, 1):
            break
        fold_first = r > 0
        # t/c/eq buffers are consumed every round: donate (the f_hat tail
        # alone is 2.3 GB at production scale — without donation two
        # generations coexist per round)
        jf = engine._jit((comb_key, "foldfr", rows, n_cur, fold_first,
                          budget, comp_split), make_round(n_cur, fold_first),
                         donate_argnums=(0, 1, 2))
        t_r = time.time()
        with B.jax_mode():
            t_s, c2r, eqs, S_all = jf(t_s, c2r, eqs, mu_pow, r3_prev)
        import jax as _jax
        all_pts = _rings_to_int(_jax.device_get(S_all))
        if log:
            log(f"      fold dev r{r} (n={n_eff}): {time.time()-t_r:.3f}s")
        Sh_pts = all_pts[:npts_h]
        sc0 = all_pts[npts_h:npts_h + 2]       # [table][slot]
        sc1 = all_pts[npts_h + 2:npts_h + 4]
        Sh_ext = _extend_host(Sh_pts, ext_h)
        terms = []
        for tbl in range(2):
            S_ext = _extend_host([sc0[tbl], sc1[tbl]], ext_c)
            w_t = [H.fq3_mul(E[tbl], _eqf_host(eq_points[tbl][r], t))
                   for t in range(n_msg)]
            terms.append((w_t, S_ext))
        w_t = [H.fq3_mul(E[2], _eqf_host(eq_points[2][r], t))
               for t in range(n_msg)]
        terms.append((w_t, Sh_ext))
        msg = _weighted_msg(terms, n_msg)
        c = _transcript_round(transcript, msg)
        proof.append(msg)
        chals.append(c)
        for tbl in range(3):
            E[tbl] = H.fq3_mul(E[tbl], _eqf_at(eq_points[tbl][r], c))
        r3_prev = _fq3_limbs(c)
        if fold_first:
            n_cur //= 2
        r += 1

    # handoff to the fixed-width device phase: fold the pending challenge
    # into the f_hat/c rows, scale the three pair-sum tables by E_tbl, and
    # reassemble the unfactored [head5, tail] parts — all in one kernel
    fold_pending = r > 0

    def fix_entry(t_s, c2r, eqs, r3, E3s):
        if fold_pending:
            t_s = _fold_t(t_s, r3)
            c2r = _fold_t(c2r, r3)
        eqr = [rq.ntt_scalar_mul_t((eqs[0][i], eqs[1][i]), E3s[i])
               for i in range(3)]
        head = (B.xp.stack([eqr[0][0], c2r[0][0], eqr[1][0],
                            c2r[0][1], eqr[2][0]]),
                B.xp.stack([eqr[0][1], c2r[1][0], eqr[1][1],
                            c2r[1][1], eqr[2][1]]))
        return head, t_s

    jfix = engine._jit((comb_key, "fixentry", rows, n_cur, fold_pending),
                       fix_entry, donate_argnums=(0, 1, 2))
    with B.jax_mode():
        head_f, tail_f = jfix(t_s, c2r, eqs, r3_prev,
                              [_fq3_limbs(e) for e in E])

    tail_proof, tail_chals, final = _fixed_phase(
        engine, transcript, [head_f, tail_f], nv, r, degree, comb_key,
        comb_t, consts_dev, None, chals, log=log)
    proof.extend(tail_proof)
    chals.extend(tail_chals)
    final = (np.asarray(final[0]).reshape(-1, 24),
             np.asarray(final[1]).reshape(-1, 24))
    if log:
        log(f"fold rounds ({r} dev + {nv-r} fixed): "
            f"{time.time()-t_start:.2f}s")
    return proof, chals, final
