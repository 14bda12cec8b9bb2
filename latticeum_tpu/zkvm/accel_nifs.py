"""Device-resident NIFS prover: the full fold on TPU with a host transcript.

Mirrors the host implementations in latticeum_tpu.nifs.* exactly (same
transcript, same messages) but keeps every large tensor on device:
  * witness pipelines (ICRT -> gadget decompose -> CRT -> f_hat) as jits,
  * linearization/folding sum-checks via DeviceEngine.sumcheck,
  * Ajtai commitments, evaluation claims, challenged-Mz combination on device.
"""

from __future__ import annotations

import numpy as np

import os

from .. import backend as B
from ..field import goldilocks as gl, host as H, mxu
from ..nifs import decomposition as dec, folding as fold, linearization as lin
from ..nifs import nifs as nifs_mod
from ..nifs.structs import CCCS, LCCCS, TAU, Witness
from ..poly import mle as mle_mod
from ..ring import decompose as dc, rq


class DeviceWitness:
    """Witness with device-resident tensors."""

    def __init__(self, w_ccs, f_coeff, f, f_hat):
        self.w_ccs = w_ccs
        self.f_coeff = f_coeff
        self.f = f
        self.f_hat = f_hat


class DeviceNifs:
    def __init__(self, engine, ccs, params, ajtai_rows, t_layout=False,
                 scheme=None):
        """ajtai_rows: host (kappa, 24) ints — the row-constant Ajtai rows
        (commitment_scheme.rs:29-33 structure).  Passing a non-row-constant
        `scheme` (commit.ajtai.AjtaiScheme) instead uploads the full dense
        κ×N ring matrix and routes ALL commitments (commit_z, the K-1
        decomposition commits) through the general chunked device matvec —
        a binding commitment, not just the reference's PoC shortcut.

        t_layout=True routes both sum-checks through the transposed
        bit-reversed kernels (accel_t) — the production-scale TPU memory
        layout; bit-exact with the standard path."""
        self.e = engine
        self.ccs = ccs
        self.p = params
        self.t_layout = t_layout
        # shrinking-buffer sum-check (one cached compile per round shape)
        # vs fixed-buffer (one compile, 2x work, interleave temps)
        self.shrink = True
        # fulldev: device-resident duplex challenger (no 2-RTT-per-round
        # host loop).  rounds=1 (default) chains one small jit PER ROUND
        # asynchronously (accel_rounds; minutes-not-tens-of-minutes cold
        # compile); rounds=0 selects the legacy ONE-dispatch monolith
        # (accel_fs) whose 17 unrolled round bodies compiled for >27 min
        # from a cold cache on the 2-core bench host (BENCH_r03 rc=124).
        self.fulldev = True
        self.rounds = os.environ.get("LATTICEUM_ROUNDS", "1") == "1"
        # mxu: evaluation claims as int8 digit-plane matmuls (field.mxu) —
        # 62.9x over the VPU inner-product path on the production shape
        # (bench/results/mxu_ab_r03.jsonl), bit-exact
        self.mxu = os.environ.get("LATTICEUM_MXU", "1") == "1"
        # factored: eq-factored fold sum-check rounds (accel_fs.
        # run_fold_fulldev_factored) — Gruen-style eq split, bit-exact
        self.factored = os.environ.get("LATTICEUM_FACTORED", "1") == "1"
        # factored_lin: same eq split + component-split layout for the
        # linearization sum-check (accel_fs.run_lin_fulldev_factored)
        self.factored_lin = os.environ.get("LATTICEUM_LIN_FACTORED",
                                           "1") == "1"
        self.general_ajtai = (scheme is not None
                              and not getattr(scheme, "row_constant", False))
        with B.jax_mode():
            if self.general_ajtai:
                self.ajtai_mat = engine.put(
                    (np.asarray(scheme.matrix[0]),
                     np.asarray(scheme.matrix[1])))       # (kappa, N, 24)
                self.ajtai_rows = None
            else:
                # build the limbs on HOST and put once — from_int under
                # jax_mode would create a device array that engine.put then
                # fetches straight back (a needless device->host round trip,
                # and the tunnel's first fetch is its stall-prone op)
                with B.numpy_mode():
                    rows_limbs = gl.from_int(
                        np.array(ajtai_rows, dtype=object))
                self.ajtai_rows = engine.put(rows_limbs)
        self._cap = max(M.max_row for M in ccs.M) + 1
        self._cap_pow2 = min(1 << (self._cap - 1).bit_length(), ccs.m)
        self._lin_comb = lin.make_comb_fn2(tuple(tuple(s) for s in ccs.S))
        with B.numpy_mode():
            self._lin_consts = gl.from_int(
                np.array([list(c) for c in ccs.c], dtype=object))
        self._lin_consts_dev = engine.put(self._lin_consts)
        self._fold_comb = fold.make_comb_fn2(params.B_SMALL, params.K)
        if t_layout:
            from . import accel_t
            self._accel_t = accel_t
            self._lin_comb_t = accel_t.make_comb_lin_batched(
                tuple(tuple(s) for s in ccs.S), ccs.t)
            self._fold_comb_t = accel_t.make_comb_fold_batched(
                params.B_SMALL, params.K)
            accel_t.register_std_comb("lin", self._lin_comb)
            accel_t.register_std_comb("fold", self._fold_comb)

    def _sumcheck(self, transcript, g_dev, nv, degree, key, comb, comb_t,
                  consts_dev, eq_info=None, log=None, already_t=False):
        """Dispatch: standard-layout engine sum-check or transposed path.

        g_dev: single (lo, hi) stack or a list of part stacks (fold path)."""
        is_parts = not hasattr(g_dev[0], "shape")
        if not self.t_layout:
            if is_parts:
                with B.jax_mode():
                    g_dev = (B.xp.concatenate([p[0] for p in g_dev]),
                             B.xp.concatenate([p[1] for p in g_dev]))
            proof_sc, chals, final = self.e.sumcheck(
                transcript, g_dev, nv, degree, key, comb, consts_dev,
                log=log, eq_info=eq_info)
            fl = (np.asarray(final[0]).reshape(-1, 24),
                  np.asarray(final[1]).reshape(-1, 24))
            return proof_sc, chals, fl
        g_t = g_dev if (already_t or is_parts) \
            else self._accel_t.to_t_layout(self.e, g_dev)
        del g_dev
        if self.fulldev and self.rounds:
            # unfactored fallback with the host transcript: shrink rounds
            # (one small shape-keyed kernel per round; RTT ~25 ms/round)
            runner = self._accel_t.run_sumcheck_shrink
        elif self.fulldev:
            from . import accel_fs
            runner = accel_fs.run_sumcheck_fulldev
        elif self.shrink:
            runner = self._accel_t.run_sumcheck_shrink
        else:
            runner = self._accel_t.run_sumcheck_fixed
        return runner(
            self.e, transcript, g_t, nv, degree, key, comb_t, consts_dev,
            eq_info_rev=eq_info, log=log)

    # -- witness pipeline -------------------------------------------------
    def _fhat_maybe_t(self, f_coeff):
        """build_fhat, transposed + bit-reversed under t_layout.

        Under t_layout every f_hat is BORN in the (TAU, 24, m) bit-reversed
        layout, so the fold's tail part is a pure concatenation — no 2 GB
        transpose inside build_g (which peaked at 12.3 GB in mem_audit)."""
        f_hat = Witness.build_fhat(f_coeff)
        if not self.t_layout:
            return f_hat
        from .accel_t import bitrev_indices
        npad = int(f_hat[0].shape[-2])
        brev = B.xp.asarray(bitrev_indices(
            int(np.log2(npad)) if npad > 1 else 0))
        return (B.xp.moveaxis(f_hat[0], -2, -1)[..., brev],
                B.xp.moveaxis(f_hat[1], -2, -1)[..., brev])

    def _fhat_batched(self, f_coeff):
        """Batched build_fhat over a leading K axis: (K, nf, 24) ->
        (K, TAU, npad, 24) std or (K, TAU, 24, npad) bit-reversed t-layout."""
        lo, hi = f_coeff
        Kb, nf = lo.shape[0], lo.shape[1]
        npad = 1 << (nf - 1).bit_length() if nf > 1 else 1
        cl = B.xp.moveaxis(lo.reshape(Kb, nf, TAU, 8), 1, 2)
        ch = B.xp.moveaxis(hi.reshape(Kb, nf, TAU, 8), 1, 2)
        ol = B.xp.zeros((Kb, TAU, npad, 8, 3), np.uint32)
        oh = B.xp.zeros((Kb, TAU, npad, 8, 3), np.uint32)
        idx = (slice(None), slice(None), slice(0, nf), slice(None), 0)
        ol = B.at_set(ol, idx, cl).reshape(Kb, TAU, npad, 24)
        oh = B.at_set(oh, idx, ch).reshape(Kb, TAU, npad, 24)
        if not self.t_layout:
            return ol, oh
        from .accel_t import bitrev_indices
        brev = B.xp.asarray(bitrev_indices(
            int(np.log2(npad)) if npad > 1 else 0))
        return (B.xp.moveaxis(ol, -2, -1)[..., brev],
                B.xp.moveaxis(oh, -2, -1)[..., brev])

    def _eval_fhat_batched(self, fhat_b, eq_dev, raw=False):
        """<f_hat, eq> claims for a (K, TAU, ...) batched f_hat stack via an
        on-device fori over K (bounds the transient to one witness).
        raw=True returns the device (K, TAU, 24) limb pair (deferred
        fetch)."""
        import jax

        if self.mxu:
            kb0 = int(fhat_b[0].shape[0])

            def fn_mxu(fh, e):
                if self.t_layout:
                    fh = (B.xp.moveaxis(fh[0], -1, -2),
                          B.xp.moveaxis(fh[1], -1, -2))
                    e = (B.xp.moveaxis(e[0], -1, -2),
                         B.xp.moveaxis(e[1], -1, -2))
                npad = fh[0].shape[-2]
                flat = (fh[0].reshape(-1, npad, 24),
                        fh[1].reshape(-1, npad, 24))
                out = mxu.ring_contract(flat, (e[0].reshape(1, npad, 24),
                                               e[1].reshape(1, npad, 24)))
                return (out[0].reshape(kb0, TAU, 24),
                        out[1].reshape(kb0, TAU, 24))

            jf = self.e._jit(("evalfhat_b_mxu", kb0, self.t_layout,
                              int(fhat_b[0].shape[-1])), fn_mxu)
            with B.jax_mode():
                out = jf(fhat_b, eq_dev)
            if raw:
                return out
            return gl.to_int_lists(self.e.get(out))

        def fn(fh, e):
            Kb = fh[0].shape[0]
            out0 = B.xp.zeros((Kb, TAU, 24), np.uint32)
            out1 = B.xp.zeros((Kb, TAU, 24), np.uint32)

            def body(k, out):
                f_k = (fh[0][k], fh[1][k])
                if self.t_layout:
                    prod = rq.ntt_mul_t(f_k, (e[0][None], e[1][None]))
                    v = gl.sum_axis(prod, axis=-1)
                else:
                    prod = rq.ntt_mul(f_k, (e[0][None], e[1][None]))
                    v = gl.sum_axis(prod, axis=-2)
                return (out[0].at[k].set(v[0]), out[1].at[k].set(v[1]))

            return jax.lax.fori_loop(0, Kb, body, (out0, out1))

        kb = int(fhat_b[0].shape[0])
        jf = self.e._jit(("evalfhat_b", kb, self.t_layout,
                          int(fhat_b[0].shape[-1])), fn)
        with B.jax_mode():
            out = jf(fhat_b, eq_dev)
        if raw:
            return out
        return gl.to_int_lists(self.e.get(out))

    def eval_claims_batched(self, eqT_dev, z_stack, raw=False):
        """u-claims for a (K, n, 24) stacked z against the (t, n, 24) eqT,
        fori over K on device -> K lists of t rings (raw=True: the device
        (t, K, 24) limb pair, deferred fetch)."""
        import jax

        if self.mxu:
            kb0 = int(z_stack[0].shape[0])
            jf = self.e._jit(("evalclaims_b_mxu", kb0), mxu.ring_contract)
            with B.jax_mode():
                out = jf(eqT_dev, z_stack)           # (t, K, 24)
            if raw:
                return out
            got = self.e.get(out)
            return gl.to_int_lists((np.swapaxes(np.asarray(got[0]), 0, 1),
                                    np.swapaxes(np.asarray(got[1]), 0, 1)))

        def fn(w, zs):
            Kb = zs[0].shape[0]
            t_ = w[0].shape[0]
            out0 = B.xp.zeros((Kb, t_, 24), np.uint32)
            out1 = B.xp.zeros((Kb, t_, 24), np.uint32)

            def body(k, out):
                prod = rq.ntt_mul(w, (zs[0][k][None], zs[1][k][None]))
                u = gl.sum_axis(prod, axis=-2)
                return (out[0].at[k].set(u[0]), out[1].at[k].set(u[1]))

            return jax.lax.fori_loop(0, Kb, body, (out0, out1))

        kb = int(z_stack[0].shape[0])
        jf = self.e._jit(("evalclaims_b", kb), fn)
        with B.jax_mode():
            out = jf(eqT_dev, z_stack)
        if raw:
            # match the mxu raw convention: (t, K, 24) j-major
            with B.jax_mode():
                out = (B.xp.moveaxis(out[0], 0, 1),
                       B.xp.moveaxis(out[1], 0, 1))
            return out
        return gl.to_int_lists(self.e.get(out))

    def build_witness(self, w_dev):
        """w_ccs (nw, 24) device -> DeviceWitness (jitted pipeline)."""
        Bp, L = self.p.B, self.p.L

        def fn(w):
            w_coeff = rq.icrt(w)
            f_coeff = dc.gadget_decompose(w_coeff, Bp, L)
            f = rq.crt(f_coeff)
            f_hat = self._fhat_maybe_t(f_coeff)
            return f_coeff, f, f_hat

        nw = int(w_dev[0].shape[0])
        jf = self.e._jit(("witness", nw, self.t_layout), fn)
        with B.jax_mode():
            f_coeff, f, f_hat = jf(w_dev)
        return DeviceWitness(w_dev, f_coeff, f, f_hat)

    def witness_from_f_coeff(self, f_coeff_dev):
        Bp, L = self.p.B, self.p.L

        def fn(f_coeff):
            f = rq.crt(f_coeff)
            w = dc.gadget_recompose(f, Bp, L)
            f_hat = self._fhat_maybe_t(f_coeff)
            return f, w, f_hat

        nf = int(f_coeff_dev[0].shape[0])
        jf = self.e._jit(("witness_f", nf, self.t_layout), fn)
        with B.jax_mode():
            f, w, f_hat = jf(f_coeff_dev)
        return DeviceWitness(w, f_coeff_dev, f, f_hat)

    AJTAI_CHUNK = 1 << 12

    def _matvec_general(self, mat, f, batch_axes=0):
        """Dense κ×N ring matvec, chunked over N inside the trace.

        mat: (kappa, N, 24); f: (..., N, 24) with `batch_axes` leading batch
        dims.  Returns (..., kappa, 24).  The matvec whose cost makes Ajtai
        a real commitment (commitment_scheme.rs:37-52) — VPU slot products
        with overflow-safe mod-p chunk sums (the MXU variant measured
        slower at κ=32: output too narrow, bench/results/mxu_ab_r03.jsonl)."""
        n = int(mat[0].shape[-2])
        acc = None
        for start in range(0, n, self.AJTAI_CHUNK):
            end = min(start + self.AJTAI_CHUNK, n)
            a = (mat[0][:, start:end], mat[1][:, start:end])  # (k, c, 24)
            x = (f[0][..., None, start:end, :],
                 f[1][..., None, start:end, :])               # (...,1,c,24)
            prod = rq.ntt_mul((a[0][(None,) * batch_axes],
                               a[1][(None,) * batch_axes]), x)
            part = gl.sum_axis(prod, axis=-2)                 # (..., k, 24)
            acc = part if acc is None else gl.add(acc, part)
        return acc

    def commit(self, f_dev):
        """Ajtai commit -> host rings.  Row-constant shortcut
        (cm_k = row_k · Σ_i f_i, exact for the reference's matrix structure)
        or the general dense matvec when a full scheme was provided."""
        n = int(f_dev[0].shape[0])
        if self.general_ajtai:
            jf = self.e._jit(("ajtai_gen", n),
                             lambda m, f: self._matvec_general(m, f))
            with B.jax_mode():
                cm = jf(self.ajtai_mat, f_dev)
            return gl.to_int_lists(self.e.get(cm))

        def fn(rows, f):
            total = gl.sum_axis(f, axis=-2)              # (24,)
            prod = rq.ntt_mul(rows, (total[0][None], total[1][None]))
            return prod

        jf = self.e._jit(("ajtai_rc", n), fn)
        with B.jax_mode():
            cm = jf(self.ajtai_rows, f_dev)
        return gl.to_int_lists(self.e.get(cm))


    @staticmethod
    def _marker(log, prefix):
        """Phase-boundary logger for profiling (no-op when log is None)."""
        import time
        state = [time.time()]

        def mark(name):
            now = time.time()
            if log:
                log(f"    {prefix}.{name}: {now-state[0]:.2f}s")
            state[0] = now
        return mark

    # -- linearization ----------------------------------------------------
    def lin_prove(self, cm_i: CCCS, wit: DeviceWitness, transcript, log=None):
        ccs = self.ccs
        beta_s = lin.squeeze_beta(transcript, ccs.s)
        with B.numpy_mode():
            head = gl.from_int(np.array(
                [list(x) for x in cm_i.x_ccs] + [H.ntt_from_u64(1)],
                dtype=object))
        with B.jax_mode():
            z_dev = (B.xp.concatenate([self.e.put(head)[0], wit.w_ccs[0]]),
                     B.xp.concatenate([self.e.put(head)[1], wit.w_ccs[1]]))
        mark = self._marker(log, "lin")
        if self.t_layout:
            # g emitted directly transposed + bit-reversed inside one jit:
            # avoids the (t+1, m, 24) standard-layout stack AND its
            # to_t_layout copy (2x ~3 GB at production scale)
            g = self.lin_g_t(z_dev, beta_s)
            mark("g_build")
        else:
            mz = self.e.matvecs(z_dev, self._cap_pow2)
            eq_dev = self.e.eq_table(beta_s, self._cap_pow2)
            with B.jax_mode():
                g = (B.xp.concatenate([mz[0], eq_dev[0][None]]),
                     B.xp.concatenate([mz[1], eq_dev[1][None]]))
            del mz, eq_dev
        if self.t_layout and self.fulldev and self.factored_lin:
            if self.rounds:
                from . import accel_rounds
                if not hasattr(self, "_c_signs"):
                    self._c_signs = accel_rounds.lin_c_signs(ccs.c)
                proof_sc, chals, final = \
                    accel_rounds.run_lin_rounds_factored(
                        self.e, transcript, g, ccs.s, ccs.d + 1, "lin",
                        self._lin_consts_dev,
                        tuple(tuple(s) for s in ccs.S), beta_s,
                        comb_t=self._lin_comb_t, log=log,
                        c_signs=self._c_signs)
            else:
                from . import accel_fs
                proof_sc, chals, final = accel_fs.run_lin_fulldev_factored(
                    self.e, transcript, g, ccs.s, ccs.d + 1, "lin",
                    self._lin_consts_dev, tuple(tuple(s) for s in ccs.S),
                    beta_s, log=log)
        else:
            proof_sc, chals, final = self._sumcheck(
                transcript, g, ccs.s, ccs.d + 1, "lin", self._lin_comb,
                getattr(self, "_lin_comb_t", None), self._lin_consts_dev,
                eq_info=(beta_s, ccs.t), log=log, already_t=self.t_layout)
        del g
        mark("sumcheck")
        eq_r = self._eq_for_eval(chals, wit.f_hat)
        v = self._eval_fhat(wit.f_hat, eq_r)
        mark("v_evals")
        # u_j = mle[M_j z](r) = the final folded sum-check values (rows 0..t)
        u = gl.to_int_lists((final[0][:ccs.t], final[1][:ccs.t]))
        transcript.absorb_slice(v)
        transcript.absorb_slice(u)
        proof = {"sumcheck": proof_sc, "v": v, "u": u}
        point_r = [H.ntt_from_fq3(r) for r in chals]
        lcccs = LCCCS(r=point_r, v=v, cm=[list(x) for x in cm_i.cm], u=u,
                      x_w=[list(x) for x in cm_i.x_ccs],
                      h=H.ntt_from_u64(1))
        return lcccs, proof, z_dev

    def lin_g_t(self, z_dev, beta_s):
        """Linearization g stack emitted directly in the transposed
        bit-reversed layout: (t+1, 24, m') with m' = cap rounded to pow2.

        Each M_j z segment-sums straight into bit-reversed row positions
        (row indices pre-permuted on host), so no full-size standard-layout
        intermediate ever exists."""
        from .accel_t import bitrev_indices
        m = self._cap_pow2
        eq_dev = self.e.eq_table(beta_s, m)
        brev = bitrev_indices(int(np.log2(m)) if m > 1 else 0)
        if not hasattr(self, "_brev_rows"):
            with B.jax_mode():
                self._brev_rows = [
                    B.xp.asarray(brev[np.asarray(M["rows"])])
                    for M in self.e.M_dev]
                self._brev_idx = B.xp.asarray(brev)

        def fn(z, e):
            outs = []
            for M, br in zip(self.e.M_dev, self._brev_rows):
                zg = (z[0][M["cols"]], z[1][M["cols"]])
                if M["vals"][0].ndim == 1:
                    sv = (M["vals"][0][:, None], M["vals"][1][:, None])
                    prod = gl.mul(sv, zg)
                else:
                    prod = rq.ntt_mul(M["vals"], zg)
                s = B.segment_sum(
                    B.xp.moveaxis(B.xp.stack(
                        [prod[0] & gl.MASK16, prod[0] >> 16,
                         prod[1] & gl.MASK16, prod[1] >> 16]), 0, -1),
                    br, m)
                mz = gl._combine_cols_small(B.xp.moveaxis(s, -1, 0))
                outs.append((B.xp.moveaxis(mz[0], 0, 1),
                             B.xp.moveaxis(mz[1], 0, 1)))
            eqt = (B.xp.moveaxis(e[0], 0, 1)[:, self._brev_idx],
                   B.xp.moveaxis(e[1], 0, 1)[:, self._brev_idx])
            outs.append(eqt)
            return (B.xp.stack([o[0] for o in outs]),
                    B.xp.stack([o[1] for o in outs]))

        jf = self.e._jit(("lin_g_t", m), fn)
        with B.jax_mode():
            return jf(z_dev, eq_dev)

    # -- decomposition ----------------------------------------------------
    def dec_prove(self, cm_i: LCCCS, wit: DeviceWitness, transcript,
                  log=None):
        p = self.p
        ccs = self.ccs
        point = [H.ntt_slots(r)[0] for r in cm_i.r]

        mark = self._marker(log, "dec")
        nf = int(wit.f_coeff[0].shape[0])
        Bp, L = p.B, p.L

        # b_small^k weights for the on-device y_0 reconstruction
        with B.numpy_mode():
            bpows = gl.from_int(np.array(
                [pow(p.B_SMALL, k, H.P) for k in range(1, p.K)],
                dtype=object))

        def batch_fn(f_coeff, cm_dev, bp):
            ks = dc.decompose_vec_into_k_vecs(f_coeff, p.B_SMALL, p.K)
            f = rq.crt(ks)                          # (K, nf, 24)
            w = dc.gadget_recompose(f, Bp, L)       # (K, nw, 24)
            f_hat = self._fhat_batched(ks)          # (K, TAU, ...)
            if self.general_ajtai:
                # dense matvec commits for k >= 1 (batched, chunked over N)
                cms = self._matvec_general(
                    self.ajtai_mat, (f[0][1:], f[1][1:]), batch_axes=1)
            else:
                # row-constant Ajtai commits for k >= 1 in the same jit
                total = gl.sum_axis((f[0][1:], f[1][1:]), axis=-2)  # (K-1,24)
                cms = rq.ntt_mul(
                    (self.ajtai_rows[0][None], self.ajtai_rows[1][None]),
                    (total[0][:, None], total[1][:, None]))  # (K-1,kappa,24)
            # y_0 = cm - sum_k b^k y_k (decomposition.rs recomposition)
            acc = gl.mul((bp[0][:, None, None], bp[1][:, None, None]), cms)
            y0 = gl.sub(cm_dev, gl.sum_axis(acc, axis=0))
            return ks, f, w, f_hat, cms, y0

        with B.numpy_mode():
            cm_host = gl.from_int(np.array([list(c) for c in cm_i.cm],
                                           dtype=object))
        jf = self.e._jit(("dec_batch", nf, self.t_layout), batch_fn)
        with B.jax_mode():
            ks, f_b, w_b, fhat_b, cms, y0_dev = jf(
                wit.f_coeff, self.e.put(cm_host), self.e.put(bpows))
        wit_s = [DeviceWitness((w_b[0][k], w_b[1][k]),
                               (ks[0][k], ks[1][k]),
                               (f_b[0][k], f_b[1][k]),
                               (fhat_b[0][k], fhat_b[1][k]))
                 for k in range(p.K)]
        mark("witnesses")

        with B.numpy_mode():
            x_s = dec.compute_x_s(cm_i.x_w, cm_i.h, p)

        # dispatch EVERYTHING (v/u claims, z stack), then fetch all results
        # in one device_get — each separate sync fetch is a tunnel RTT
        eq_r = self._eq_for_eval(point, (fhat_b[0][0], fhat_b[1][0]))
        v_dev = self._eval_fhat_batched(fhat_b, eq_r, raw=True)
        mark("v_dispatch")

        eqT = self.eqT(point)
        mark("eqT")
        with B.numpy_mode():
            heads = gl.from_int(np.array(
                [[list(v) for v in x_s[k]] for k in range(p.K)],
                dtype=object))                       # (K, l+1, 24)
        hd = self.e.put(heads)

        def z_fn(h, w):
            return (B.xp.concatenate([h[0], w[0]], axis=1),
                    B.xp.concatenate([h[1], w[1]], axis=1))

        zjf = self.e._jit(("z_stack", p.K), z_fn)
        with B.jax_mode():
            z_b = zjf(hd, w_b)                       # (K, n, 24)
        z_s = [(z_b[0][k], z_b[1][k]) for k in range(p.K)]
        u_dev = self.eval_claims_batched(eqT, z_b, raw=True)

        import jax as _jax
        cm_fetch, v_fetch, u_fetch = _jax.device_get(
            ((y0_dev, cms), v_dev, u_dev))
        y_s = gl.to_int_lists((
            np.concatenate([cm_fetch[0][0][None], cm_fetch[1][0]], axis=0),
            np.concatenate([cm_fetch[0][1][None], cm_fetch[1][1]], axis=0)))
        v_s = gl.to_int_lists(tuple(np.asarray(a) for a in v_fetch))
        u_tk = tuple(np.swapaxes(np.asarray(a), 0, 1) for a in u_fetch)
        u_s = gl.to_int_lists(u_tk)                  # (K, t, 24) lists
        mark("claims_fetch")

        lcccs_s = []
        for k in range(p.K):
            transcript.absorb_slice(x_s[k])
            transcript.absorb_slice(y_s[k])
            transcript.absorb_slice(u_s[k])
            transcript.absorb_slice(v_s[k])
            lcccs_s.append(LCCCS(r=[list(r) for r in cm_i.r], v=v_s[k],
                                 cm=y_s[k], u=u_s[k], x_w=x_s[k][:-1],
                                 h=x_s[k][-1]))
        proof = {"u_s": u_s, "v_s": v_s, "x_s": x_s, "y_s": y_s}
        batch = {"f": f_b, "fhat": fhat_b, "z": z_b}
        return z_s, lcccs_s, wit_s, proof, batch

    def _eq_for_eval(self, point, f_hat):
        """eq table matching f_hat's layout (std (npad, 24) or t-layout
        (24, npad) bit-reversed) for <f_hat, eq> evaluation claims."""
        npad = int(f_hat[0].shape[-1 if self.t_layout else -2])
        eq = self.e.eq_table(point, npad)
        if not self.t_layout:
            return eq
        from .accel_t import bitrev_indices
        brev = bitrev_indices(int(np.log2(npad)) if npad > 1 else 0)

        def fn(e, br):
            return (B.xp.moveaxis(e[0], 0, 1)[:, br],
                    B.xp.moveaxis(e[1], 0, 1)[:, br])

        jf = self.e._jit(("eq_t", npad), fn)
        with B.jax_mode():
            return jf(eq, B.xp.asarray(brev))

    def _eval_fhat(self, f_hat, eq_dev):
        """<f_hat_j, eq> for each of the TAU f_hat MLEs."""
        if self.mxu:
            def fn_mxu(fh, e):
                if self.t_layout:
                    fh = (B.xp.moveaxis(fh[0], -1, -2),
                          B.xp.moveaxis(fh[1], -1, -2))
                    e = (B.xp.moveaxis(e[0], -1, -2),
                         B.xp.moveaxis(e[1], -1, -2))
                npad = fh[0].shape[-2]
                out = mxu.ring_contract(fh, (e[0].reshape(1, npad, 24),
                                             e[1].reshape(1, npad, 24)))
                return out[0][:, 0], out[1][:, 0]

            jf = self.e._jit(("evalfhat_mxu", self.t_layout,
                              int(f_hat[0].shape[-1])), fn_mxu)
            with B.jax_mode():
                out = jf(f_hat, eq_dev)
            return gl.to_int_lists(self.e.get(out))
        if not self.t_layout:
            return self.e.eval_mles_at(f_hat, eq_dev)

        def fn(m_, e):
            prod = rq.ntt_mul_t(m_, (e[0][None], e[1][None]))
            return gl.sum_axis(prod, axis=-1)

        npad = int(f_hat[0].shape[-1])
        jf = self.e._jit(("evalfhat_t", npad), fn)
        with B.jax_mode():
            out = jf(f_hat, eq_dev)
        return gl.to_int_lists(self.e.get(out))

    def eqT(self, point):
        """(t, n, 24) M_j^T eq rows on device."""
        eq_dev = self.e.eq_table(point, self._cap)

        def fn(e):
            outs = []
            for M in self.e.M_dev:
                yg = (e[0][M["rows"]], e[1][M["rows"]])
                if M["vals"][0].ndim == 1:
                    sv = (M["vals"][0][:, None], M["vals"][1][:, None])
                    prod = gl.mul(sv, yg)
                else:
                    prod = rq.ntt_mul(M["vals"], yg)
                s = B.segment_sum(
                    B.xp.moveaxis(B.xp.stack(
                        [prod[0] & gl.MASK16, prod[0] >> 16,
                         prod[1] & gl.MASK16, prod[1] >> 16]), 0, -1),
                    M["cols"], self.ccs.n)
                outs.append(gl._combine_cols_small(B.xp.moveaxis(s, -1, 0)))
            return (B.xp.stack([o[0] for o in outs]),
                    B.xp.stack([o[1] for o in outs]))

        jf = self.e._jit(("eqT",), fn)
        with B.jax_mode():
            return jf(eq_dev)

    def eval_claims(self, eqT_dev, z_dev):
        if self.mxu:
            def fn_mxu(w, z):
                out = mxu.ring_contract(w, (z[0][None], z[1][None]))
                return out[0][:, 0], out[1][:, 0]

            jf = self.e._jit(("evalclaims_mxu",), fn_mxu)
            with B.jax_mode():
                out = jf(eqT_dev, z_dev)
            return gl.to_int_lists(self.e.get(out))

        def fn(w, z):
            prod = rq.ntt_mul(w, (z[0][None], z[1][None]))
            return gl.sum_axis(prod, axis=-2)

        jf = self.e._jit(("evalclaims",), fn)
        with B.jax_mode():
            out = jf(eqT_dev, z_dev)
        ints = gl.to_int(self.e.get(out))
        return [[int(v) for v in r] for r in ints]

    # -- folding ----------------------------------------------------------
    def fold_prove(self, cm_i_s, wit_s, transcript, z_s, log=None,
                   batches=None):
        p, ccs = self.p, self.ccs
        K, b_small = p.K, p.B_SMALL
        log_m = ccs.s
        alpha_s, beta_s, zeta_s, mu_s = fold.squeeze_alpha_beta_zeta_mu(
            transcript, log_m, K)

        # assemble the fold g: the f_hat tail + the 5-row head.  Witness
        # f_hats are freed as they are consumed; w_ccs is dead after the
        # z_s capture in dec_prove.
        mark = self._marker(log, "fold")
        for w in wit_s:
            w.w_ccs = None
        zs_stack = None
        if batches is not None:
            with B.jax_mode():
                zs_stack = (
                    B.xp.concatenate([batches[0]["z"][0],
                                      batches[1]["z"][0]]),
                    B.xp.concatenate([batches[0]["z"][1],
                                      batches[1]["z"][1]]))
        if self.t_layout:
            # f_hats are BORN t-layout -> the tail is a pure concatenation
            # (a reshape of the two batched dec stacks when available)
            with B.jax_mode():
                if batches is not None:
                    m_ = batches[0]["fhat"][0].shape[-1]
                    tail = (B.xp.concatenate(
                                [batches[0]["fhat"][0],
                                 batches[1]["fhat"][0]]).reshape(
                                     -1, 24, m_),
                            B.xp.concatenate(
                                [batches[0]["fhat"][1],
                                 batches[1]["fhat"][1]]).reshape(
                                     -1, 24, m_))
                else:
                    tail = (B.xp.concatenate([w.f_hat[0] for w in wit_s]),
                            B.xp.concatenate([w.f_hat[1] for w in wit_s]))
            for w in wit_s:
                w.f_hat = None
                w.f_coeff = None
            if batches is not None:
                # the two (K, TAU, 24, m) dec f_hat stacks are 2.8 GB each
                # at production scale and are dead once concatenated into
                # the tail (thetas come from the sum-check finals) — drop
                # the refs or they pin ~5.7 GB of HBM through the fold
                # rounds (step-2 OOM, BENCH r04 cold-run post-mortem)
                batches[0]["fhat"] = None
                batches[1]["fhat"] = None
            mark("tail_concat")
            head = self._build_head(tail, z_s, cm_i_s, alpha_s, zeta_s,
                                    beta_s, K, zs_stack=zs_stack)
            g = (head, tail)
            mark("head_build")
        else:
            with B.jax_mode():
                fhats = (B.xp.stack([w.f_hat[0] for w in wit_s]),
                         B.xp.stack([w.f_hat[1] for w in wit_s]))
            for w in wit_s:
                w.f_hat = None
                w.f_coeff = None
            g = self._build_g(fhats, z_s, cm_i_s, alpha_s, zeta_s, beta_s, K)
            del fhats
        with B.numpy_mode():
            mu_c = fold.mu_consts(mu_s)
        if self.factored and self.t_layout and self.fulldev:
            # eq-factored coefficient rounds (Gruen): eq tables leave the
            # comb, h evaluated at 2·B_SMALL points only, Lagrange-extended
            # post-contraction — bit-identical messages, ~45% less VPU work
            r1 = [H.ntt_slots(r)[0] for r in cm_i_s[0].r]
            r2 = [H.ntt_slots(r)[0] for r in cm_i_s[K].r]
            if self.rounds:
                from . import accel_rounds
                proof_sc, chals, final = \
                    accel_rounds.run_fold_rounds_factored(
                        self.e, transcript, g, log_m, 2 * b_small, "fold",
                        self.e.put(mu_c), (r1, r2, beta_s), b_small, K,
                        comb_t=self._fold_comb_t, log=log)
            else:
                from . import accel_fs
                proof_sc, chals, final = accel_fs.run_fold_fulldev_factored(
                    self.e, transcript, g, log_m, 2 * b_small, "fold",
                    self.e.put(mu_c), (r1, r2, beta_s), b_small, K,
                    log=log)
        else:
            proof_sc, chals, final = self._sumcheck(
                transcript, g, log_m, 2 * b_small, "fold", self._fold_comb,
                getattr(self, "_fold_comb_t", None), self.e.put(mu_c),
                log=log, already_t=self.t_layout)
        del g
        mark("sumcheck")
        r_0 = chals

        # theta_s = mle[f_hat](r_0): rows 5.. of the sum-check's final
        # folded values — no separate evaluation pass needed
        del mu_c
        theta_flat = gl.to_int_lists((final[0][5:], final[1][5:]))
        theta_s = [theta_flat[i * TAU:(i + 1) * TAU]
                   for i in range(2 * K)]
        eqT_r0 = self.eqT(r_0)
        mark("eqT")
        if zs_stack is not None:
            eta_s = self.eval_claims_batched(eqT_r0, zs_stack)
        else:
            eta_s = [self.eval_claims(eqT_r0, z) for z in z_s]
        mark("eta_evals")
        for th in theta_s:
            transcript.absorb_slice(th)
        for et in eta_s:
            transcript.absorb_slice(et)
        rho_coeff, rho_ntt = fold.get_rhos(transcript, K)

        # f_0 = Σ ρ_i f_i on device
        def f0_fn(fs, rhos):
            prod = rq.ntt_mul(fs, rhos)
            return gl.sum_axis(prod, axis=0)

        with B.jax_mode():
            if batches is not None:
                fs = (B.xp.concatenate([batches[0]["f"][0],
                                        batches[1]["f"][0]]),
                      B.xp.concatenate([batches[0]["f"][1],
                                        batches[1]["f"][1]]))
            else:
                fs = (B.xp.stack([w.f[0] for w in wit_s]),
                      B.xp.stack([w.f[1] for w in wit_s]))
        with B.numpy_mode():
            rh = gl.from_int(np.array([[list(r)] for r in rho_ntt],
                                      dtype=object))  # (2K, 1, 24)
        jf = self.e._jit(("f0",), f0_fn)
        with B.jax_mode():
            f0 = jf(fs, self.e.put(rh))
        mark("f0")

        with B.numpy_mode():
            v_0, cm_0, u_0, x_0 = fold.compute_v0_u0_x0_cm0_vec(
                rho_coeff, rho_ntt, theta_s, cm_i_s, eta_s, ccs)
        mark("v0_u0_host")
        h = x_0[-1]
        lcccs = LCCCS(r=[H.ntt_from_fq3(c) for c in r_0], v=v_0, cm=cm_0,
                      u=u_0, x_w=x_0[:-1], h=h)
        w_0 = self.witness_from_f(f0)
        mark("w0_build")
        proof = {"sumcheck": proof_sc, "theta_s": theta_s, "eta_s": eta_s}
        return lcccs, w_0, proof

    def witness_from_f(self, f_dev):
        Bp, L = self.p.B, self.p.L

        def fn(f):
            f_coeff = rq.icrt(f)
            w = dc.gadget_recompose(f, Bp, L)
            f_hat = self._fhat_maybe_t(f_coeff)
            return f_coeff, w, f_hat

        nf = int(f_dev[0].shape[0])
        jf = self.e._jit(("witness_from_f", nf, self.t_layout), fn)
        with B.jax_mode():
            f_coeff, w, f_hat = jf(f_dev)
        return DeviceWitness(w, f_coeff, f_dev, f_hat)

    def _unified_coo(self):
        """All t matrices concatenated into one COO with a matrix-id column
        (built once): the challenged Mz over all j collapses to ONE gather +
        ONE segment sum instead of t unrolled matvecs."""
        if hasattr(self, "_ucoo"):
            return self._ucoo
        rows, cols, mats = [], [], []
        svals_lo, svals_hi, rvals_lo, rvals_hi = [], [], [], []
        all_scalar = all(M["scalar"] for M in self.e.M_dev)
        for j, M in enumerate(self.e.M_dev):
            nnz = int(np.asarray(M["rows"]).shape[0])
            rows.append(np.asarray(M["rows"]))
            cols.append(np.asarray(M["cols"]))
            mats.append(np.full((nnz,), j, np.int32))
            if all_scalar:
                svals_lo.append(np.asarray(M["vals"][0]))
                svals_hi.append(np.asarray(M["vals"][1]))
            else:
                vl, vh = np.asarray(M["vals"][0]), np.asarray(M["vals"][1])
                if vl.ndim == 1:   # scalar matrix -> embed on coeff 0? no:
                    # embedded-scalar ring value: slot pattern (c,0,0) x8
                    full_l = np.zeros((nnz, 24), np.uint32)
                    full_h = np.zeros((nnz, 24), np.uint32)
                    full_l[:, 0::3] = vl[:, None]
                    full_h[:, 0::3] = vh[:, None]
                    vl, vh = full_l, full_h
                rvals_lo.append(vl)
                rvals_hi.append(vh)
        with B.jax_mode():
            self._ucoo = dict(
                rows=B.xp.asarray(np.concatenate(rows)),
                cols=B.xp.asarray(np.concatenate(cols)),
                mats=B.xp.asarray(np.concatenate(mats)),
                scalar=all_scalar,
                vals=(B.xp.asarray(np.concatenate(
                          svals_lo if all_scalar else rvals_lo)),
                      B.xp.asarray(np.concatenate(
                          svals_hi if all_scalar else rvals_hi))))
        return self._ucoo

    def _build_g(self, fhats, z_s, cm_i_s, alpha_s, zeta_s, beta_s, K):
        """g MLE stack on device (one jit): eq_r1, comb1, eq_r2, comb2,
        eq_beta, fhat[0..2K][0..TAU].  fhats: stacked (2K, TAU, m, 24).

        Batched formulation (the unrolled 125x30x2 scalar-mul graph is too
        large for the TPU compiler): the alpha-Horner is one scalar-mul over
        the (2K*TAU, m, 24) f_hat stack; the challenged Mz is combined z
        (zeta-powers contracted over instances) pushed through the unified
        COO in one segment sum per half.  Under t_layout the output is
        emitted directly transposed + bit-reversed (fused into the jit, no
        second full-size buffer)."""
        ccs = self.ccs
        t = ccs.t
        r1 = [H.ntt_slots(r)[0] for r in cm_i_s[0].r]
        r2 = [H.ntt_slots(r)[0] for r in cm_i_s[K].r]
        eq_r1 = self.e.eq_table(r1, None)
        eq_r2 = self.e.eq_table(r2, None)
        eq_b = self.e.eq_table(beta_s, None)

        with B.numpy_mode():
            # alpha powers alpha_i^{d+1}, k-major (matches fhat stack order)
            apows = []
            for a in alpha_s:
                p = (1, 0, 0)
                for _d in range(TAU):
                    p = H.fq3_mul(p, a)
                    apows.append(list(p))
            alpha_c = gl.from_int(np.array(apows, dtype=object))  # (2K*TAU,3)
            zeta_pows = np.empty((2 * K, t, 3), dtype=object)
            for i in range(2 * K):
                for j in range(t):
                    zeta_pows[i, j] = list(H.fq3_pow(zeta_s[i], j + 1))
            zeta_c = gl.from_int(zeta_pows)      # (2K, t, 3) limbs

        fn = self._build_g_fn()

        with B.jax_mode():
            zs = (B.xp.stack([z[0] for z in z_s]),
                  B.xp.stack([z[1] for z in z_s]))
        # fhats (2.3 GB at production scale) are dead after this call
        # (thetas come from the sum-check's final values) — donate them.
        # The tail output has exactly fhats' element count so the donated
        # buffers are reusable (the round-1 single-stack output was 95 rows
        # vs the 90-row input, which silently defeated the donation and
        # doubled peak HBM — BENCH_r01 post-mortem).
        jf = self.e._jit(("build_g", self.t_layout), fn,
                         donate_argnums=(0,))
        with B.jax_mode():
            return jf(fhats, zs, eq_r1, eq_r2, eq_b,
                      self.e.put(alpha_c), self.e.put(zeta_c))

    def _build_g_fn(self):
        """The jitted g-builder: (fhats, zs, eq1, eq2, eqb, alpha, zeta) ->
        (head, tail) where head = [eq_r1, comb1, eq_r2, comb2, eq_beta]
        (5, m, 24) and tail = the alpha-scaled f_hat stack (2K*TAU, m, 24)
        (t-layout: (*, 24, m) bit-reversed)."""
        ccs = self.ccs
        m = ccs.m
        t = ccs.t
        K = self.p.K
        ucoo = self._unified_coo()

        def fn(fhats, zs, eq1, eq2, eqb, alpha, zeta):
            # fhats: (2K, TAU, m, 24); zs: (2K, n, 24)
            flat = (fhats[0].reshape(2 * K * TAU, m, 24),
                    fhats[1].reshape(2 * K * TAU, m, 24))
            a3 = tuple((alpha[0][:, c, None], alpha[1][:, c, None])
                       for c in range(3))                  # (2K*TAU, 1) each
            ha = rq.ntt_scalar_mul(flat, a3)
            ha = (ha[0].reshape(2 * K, TAU, m, 24),
                  ha[1].reshape(2 * K, TAU, m, 24))
            ha = gl.sum_axis(ha, axis=1)                   # (2K, m, 24)

            def half(lo_idx, hi_idx):
                acc = gl.sum_axis((ha[0][lo_idx:hi_idx],
                                   ha[1][lo_idx:hi_idx]), axis=0)
                # challenged z per COO entry (see _build_head.half): scale
                # the nnz gathered columns instead of the full (t, n) grid
                zg_i = (zs[0][lo_idx:hi_idx][:, ucoo["cols"]],
                        zs[1][lo_idx:hi_idx][:, ucoo["cols"]])
                zc = tuple((zeta[0][lo_idx:hi_idx, :, c][:, ucoo["mats"]],
                            zeta[1][lo_idx:hi_idx, :, c][:, ucoo["mats"]])
                           for c in range(3))              # (Kh, nnz)
                zg = gl.sum_axis(rq.ntt_scalar_mul(zg_i, zc), axis=0)
                if ucoo["scalar"]:
                    sv = (ucoo["vals"][0][:, None], ucoo["vals"][1][:, None])
                    prod = gl.mul(sv, zg)
                else:
                    prod = rq.ntt_mul(ucoo["vals"], zg)
                s = B.segment_sum(
                    B.xp.moveaxis(B.xp.stack(
                        [prod[0] & gl.MASK16, prod[0] >> 16,
                         prod[1] & gl.MASK16, prod[1] >> 16]), 0, -1),
                    ucoo["rows"], m)
                mz = gl._combine_cols_small(B.xp.moveaxis(s, -1, 0))
                return gl.add(acc, mz)

            c1 = half(0, K)
            c2 = half(K, 2 * K)
            head_lo = B.xp.stack([eq1[0], c1[0], eq2[0], c2[0], eqb[0]])
            head_hi = B.xp.stack([eq1[1], c1[1], eq2[1], c2[1], eqb[1]])
            if self.t_layout:
                from .accel_t import bitrev_indices
                brev = B.xp.asarray(bitrev_indices(ccs.s))
                head = (B.xp.moveaxis(head_lo, -2, -1)[..., brev],
                        B.xp.moveaxis(head_hi, -2, -1)[..., brev])
                tail = (B.xp.moveaxis(flat[0], -2, -1)[..., brev],
                        B.xp.moveaxis(flat[1], -2, -1)[..., brev])
                return head, tail
            return (head_lo, head_hi), flat

        return fn

    def _build_head(self, tail, z_s, cm_i_s, alpha_s, zeta_s, beta_s, K,
                    zs_stack=None):
        """The 5-row fold head [eq_r1, c1, eq_r2, c2, eq_beta] in t-layout
        (5, 24, m), built in one jit that READS the already-t-layout tail:

          c_half = sum_{i,d} alpha_i^{d+1} f_hat[i][d]
                   + M^T-combined challenged Mz (unified COO, segment-summed
                     straight into bit-reversed positions)

        Replaces _build_g for the t-layout path: no (2K, TAU, m, 24)
        standard-layout stack, no 2 GB transpose, no donation needed — the
        round-1 build_g peaked at 12.3 GB (mem_audit); this peaks at the
        tail (read-only) + ~1 GB of temps."""
        ccs = self.ccs
        m, t, TAU_ = ccs.m, ccs.t, TAU
        r1 = [H.ntt_slots(r)[0] for r in cm_i_s[0].r]
        r2 = [H.ntt_slots(r)[0] for r in cm_i_s[K].r]
        eq_r1 = self.e.eq_table(r1, None)
        eq_r2 = self.e.eq_table(r2, None)
        eq_b = self.e.eq_table(beta_s, None)
        ucoo = self._unified_coo()
        from .accel_t import bitrev_indices
        brev = bitrev_indices(ccs.s)
        if not hasattr(self, "_ucoo_brev_rows"):
            with B.jax_mode():
                self._ucoo_brev_rows = B.xp.asarray(
                    brev[np.asarray(ucoo["rows"])])
                self._brev_m = B.xp.asarray(brev)

        with B.numpy_mode():
            apows = []
            for a in alpha_s:
                p = (1, 0, 0)
                for _d in range(TAU_):
                    p = H.fq3_mul(p, a)
                    apows.append(list(p))
            alpha_c = gl.from_int(np.array(apows, dtype=object))  # (2K*TAU,3)
            zeta_pows = np.empty((2 * K, t, 3), dtype=object)
            for i in range(2 * K):
                for j in range(t):
                    zeta_pows[i, j] = list(H.fq3_pow(zeta_s[i], j + 1))
            zeta_c = gl.from_int(zeta_pows)

        def fn(tl, zs, eq1, eq2, eqb, alpha, zeta):
            def tp(x):
                return (B.xp.moveaxis(x[0], 0, 1)[:, self._brev_m],
                        B.xp.moveaxis(x[1], 0, 1)[:, self._brev_m])

            def half(lo_idx, hi_idx):
                acc = None
                for idx in range(lo_idx * TAU_, hi_idx * TAU_):
                    a3 = tuple((alpha[0][idx, c], alpha[1][idx, c])
                               for c in range(3))
                    term = rq.ntt_scalar_mul_t((tl[0][idx], tl[1][idx]), a3)
                    acc = term if acc is None else gl.add(acc, term)
                # challenged z per COO ENTRY: only the nnz gathered columns
                # are ever read, so scale those instead of materializing
                # comb[j] = Σ_i ζ_i^{j+1} z_i over the full (t, n) grid
                # (~36x less work: nnz=68k vs t·n=2.5M)
                zg_i = (zs[0][lo_idx:hi_idx][:, ucoo["cols"]],
                        zs[1][lo_idx:hi_idx][:, ucoo["cols"]])
                zc = tuple((zeta[0][lo_idx:hi_idx, :, c][:, ucoo["mats"]],
                            zeta[1][lo_idx:hi_idx, :, c][:, ucoo["mats"]])
                           for c in range(3))        # (Kh, nnz) comps
                zg = gl.sum_axis(rq.ntt_scalar_mul(zg_i, zc), axis=0)
                if ucoo["scalar"]:
                    sv = (ucoo["vals"][0][:, None], ucoo["vals"][1][:, None])
                    prod = gl.mul(sv, zg)
                else:
                    prod = rq.ntt_mul(ucoo["vals"], zg)
                s = B.segment_sum(
                    B.xp.moveaxis(B.xp.stack(
                        [prod[0] & gl.MASK16, prod[0] >> 16,
                         prod[1] & gl.MASK16, prod[1] >> 16]), 0, -1),
                    self._ucoo_brev_rows, m)
                mz = gl._combine_cols_small(B.xp.moveaxis(s, -1, 0))
                mzt = (B.xp.moveaxis(mz[0], 0, 1), B.xp.moveaxis(mz[1], 0, 1))
                return gl.add(acc, mzt)

            c1 = half(0, K)
            c2 = half(K, 2 * K)
            e1, e2, eb = tp(eq1), tp(eq2), tp(eqb)
            return (B.xp.stack([e1[0], c1[0], e2[0], c2[0], eb[0]]),
                    B.xp.stack([e1[1], c1[1], e2[1], c2[1], eb[1]]))

        with B.jax_mode():
            zs = zs_stack if zs_stack is not None else (
                B.xp.stack([z[0] for z in z_s]),
                B.xp.stack([z[1] for z in z_s]))
        jf = self.e._jit(("build_head",), fn)
        with B.jax_mode():
            return jf(tail, zs, eq_r1, eq_r2, eq_b,
                      self.e.put(alpha_c), self.e.put(zeta_c))

    # -- composition ------------------------------------------------------
    def prove(self, acc, w_acc: DeviceWitness, cm_i, w_i: DeviceWitness,
              transcript, log=None, timings=None):
        import time
        t = time.time()

        def mark(name):
            nonlocal t
            now = time.time()
            if timings is not None:
                timings.setdefault(name, []).append(now - t)
            if log:
                log(f"  nifs.{name}: {now-t:.2f}s")
            t = now

        nifs_mod.sanity_check(self.ccs, self.p)
        nifs_mod.absorb_public_input(acc, cm_i, transcript)
        linearized, lin_proof, _ = self.lin_prove(cm_i, w_i, transcript,
                                                  log=log)
        mark("lin")
        z_l, lc_l, ws_l, dp_l, b_l = self.dec_prove(acc, w_acc, transcript,
                                                     log=log)
        mark("dec_l")
        z_r, lc_r, ws_r, dp_r, b_r = self.dec_prove(linearized, w_i,
                                                    transcript, log=log)
        mark("dec_r")
        folded, w0, fp = self.fold_prove(lc_l + lc_r, ws_l + ws_r,
                                         transcript, z_l + z_r, log=log,
                                         batches=(b_l, b_r))
        mark("fold")
        proof = {"linearization": lin_proof, "decomposition_l": dp_l,
                 "decomposition_r": dp_r, "folding": fp}
        return folded, w0, proof
