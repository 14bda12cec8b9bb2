"""Device (TPU) kernel engine for the prover hot path.

Design: the protocol flow and Fiat-Shamir transcript stay on host; the heavy
tensor work — sum-check round evaluations, MLE folding, Mz matvecs, Ajtai
commitments, eq tables, evaluation claims — runs as jitted device functions
with all large arrays device-resident between calls.  Only round messages
(a few ring elements) and challenges cross the host boundary each round.

Compilation strategy: per-(shape, kernel) jit with the persistent JAX
compilation cache; rounds below `tail_threshold` fall back to numpy on host
(tiny arrays, avoids long-tail compiles).
"""

from __future__ import annotations

import os

import numpy as np

from .. import backend as B
from ..field import goldilocks as gl
from ..ring import rq


def _machine_fingerprint() -> str:
    """Short stable id of THIS machine's CPU feature set.  XLA:CPU AOT
    artifacts are compiled for the build host's exact feature flags; loading
    them on a different machine aborts with 'Compile machine features ... vs
    host machine features' (the MULTICHIP_r02 timeout).  Keying the cache dir
    by the fingerprint makes cross-machine cache poisoning impossible."""
    import hashlib
    import platform
    feats = platform.machine()
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    feats += line
                    break
    except OSError:
        pass
    return hashlib.sha1(feats.encode()).hexdigest()[:10]


def _ensure_cache():
    """Persistent compile cache, keyed by backend platform + machine
    fingerprint (platform alone let the axon remote-compile target and
    local-CPU runs on different machines poison each other's AOT blobs)."""
    import jax
    plat = jax.default_backend()
    # Only XLA:CPU emits machine-specific AOT blobs; TPU/axon executables
    # target the chip, so their cache stays portable across hosts.
    suffix = f"_{_machine_fingerprint()}" if plat == "cpu" else ""
    if plat == "cpu":
        # v2: the unversioned cpu dir on shared /tmp accumulated AOT blobs
        # compiled on a DIFFERENT machine despite the fingerprint (XLA
        # loads them with a machine-feature-mismatch warning and can
        # miscompile / livelock); bumping the name orphans any poisoned
        # entries.  TPU executables target the chip (portable), so that
        # dir keeps its name — and its warm entries.
        cache = f"/tmp/latticeum_jax_cache_v2_{plat}{suffix}"
    else:
        cache = f"/tmp/latticeum_jax_cache_{plat}{suffix}"
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
    except Exception:
        pass


class DeviceEngine:
    """Jitted kernels over a fixed CCS. One instance per prover."""

    def __init__(self, ccs, params, tail_threshold: int = 512):
        _ensure_cache()
        import jax
        self.jax = jax
        self.ccs = ccs
        self.params = params
        self.tail = tail_threshold
        # per-point comb transient budget: the chunked fori serializes
        # npts*chunks trips, so a bigger budget = fewer, wider trips (more
        # VPU parallelism).  384 MB keeps the fold round-0 transients
        # ~3 GB next to the ~4 GB resident buffers (16 GB chip).
        self.sum_chunk_bytes = int(os.environ.get(
            "LATTICEUM_CHUNK_MB", "384")) << 20
        self._jits = {}
        # device copies of the CCS COO tensors (uploaded once)
        with B.jax_mode():
            self.M_dev = []
            for M in ccs.M:
                self.M_dev.append(dict(
                    rows=B.xp.asarray(np.asarray(M.rows)),
                    cols=B.xp.asarray(np.asarray(M.cols)),
                    vals=(B.xp.asarray(np.asarray(M.vals[0])),
                          B.xp.asarray(np.asarray(M.vals[1]))),
                    max_row=M.max_row,
                    scalar=not hasattr(M.vals[0], "ndim")
                    or np.asarray(M.vals[0]).ndim == 1,
                ))

    # -- helpers ---------------------------------------------------------
    def put(self, x):
        """Host numpy limb pair -> device."""
        return tuple(self.jax.device_put(np.asarray(a)) for a in x)

    def get(self, x):
        return tuple(np.asarray(a) for a in x)

    def _jit(self, key, fn, donate_argnums=()):
        if key not in self._jits:
            with B.jax_mode():
                self._jits[key] = self.jax.jit(
                    fn, donate_argnums=donate_argnums)
        return self._jits[key]

    # -- kernels ---------------------------------------------------------
    def matvecs(self, z_dev, out_rows):
        """All t M_j z on device -> (t, out_rows, 24)."""
        def fn(z, mats):
            outs = []
            for M in mats:
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
                    M["rows"], out_rows)
                outs.append(gl._combine_cols_small(B.xp.moveaxis(s, -1, 0)))
            return (B.xp.stack([o[0] for o in outs]),
                    B.xp.stack([o[1] for o in outs]))

        jf = self._jit(("matvecs", out_rows), lambda z: fn(z, self.M_dev))
        with B.jax_mode():
            return jf(z_dev)

    def eq_table(self, point, max_rows):
        """Device eq table from host Fq3 point list.

        The doubling runs ON DEVICE (one jit per (nv, max_rows)): numpy
        doubling at 2^17 rows costs ~0.5 s per table and each fold needs
        several tables.  Inputs are the stacked (nv, 2, 3) limbs of
        (r_i, 1-r_i), so one compile serves every fold."""
        from ..field import host as Hh
        nv = len(point)
        rows = 1 << nv
        if max_rows is not None:
            rows = min(rows, max_rows)

        n_dbl = (rows - 1).bit_length() if rows > 1 else 0

        def fn(rl, init):
            cur = init                            # (1, 24)
            for i in range(n_dbl):
                r = tuple((rl[0][i, 0, c, None], rl[1][i, 0, c, None])
                          for c in range(3))
                omr = tuple((rl[0][i, 1, c, None], rl[1][i, 1, c, None])
                            for c in range(3))
                low = rq.ntt_scalar_mul(cur, omr)
                high = rq.ntt_scalar_mul(cur, r)
                cur = (B.xp.concatenate([low[0], high[0]]),
                       B.xp.concatenate([low[1], high[1]]))
            return cur

        vals = np.empty((max(n_dbl, 1), 2, 3), dtype=object)
        vals[:] = 0
        for i, r in enumerate(point[:n_dbl]):
            vals[i, 0] = list(r)
            vals[i, 1] = list(Hh.fq3_sub((1, 0, 0), r))
        # truncated table: the skipped (top) variables contribute a global
        # prod(1 - r_j) factor to every surviving row — fold it into init
        tail = (1, 0, 0)
        for r in point[n_dbl:]:
            tail = Hh.fq3_mul(tail, Hh.fq3_sub((1, 0, 0), r))
        with B.numpy_mode():
            rl = gl.from_int(vals)
            init = gl.from_int(np.array([Hh.ntt_from_fq3(tail)],
                                        dtype=object))
        jf = self._jit(("eqtab", nv, rows), fn)
        with B.jax_mode():
            return jf(self.put(rl), self.put(init))

    def eval_mles_at(self, mles_dev, eq_dev):
        """<mle_k, eq> for stacked mles (k, n, 24): one contraction."""
        n = int(mles_dev[0].shape[-2])

        def fn(m, e):
            prod = rq.ntt_mul(m, (e[0][None, :n], e[1][None, :n]))
            return gl.sum_axis(prod, axis=-2)

        k = mles_dev[0].shape[0]
        jf = self._jit(("evalmle", k, n), fn)
        with B.jax_mode():
            out = jf(mles_dev, eq_dev)
        ints = gl.to_int(self.get(out))
        return [[int(v) for v in row] for row in ints]

    def sumcheck_round(self, mles_dev, degree, comb_key, comb_fn, consts_dev):
        """One round: returns (round_msg host rings, v0, v1, step device)."""
        def fn(cur, consts):
            lo, hi = cur
            n = lo.shape[-2]
            lo2 = lo.reshape(lo.shape[:-2] + (n // 2, 2, 24))
            hi2 = hi.reshape(hi.shape[:-2] + (n // 2, 2, 24))
            v0 = (lo2[..., 0, :], hi2[..., 0, :])
            v1 = (lo2[..., 1, :], hi2[..., 1, :])
            step = gl.sub(v1, v0)
            pts_lo = [v0[0], v1[0]]
            pts_hi = [v0[1], v1[1]]
            vals = v1
            for _t in range(2, degree + 1):
                vals = gl.add(vals, step)
                pts_lo.append(vals[0])
                pts_hi.append(vals[1])
            stacked = (B.xp.stack(pts_lo, axis=-3),
                       B.xp.stack(pts_hi, axis=-3))
            evals = comb_fn(stacked, consts)
            sums = gl.sum_axis(evals, axis=-2)
            return sums, v0, step

        n = int(mles_dev[0].shape[-2])
        k = int(mles_dev[0].shape[0])
        jf = self._jit((comb_key, k, n, degree), fn)
        with B.jax_mode():
            sums, v0, step = jf(mles_dev, consts_dev)
        ints = gl.to_int(self.get(sums))
        msg = [[int(v) for v in row] for row in ints]
        return msg, v0, step

    def fold_mles(self, v0, step, r_fq3):
        """next = v0 + r*step on device."""
        from ..poly import mle as mle_mod

        def fn(v0_, step_, r_limbs):
            return gl.add(v0_, rq.ntt_scalar_mul(step_, r_limbs))

        shape = tuple(int(s) for s in v0[0].shape)
        jf = self._jit(("fold", shape), fn)
        with B.numpy_mode():
            r_limbs = mle_mod.fq3_const(r_fq3)
        with B.jax_mode():
            return jf(v0, step, self.put_small(r_limbs))

    def trunc(self, x, rows):
        return (x[0][:rows], x[1][:rows])

    def put_small(self, tree):
        return self.jax.tree_util.tree_map(
            lambda a: self.jax.device_put(np.asarray(a)), tree)

    def sumcheck(self, transcript, mles_dev, nv, degree, comb_key, comb_fn,
                 consts_dev, log=None, eq_info=None):
        """Full sum-check: device rounds down to `tail` size, then numpy."""
        import time
        from ..poly import sumcheck as sc
        transcript.absorb_u64(nv)
        transcript.absorb_u64(degree)
        proof = []
        chals = []
        cur = mles_dev
        rounds_done = 0
        while rounds_done < nv and int(cur[0].shape[-2]) // 2 >= self.tail:
            t0 = time.time()
            msg, v0, step = self.sumcheck_round(cur, degree, comb_key,
                                                comb_fn, consts_dev)
            transcript.absorb_slice(msg)
            proof.append(msg)
            r = transcript.get_challenge()
            transcript.absorb_fq3(r)
            chals.append(r)
            cur = self.fold_mles(v0, step, r)
            rounds_done += 1
            if log:
                log(f"dev round {rounds_done-1}: {time.time()-t0:.2f}s")
        # numpy tail (transcript already advanced through `rounds_done`)
        if rounds_done < nv:
            cur_host = self.get(cur)
            consts_host = self.jax.tree_util.tree_map(np.asarray, consts_dev)
            with B.numpy_mode():
                tail_proof, tail_chals, final = _numpy_tail(
                    transcript, cur_host, nv, rounds_done, degree,
                    lambda vals: comb_fn(vals, consts_host),
                    eq_info=eq_info, prior_chals=chals)
            proof.extend(tail_proof)
            chals.extend(tail_chals)
            cur = final
        return proof, chals, cur


def _numpy_tail(transcript, mles, nv, start_round, degree, comb,
                eq_info=None, prior_chals=()):
    """Remaining sum-check rounds on host (no nvars/degree re-absorption)."""
    from ..field import host as H
    from ..poly import mle as mle_mod
    proof, chals = [], []
    cur = mles
    for _r in range(start_round, nv):
        lo, hi = cur
        n = lo.shape[-2]
        if n == 1:
            rest = 1 << (nv - _r)
            z = np.zeros(lo.shape[:-2] + (rest - 1, 24), lo.dtype)
            lo = np.concatenate([lo, z], axis=-2)
            hi = np.concatenate([hi, z], axis=-2)
            if eq_info is not None:
                beta_list, eq_index = eq_info
                all_chals = list(prior_chals) + chals
                scale = (1, 0, 0)
                for rj, bj in zip(all_chals, beta_list):
                    xy = H.fq3_mul(rj, bj)
                    scale = H.fq3_mul(scale, H.fq3_sub(
                        H.fq3_add(H.fq3_add(xy, xy), (1, 0, 0)),
                        H.fq3_add(rj, bj)))
                tab = mle_mod.build_eq_table(beta_list[_r:])
                from ..ring import rq as rq_mod
                tab = rq_mod.ntt_scalar_mul(tab, mle_mod.fq3_const(scale))
                lo[eq_index] = tab[0]
                hi[eq_index] = tab[1]
            cur = (lo, hi)
            n = rest
        lo2 = lo.reshape(lo.shape[:-2] + (n // 2, 2, 24))
        hi2 = hi.reshape(hi.shape[:-2] + (n // 2, 2, 24))
        v0 = (lo2[..., 0, :], hi2[..., 0, :])
        v1 = (lo2[..., 1, :], hi2[..., 1, :])
        pts_lo, pts_hi = [v0[0], v1[0]], [v0[1], v1[1]]
        step = gl.sub(v1, v0)
        vals = v1
        for _t in range(2, degree + 1):
            vals = gl.add(vals, step)
            pts_lo.append(vals[0])
            pts_hi.append(vals[1])
        stacked = (np.stack(pts_lo, axis=-3), np.stack(pts_hi, axis=-3))
        evals = comb(stacked)
        sums = gl.sum_axis(evals, axis=-2)
        ints = gl.to_int(sums)
        msg = [[int(v) for v in row] for row in ints]
        transcript.absorb_slice(msg)
        proof.append(msg)
        r = transcript.get_challenge()
        transcript.absorb_fq3(r)
        chals.append(r)
        cur = gl.add(v0, rq.ntt_scalar_mul(step, mle_mod.fq3_const(r)))
    return proof, chals, cur
