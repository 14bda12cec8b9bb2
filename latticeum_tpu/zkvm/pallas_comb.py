"""Pallas TPU kernels for the fold sum-check round comb bodies.

Why (measured, scripts/tpu_comb_probe.py + bench_verbose_r05_cold.log):
the XLA round kernels run ~10x off the chip's limits — a single fused
gl.mul streams at ~340 GB/s (the chip's effective HBM rate), but the comb
bodies chain ~10 field muls per element and XLA spills intermediates
between fusion groups, multiplying HBM traffic; the packed ntt_mul_t
additionally pays a 24->(8,3) retile per op (4.4x vs gl.mul at equal
traffic).  A Pallas kernel holds the whole per-element chain in VMEM:
each input element is read from HBM exactly once, and the only writes are
the folded halves (round >= 1) and the tiny per-point sums.

Math is identical to the XLA comp-split branch in accel_rounds.py
(mirroring latticefold/src/nifs/folding/utils.rs:196-321): round r of the
fold sum-check evaluates, for the 2K*TAU-row f_hat tail,

    S_h(t) = sum_x Tb(x) * sum_rows mu_row * f_t(x) * prod_b (f_t(x)^2 - b^2)

at points t (b_small=2 -> 4 points; round 0 skips t=0,1 where h vanishes
identically on honest digit witnesses).  All arithmetic is exact
uint32-limb Goldilocks (field/goldilocks.py) on Fq3 component triples —
field sums reassociate freely (exact mod p), so the row-tile/column-tile
accumulation order cannot change results; messages are bit-identical to
the XLA path (on-chip oracle check in scripts/pallas_ab.py).

Layouts: Mosaic rejects sublane-crossing reshapes, so the kernels carry
the tail in the C-LAYOUT (rows, 3, 8, m) — Fq3 component major, slots,
then the minor hypercube axis — where every access is a plain slice.
The MLE stack is split halves (A, B) with the logical array
X = concat(A, B) along the minor axis; a round >= 1 kernel folds at the
challenge (f = A + r*(B - A)), evaluates the comb on (f_low, f_high),
and emits the new halves — fold + comb fused, nothing intermediate ever
touching HBM.  Round 0 reads (A, B) as (v0, v1) directly and emits only
sums.  Sums come out as (npts, 3, 8) (comp-major); accel_rounds repacks
to the slot-major 24 message form in plain XLA.
"""

from __future__ import annotations

import numpy as np

from .. import backend as B
from ..field import fq3, goldilocks as gl

P = gl.P


def to_c_layout(x24):
    """(rows, 24, m) pair -> (rows, 3, 8, m) comp-major pair (XLA-side)."""
    lo, hi = x24
    r, _, m = lo.shape
    return (B.xp.moveaxis(lo.reshape(r, 8, 3, m), 2, 1),
            B.xp.moveaxis(hi.reshape(r, 8, 3, m), 2, 1))


def from_c_layout(xc):
    """(rows, 3, 8, m) pair -> (rows, 24, m) pair (XLA-side)."""
    lo, hi = xc
    r, _, _, m = lo.shape
    return (B.xp.moveaxis(lo, 1, 2).reshape(r, 24, m),
            B.xp.moveaxis(hi, 1, 2).reshape(r, 24, m))


def _bsq_consts(b_small):
    return [((np.uint32((b * b) % P & 0xFFFFFFFF)),
             (np.uint32(((b * b) % P) >> 32))) for b in range(1, b_small)]


def _sum_axis_i32(a, axis):
    """gl.sum_axis's small path with SIGNED accumulation: Mosaic has no
    unsigned reductions.  Exact for <= 2^15 terms (16-bit columns sum to
    < 2^31, value-preserving through the int32 view)."""
    lo, hi = a
    assert lo.shape[axis] <= (1 << 15)
    cols = B.xp.stack(
        [lo & gl.MASK16, lo >> 16, hi & gl.MASK16, hi >> 16], axis=0)
    csum = B.xp.sum(cols.astype(B.xp.int32), axis=axis + 1
                    if axis >= 0 else axis).astype(np.uint32)
    return gl._combine_cols_small(csum)


def _comps(loaded):
    """(RT, 3, 8, CT) loaded pair -> fq3 triple of (RT, 8, CT) pairs."""
    lo, hi = loaded
    return tuple((lo[:, k], hi[:, k]) for k in range(3))


def _accum_h(v0_3, step_3, mu3, Tb3, bsq, pt0, npts, slo, shi):
    """Accumulate this tile's h-part contributions into the (npts, 3, 8)
    sums refs: ev_t = mu*f_t * prod_b (f_t^2 - b^2); row-sum; Tb-weight;
    column-sum.  f_t advances by exact adds (f_{t+1} = f_t + step)."""
    a3 = fq3.mul(mu3, v0_3)
    b3 = fq3.mul(mu3, step_3)
    f = v0_3
    mf = a3
    for _ in range(pt0):
        f = fq3.add(f, step_3)
        mf = fq3.add(mf, b3)
    for t in range(pt0, npts):
        fsq = fq3.square(f)
        ev = mf
        for bb in bsq:
            factor = (gl.sub(fsq[0], bb), fsq[1], fsq[2])
            ev = fq3.mul(ev, factor)
        evs = tuple(_sum_axis_i32(ev[c], 0) for c in range(3))  # (8, C)
        evs = fq3.mul(evs, Tb3)
        s3 = tuple(_sum_axis_i32(evs[c], -1) for c in range(3))  # (8,)
        for k in range(3):
            new = gl.add((slo[t, k], shi[t, k]), s3[k])
            slo[t, k] = new[0]
            shi[t, k] = new[1]
        if t + 1 < npts:
            f = fq3.add(f, step_3)
            mf = fq3.add(mf, b3)


def fold_round0_pallas(A, B_, Tb, mu, *, b_small, row_tile=18,
                       col_tile=256, interpret=False):
    """Round-0 comb sums (no fold, zero-skip points): X = concat(A, B_),
    v0 = A, v1 = B_ — all in c-layout (rows, 3, 8, q).
    Tb: ((3, 8, q) lo, hi).  Returns ((npts, 3, 8) lo, hi)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = int(A[0].shape[0])
    q = int(A[0].shape[-1])
    npts = 2 * b_small
    pt0 = 2
    assert rows % row_tile == 0 and q % col_tile == 0, (rows, q)
    gi, gj = rows // row_tile, q // col_tile
    bsq = _bsq_consts(b_small)
    RT, CT = row_tile, col_tile

    def kernel(alo, ahi, blo, bhi, tblo, tbhi, mlo, mhi, slo, shi):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when((i == 0) & (j == 0))
        def _():
            slo[...] = B.xp.zeros_like(slo)
            shi[...] = B.xp.zeros_like(shi)

        mrl = mlo[pl.ds(i * RT, RT), :]
        mrh = mhi[pl.ds(i * RT, RT), :]
        mu3 = tuple((mrl[:, k][:, None, None],
                     mrh[:, k][:, None, None]) for k in range(3))
        Tb3 = tuple((tblo[k], tbhi[k]) for k in range(3))     # (8, C)
        v0_3 = _comps((alo[...], ahi[...]))
        v1_3 = _comps((blo[...], bhi[...]))
        step_3 = fq3.sub(v1_3, v0_3)
        _accum_h(v0_3, step_3, mu3, Tb3, bsq, pt0, npts, slo, shi)

    blk = pl.BlockSpec((RT, 3, 8, CT), lambda i, j: (i, 0, 0, j),
                       memory_space=pltpu.VMEM)
    tbs = pl.BlockSpec((3, 8, CT), lambda i, j: (0, 0, j),
                       memory_space=pltpu.VMEM)
    mus = pl.BlockSpec((rows, 3), lambda i, j: (0, 0),
                       memory_space=pltpu.VMEM)
    sus = pl.BlockSpec((npts, 3, 8), lambda i, j: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    slo, shi = pl.pallas_call(
        kernel,
        grid=(gi, gj),
        in_specs=[blk, blk, blk, blk, tbs, tbs, mus, mus],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_specs=(sus, sus),
        out_shape=(jax.ShapeDtypeStruct((npts, 3, 8), np.uint32),
                   jax.ShapeDtypeStruct((npts, 3, 8), np.uint32)),
        interpret=interpret,
    )(A[0], A[1], B_[0], B_[1], Tb[0], Tb[1], mu[0], mu[1])
    return slo, shi


def fold_roundr_pallas(A, B_, Tb, mu, r3, *, b_small, row_tile=18,
                      col_tile=256, interpret=False):
    """Round r >= 1: fold X = concat(A, B_) at challenge r (f = A + r*(B_
    - A)), comb on (f_low, f_high), emit the new halves — c-layout.

    A, B_: ((rows, 3, 8, 2q) lo, hi); Tb: ((3, 8, q) lo, hi);
    mu: ((rows, 3) lo, hi); r3: ((1, 3) lo, hi).
    Returns (sums, A', B') with A'/B' ((rows, 3, 8, q) pairs)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = int(A[0].shape[0])
    m2 = int(A[0].shape[-1])
    q = m2 // 2
    npts = 2 * b_small
    assert rows % row_tile == 0 and q % col_tile == 0, (rows, q)
    gi, gj = rows // row_tile, q // col_tile
    jq = q // col_tile
    bsq = _bsq_consts(b_small)
    RT, CT = row_tile, col_tile

    def kernel(al1, ah1, al2, ah2, bl1, bh1, bl2, bh2,
               tblo, tbhi, mlo, mhi, rlo, rhi,
               slo, shi, oal, oah, obl, obh):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when((i == 0) & (j == 0))
        def _():
            slo[...] = B.xp.zeros_like(slo)
            shi[...] = B.xp.zeros_like(shi)

        rf = tuple((rlo[0, k], rhi[0, k]) for k in range(3))
        mrl = mlo[pl.ds(i * RT, RT), :]
        mrh = mhi[pl.ds(i * RT, RT), :]
        mu3 = tuple((mrl[:, k][:, None, None],
                     mrh[:, k][:, None, None]) for k in range(3))
        Tb3 = tuple((tblo[k], tbhi[k]) for k in range(3))

        a_lo = _comps((al1[...], ah1[...]))
        b_lo = _comps((bl1[...], bh1[...]))
        f_low = fq3.add(a_lo, fq3.mul(rf, fq3.sub(b_lo, a_lo)))
        a_hi = _comps((al2[...], ah2[...]))
        b_hi = _comps((bl2[...], bh2[...]))
        f_high = fq3.add(a_hi, fq3.mul(rf, fq3.sub(b_hi, a_hi)))

        for k in range(3):
            oal[:, k] = f_low[k][0]
            oah[:, k] = f_low[k][1]
            obl[:, k] = f_high[k][0]
            obh[:, k] = f_high[k][1]

        step_3 = fq3.sub(f_high, f_low)
        _accum_h(f_low, step_3, mu3, Tb3, bsq, 0, npts, slo, shi)

    lo_s = pl.BlockSpec((RT, 3, 8, CT), lambda i, j: (i, 0, 0, j),
                        memory_space=pltpu.VMEM)
    hi_s = pl.BlockSpec((RT, 3, 8, CT), lambda i, j: (i, 0, 0, j + jq),
                        memory_space=pltpu.VMEM)
    tbs = pl.BlockSpec((3, 8, CT), lambda i, j: (0, 0, j),
                       memory_space=pltpu.VMEM)
    mus = pl.BlockSpec((rows, 3), lambda i, j: (0, 0),
                       memory_space=pltpu.VMEM)
    rs = pl.BlockSpec((1, 3), lambda i, j: (0, 0),
                      memory_space=pltpu.VMEM)
    sus = pl.BlockSpec((npts, 3, 8), lambda i, j: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    ous = pl.BlockSpec((RT, 3, 8, CT), lambda i, j: (i, 0, 0, j),
                       memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(gi, gj),
        in_specs=[lo_s, lo_s, hi_s, hi_s, lo_s, lo_s, hi_s, hi_s,
                  tbs, tbs, mus, mus, rs, rs],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_specs=(sus, sus, ous, ous, ous, ous),
        out_shape=(jax.ShapeDtypeStruct((npts, 3, 8), np.uint32),
                   jax.ShapeDtypeStruct((npts, 3, 8), np.uint32),
                   jax.ShapeDtypeStruct((rows, 3, 8, q), np.uint32),
                   jax.ShapeDtypeStruct((rows, 3, 8, q), np.uint32),
                   jax.ShapeDtypeStruct((rows, 3, 8, q), np.uint32),
                   jax.ShapeDtypeStruct((rows, 3, 8, q), np.uint32)),
        interpret=interpret,
    )(A[0], A[1], A[0], A[1], B_[0], B_[1], B_[0], B_[1],
      Tb[0], Tb[1], mu[0], mu[1], r3[0], r3[1])
    sums = (outs[0], outs[1])
    return sums, (outs[2], outs[3]), (outs[4], outs[5])


# ---------------------------------------------------------------------------
# linearization round kernels
# ---------------------------------------------------------------------------
#
# g = eq(beta, x) * sum_i c_i prod_{j in S_i} Mz_j(x)
# (latticefold/src/nifs/linearization/utils.rs:66-107).  The eq factor is
# Gruen-split (accel_rounds), so the kernel evaluates only
# q(t) = sum_i c_i prod_j Mz_j(t) per column, weights by the pair-sum
# table Tc and column-sums.  The zkvm builder's c_i are all +-1 scalars
# (signs passed statically; accel_rounds falls back to the XLA path
# otherwise), multisets are static index tuples, and every product is a
# chain of static row slices — no gathers.  Mz rows travel as c-layout
# halves exactly like the fold tail.


def _lin_point(f3, S, signs):
    """q(point) for comps f3 of (rows, 8, C): returns (8, C) comps."""
    acc = None
    for S_i, sg in zip(S, signs):
        prod = tuple((f3[c][0][S_i[0]], f3[c][1][S_i[0]])
                     for c in range(3))
        for j in S_i[1:]:
            prod = fq3.mul(prod, tuple((f3[c][0][j], f3[c][1][j])
                                       for c in range(3)))
        if acc is None:
            acc = prod if sg > 0 else fq3.neg(prod)
        else:
            acc = fq3.add(acc, prod) if sg > 0 else fq3.sub(acc, prod)
    return acc


def _lin_accum(v0_3, step_3, Tc3, S, signs, npts, slo, shi):
    # fori over the evaluation points: ONE comb instance in the Mosaic
    # program (the fully unrolled npts_q=8-point body compiled for ~6 min
    # per shape); f advances by exact adds in the carry
    import jax

    def body(t, f):
        qv = _lin_point(f, S, signs)
        qv = fq3.mul(qv, Tc3)
        s3 = tuple(_sum_axis_i32(qv[c], -1) for c in range(3))  # (8,)
        for k in range(3):
            new = gl.add((slo[t, k], shi[t, k]), s3[k])
            slo[t, k] = new[0]
            shi[t, k] = new[1]
        return fq3.add(f, step_3)

    jax.lax.fori_loop(0, npts, body, v0_3)


def lin_round0_pallas(A, B_, Tc, S, signs, npts, *, col_tile=128,
                      interpret=False):
    """Lin round 0 (no fold): X = concat(A, B_) c-layout (rows, 3, 8, q),
    v0 = A, v1 = B_; Tc ((3, 8, q) lo, hi).  Returns (npts, 3, 8) sums."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = int(A[0].shape[0])
    q = int(A[0].shape[-1])
    ct = min(col_tile, q)
    assert q % ct == 0
    gj = q // ct

    def kernel(alo, ahi, blo, bhi, tlo, thi, slo, shi):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            slo[...] = B.xp.zeros_like(slo)
            shi[...] = B.xp.zeros_like(shi)

        Tc3 = tuple((tlo[k], thi[k]) for k in range(3))
        v0_3 = _comps((alo[...], ahi[...]))
        v1_3 = _comps((blo[...], bhi[...]))
        step_3 = fq3.sub(v1_3, v0_3)
        _lin_accum(v0_3, step_3, Tc3, S, signs, npts, slo, shi)

    blk = pl.BlockSpec((rows, 3, 8, ct), lambda j: (0, 0, 0, j),
                       memory_space=pltpu.VMEM)
    tbs = pl.BlockSpec((3, 8, ct), lambda j: (0, 0, j),
                       memory_space=pltpu.VMEM)
    sus = pl.BlockSpec((npts, 3, 8), lambda j: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    slo, shi = pl.pallas_call(
        kernel,
        grid=(gj,),
        in_specs=[blk, blk, blk, blk, tbs, tbs],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_specs=(sus, sus),
        out_shape=(jax.ShapeDtypeStruct((npts, 3, 8), np.uint32),
                   jax.ShapeDtypeStruct((npts, 3, 8), np.uint32)),
        interpret=interpret,
    )(A[0], A[1], B_[0], B_[1], Tc[0], Tc[1])
    return slo, shi


def lin_roundr_pallas(A, B_, Tc, r3, S, signs, npts, *, col_tile=128,
                      interpret=False):
    """Lin round r >= 1: fold X = concat(A, B_) at r3 ((1, 3) pair), comb
    on (f_low, f_high), emit new halves.  Returns (sums, A', B')."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = int(A[0].shape[0])
    m2 = int(A[0].shape[-1])
    q = m2 // 2
    ct = min(col_tile, q)
    assert q % ct == 0
    gj = q // ct
    jq = q // ct

    def kernel(al1, ah1, al2, ah2, bl1, bh1, bl2, bh2, tlo, thi,
               rlo, rhi, slo, shi, oal, oah, obl, obh):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            slo[...] = B.xp.zeros_like(slo)
            shi[...] = B.xp.zeros_like(shi)

        rf = tuple((rlo[0, k], rhi[0, k]) for k in range(3))
        Tc3 = tuple((tlo[k], thi[k]) for k in range(3))
        a_lo = _comps((al1[...], ah1[...]))
        b_lo = _comps((bl1[...], bh1[...]))
        f_low = fq3.add(a_lo, fq3.mul(rf, fq3.sub(b_lo, a_lo)))
        a_hi = _comps((al2[...], ah2[...]))
        b_hi = _comps((bl2[...], bh2[...]))
        f_high = fq3.add(a_hi, fq3.mul(rf, fq3.sub(b_hi, a_hi)))
        for k in range(3):
            oal[:, k] = f_low[k][0]
            oah[:, k] = f_low[k][1]
            obl[:, k] = f_high[k][0]
            obh[:, k] = f_high[k][1]
        step_3 = fq3.sub(f_high, f_low)
        _lin_accum(f_low, step_3, Tc3, S, signs, npts, slo, shi)

    lo_s = pl.BlockSpec((rows, 3, 8, ct), lambda j: (0, 0, 0, j),
                        memory_space=pltpu.VMEM)
    hi_s = pl.BlockSpec((rows, 3, 8, ct), lambda j: (0, 0, 0, j + jq),
                        memory_space=pltpu.VMEM)
    tbs = pl.BlockSpec((3, 8, ct), lambda j: (0, 0, j),
                       memory_space=pltpu.VMEM)
    rs = pl.BlockSpec((1, 3), lambda j: (0, 0),
                      memory_space=pltpu.VMEM)
    sus = pl.BlockSpec((npts, 3, 8), lambda j: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    ous = pl.BlockSpec((rows, 3, 8, ct), lambda j: (0, 0, 0, j),
                       memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(gj,),
        in_specs=[lo_s, lo_s, hi_s, hi_s, lo_s, lo_s, hi_s, hi_s,
                  tbs, tbs, rs, rs],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_specs=(sus, sus, ous, ous, ous, ous),
        out_shape=(jax.ShapeDtypeStruct((npts, 3, 8), np.uint32),
                   jax.ShapeDtypeStruct((npts, 3, 8), np.uint32),
                   jax.ShapeDtypeStruct((rows, 3, 8, q), np.uint32),
                   jax.ShapeDtypeStruct((rows, 3, 8, q), np.uint32),
                   jax.ShapeDtypeStruct((rows, 3, 8, q), np.uint32),
                   jax.ShapeDtypeStruct((rows, 3, 8, q), np.uint32)),
        interpret=interpret,
    )(A[0], A[1], A[0], A[1], B_[0], B_[1], B_[0], B_[1],
      Tc[0], Tc[1], r3[0], r3[1])
    return (outs[0], outs[1]), (outs[2], outs[3]), (outs[4], outs[5])
