"""Pallas TPU kernels for the prover's regular hot loops.

First kernel: batched Poseidon2 width-8 permutation over uint32 limb pairs —
the Merkle-leaf workhorse (8192 pages x 64 sponge steps per memory
commitment).  The whole 30-round permutation runs on-chip per block: state
tiles stay in VMEM, each lane column is a (block, 1) vector on the VPU, and
the only HBM traffic is one load + one store of the state.

All arithmetic is the branch-free uint32 limb code from field/goldilocks —
exact Goldilocks, no native u64 needed.  Falls back to interpret mode off-TPU
(used by the tests).
"""

from __future__ import annotations

import functools

import numpy as np

from ..crypto import consts

P_LO = np.uint32(1)
P_HI = np.uint32(0xFFFFFFFF)
EPS = np.uint32(0xFFFFFFFF)
MASK16 = np.uint32(0xFFFF)


def _kernel_body(jnp):
    """Limb arithmetic primitives specialized for the kernel (traced jnp)."""

    def addc(a, b):
        s = a + b
        return s, (s < a).astype(jnp.uint32)

    def subb(a, b):
        d = a - b
        return d, (a < b).astype(jnp.uint32)

    def cond_sub_p(lo, hi):
        m = (hi == P_HI) & (lo >= P_LO)
        return jnp.where(m, lo - P_LO, lo), jnp.where(m, hi - P_HI, hi)

    def fadd(a, b):
        lo, c0 = addc(a[0], b[0])
        hi1, c1 = addc(a[1], b[1])
        hi, c2 = addc(hi1, c0)
        ov = c1 + c2
        lo2, c = addc(lo, EPS)
        hi2 = hi + c
        lo = jnp.where(ov > 0, lo2, lo)
        hi = jnp.where(ov > 0, hi2, hi)
        return cond_sub_p(lo, hi)

    def mul32(a, b):
        a0, a1 = a & MASK16, a >> 16
        b0, b1 = b & MASK16, b >> 16
        p00, p01, p10, p11 = a0 * b0, a0 * b1, a1 * b0, a1 * b1
        mid = (p00 >> 16) + (p01 & MASK16) + (p10 & MASK16)
        lo = (p00 & MASK16) | (mid << 16)
        hi = p11 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)
        return lo, hi

    def fmul(a, b):
        l0, h0 = mul32(a[0], b[0])
        l1, h1 = mul32(a[0], b[1])
        l2, h2 = mul32(a[1], b[0])
        l3, h3 = mul32(a[1], b[1])
        r0 = l0
        r1a, c0 = addc(h0, l1)
        r1, c1 = addc(r1a, l2)
        r2a, c2 = addc(h1, h2)
        r2b, c3 = addc(r2a, l3)
        r2, c4 = addc(r2b, c0 + c1)
        r3 = h3 + c2 + c3 + c4
        # reduce128
        tlo, b0_ = subb(r0, r3)
        thi1, b1_ = subb(r1, jnp.zeros_like(r1))
        thi, b2_ = subb(thi1, b0_)
        bw = b1_ + b2_
        tlo2, bb = subb(tlo, EPS)
        thi2 = thi - bb
        tlo = jnp.where(bw > 0, tlo2, tlo)
        thi = jnp.where(bw > 0, thi2, thi)
        elo, e_b = subb(jnp.zeros_like(r2), r2)
        ehi = r2 - e_b
        lo, c0 = addc(tlo, elo)
        hi1, c1 = addc(thi, ehi)
        hi, c2 = addc(hi1, c0)
        ov = c1 + c2
        lo2, c = addc(lo, EPS)
        hi2 = hi + c
        lo = jnp.where(ov > 0, lo2, lo)
        hi = jnp.where(ov > 0, hi2, hi)
        return cond_sub_p(lo, hi)

    def sbox(x):
        x2 = fmul(x, x)
        x4 = fmul(x2, x2)
        x6 = fmul(x4, x2)
        return fmul(x6, x)

    return fadd, fmul, sbox


def _const_pair(jnp, v):
    return (jnp.uint32(v & 0xFFFFFFFF), jnp.uint32(v >> 32))


def make_perm8_kernel():
    """Returns a pallas_call-able f(lo (n,8) u32, hi (n,8) u32) -> (lo, hi)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fadd, fmul, sbox = _kernel_body(jnp)

    W8I = consts.W8_EXTERNAL_INITIAL
    W8T = consts.W8_EXTERNAL_TERMINAL
    INT22 = consts.INTERNAL_22
    DIAG8 = consts.DIAG_8

    def mds8(cols):
        out = []
        for b in range(0, 8, 4):
            c0, c1, c2, c3 = cols[b:b + 4]
            d0 = fadd(fadd(fadd(c0, c0), fadd(c1, fadd(c1, c1))),
                      fadd(c2, c3))
            d1 = fadd(fadd(c0, fadd(c1, c1)),
                      fadd(fadd(c2, fadd(c2, c2)), c3))
            d2 = fadd(fadd(c0, c1),
                      fadd(fadd(c2, c2), fadd(c3, fadd(c3, c3))))
            d3 = fadd(fadd(fadd(c0, fadd(c0, c0)), c1), fadd(c2, fadd(c3, c3)))
            out.extend([d0, d1, d2, d3])
        sums = [fadd(out[k], out[k + 4]) for k in range(4)]
        return [fadd(out[i], sums[i % 4]) for i in range(8)]

    def kernel(lo_ref, hi_ref, out_lo_ref, out_hi_ref):
        cols = [(lo_ref[:, i], hi_ref[:, i]) for i in range(8)]
        cols = mds8(cols)
        for r in range(4):
            cols = [sbox(fadd(c, _const_pair(jnp, W8I[r][i])))
                    for i, c in enumerate(cols)]
            cols = mds8(cols)
        for r in range(22):
            c0 = sbox(fadd(cols[0], _const_pair(jnp, INT22[r])))
            cols = [c0] + cols[1:]
            tot = cols[0]
            for c in cols[1:]:
                tot = fadd(tot, c)
            cols = [fadd(fmul(c, _const_pair(jnp, DIAG8[i])), tot)
                    for i, c in enumerate(cols)]
        for r in range(4):
            cols = [sbox(fadd(c, _const_pair(jnp, W8T[r][i])))
                    for i, c in enumerate(cols)]
            cols = mds8(cols)
        for i in range(8):
            out_lo_ref[:, i] = cols[i][0]
            out_hi_ref[:, i] = cols[i][1]

    @functools.partial(jax.jit, static_argnames=("interpret",))
    def perm8_pallas(lo, hi, interpret=False):
        n = lo.shape[0]
        return pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((n, 8), jnp.uint32),
                       jax.ShapeDtypeStruct((n, 8), jnp.uint32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            interpret=interpret,
        )(lo, hi)

    return perm8_pallas
