"""MXU digit-plane contraction for batched ring inner products.

The NIFS evaluation claims are large contractions of RqNTT vectors:

    u[j, k] = Σ_n  A[j, n] ⊙ B[k, n]        (slot-wise Fq3 products)

On the VPU this costs one 24-limb Goldilocks ring mul per (j, k, n) term
(`accel_nifs.eval_claims*`, ~2.8 s/fold at production scale).  The MXU
formulation decomposes every u64 field limb into 9 balanced base-256
digits (8 int8 digits + one {0,1} carry plane, so every canonical value
< 2^64 is exactly representable), turning the contraction over n into ONE
int8×int8→int32 batched matmul per fold:

    C[s, (j,i,dA), (k,i',dB)] = Σ_n  digit_dA(A[j,n,s,i]) · digit_dB(B[k,n,s,i'])

with s = the 8 NTT slots batched, i/i' the Fq3 components, dA/dB the digit
planes.  |digit| ≤ 128 so each int32 accumulator stays exact for n up to
2^16 (the kernel chunks larger n).  The Fq3 cross-component structure
(c0 = a0b0 + W(a1b2 + a2b1), …, W = 2^40 the nonresidue) and the digit
weights 2^{8(dA+dB)} fold into per-plane constants applied AFTER the
matmul on the tiny (slots, j, k) output — so the entire O(n) work runs on
the MXU at int8 rates.

Bit-exact with the VPU path (tests/test_mxu.py fuzzes vs the host oracle).
Measured on one TPU v5e chip: 62.9x on the production evaluation-claims
shape (bench/results/mxu_ab_r03.jsonl).

Reference semantics: evaluate_mles / calculate_Mz_mles claim evaluations
(latticeum/crates/latticefold/src/utils/mle_helpers.rs:65-146).
"""

from __future__ import annotations

import numpy as np

from .. import backend as B
from . import goldilocks as gl

P = gl.P
W_NONRESIDUE = 1 << 40
NPLANES = 9          # 8 balanced base-256 digits + 1 carry plane
CHUNK_N = 1 << 16    # contraction chunk: 2^14 * 2^16 * 3 terms < 2^31


def digit_planes(x):
    """(lo, hi) uint32 limbs, shape S -> int8 digit planes, shape S + (9,).

    Balanced base-256: value = Σ_{i<8} d_i 256^i + d_8 · 2^64 with
    d_i ∈ [-128, 127] and d_8 ∈ {0, 1}.  Branch-free carry chain.
    """
    lo, hi = x
    xp = B.xp
    bytes_ = [((lo >> np.uint32(8 * i)) & np.uint32(0xFF)).astype(np.int32)
              for i in range(4)]
    bytes_ += [((hi >> np.uint32(8 * i)) & np.uint32(0xFF)).astype(np.int32)
               for i in range(4)]
    digits = []
    carry = xp.zeros_like(bytes_[0])
    for i in range(8):
        d = bytes_[i] + carry
        m = (d > 127).astype(np.int32)
        digits.append((d - 256 * m).astype(np.int8))
        carry = m
    digits.append(carry.astype(np.int8))
    return xp.stack(digits, axis=-1)


def _int32_to_field(v):
    """Signed int32 array -> (lo, hi) field limbs (exact, branch-free)."""
    xp = B.xp
    neg = v < 0
    a = xp.abs(v).astype(np.uint32)
    pos = (a, xp.zeros_like(a))
    return gl.select(neg, gl.neg(pos), pos)


def _weight_limbs(scale: int):
    """(9, 9) plane-weight constants scale·2^{8(dA+dB)} mod p as numpy limb
    pair arrays shaped (9, 1, 9) for broadcast against (..., 9, kb, 9).
    Pure numpy (host constants, safe to build inside a jit trace)."""
    lo = np.empty((NPLANES, 1, NPLANES), dtype=np.uint32)
    hi = np.empty((NPLANES, 1, NPLANES), dtype=np.uint32)
    for a in range(NPLANES):
        for b in range(NPLANES):
            v = pow(2, 8 * (a + b), P) * scale % P
            lo[a, 0, b] = v & 0xFFFFFFFF
            hi[a, 0, b] = v >> 32
    return lo, hi


def _recombine(O, t, kb, wts):
    """O: (8, t, 3, 9, kb, 3, 9) int32 plane products -> (t, kb, 24) limbs.

    Fq3 product structure (fq3.mul / goldilocks/mod.rs:29-54):
      c0 = a0b0 + W(a1b2 + a2b1)
      c1 = a0b1 + a1b0 + W a2b2
      c2 = a0b2 + a1b1 + a2b0
    Each (i, i') component-pair block is converted to field in one
    vectorized op, scaled by its broadcast (dA, dB) weight plane (W folded
    in where the nonresidue applies), and plane-summed.
    """
    xp = B.xp
    w1, ww = wts
    entries = [
        # (i, i', output component, weight planes)
        (0, 0, 0, w1), (1, 2, 0, ww), (2, 1, 0, ww),
        (0, 1, 1, w1), (1, 0, 1, w1), (2, 2, 1, ww),
        (0, 2, 2, w1), (1, 1, 2, w1), (2, 0, 2, w1),
    ]
    comps = [None, None, None]
    for i, i2, comp, w in entries:
        g = O[:, :, i, :, :, i2, :]                 # (8, t, 9, kb, 9) int32
        elem = _int32_to_field(g)
        term = gl.mul(elem, w)                      # broadcast (9, 1, 9)
        flat = (xp.moveaxis(term[0], 2, 3).reshape(8, t, kb, -1),
                xp.moveaxis(term[1], 2, 3).reshape(8, t, kb, -1))
        s = gl.sum_axis(flat, axis=-1)              # (8, t, kb)
        comps[comp] = s if comps[comp] is None else gl.add(comps[comp], s)
    # pack (8 slots, 3 comps) -> (..., 24) ring layout, batch-major (t, kb)
    lo = xp.stack([comps[c][0] for c in range(3)], axis=-1)  # (8, t, kb, 3)
    hi = xp.stack([comps[c][1] for c in range(3)], axis=-1)
    lo = xp.moveaxis(lo, 0, -2)                     # (t, kb, 8, 3)
    hi = xp.moveaxis(hi, 0, -2)
    return (lo.reshape(lo.shape[:-2] + (24,)),
            hi.reshape(hi.shape[:-2] + (24,)))


def ring_contract(A, B_, t=None, kb=None):
    """Batched ring inner products on the MXU.

    A: (t, n, 24) limb pair;  B_: (kb, n, 24) limb pair.
    Returns (t, kb, 24) limbs:  out[j, k] = Σ_n A[j, n] ⊙ B_[k, n].

    Contraction over n runs as int8 digit-plane matmuls (chunked at 2^16 so
    int32 accumulation is exact), everything else is O(t·kb) cleanup.
    """
    import jax
    xp = B.xp
    t = int(A[0].shape[0]) if t is None else t
    kb = int(B_[0].shape[0]) if kb is None else kb
    n = int(A[0].shape[1])

    def planes_lhs(x):
        # (t, n, 24) -> (8, t*3*9, n) int8
        lo = x[0].reshape(t, n, 8, 3)
        hi = x[1].reshape(t, n, 8, 3)
        d = digit_planes((lo, hi))                  # (t, n, 8, 3, 9)
        d = xp.moveaxis(d, 2, 0)                    # (8, t, n, 3, 9)
        d = xp.moveaxis(d, 2, 4)                    # (8, t, 3, 9, n)
        return d.reshape(8, t * 3 * NPLANES, n)

    def planes_rhs(x):
        # (kb, n, 24) -> (8, n, kb*3*9) int8
        lo = x[0].reshape(kb, n, 8, 3)
        hi = x[1].reshape(kb, n, 8, 3)
        d = digit_planes((lo, hi))                  # (kb, n, 8, 3, 9)
        d = xp.moveaxis(d, 2, 0)                    # (8, kb, n, 3, 9)
        d = xp.moveaxis(d, 2, 1)                    # (8, n, kb, 3, 9)
        return d.reshape(8, n, kb * 3 * NPLANES)

    L = planes_lhs(A)
    R = planes_rhs(B_)
    wts = (tuple(xp.asarray(a) for a in _weight_limbs(1)),
           tuple(xp.asarray(a) for a in _weight_limbs(W_NONRESIDUE)))
    dn = (((2,), (1,)), ((0,), (0,)))               # contract n, batch slots
    nchunks = (n + CHUNK_N - 1) // CHUNK_N
    out = None
    for c in range(nchunks):
        sl = slice(c * CHUNK_N, min((c + 1) * CHUNK_N, n))
        O = jax.lax.dot_general(L[:, :, sl], R[:, sl, :], dn,
                                preferred_element_type=np.int32)
        O = O.reshape(8, t, 3, NPLANES, kb, 3, NPLANES)
        part = _recombine(O, t, kb, wts)
        out = part if out is None else gl.add(out, part)
    return out
