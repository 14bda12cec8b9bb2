"""Dense multilinear extensions over RqNTT, batched for TPU.

An MLE over {0,1}^nv with ring-element values is a limb pair of shape
(..., 2^nv, 24): hypercube index on axis -2 (variable 0 = least-significant
index bit, matching the reference's DenseMultilinearExtension layout,
stark-rings/crates/poly/src/mle/dense.rs:18-27,171-196), ring slot-major
NTT coefficients on axis -1.

Unlike the reference's lazily-truncated vectors, the TPU form is always
dense/padded — XLA wants static shapes, and the padding region is exact
zeros so results are identical.
"""

from __future__ import annotations

from .. import backend as B

from ..field import goldilocks as gl
from ..ring import rq


def from_rings(rings, nv: int):
    """Host list of ring elements (each 24 ints) -> padded MLE limbs."""
    import numpy as np
    n = 1 << nv
    arr = np.zeros((n, 24), dtype=object)
    for i, r in enumerate(rings):
        arr[i, :] = r
    return gl.from_int(arr)


def fix_variable(mle, r_fq3):
    """Fold variable 0 at Fq3 point r: new[b] = a[2b] + r*(a[2b+1]-a[2b]).

    mle: (..., n, 24) limbs; r_fq3: fq3 limb triple (scalars or batch-
    broadcastable).  Returns (..., n/2, 24).
    """
    lo, hi = mle
    n = lo.shape[-2]
    lo = lo.reshape(lo.shape[:-2] + (n // 2, 2, 24))
    hi = hi.reshape(hi.shape[:-2] + (n // 2, 2, 24))
    left = (lo[..., 0, :], hi[..., 0, :])
    right = (lo[..., 1, :], hi[..., 1, :])
    diff = gl.sub(right, left)
    return gl.add(left, rq.ntt_scalar_mul(diff, r_fq3))


def evaluate(mle, rs_fq3):
    """Evaluate at a point (list of Fq3 limb triples, variable 0 first)."""
    out = mle
    for r in rs_fq3:
        out = fix_variable(out, r)
    lo, hi = out
    return (lo[..., 0, :], hi[..., 0, :])


def fq3_const(c):
    """Host Fq3 tuple -> device limb triple (rank-0)."""
    return tuple(gl.const(x) for x in c)


def build_eq_table(r_fq3_list):
    """eq(r, x) evaluations over the hypercube as an MLE (n, 24) limbs.

    eq(r, x) = prod_i (r_i x_i + (1-r_i)(1-x_i)); variable 0 = LSB.
    Matches latticefold's build_eq_x_r (utils/sumcheck/utils.rs:123-160).
    """
    import numpy as np
    from ..field import host as H
    # host computation (table built once per sum-check; 2^nv entries)
    evals = [(1, 0, 0)]
    for r in r_fq3_list:
        one_minus = H.fq3_sub((1, 0, 0), r)
        new = []
        for e in evals:
            new.append(H.fq3_mul(e, one_minus))
        for e in evals:
            new.append(H.fq3_mul(e, r))
        # variable ordering: r_i is variable i; LSB-first layout means
        # new[b + 2^i * x_i]; we build MSB-last so prepend accordingly.
        evals = new
    # evals indexed with variable i at bit i? We appended x_i as the HIGH bit
    # each iteration, so after processing [r0, r1, ...], index bit i = x_i. ✓
    n = len(evals)
    arr = np.zeros((n, 24), dtype=object)
    for b, e in enumerate(evals):
        arr[b, :] = H.ntt_from_fq3(e)
    return gl.from_int(arr)
