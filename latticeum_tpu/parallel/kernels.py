"""Jittable TPU compute kernels for the folding hot path.

These are the pure-array cores of the prover (no host transcript): built to
be traced once under `jax.jit` and, in multi-chip runs, sharded over a
`jax.sharding.Mesh` so XLA inserts the collectives (psum over the hypercube
row axis for sum-check round messages and Ajtai partial sums).

All functions assume the backend is in JAX mode (see backend.jax_mode).
"""

from __future__ import annotations

import numpy as np

from .. import backend as B
from ..field import goldilocks as gl
from ..ring import rq


def sumcheck_round_evals(mles, degree: int, comb_fn):
    """One sum-check round: mles (k, n, 24) -> evals (degree+1, 24) limbs.

    Splits the hypercube into (index/2, bit) pairs, evaluates the comb at
    t = 0..degree via the incremental step rule, and reduces over rows
    (the reduction is where psum rides ICI when rows are sharded).
    """
    lo, hi = mles
    n = lo.shape[-2]
    lo2 = lo.reshape(lo.shape[:-2] + (n // 2, 2, 24))
    hi2 = hi.reshape(hi.shape[:-2] + (n // 2, 2, 24))
    v0 = (lo2[..., 0, :], hi2[..., 0, :])
    v1 = (lo2[..., 1, :], hi2[..., 1, :])
    evals = [comb_fn(v0), comb_fn(v1)]
    step = gl.sub(v1, v0)
    vals = v1
    for _ in range(2, degree + 1):
        vals = gl.add(vals, step)
        evals.append(comb_fn(vals))
    summed = [gl.sum_axis(e, axis=-2) for e in evals]
    return (B.xp.stack([s[0] for s in summed]),
            B.xp.stack([s[1] for s in summed]))


def fix_variable_dev(mles, r_limbs):
    """Fold the lowest hypercube variable at an Fq3 point (device limbs)."""
    lo, hi = mles
    n = lo.shape[-2]
    lo2 = lo.reshape(lo.shape[:-2] + (n // 2, 2, 24))
    hi2 = hi.reshape(hi.shape[:-2] + (n // 2, 2, 24))
    left = (lo2[..., 0, :], hi2[..., 0, :])
    right = (lo2[..., 1, :], hi2[..., 1, :])
    return gl.add(left, rq.ntt_scalar_mul(gl.sub(right, left), r_limbs))


def ajtai_commit_kernel(matrix, f):
    """cm = A·f: (kappa, n, 24) x (n, 24) -> (kappa, 24)."""
    prod = rq.ntt_mul(matrix, (f[0][None], f[1][None]))
    return gl.sum_axis(prod, axis=-2)


def product_comb(vals):
    """comb = product of all mles (used by the bench/dryrun harness)."""
    lo, hi = vals
    acc = (lo[0], hi[0])
    for i in range(1, lo.shape[0]):
        acc = rq.ntt_mul(acc, (lo[i], hi[i]))
    return acc


def fold_step_core(mles, matrix, f, degree: int):
    """The representative per-fold compute bundle: one sum-check round over
    the witness-row hypercube + an Ajtai commitment.  Jittable."""
    evals = sumcheck_round_evals(mles, degree, product_comb)
    cm = ajtai_commit_kernel(matrix, f)
    return evals, cm


def rand_mles(k, n, seed=0):
    rng = np.random.default_rng(seed)
    lo = rng.integers(0, 1 << 32, size=(k, n, 24), dtype=np.uint32)
    hi = rng.integers(0, 0xFFFFFFFE, size=(k, n, 24), dtype=np.uint32)
    # keep < p: ensure not both limbs maxed (hi<0xFFFFFFFF suffices for hi != 0xFFFFFFFF)
    return (B.xp.asarray(lo), B.xp.asarray(hi))
