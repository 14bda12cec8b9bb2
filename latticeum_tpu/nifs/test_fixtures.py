"""Small synthetic CCS fixtures mirroring the reference's test instances
(latticefold/src/arith/r1cs.rs:128-151,227-235): the x^3 + x + 5 = y R1CS
converted to CCS and padded."""

from __future__ import annotations

import numpy as np

from ..field import goldilocks as gl, host as H
from .structs import CCS, SparseRingMatrix

P = H.P

# test decomposition params (decomposition_parameters.rs:51-59)
TEST_B, TEST_L, TEST_B_SMALL, TEST_K = 1024, 2, 2, 10

A_ROWS = [[1, 0, 0, 0, 0, 0], [0, 0, 0, 1, 0, 0],
          [1, 0, 0, 0, 1, 0], [0, 5, 0, 0, 0, 1]]
B_ROWS = [[1, 0, 0, 0, 0, 0], [1, 0, 0, 0, 0, 0],
          [0, 1, 0, 0, 0, 0], [0, 1, 0, 0, 0, 0]]
C_ROWS = [[0, 0, 0, 1, 0, 0], [0, 0, 0, 0, 1, 0],
          [0, 0, 0, 0, 0, 1], [0, 0, 1, 0, 0, 0]]


def _sparse_from_dense(rows, nrows, ncols):
    entries = []
    for r, row in enumerate(rows):
        for c, v in enumerate(row):
            if v:
                entries.append((r, c, H.ntt_from_u64(v)))
    return SparseRingMatrix.from_host(nrows, ncols, entries)


def get_test_ccs(L: int = TEST_L) -> CCS:
    """CCS::from_r1cs_padded of the test R1CS: m -> max((n-l-1)*L, m) pow2."""
    n, l = 6, 1
    m = max((n - l - 1) * L, 4)
    m = 1 << (m - 1).bit_length()
    M = [_sparse_from_dense(R, m, n) for R in (A_ROWS, B_ROWS, C_ROWS)]
    return CCS(m=m, n=n, l=l, t=3, q=2, d=2, M=M,
               S=[[0, 1], [2]],
               c=[H.ntt_from_u64(1), H.ntt_neg(H.ntt_from_u64(1))])


def get_test_z(inp: int):
    """z = [io, 1, w...] as host scalar rings (r1cs.rs:227-235)."""
    return [H.ntt_from_u64(v) for v in [
        inp, 1, inp ** 3 + inp + 5, inp ** 2, inp ** 3, inp ** 3 + inp]]


def z_to_device(z_host):
    return gl.from_int(np.array(z_host, dtype=object))
