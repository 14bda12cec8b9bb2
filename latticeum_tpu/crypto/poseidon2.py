"""Batched Poseidon2 permutations on limb arrays (numpy or TPU via backend).

Vectorizes the width-8/width-16 Goldilocks permutations over a leading batch
axis — the workhorse for Merkle leaf hashing (thousands of rows hashed in
lock-step) and future on-device transcript work.  Bit-exact with the scalar
oracle in poseidon2_ref.py.
"""

from __future__ import annotations

import numpy as np

from .. import backend as B
from ..field import goldilocks as gl
from . import consts

P = gl.P


def _sbox(x):
    x2 = gl.mul(x, x)
    x4 = gl.mul(x2, x2)
    x6 = gl.mul(x4, x2)
    return B.barrier(gl.mul(x6, x))


def _col(arr, i):
    return (arr[0][..., i], arr[1][..., i])


def _stack(cols):
    return (B.xp.stack([c[0] for c in cols], axis=-1),
            B.xp.stack([c[1] for c in cols], axis=-1))


def _mds_light(state, width):
    """M4-block + circulant-sum external linear layer (batched)."""
    cols = [_col(state, i) for i in range(width)]
    out = []
    for blk in range(0, width, 4):
        c0, c1, c2, c3 = cols[blk:blk + 4]
        d0 = gl.add(gl.add(gl.add(c0, c0), gl.add(c1, gl.add(c1, c1))),
                    gl.add(c2, c3))
        d1 = gl.add(gl.add(c0, gl.add(c1, c1)),
                    gl.add(gl.add(c2, gl.add(c2, c2)), c3))
        d2 = gl.add(gl.add(c0, c1),
                    gl.add(gl.add(c2, c2), gl.add(c3, gl.add(c3, c3))))
        d3 = gl.add(gl.add(gl.add(c0, gl.add(c0, c0)), c1),
                    gl.add(c2, gl.add(c3, c3)))
        out.extend([d0, d1, d2, d3])
    sums = []
    for k in range(4):
        acc = out[k]
        for j in range(4 + k, width, 4):
            acc = gl.add(acc, out[j])
        sums.append(acc)
    final = [gl.add(out[i], sums[i % 4]) for i in range(width)]
    return _stack(final)


def _add_rc(state, rcs):
    rc = gl.from_int(np.array(rcs, dtype=object))
    return gl.add(state, (B.xp.broadcast_to(rc[0], state[0].shape),
                          B.xp.broadcast_to(rc[1], state[1].shape)))


def _matmul_internal(state, diag):
    d = gl.from_int(np.array(diag, dtype=object))
    tot = gl.sum_axis(state, axis=-1)
    prod = gl.mul(state, (B.xp.broadcast_to(d[0], state[0].shape),
                          B.xp.broadcast_to(d[1], state[1].shape)))
    return gl.add(prod, (tot[0][..., None], tot[1][..., None]))


def _perm(state, width, ext_init, ext_term, diag):
    state = _mds_light(state, width)
    for rc in ext_init:
        state = _mds_light(_sbox(_add_rc(state, rc)), width)
    for rc in consts.INTERNAL_22:
        s0 = _sbox(gl.add(_col(state, 0), gl.const(rc)))
        state = (B.at_set(state[0], (..., 0), s0[0]),
                 B.at_set(state[1], (..., 0), s0[1]))
        state = B.barrier(_matmul_internal(state, diag))
    for rc in ext_term:
        state = _mds_light(_sbox(_add_rc(state, rc)), width)
    return state


def perm8(state):
    """(batch, 8) limbs -> (batch, 8)."""
    return _perm(state, 8, consts.W8_EXTERNAL_INITIAL,
                 consts.W8_EXTERNAL_TERMINAL, consts.DIAG_8)


def perm16(state):
    return _perm(state, 16, consts.W16_EXTERNAL_INITIAL,
                 consts.W16_EXTERNAL_TERMINAL, consts.DIAG_16)


def hash_rows_narrow(rows):
    """Batched width-8 sponge over (batch, L) u32-word arrays -> (batch, 4).

    rows: numpy uint32/int array of field values < p (VM words).
    Returns digests as a limb pair (batch, 4).
    """
    rows = np.asarray(rows, dtype=np.uint64)
    bsz, L = rows.shape
    state = gl.zeros((bsz, 8))
    pos = 0
    while pos < L:
        chunk = rows[:, pos:pos + 4]
        w = chunk.shape[1]
        lo = B.xp.asarray((chunk & 0xFFFFFFFF).astype(np.uint32))
        hi = B.xp.asarray((chunk >> 32).astype(np.uint32))
        state = (B.at_set(state[0], (slice(None), slice(0, w)), lo),
                 B.at_set(state[1], (slice(None), slice(0, w)), hi))
        state = perm8(state)
        pos += 4
    return (state[0][:, :4], state[1][:, :4])


def compress_level(digests):
    """(2n, 4) limb digests -> (n, 4) via truncated perm8 on pairs."""
    lo, hi = digests
    n = lo.shape[0] // 2
    state = (lo.reshape(n, 8), hi.reshape(n, 8))
    out = perm8(state)
    return (out[0][:, :4], out[1][:, :4])


def merkle_root_rows(rows):
    """Full tree over row-major matrix (power-of-two height assumed padded
    by caller with zero-digest rows handled at digest level)."""
    digests = hash_rows_narrow(rows)
    n = digests[0].shape[0]
    npad = 1 << (n - 1).bit_length() if n > 1 else 1
    if npad != n:
        z = gl.zeros((npad - n, 4))
        digests = (B.xp.concatenate([digests[0], z[0]]),
                   B.xp.concatenate([digests[1], z[1]]))
    levels = [digests]
    while digests[0].shape[0] > 1:
        digests = compress_level(digests)
        levels.append(digests)
    return levels
