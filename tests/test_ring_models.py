"""Cross-ring model tests (BabyBear / Frog / StarkPrime / Goldilocks):
the CRT factorization, slotwise multiplication, ICRT inverse, and balanced
decomposition must satisfy their defining identities for every model
(the property analog of the reference's per-model ntt.rs test modules)."""

import numpy as np
import pytest

from latticeum_tpu.ring import models as M

ALL = [M.BABYBEAR, M.FROG, M.STARK, M.GOLDILOCKS]
IDS = [m.name for m in ALL]


@pytest.mark.parametrize("m", ALL, ids=IDS)
def test_root_tables_are_powers(m):
    g = m.slot_roots[0]
    order = {"babybear": 24, "frog": 8, "stark_prime": 32,
             "goldilocks": 24}[m.name]
    assert pow(g, order, m.p) == 1
    assert pow(g, order // 2, m.p) == m.p - 1  # primitive (even half -> -1)


@pytest.mark.parametrize("m", ALL, ids=IDS)
def test_slot_roots_satisfy_cyclotomic(m):
    """X^d = r_i must be a root of Phi: r^N - mid*r^(N/2) + 1 == 0."""
    for r in m.slot_roots:
        val = (pow(r, m.N, m.p) - m.mid * pow(r, m.N // 2, m.p) + 1) % m.p
        assert val == 0, (m.name, r)


@pytest.mark.parametrize("m", ALL, ids=IDS)
def test_crt_is_ring_homomorphism(m):
    rng = np.random.default_rng(42)
    a, b = m.rand(rng), m.rand(rng)
    direct = m.poly_mul(a, b)
    via_crt = m.ntt_mul(a, b)
    assert direct == via_crt


@pytest.mark.parametrize("m", ALL, ids=IDS)
def test_icrt_inverts_crt(m):
    rng = np.random.default_rng(7)
    a = m.rand(rng)
    assert m.icrt(m.crt(a)) == [v % m.p for v in a]


@pytest.mark.parametrize("m", ALL, ids=IDS)
def test_reduce_matches_mod(m):
    """X^D reduces to mid*X^(D/2) - 1."""
    e = [0] * (m.D + 1)
    e[m.D] = 1
    red = m.reduce(e)
    expect = [0] * m.D
    expect[0] = (-1) % m.p
    if m.mid:
        expect[m.D // 2] = m.mid % m.p
    assert red == expect


@pytest.mark.parametrize("m", ALL, ids=IDS)
def test_balanced_decompose_roundtrip(m):
    rng = np.random.default_rng(3)
    a = m.rand(rng)
    b, L = 1 << 8, (m.p.bit_length() + 7) // 8 + 1
    digs = m.decompose_balanced(a, b, L)
    assert m.recompose(digs, b) == [v % m.p for v in a]
    half = m.p // 2
    for dig in digs:
        for v in dig:
            lifted = v - m.p if v > half else v
            assert -b // 2 <= lifted <= b // 2


def test_goldilocks_model_matches_production_ring():
    """The generic goldilocks model must agree with the production
    bit-exact ring (ring/ref_impl.py, golden-pinned against the Rust NTT)
    in the COEFFICIENT domain — slot representations differ by the
    documented per-slot isomorphism, ring products do not."""
    from latticeum_tpu.ring import ref_impl as R
    rng = np.random.default_rng(11)
    a, b = M.GOLDILOCKS.rand(rng), M.GOLDILOCKS.rand(rng)
    mine = M.GOLDILOCKS.ntt_mul(a, b)
    ref = R.icrt(R.ntt_mul(R.crt(list(a)), R.crt(list(b))))
    assert mine == ref


@pytest.mark.parametrize("m", ALL, ids=IDS)
def test_crt_h_ring_isomorphism(m):
    """crt_h (CRT + per-slot homogenization into the common field F) must
    be a ring isomorphism for every model that has one: icrt_h inverts it,
    and slotwise products in the normalized domain equal poly_mul.
    This is the property the generic NIFS (nifs/generic.py) builds on."""
    if not m.has_hom:
        pytest.skip(f"{m.name}: no homogenization (documented gap)")
    rng = np.random.default_rng(11)
    a, b = m.rand(rng), m.rand(rng)
    assert m.icrt_h(m.crt_h(a)) == [v % m.p for v in a]
    direct = m.poly_mul(a, b)
    via = m.icrt_h(m.slot_mul_h(m.crt_h(a), m.crt_h(b)))
    assert direct == via
