"""Vectorized collector math vs scalar field.host oracles.

The collector (zkvm/collect.py) was vectorized through field.hostvec in
round 3; these tests pin each batched computation against the original
pure-Python int formulation (zk_latticefold.rs semantics)."""

import numpy as np

from latticeum_tpu import backend as B
from latticeum_tpu.field import host as H, hostvec as HV
from latticeum_tpu.nifs import folding as fold

P = H.P
RNG = np.random.default_rng(42)


def _rand_fq():
    return int(RNG.integers(0, 1 << 62)) * 4 % P


def _ring():
    return [_rand_fq() for _ in range(24)]


def _fq3():
    return tuple(_rand_fq() for _ in range(3))


class _FakeLcccs:
    def __init__(self, t, kappa, l):
        self.v = [_ring() for _ in range(3)]
        self.u = [_ring() for _ in range(t)]
        self.cm = [_ring() for _ in range(kappa)]
        self.x_w = [_ring() for _ in range(l)]
        self.h = _ring()
        self.r = [_ring() for _ in range(4)]


def test_claim_chains_match_scalar():
    t, n_i = 9, 6
    cms = [_FakeLcccs(t, 4, 2) for _ in range(n_i)]
    alpha_s = [_fq3() for _ in range(n_i)]
    zeta_s = [_fq3() for _ in range(n_i)]

    # scalar oracle (the pre-vectorization loop)
    g1_h1, g1_h2, g1_terms, g3_h, g3_terms = [], [], [], [], []
    claim_g1, claim_g3 = H.ntt_zero(), H.ntt_zero()
    for i in range(n_i):
        v_i, a = cms[i].v, alpha_s[i]
        h1 = H.ntt_add(H.ntt_scalar_mul(list(v_i[2]), a), v_i[1])
        h2 = H.ntt_add(H.ntt_scalar_mul(h1, a), v_i[0])
        ci = H.ntt_scalar_mul(h2, a)
        g1_h1.append(h1)
        g1_h2.append(h2)
        g1_terms.append(ci)
        claim_g1 = H.ntt_add(claim_g1, ci)
        u_i, zi = cms[i].u, zeta_s[i]
        h = H.ntt_add(H.ntt_scalar_mul(list(u_i[t - 1]), zi), u_i[t - 2])
        g3_h.append(h)
        for j in range(t - 3, -1, -1):
            h = H.ntt_add(H.ntt_scalar_mul(h, zi), u_i[j])
            g3_h.append(h)
        gi = H.ntt_scalar_mul(h, zi)
        g3_terms.append(gi)
        claim_g3 = H.ntt_add(claim_g3, gi)

    # vectorized (the collect.py formulation)
    import latticeum_tpu.field.goldilocks as gl
    with B.numpy_mode():
        v = HV.rings(np.array([[list(x) for x in c.v] for c in cms],
                              dtype=object))
        u = HV.rings(np.array([[list(x) for x in c.u] for c in cms],
                              dtype=object))
        a3 = HV.fq3s(alpha_s)
        z3 = HV.fq3s(zeta_s)
        h1 = gl.add(HV.ntt_scalar_mul_batch((v[0][:, 2], v[1][:, 2]), a3),
                    (v[0][:, 1], v[1][:, 1]))
        h2 = gl.add(HV.ntt_scalar_mul_batch(h1, a3), (v[0][:, 0], v[1][:, 0]))
        cl1 = HV.ntt_scalar_mul_batch(h2, a3)
        hh = gl.add(HV.ntt_scalar_mul_batch((u[0][:, t - 1], u[1][:, t - 1]),
                                            z3), (u[0][:, t - 2],
                                                  u[1][:, t - 2]))
        hs = [hh]
        for j in range(t - 3, -1, -1):
            hh = gl.add(HV.ntt_scalar_mul_batch(hh, z3),
                        (u[0][:, j], u[1][:, j]))
            hs.append(hh)
        g3i = HV.ntt_scalar_mul_batch(hh, z3)
        hs_st = (np.stack([x[0] for x in hs], axis=1),
                 np.stack([x[1] for x in hs], axis=1))
        assert HV.to_rings(h1) == g1_h1
        assert HV.to_rings(h2) == g1_h2
        assert HV.to_rings(cl1) == g1_terms
        assert HV.to_rings(gl.sum_axis(cl1, axis=0)) == claim_g1
        assert HV.to_rings((hs_st[0].reshape(-1, 24),
                            hs_st[1].reshape(-1, 24))) == g3_h
        assert HV.to_rings(g3i) == g3_terms
        assert HV.to_rings(gl.sum_axis(g3i, axis=0)) == claim_g3


def test_final_products_and_v0_match_scalar():
    t, n_i, kappa, l = 7, 4, 3, 2
    cms = [_FakeLcccs(t, kappa, l) for _ in range(n_i)]
    eta_s = [[_ring() for _ in range(t)] for _ in range(n_i)]
    theta_s = [[_ring() for _ in range(3)] for _ in range(n_i)]
    rho_coeff = [[int(RNG.integers(-32, 32)) for _ in range(24)]
                 for _ in range(n_i)]
    from latticeum_tpu.ring import ref_impl as RI
    rho_ntt = [RI.crt([c % P for c in r]) for r in rho_coeff]

    # scalar oracles
    cm_products = [H.ntt_mul(list(cm_j), rho)
                   for cm_i, rho in zip(cms, rho_ntt) for cm_j in cm_i.cm]
    u_products = [H.ntt_mul(list(e), rho)
                  for etas, rho in zip(eta_s, rho_ntt) for e in etas]
    v0_s = fold.rot_lin_combination(rho_coeff, theta_s)
    cm0_s = [H.ntt_zero() for _ in range(kappa)]
    for rho, cm_i in zip(rho_ntt, cms):
        for k in range(kappa):
            cm0_s[k] = H.ntt_add(cm0_s[k], H.ntt_mul(list(cm_i.cm[k]), rho))

    with B.numpy_mode():
        rho_l = HV.rings(np.array(rho_ntt, dtype=object))
        rho_b = (rho_l[0][:, None], rho_l[1][:, None])
        got_cm = HV.ntt_mul_batch(HV.rings(np.array(
            [[list(c) for c in cm.cm] for cm in cms], dtype=object)), rho_b)
        got_u = HV.ntt_mul_batch(HV.rings(np.array(
            [[list(e) for e in etas] for etas in eta_s], dtype=object)),
            rho_b)
        assert HV.to_rings((np.asarray(got_cm[0]).reshape(-1, 24),
                            np.asarray(got_cm[1]).reshape(-1, 24))) \
            == cm_products
        assert HV.to_rings((np.asarray(got_u[0]).reshape(-1, 24),
                            np.asarray(got_u[1]).reshape(-1, 24))) \
            == u_products

    class _Ccs:
        pass
    ccs = _Ccs()
    ccs.t, ccs.l = t, l
    with B.numpy_mode():
        v0_v, cm0_v, _, _ = fold.compute_v0_u0_x0_cm0_vec(
            rho_coeff, rho_ntt, theta_s, cms, eta_s, ccs)
    # rot_lin_combination already returns TAU packed rings
    v0_ref = [[int(x) for x in ring] for ring in v0_s]
    assert v0_v == v0_ref
    assert cm0_v == cm0_s


def test_interpolate_with_terms_matches_scalar():
    from latticeum_tpu.zkvm.collect import zk_interpolate_with_terms
    n = 10
    p_i = [_ring() for _ in range(n)]
    r = _fq3()
    res, terms = zk_interpolate_with_terms(p_i, r)
    # scalar oracle
    res_s = H.ntt_zero()
    terms_s = []
    for i in range(n - 1, -1, -1):
        num, den = (1, 0, 0), 1
        for j in range(n):
            if j == i:
                continue
            num = H.fq3_mul(num, H.fq3_sub(r, (j % P, 0, 0)))
            den = den * (i - j) % P
        w = H.fq3_mul(num, H.fq3_scalar(pow(den, P - 2, P)))
        term = H.ntt_scalar_mul(p_i[i], w)
        terms_s.append(term)
        res_s = H.ntt_add(res_s, term)
    assert res == res_s
    assert terms == terms_s


def test_collect_folding_vars_chain_matches_scalar():
    """Drives collect.collect_folding_vars ITSELF (not an inline copy) and
    pins its claim chains / g3 suffix-scan against the scalar formulation
    at production-like t."""
    from latticeum_tpu.zkvm.collect import collect_folding_vars
    from latticeum_tpu.crypto.transcript import Transcript

    t, K, b_small, s = 125, 2, 2, 3
    n_i = 2 * K

    class _Ccs:
        pass
    ccs = _Ccs()
    ccs.t, ccs.l, ccs.s = t, 2, s

    cms = [_FakeLcccs(t, 3, 2) for _ in range(n_i)]
    for c in cms:
        c.r = [H.ntt_from_fq3(_fq3()) for _ in range(s)]
    proof = {
        "sumcheck": [[_ring() for _ in range(2 * b_small + 1)]
                     for _ in range(s)],
        "theta_s": [[_ring() for _ in range(3)] for _ in range(n_i)],
        "eta_s": [[_ring() for _ in range(t)] for _ in range(n_i)],
    }

    class _P:
        pass
    params = _P()
    params.K, params.B_SMALL = K, b_small

    vars_ = collect_folding_vars(cms, proof, Transcript(), ccs, params)

    # scalar oracle for the g3 chain, replaying the same challenges
    t2 = Transcript()
    alpha_s, beta_s, zeta_s, mu_s = fold.squeeze_alpha_beta_zeta_mu(
        t2, s, K)
    g3_h = []
    g3 = H.ntt_zero()
    for i in range(n_i):
        u_i, zi = cms[i].u, zeta_s[i]
        h = H.ntt_add(H.ntt_scalar_mul(list(u_i[t - 1]), zi), u_i[t - 2])
        g3_h.append(h)
        for j in range(t - 3, -1, -1):
            h = H.ntt_add(H.ntt_scalar_mul(h, zi), u_i[j])
            g3_h.append(h)
        g3 = H.ntt_add(g3, H.ntt_scalar_mul(h, zi))
    assert vars_["claim_g3_h"] == g3_h
    assert vars_["claim_g3"] == g3
    assert len(vars_["final_u_products"]) == n_i * t


def test_replay_transcript_collector_equality():
    """The collector fed a ReplayTranscript (recorded prover samples, no
    re-hashing) must produce byte-identical vars to the full re-hash
    replay — the production prover path (prover.fold records samples)."""
    import numpy as np

    from latticeum_tpu.commit.ajtai import AjtaiScheme
    from latticeum_tpu.crypto.transcript import ReplayTranscript, Transcript
    from latticeum_tpu.field import goldilocks as gl, host as H
    from latticeum_tpu.nifs import linearization as lin, nifs
    from latticeum_tpu.nifs.nifs import DecompositionParams
    from latticeum_tpu.nifs.structs import CCCS, Witness
    from latticeum_tpu.nifs.test_fixtures import (TEST_B, TEST_B_SMALL,
                                                  TEST_K, TEST_L,
                                                  get_test_ccs, get_test_z,
                                                  z_to_device)

    params = DecompositionParams(B=TEST_B, L=TEST_L, B_SMALL=TEST_B_SMALL,
                                 K=TEST_K)
    ccs = get_test_ccs()
    z_host = get_test_z(3)
    wit = Witness.from_w_ccs(z_to_device(z_host[2:]), TEST_B, TEST_L)
    scheme = AjtaiScheme.from_seed(kappa=4, n=wit.f[0].shape[0],
                                   row_constant=True)
    cm_i = CCCS(cm=scheme.commit_host(wit.f), x_ccs=z_host[:1])
    acc_wit = Witness.from_w_ccs(gl.zeros((ccs.n - ccs.l - 1, 24)),
                                 TEST_B, TEST_L)
    acc, _, _ = lin.prove(
        CCCS(cm=scheme.commit_host(acc_wit.f), x_ccs=[H.ntt_zero()]),
        acc_wit, Transcript(), ccs)
    t = Transcript(record_samples=True)
    _, _, proof = nifs.prove(acc, acc_wit, cm_i, wit, t, ccs, scheme,
                             params)
    from latticeum_tpu.zkvm.collect import generate_verification_witness_vars
    v_rehash = generate_verification_witness_vars(acc, cm_i, proof, ccs,
                                                  params, Transcript)
    v_replay = generate_verification_witness_vars(
        acc, cm_i, proof, ccs, params, lambda: ReplayTranscript(t.samples))
    assert repr(v_rehash) == repr(v_replay)
