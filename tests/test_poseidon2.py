"""Poseidon2 tests: matrix consistency vs reference inverse constants, sage
golden intermediates, sponge/challenger behavior."""

from latticeum_tpu.crypto import consts, poseidon2_ref as p2

P = p2.P


def _matmul(A, B):
    n = len(A)
    return [[sum(A[i][k] * B[k][j] for k in range(n)) % P for j in range(n)]
            for i in range(n)]


def _identity(A):
    return all(A[i][j] == (1 if i == j else 0)
               for i in range(len(A)) for j in range(len(A)))


def _external_matrix(w):
    ME = [[0] * w for _ in range(w)]
    for bi in range(w // 4):
        for bj in range(w // 4):
            m = 2 if bi == bj else 1
            for i in range(4):
                for j in range(4):
                    ME[bi * 4 + i][bj * 4 + j] = m * consts.M4[i][j]
    return ME


def test_external_matrix_matches_pinned_inverse():
    ME = _external_matrix(16)
    assert _identity(_matmul(ME, consts.MDS_INVERSE_TRANSPOSED))


def test_internal_matrix_matches_pinned_inverse():
    MI = [[(consts.DIAG_16[i] + 1 if i == j else 1) % P for j in range(16)]
          for i in range(16)]
    assert _identity(_matmul(MI, consts.M_I_INVERSE_TRANSPOSED))


def test_mds_light_equals_matrix():
    import random
    rng = random.Random(3)
    for w in (8, 16):
        ME = _external_matrix(w)
        s = [rng.randrange(P) for _ in range(w)]
        direct = [sum(ME[i][j] * s[j] for j in range(w)) % P for i in range(w)]
        assert p2.mds_light(s) == direct


# initial_mds.sage:4-23 input; external_initial_rounds.sage:6-23 pins s =
# mds(initial_state).
SAGE_STATE = [0, 13458558136629279646, 11917569669020208757,
              3145715386209370042, 17331705705982545631,
              13458558136629279646, 11917569669020208757,
              3145715386209370042, 17331705705982545631,
              13984430912008153556, 15521108528102704061,
              4970103052708374450, 0, 0, 0, 0]
SAGE_AFTER_MDS = [2940300425484625778, 16464418761950202686,
                  13431970605222186296, 17077726682652553912,
                  710223698620548398, 15349380398518163996,
                  12316932241790147606, 13732611592356437842,
                  7715768550338669840, 10589386123607817815,
                  7076301665416441027, 3064054490401231551,
                  2841573168610961004, 5989110303665400044,
                  3594615110753547652, 3856912173998909746]


def test_initial_mds_sage_golden():
    assert p2.mds_light(SAGE_STATE) == SAGE_AFTER_MDS


# inverse_mds.sage:26-77: v -> mds -> +consts_0 -> ^7 -> mds pinned output.
SAGE_V = [0, 13458558136629279646, 11917569669020208757, 3145715386209370042,
          17331705705982545631, 13458558136629279646, 11917569669020208757,
          3145715386209370042, 17331705705982545631, 8203537595394924561,
          468776755909577198, 15626073765615709212, 0, 0, 0, 0]
SAGE_AFTER_R0 = [13683660796927978233, 7850493864209007699,
                 10399109049190030749, 296749962854134813,
                 17870702501576171902, 1170131620745158975,
                 5788470875138555445, 14062732781766198387,
                 12463534727628334687, 1534455127310058180,
                 15785301287996621979, 12486805659628710389,
                 11721726782605920875, 8882791029757694266,
                 14695373258366177538, 5062228837766480612]


def test_first_external_round_sage_golden():
    after_mds = p2.mds_light(SAGE_V)
    rc0 = consts.W16_EXTERNAL_INITIAL[0]
    after_sbox = [p2._sbox((x + c) % P) for x, c in zip(after_mds, rc0)]
    assert p2.mds_light(after_sbox) == SAGE_AFTER_R0


def test_perm16_intermediates_recorded():
    state, inter = p2.perm16(SAGE_V, record=True)
    assert inter["after_initial_mds"] == p2.mds_light(SAGE_V)
    assert inter["after_ext_init"][0] == SAGE_AFTER_R0
    assert len(inter["after_ext_init"]) == 4
    assert len(inter["after_internal"]) == 22
    assert len(inter["after_ext_term"]) == 4
    assert state == inter["after_ext_term"][-1]


def test_perm_intermediates_satisfy_inverse_gates():
    """The in-circuit gates use (s+rc)^7 == MDS_inv_T^T-free form:
    next = M_E @ sbox  =>  sbox_i == sum_j MDS_INVERSE_TRANSPOSED[j][i] ... —
    verify with the exact 'inverse_it_transposed' contraction of the sage
    script (inverse_mds.sage:80-103): sbox[i] == sum_j A_inv^T[i][j]*next[j]
    where A_inv^T == MDS_INVERSE_TRANSPOSED read row-wise as in ccs gates."""
    state = SAGE_V
    after_mds = p2.mds_light(state)
    rc0 = consts.W16_EXTERNAL_INITIAL[0]
    sbox = [p2._sbox((x + c) % P) for x, c in zip(after_mds, rc0)]
    nxt = p2.mds_light(sbox)
    MIT = consts.MDS_INVERSE_TRANSPOSED
    for i in range(16):
        got = sum(MIT[i][j] * nxt[j] for j in range(16)) % P
        assert got == sbox[i]


def test_hash_wide_block_boundaries():
    # 12 elems -> exactly 1 permutation; 13 -> 2 (poseidon2.rs:62)
    one = p2.hash_wide(list(range(12)))
    s = [x % P for x in range(12)] + [0, 0, 0, 0]
    assert one == p2.perm16(s)[:4]
    _, states = p2.hash_wide(list(range(13)), record=True)
    assert len(states) == 2
    _, states = p2.hash_wide(list(range(24)), record=True)
    assert len(states) == 2
    _, states = p2.hash_wide(list(range(25)), record=True)
    assert len(states) == 3


def test_hash_narrow_and_compress():
    d = p2.hash_narrow([1, 2, 3, 4])
    assert d == p2.perm8([1, 2, 3, 4, 0, 0, 0, 0])[:4]
    c = p2.compress8([1, 2, 3, 4], [5, 6, 7, 8])
    assert c == p2.perm8([1, 2, 3, 4, 5, 6, 7, 8])[:4]


def test_duplex_challenger_semantics():
    ch = p2.DuplexChallenger()
    ch.observe(7)
    c0 = ch.sample()
    # state after duplex: [7,0,...,0] permuted; sample pops state[11]
    st = p2.perm16([7] + [0] * 15)
    assert c0 == st[11]
    c1 = ch.sample()
    assert c1 == st[10]
    # observing clears output buffer; next sample re-duplexes
    ch.observe(9)
    c2 = ch.sample()
    st2 = list(st)
    st2[0] = 9
    assert c2 == p2.perm16(st2)[11]


def test_squeeze_bytes():
    ch = p2.DuplexChallenger()
    ch.observe(1)
    b = ch.squeeze_bytes(18)
    ch2 = p2.DuplexChallenger()
    ch2.observe(1)
    v0 = ch2.sample()
    v1 = ch2.sample()
    v2 = ch2.sample()
    expect = (v0.to_bytes(8, "little") + v1.to_bytes(8, "little")
              + v2.to_bytes(8, "little")[:2])
    assert b == expect
