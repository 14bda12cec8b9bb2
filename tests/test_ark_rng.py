"""ark_std::test_rng / arkworks sampling replication (BASELINE parity #1)."""

from latticeum_tpu.crypto import ark_rng


def test_chacha20_rfc7539_block0():
    # RFC 7539 A.1 TV#1: zero key, zero nonce, counter 0 (the djb variant
    # rand_chacha uses has an identical initial state for these parameters)
    rng = ark_rng.ChaChaRng(bytes(32), rounds=20)
    got = [rng.next_u32() for _ in range(8)]
    assert got == [0xADE0B876, 0x903DF1A0, 0xE56A5D40, 0x28BD8653,
                   0xB819D2BD, 0x1AED8DA0, 0xCCEF36A8, 0xC70D778B]


def test_chacha20_rfc7539_block1():
    rng = ark_rng.ChaChaRng(bytes(32), rounds=20)
    for _ in range(16):
        rng.next_u32()
    got = [rng.next_u32() for _ in range(4)]
    # RFC 7539 A.1 TV#2 keystream (counter = 1), first 16 bytes LE
    assert got == [0xBEE7079F, 0x7A385155, 0x7C97BA98, 0x0D082D73]


def test_next_u64_word_order():
    rng = ark_rng.ChaChaRng(bytes(32), rounds=20)
    lo, hi = 0xADE0B876, 0x903DF1A0
    rng2 = ark_rng.ChaChaRng(bytes(32), rounds=20)
    assert rng2.next_u64() == lo | (hi << 32)
    _ = rng


def test_fq_rand_montgomery_roundtrip():
    # the accepted raw limb is the Montgomery form: value * 2^64 == raw (p)
    rng = ark_rng.ark_test_rng()
    raw_rng = ark_rng.ark_test_rng()
    v = ark_rng.fq_rand(rng)
    raw = raw_rng.next_u64()
    while raw >= ark_rng.P:
        raw = raw_rng.next_u64()
    assert (v << 64) % ark_rng.P == raw % ark_rng.P


def test_reference_ajtai_ring_pinned():
    """Golden pin of the replicated reference Ajtai ring element
    (main.rs:81-83 + commitment_scheme.rs:31).  Deterministic by
    construction; guards the whole ChaCha12/rejection/Montgomery chain
    against regressions.  Cross-check against the Rust binary is recorded
    in PARITY.md (no Rust toolchain in this environment)."""
    ring = ark_rng.reference_ajtai_ring()
    assert len(ring) == 24
    assert all(0 <= v < ark_rng.P for v in ring)
    rerun = ark_rng.reference_ajtai_ring()
    assert ring == rerun
    import json
    import os
    pin = os.path.join(os.path.dirname(__file__), "golden_ajtai_ring.json")
    if os.path.exists(pin):
        with open(pin) as f:
            assert ring == json.load(f)
    else:  # first run writes the pin (committed to the repo)
        with open(pin, "w") as f:
            json.dump(ring, f)
