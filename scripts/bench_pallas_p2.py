"""Poseidon2 width-8 permutation on the chip: Pallas kernel vs XLA-batched
(crypto/poseidon2.perm8) vs native C++ (host), at the Merkle page workload
size (8192 leaves).  Decides which implementation owns the bulk-hash path
(VERDICT round-1 item #7: wire the Pallas kernel or earn its deletion)."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    from latticeum_tpu import backend as B
    from latticeum_tpu.crypto import native
    from latticeum_tpu.crypto import poseidon2 as p2
    from latticeum_tpu.crypto import poseidon2_ref as p2ref

    n = 8192
    rng = np.random.default_rng(9)
    P = p2ref.P
    vals = rng.integers(0, P, (n, 8), dtype=np.uint64)
    lo = (vals & 0xFFFFFFFF).astype(np.uint32)
    hi = (vals >> 32).astype(np.uint32)

    # correctness oracle on 4 rows
    expect = [p2ref.perm8([int(v) for v in row]) for row in vals[:4]]

    results = {}

    # XLA-batched
    B.use_jax()
    jperm = jax.jit(p2.perm8)
    out = jperm((B.xp.asarray(lo), B.xp.asarray(hi)))  # compile
    jax.block_until_ready(out)
    got = np.asarray(out[0][:4]).astype(np.uint64) | (
        np.asarray(out[1][:4]).astype(np.uint64) << np.uint64(32))
    assert [list(map(int, r)) for r in got] == expect, "XLA perm8 mismatch"
    t0 = time.time()
    for _ in range(10):
        out = jperm((B.xp.asarray(lo), B.xp.asarray(hi)))
    jax.block_until_ready(out)
    results["xla_batched"] = (time.time() - t0) / 10

    # Pallas
    try:
        from latticeum_tpu.parallel.pallas_kernels import make_perm8_kernel
        kern = make_perm8_kernel()
        interp = jax.default_backend() not in ("tpu", "axon")
        out = kern(B.xp.asarray(lo), B.xp.asarray(hi), interpret=interp)
        jax.block_until_ready(out)
        got = np.asarray(out[0][:4]).astype(np.uint64) | (
            np.asarray(out[1][:4]).astype(np.uint64) << np.uint64(32))
        assert [list(map(int, r)) for r in got] == expect, "pallas mismatch"
        t0 = time.time()
        for _ in range(10):
            out = kern(B.xp.asarray(lo), B.xp.asarray(hi), interpret=interp)
        jax.block_until_ready(out)
        results["pallas"] = (time.time() - t0) / 10
    except Exception as e:  # pallas may be unsupported off-TPU
        results["pallas_error"] = str(e)[:200]

    B.use_numpy()
    if native.available():
        arrs = [[int(v) for v in row] for row in vals]
        t0 = time.time()
        for row in arrs:
            native.perm8(row)
        results["native_cpp_seq"] = time.time() - t0

    results = {k: (round(v, 5) if isinstance(v, float) else v)
               for k, v in results.items()}
    print(json.dumps({"bench": "poseidon2_perm8_n8192", **results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
