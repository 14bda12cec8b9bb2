"""The production fold sum-check sharded over the 8-device virtual mesh
must be bit-exact with the single-device run (proof, challenges, final
values, transcript state, Ajtai commitment)."""

from latticeum_tpu import backend as B


import pytest

# XLA-compile-heavy tier: minutes on a small host (run with -m 'not slow'
# for the fast host-math tier; the full suite still runs these by default)
pytestmark = pytest.mark.slow


def test_sharded_fold_sumcheck_matches_single_device():
    B.use_jax()
    try:
        from latticeum_tpu.parallel import fold_mesh
        res = fold_mesh.sharded_vs_single(8, m=1 << 9, K=2, tail=64,
                                          with_collective_count=False)
    finally:
        B.use_numpy()
    assert res["proof_equal"]
    assert res["chals_equal"]
    assert res["final_equal"]
    assert res["transcript_equal"]
    assert res["ajtai_equal"]
    assert res["rounds_total"] == 9
