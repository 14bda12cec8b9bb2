"""The production-structure linearization sum-check sharded over the
8-device virtual mesh must be bit-exact with the single-device run
(VERDICT r04 item 5: regression protection for the 126-row / 52-multiset
degree-9 comb, not just the K=2 toy shape).

The full m=2^10 run with collective counts lives in
scripts/mesh_validate.py (MESH_r04.log); here m is reduced to keep the
XLA:CPU compile bill inside the suite while keeping the production comb
structure (t=125 matrices, q=52 multisets from the real builder).
"""

from latticeum_tpu import backend as B

import pytest

pytestmark = pytest.mark.slow


def test_sharded_lin_production_structure_matches_single_device():
    B.use_jax()
    try:
        from latticeum_tpu.parallel import lin_mesh
        res = lin_mesh.sharded_lin_vs_single(8, m=1 << 8, tail=64,
                                             with_collective_count=False)
    finally:
        B.use_numpy()
    assert res["proof_equal"]
    assert res["chals_equal"]
    assert res["final_equal"]
    assert res["transcript_equal"]
