"""Bit-exactness of the Pallas sum-check round kernels.

The kernels only lower through Mosaic (interpret mode livelocks the
2-core bench host — XLA:CPU compiles the op-by-op interpreter program
pathologically), so this test is gated to hosts with the real chip:
run with LATTICEUM_TPU_TESTS=1.  The same oracle check runs (and its log
is committed) via scripts/pallas_ab.py each round; the end-to-end
guarantee is scripts/pallas_step_check.py — two full IVC steps with
LATTICEUM_PALLAS=1 vs =0 must produce identical acc/step digests and
fold sum-check proofs.
"""

import os

import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.environ.get("LATTICEUM_TPU_TESTS"),
        reason="needs the real TPU (Mosaic); see scripts/pallas_ab.py"),
]


def test_pallas_kernels_match_oracle_on_chip():
    import subprocess
    import sys
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "scripts", "pallas_ab.py")],
        capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    assert '"pass": true' in r.stdout
    assert '"pass": false' not in r.stdout
