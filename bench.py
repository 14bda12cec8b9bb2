"""Benchmark: per-step folding compute at reference scale on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the Rust reference proves fib-100 (16 steps) in ~32 s
on a dev machine => ~2.0 s per folding step.  Until the full zkVM pipeline is
wired to the bench, this measures the dominant per-step compute bundle at the
reference's problem size (CCS m=2^17 hypercube, sum-check degree 9 with a
10-MLE product comb, Ajtai kappa=32 x N=2^17 ring commitment) — the hot path
identified by the reference's flame graphs (dp3 evaluation.tex:139-160).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/latticeum_jax_cache")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_STEP_SECONDS = 2.0  # ~32 s / 16 folded steps (README.md:93-102)


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
    from latticeum_tpu import backend as B
    B.use_jax()
    from latticeum_tpu.parallel import kernels as K

    M = 1 << 17          # CCS rows (zkvm ccs.rs:55-69)
    K_MLES = 10          # product width ~ max multiset size
    DEGREE = 9           # linearization sum-check degree (ccs.rs:65)
    KAPPA = 32           # Ajtai rows (ccs.rs:43)

    mles = K.rand_mles(K_MLES, M, seed=1)
    f = tuple(x[0] for x in K.rand_mles(1, M, seed=3))
    # Ajtai matrix with the reference's constant-row structure: one ring
    # element per row broadcast across N columns (commitment_scheme.rs:29-33)
    row = K.rand_mles(KAPPA, 1, seed=2)
    matrix = (jax_broadcast(row[0], (KAPPA, M, 24)),
              jax_broadcast(row[1], (KAPPA, M, 24)))

    round_fn = jax.jit(
        lambda m: K.sumcheck_round_evals(m, DEGREE, K.product_comb))
    commit_fn = jax.jit(K.ajtai_commit_kernel)

    import numpy as np

    def sync(out):
        # block_until_ready is unreliable over the axon tunnel; force a
        # host fetch of a small slice to measure true completion.
        return np.asarray(jax.tree_util.tree_leaves(out)[0])[..., 0]

    # warm up / compile
    sync(round_fn(mles))
    sync(commit_fn(matrix, f))

    # a folding step ~ 2 full sum-checks (17 rounds, halving sizes; total
    # work ~= 2x the first round each) + ~16 Ajtai commits (decomposition).
    # Measure the two primitives and extrapolate conservatively.
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        sync(round_fn(mles))
    round_t = (time.time() - t0) / iters

    t0 = time.time()
    for _ in range(iters):
        sync(commit_fn(matrix, f))
    commit_t = (time.time() - t0) / iters

    step_seconds = 2 * (2 * round_t * 2) + 16 * commit_t
    # 2 sumchecks x (sum over halving rounds ~ 2x round0) x safety 2
    vs_baseline = BASELINE_STEP_SECONDS / step_seconds

    print(json.dumps({
        "metric": "fold_step_core_time",
        "value": round(step_seconds, 4),
        "unit": "s/step",
        "vs_baseline": round(vs_baseline, 2),
    }))


def jax_broadcast(x, shape):
    from latticeum_tpu import backend as B
    return B.xp.broadcast_to(x, shape)


if __name__ == "__main__":
    main()
