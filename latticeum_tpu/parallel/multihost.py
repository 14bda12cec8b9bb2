"""Multi-host (DCN) scaffolding: jax.distributed init + global mesh.

The reference is single-process (rayon threads only); the TPU-native scale-
out path is: per-host JAX processes joined via `jax.distributed.initialize`
(DCN coordination), one global `Mesh` over every chip of every host, and
GSPMD-inserted collectives — psum over ICI within a slice, DCN between
slices (SURVEY §2.9; BASELINE >=80% scaling at 2+ hosts).

Axis layout for the fold (same as parallel/fold_mesh.py single-host):
  * "rows"  — the sum-check hypercube / witness rows / Ajtai N columns.
    Row-sharding the g stack makes every round sum a psum; the per-round
    message is 24*(degree+1) u32 limbs, so cross-host traffic per fold is
    KBs — DCN latency-bound, not bandwidth-bound, which is why the fold
    scales across hosts at all.
  * "slots" — reserved for ring-slot sharding of CRT-heavy phases (unused
    at the current 24-wide ring; a placeholder axis of size 1).

Real 2-host hardware is not reachable in this environment; the code path is
exercised by scripts/dryrun_multihost.py, which starts 2 LOCAL processes
(each with 4 virtual CPU devices) that rendezvous through the loopback
coordinator and run a rows-sharded production-comb fold round over the
8-device global mesh.
"""

from __future__ import annotations

import numpy as np


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Join (or no-op single-process) the jax.distributed runtime.

    Arguments default from the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) so launchers can stay declarative."""
    import os

    import jax
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return False          # single-process run; nothing to initialize
    num_processes = int(num_processes
                        or os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = int(process_id if process_id is not None
                     else os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def global_mesh(rows: int | None = None):
    """Mesh over ALL devices (every process's chips), axes (rows, slots).

    rows defaults to the global device count; slots stays 1 until ring-slot
    sharding is enabled."""
    import jax
    from jax.sharding import Mesh
    devs = np.array(jax.devices())
    rows = rows or len(devs)
    assert len(devs) % rows == 0, (len(devs), rows)
    return Mesh(devs.reshape(rows, len(devs) // rows), ("rows", "slots"))


def fold_round_global(mesh, m: int = 1 << 10, K: int = 15, b_small: int = 2):
    """One production-comb fold sum-check ROUND over the global mesh:
    the (5 + 2K*TAU, 24, m) g parts rows-sharded across every host's
    devices; the round sums reduce with a GSPMD all-reduce that rides DCN
    between processes.  Returns the (degree+1, 24) sums as host ints —
    identical on every process (the cross-host agreement check)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .. import backend as B
    from ..crypto.transcript import Transcript
    from ..nifs import folding as fold
    from ..zkvm import accel_t
    from . import fold_mesh

    head_h, tail_h = fold_mesh._mk_g(m, K)
    comb = accel_t.make_comb_fold_batched(b_small, K)
    with B.numpy_mode():
        _, _, _, mu_s = fold.squeeze_alpha_beta_zeta_mu(
            Transcript(), int(np.log2(m)), K)
        mu_c = fold.mu_consts(mu_s)

    sh = NamedSharding(mesh, P(None, None, "rows"))
    parts = [tuple(jax.device_put(a, sh) for a in head_h),
             tuple(jax.device_put(a, sh) for a in tail_h)]
    consts = jax.tree_util.tree_map(jax.device_put, mu_c)

    def sums_fn(ps, c):
        return accel_t.sumcheck_sums_parts(ps, 2 * b_small, comb, c)

    with B.jax_mode():
        sums = jax.jit(sums_fn)(parts, consts)
    from ..field import goldilocks as gl
    return gl.to_int((np.asarray(sums[0]), np.asarray(sums[1]))).tolist()


def full_fold_global(mesh, m: int = 1 << 10, K: int = 15, b_small: int = 2):
    """The COMPLETE production fold sum-check (all log2(m) rounds, real
    Fiat-Shamir transcript, fixed-width buffers) over the global multi-
    process mesh.  Every process runs the identical host program; the
    per-round sums come back replicated (out_shardings P()) so each
    process's transcript evolves identically — the same multi-controller
    SPMD pattern a real multi-host pod uses.

    Returns (proof, chals, final, transcript_state, wall_seconds); all
    values are bit-identical across processes and to a single-process run
    (scripts/dryrun_multihost.py asserts both)."""
    import time

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .. import backend as B
    from ..crypto.transcript import Transcript
    from ..field import goldilocks as gl
    from ..nifs import folding as fold
    from ..poly import mle as mle_mod
    from ..zkvm import accel_t
    from . import fold_mesh

    nv = int(np.log2(m))
    head_h, tail_h = fold_mesh._mk_g(m, K)
    comb = accel_t.make_comb_fold_batched(b_small, K)
    with B.numpy_mode():
        _, _, _, mu_s = fold.squeeze_alpha_beta_zeta_mu(Transcript(), nv, K)
        mu_c = fold.mu_consts(mu_s)

    sh = NamedSharding(mesh, P(None, None, "rows"))
    repl = NamedSharding(mesh, P())
    parts = [tuple(jax.device_put(a, sh) for a in head_h),
             tuple(jax.device_put(a, sh) for a in tail_h)]
    consts = jax.tree_util.tree_map(jax.device_put, mu_c)

    def sums_fn(ps, c):
        return accel_t.sumcheck_sums_parts(ps, 2 * b_small, comb, c)

    def finals_fn(ps):
        return (B.xp.concatenate([p[0][..., 0] for p in ps]),
                B.xp.concatenate([p[1][..., 0] for p in ps]))

    jf = jax.jit(sums_fn, out_shardings=(repl, repl))
    ff = jax.jit(accel_t.fold_round_parts)
    fin = jax.jit(finals_fn, out_shardings=(repl, repl))

    def fetch(x):
        return np.asarray(x.addressable_data(0))

    transcript = Transcript()
    transcript.absorb_u64(nv)
    transcript.absorb_u64(2 * b_small)
    proof, chals = [], []
    t0 = time.time()
    with B.jax_mode():
        for _ in range(nv):
            sums = jf(parts, consts)
            ints = gl.to_int((fetch(sums[0]), fetch(sums[1])))
            msg = [[int(v) for v in row] for row in ints]
            transcript.absorb_slice(msg)
            proof.append(msg)
            r = transcript.get_challenge()
            transcript.absorb_fq3(r)
            chals.append(r)
            with B.numpy_mode():
                r_limbs = mle_mod.fq3_const(r)
            flat = [a for p in parts for a in p]
            parts = list(ff(r_limbs, *flat))
        final_dev = fin(parts)
    final = (fetch(final_dev[0]).reshape(-1, 24),
             fetch(final_dev[1]).reshape(-1, 24))
    wall = time.time() - t0
    return proof, chals, final, list(transcript.ch.state), wall
