"""Production linearization sum-check + CRT slot exchange over the mesh.

Completes the §2.9 sharding coverage beyond the fold sum-check
(fold_mesh.py): the LIN sum-check with the real zkVM multiset structure
(125 matrices / 52 multisets) rows-sharded and bit-exact vs single-device,
and the CRT butterfly with the RING-COORDINATE axis sharded over the
'slots' mesh axis — the layout whose stage exchange rides all_to_all /
collective-permute on ICI (BASELINE's NTT-stage exchange item; the 24-wide
coefficient axis is tiny, so production keeps it replicated and shards the
batch — this demonstrates and MEASURES the slots-axis path).
"""

from __future__ import annotations

import numpy as np

from .. import backend as B
from ..field import goldilocks as gl
from .fold_mesh import _mk_engine


def _zkvm_S_c():
    """The real zkVM multiset structure (125 matrices / 52 multisets) —
    shapes only, no matrix values needed for the sum-check kernels."""
    from ..zkvm.builder import create_riscv_ccs
    from ..zkvm.layout import CCSLayout
    from ..zkvm.params import default_params
    ccs = create_riscv_ccs(CCSLayout(default_params()))
    return tuple(tuple(s) for s in ccs.S), [list(c) for c in ccs.c], ccs.t


def run_lin_sumcheck(engine, g_dev, m, S, c_consts, t_rows, log=None):
    """One transcripted lin sum-check over whatever sharding g_dev has."""
    from ..crypto.transcript import Transcript
    from ..nifs import linearization as lin
    from ..zkvm import accel_t

    nv = int(np.log2(m))
    degree = max(len(s) for s in S) + 1
    comb = accel_t.make_comb_lin_batched(S, t_rows)
    accel_t.register_std_comb("lin_mesh", lin.make_comb_fn2(S))
    with B.numpy_mode():
        consts = gl.from_int(np.array(c_consts, dtype=object))
    t = Transcript()
    proof, chals, final = accel_t.run_sumcheck_shrink(
        engine, t, g_dev, nv, degree, "lin_mesh", comb,
        engine.put_small(consts), log=log)
    return proof, chals, final, t.ch.state


def sharded_lin_vs_single(n_devices: int, m: int = 1 << 10,
                          tail: int = 256, log=None,
                          with_collective_count: bool = True):
    """Rows-shard the PRODUCTION-structure lin sum-check (126-row stack,
    degree-9 comb over the real 52 multisets) and assert bit-exact proof +
    transcript equality vs the single-device run."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from . import mesh as M
    from ..zkvm import accel_t

    S, c_consts, t_rows = _zkvm_S_c()
    engine = _mk_engine(tail)
    rng = np.random.default_rng(17)
    vals = rng.integers(0, (1 << 64) - (1 << 32) + 1,
                        (t_rows + 1, 24, m), dtype=np.uint64)
    g_h = ((vals & 0xFFFFFFFF).astype(np.uint32),
           (vals >> 32).astype(np.uint32))

    with B.jax_mode():
        g_1 = engine.put(g_h)
    p1, c1, f1, ts1 = run_lin_sumcheck(engine, g_1, m, S, c_consts,
                                       t_rows, log=log)
    del g_1

    engine2 = _mk_engine(tail)
    mesh = M.make_mesh(n_devices)
    sh = NamedSharding(mesh, P(None, None, "rows"))
    g_n = tuple(jax.device_put(a, sh) for a in g_h)
    colls = None
    if with_collective_count:
        degree = max(len(s) for s in S) + 1
        comb = accel_t.make_comb_lin_batched(S, t_rows)
        with B.numpy_mode():
            consts = gl.from_int(np.array(c_consts, dtype=object))

        def sums_fn(g, cc):
            return accel_t.sumcheck_sums_parts(
                [g], degree, lambda v, c: comb(v[0], c), cc)

        with B.jax_mode():
            txt = jax.jit(sums_fn).lower(
                g_n, engine2.put_small(consts)).compile().as_text()
        colls = {kind: txt.count(f" {kind}(") + txt.count(f" {kind}-start(")
                 for kind in ("all-reduce", "all-gather", "reduce-scatter",
                              "collective-permute", "all-to-all")}
    pn, cn, fn, tsn = run_lin_sumcheck(engine2, g_n, m, S, c_consts,
                                       t_rows, log=log)
    return {
        "m": m, "t_rows": t_rows, "multisets": len(S),
        "devices": n_devices,
        "proof_equal": p1 == pn,
        "chals_equal": c1 == cn,
        "final_equal": (np.array_equal(f1[0], fn[0])
                        and np.array_equal(f1[1], fn[1])),
        "transcript_equal": ts1 == tsn,
        "collectives_round0": colls,
    }


def slots_crt_exchange(n_rows: int = 4, n_slots: int = 2,
                       batch: int = 1 << 8):
    """CRT with the 24-wide RING-COORDINATE axis sharded over the 'slots'
    mesh axis: the butterfly stages mix coefficients across shards, so XLA
    must insert a cross-slot exchange (all_to_all / collective-permute /
    all-gather on ICI).  Returns the measured collective counts and the
    bit-exactness flag vs the replicated run.

    Production keeps the 24-axis replicated (it is tiny) — this pins the
    slots-axis code path and its collectives for the day the ring axis is
    worth sharding (BASELINE §2.9 NTT-stage exchange)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.sharding import Mesh
    from ..ring import rq

    devs = np.array(jax.devices()[:n_rows * n_slots]).reshape(
        n_rows, n_slots)
    mesh = Mesh(devs, ("rows", "slots"))
    rng = np.random.default_rng(23)
    vals = rng.integers(0, (1 << 64) - (1 << 32) + 1, (batch, 24),
                        dtype=np.uint64)
    x = ((vals & 0xFFFFFFFF).astype(np.uint32),
         (vals >> 32).astype(np.uint32))

    B.use_jax()
    try:
        # replicated reference
        ref = jax.jit(rq.crt)(tuple(np.asarray(a) for a in x))
        ref = tuple(np.asarray(a) for a in ref)

        # coefficient axis sharded over 'slots', batch over 'rows'
        sh = NamedSharding(mesh, P("rows", "slots"))
        x_sh = tuple(jax.device_put(a, sh) for a in x)
        jitted = jax.jit(rq.crt, out_shardings=NamedSharding(
            mesh, P("rows", "slots")))
        txt = jitted.lower(x_sh).compile().as_text()
        colls = {kind: txt.count(f" {kind}(") + txt.count(f" {kind}-start(")
                 for kind in ("all-to-all", "collective-permute",
                              "all-gather", "all-reduce")}
        out = jitted(x_sh)
        out = tuple(np.asarray(a) for a in out)
    finally:
        B.use_numpy()
    return {
        "mesh": {"rows": n_rows, "slots": n_slots},
        "batch": batch,
        "equal": (np.array_equal(out[0], ref[0])
                  and np.array_equal(out[1], ref[1])),
        "collectives": colls,
        "exchanged": sum(colls.values()) > 0,
    }
