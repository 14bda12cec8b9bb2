"""Per-subprotocol benchmark harness — the criterion analog of the
reference's `latticefold/benches/{ajtai,linearization,decomposition,folding,
e2e}.rs` over its `benches/config.toml` param grid, plus the BASELINE
workload configs (1k-step Poseidon2 chain, memory-heavy paged-RAM guest).

Emits one JSON line per measurement:
    {"suite", "config", "op", "value": seconds, "unit": "s", ...}

Usage:
    python bench/run.py nifs            # dummy-CCS subprotocols, small grid
    python bench/run.py nifs --all      # full goldilocks grid
    python bench/run.py poseidon2       # 1k-step hash chain + wide batch
    python bench/run.py guest-mem       # memory-heavy guest (VM + witness)
    python bench/run.py --device ...    # hot path on the active JAX device
                                        # (default: host numpy protocol glue)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# goldilocks rows from the reference benches/config.toml:116-131
# (x_len, kappa, wit_len, B, L, B_SMALL, K)
GOLDILOCKS_GRID = [
    (1, 8, 512, 256, 8, 2, 8),
    (1, 9, 512, 1024, 7, 2, 10),
    (1, 11, 512, 2048, 6, 2, 11),
    (1, 14, 512, 8192, 5, 2, 13),
    (1, 8, 1024, 256, 8, 2, 8),
    (1, 9, 1024, 1024, 7, 2, 10),
    (1, 8, 2048, 256, 8, 2, 8),
    (1, 8, 4096, 256, 8, 2, 8),
    (1, 8, 8192, 256, 8, 2, 8),
    (1, 8, 16384, 256, 8, 2, 8),
]
SMALL_GRID = [GOLDILOCKS_GRID[0], GOLDILOCKS_GRID[4], GOLDILOCKS_GRID[6]]


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed(fn, *args, reps=1, **kw):
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = fn(*args, **kw)
    return (time.time() - t0) / reps, out


def bench_nifs(grid, reps=1):
    from latticeum_tpu.commit.ajtai import AjtaiScheme
    from latticeum_tpu.crypto.transcript import Transcript
    from latticeum_tpu.field import goldilocks as gl, host as H
    from latticeum_tpu.nifs import (decomposition as dec, folding as fold,
                                    linearization as lin, nifs)
    from latticeum_tpu.nifs.nifs import DecompositionParams
    from latticeum_tpu.nifs.structs import CCCS, Witness
    from latticeum_tpu.nifs.test_fixtures import get_dummy_ccs, get_dummy_z
    import numpy as np

    for (x_len, kappa, wit_len, B_, L, b_small, K) in grid:
        cfg = f"x{x_len}_k{kappa}_n{wit_len}_B{B_}_L{L}_K{K}"
        params = DecompositionParams(B=B_, L=L, B_SMALL=b_small, K=K)
        ccs = get_dummy_ccs(x_len, wit_len, L)
        z = get_dummy_z(x_len, wit_len)
        w_dev = gl.from_int(np.array(z[x_len + 1:], dtype=object))
        wit = Witness.from_w_ccs(w_dev, B_, L)
        n_ajtai = int(wit.f[0].shape[0])
        scheme = AjtaiScheme.from_seed(kappa=kappa, n=n_ajtai)

        dt, cm = timed(scheme.commit_host, wit.f, reps=reps)
        emit(suite="nifs", config=cfg, op="ajtai_commit", value=round(dt, 5),
             unit="s", n=n_ajtai, kappa=kappa)

        cm_i = CCCS(cm=cm, x_ccs=z[:x_len])
        dt, (lcccs, lproof, _) = timed(
            lambda: lin.prove(cm_i, wit, Transcript(), ccs), reps=reps)
        emit(suite="nifs", config=cfg, op="linearization_prove",
             value=round(dt, 5), unit="s")
        dt, _ = timed(lambda: lin.verify(cm_i, lproof, Transcript(), ccs),
                      reps=reps)
        emit(suite="nifs", config=cfg, op="linearization_verify",
             value=round(dt, 5), unit="s")

        dt, (z_s, lcccs_s, wit_s, dproof) = timed(
            lambda: dec.prove(lcccs, wit, Transcript(), ccs, scheme, params),
            reps=reps)
        emit(suite="nifs", config=cfg, op="decomposition_prove",
             value=round(dt, 5), unit="s")
        dt, _ = timed(lambda: dec.verify(lcccs, dproof, Transcript(), ccs,
                                         params), reps=reps)
        emit(suite="nifs", config=cfg, op="decomposition_verify",
             value=round(dt, 5), unit="s")

        cm_i_s = lcccs_s + lcccs_s
        w2, z2 = wit_s + wit_s, z_s + z_s
        dt, (_, _, fproof) = timed(
            lambda: fold.prove(cm_i_s, w2, Transcript(), ccs, z2, params),
            reps=reps)
        emit(suite="nifs", config=cfg, op="folding_prove", value=round(dt, 5),
             unit="s")
        dt, _ = timed(lambda: fold.verify(cm_i_s, fproof, Transcript(), ccs,
                                          params), reps=reps)
        emit(suite="nifs", config=cfg, op="folding_verify",
             value=round(dt, 5), unit="s")

        # full NIFS e2e (lin + 2x dec + fold), fresh accumulator
        nw = ccs.n - ccs.l - 1
        w0 = Witness.from_w_ccs(gl.zeros((nw, 24)), B_, L)
        acc, _, _ = lin.prove(
            CCCS(cm=scheme.commit_host(w0.f), x_ccs=[H.ntt_zero()] * x_len),
            w0, Transcript(), ccs)
        dt, (_, _, eproof) = timed(
            lambda: nifs.prove(acc, w0, cm_i, wit, Transcript(), ccs, scheme,
                               params), reps=reps)
        emit(suite="nifs", config=cfg, op="e2e_prove", value=round(dt, 5),
             unit="s")
        dt, _ = timed(lambda: nifs.verify(acc, cm_i, eproof, Transcript(),
                                          ccs, params), reps=reps)
        emit(suite="nifs", config=cfg, op="e2e_verify", value=round(dt, 5),
             unit="s", proof_elems=nifs.proof_size_elements(eproof))


def bench_nifs_device(grid, reps=1):
    """Device (TPU) NIFS grid: the full fold (lin + 2x dec + fold) through
    DeviceNifs at each config — first pass compiles, second is steady-state.
    Emits per-subprotocol splits from the prover's own phase markers."""
    import numpy as np
    from latticeum_tpu import backend as B
    from latticeum_tpu.commit.ajtai import AjtaiScheme
    from latticeum_tpu.crypto.transcript import Transcript
    from latticeum_tpu.field import goldilocks as gl, host as H
    from latticeum_tpu.nifs import linearization as lin
    from latticeum_tpu.nifs.nifs import DecompositionParams
    from latticeum_tpu.nifs.structs import CCCS
    from latticeum_tpu.nifs.test_fixtures import get_dummy_ccs, get_dummy_z
    from latticeum_tpu.zkvm.accel import DeviceEngine
    from latticeum_tpu.zkvm.accel_nifs import DeviceNifs

    B.use_jax()
    for (x_len, kappa, wit_len, B_, L, b_small, K) in grid:
        cfg = f"x{x_len}_k{kappa}_n{wit_len}_B{B_}_L{L}_K{K}"
        params = DecompositionParams(B=B_, L=L, B_SMALL=b_small, K=K)
        ccs = get_dummy_ccs(x_len, wit_len, L)
        z = get_dummy_z(x_len, wit_len)
        w_limbs = gl.from_int(np.array(z[x_len + 1:], dtype=object))
        engine = DeviceEngine(ccs, params, tail_threshold=512)
        n_ajtai = wit_len * L
        scheme = AjtaiScheme.from_seed(kappa=kappa, n=n_ajtai,
                                       row_constant=True)
        rows_host = [[int(v) for v in r] for r in gl.to_int(
            (np.asarray(scheme.rows_limbs[0]),
             np.asarray(scheme.rows_limbs[1])))]
        dn = DeviceNifs(engine, ccs, params, rows_host, t_layout=True)

        dt, wit = timed(lambda: dn.build_witness(engine.put(w_limbs)))
        emit(suite="nifs-device", config=cfg, op="witness_build",
             value=round(dt, 5), unit="s", n=n_ajtai)
        dt, cm = timed(lambda: dn.commit(wit.f))
        emit(suite="nifs-device", config=cfg, op="ajtai_commit",
             value=round(dt, 5), unit="s", n=n_ajtai, kappa=kappa)

        cm_i = CCCS(cm=cm, x_ccs=z[:x_len])
        nw = ccs.n - ccs.l - 1
        w0 = dn.build_witness(engine.put(gl.zeros((nw, 24))))
        acc, _, _ = dn.lin_prove(
            CCCS(cm=dn.commit(w0.f), x_ccs=[H.ntt_zero()] * x_len),
            w0, Transcript())
        for it in range(2):
            timings = {}
            t0 = time.time()
            dn.prove(acc, w0, cm_i, wit, Transcript(), timings=timings)
            dt = time.time() - t0
            emit(suite="nifs-device", config=cfg,
                 op="e2e_prove" + ("_compile" if it == 0 else ""),
                 value=round(dt, 5), unit="s",
                 **{k: round(v[-1], 5) for k, v in timings.items()})


def bench_poseidon2(chain_steps=1000, wide_batch=8192):
    """BASELINE config: 1k-step Poseidon2 chain (the per-step state-digest
    chain) + one wide batched permutation sweep (the Merkle page workload)."""
    import numpy as np
    from latticeum_tpu.crypto import native
    from latticeum_tpu.crypto import poseidon2 as p2
    from latticeum_tpu.crypto.poseidon2_ref import hash_narrow as ref_narrow

    state = [1, 2, 3, 4]
    t0 = time.time()
    for _ in range(chain_steps):
        state = list(ref_narrow(state))
    emit(suite="poseidon2", config=f"chain{chain_steps}", op="narrow_chain",
         value=round(time.time() - t0, 5), unit="s",
         per_hash_us=round((time.time() - t0) / chain_steps * 1e6, 2))

    if native.available():
        t0 = time.time()
        st = [1, 2, 3, 4]
        for _ in range(chain_steps):
            st = list(native.hash_narrow(st))
        emit(suite="poseidon2", config=f"chain{chain_steps}",
             op="narrow_chain_native_cpp",
             value=round(time.time() - t0, 5), unit="s",
             per_hash_us=round((time.time() - t0) / chain_steps * 1e6, 2))

    rng = np.random.default_rng(5)
    leaves = rng.integers(0, 1 << 63, (wide_batch, 4), dtype=np.uint64)
    t0 = time.time()
    p2.hash_rows_narrow(leaves)
    emit(suite="poseidon2", config=f"wide{wide_batch}", op="batched_rows",
         value=round(time.time() - t0, 5), unit="s",
         per_hash_us=round((time.time() - t0) / wide_batch * 1e6, 2))
    if native.available():
        t0 = time.time()
        native.hash_rows_narrow(leaves)
        emit(suite="poseidon2", config=f"wide{wide_batch}",
             op="batched_rows_native_cpp",
             value=round(time.time() - t0, 5), unit="s",
             per_hash_us=round((time.time() - t0) / wide_batch * 1e6, 2))


def bench_guest_mem(pages=64, passes=2, fold_steps=0, device=False):
    """Memory-heavy paged-RAM guest: VM execution + witness arithmetization
    throughput; optionally folds `fold_steps` steps through the prover."""
    from latticeum_tpu.vm.assembler import mem_churn_guest
    from latticeum_tpu.vm.vm import new_vm_1mb
    from latticeum_tpu.zkvm.prover import ZkVmProver

    elf = mem_churn_guest(pages=pages, passes=passes)
    vm = new_vm_1mb().load_elf_data(elf)
    traces = []
    t0 = time.time()
    vm.run(lambda t, _vm: traces.append(t), max_cycles=2_000_000)
    dt = time.time() - t0
    emit(suite="guest-mem", config=f"p{pages}x{passes}", op="vm_execute",
         value=round(dt, 5), unit="s", traces=len(traces),
         traces_per_sec=round(len(traces) / dt, 1))

    if fold_steps:
        prover = ZkVmProver(device=device, t_layout=device)
        vm2 = new_vm_1mb().load_elf_data(elf)
        t0 = time.time()
        state = prover.prove_vm(vm2, max_steps=fold_steps)
        dt = time.time() - t0
        emit(suite="guest-mem", config=f"p{pages}x{passes}",
             op="fold_steps", value=round(dt, 5), unit="s",
             steps=state.steps, s_per_step=round(dt / max(state.steps, 1), 3))



def bench_rings(reps=1):
    """Cross-ring NIFS rows — the reference benches every subprotocol over
    its 4 ring models (latticefold/benches/*, benches/config.toml); this
    runs the ring-generic NIFS (nifs/generic.py) per model at host scale
    on the toy CCS (the reference's benches are CPU too).  Frog is skipped
    for NIFS exactly as the reference's test/bench matrix does (no
    homogenization; nifs/tests.rs:119-203)."""
    from latticeum_tpu.nifs import generic as G
    from latticeum_tpu.ring import models
    from tests.test_generic_nifs import _params, _setup

    for model in (models.GOLDILOCKS, models.BABYBEAR, models.STARK):
        ring = G.GRing(model)
        params = _params(ring)
        t_set = time.time()
        _, ccs, z, wit, scheme, cm_i, acc, w_acc = _setup(ring)
        emit(suite="rings", ring=model.name, op="setup",
             value=round(time.time() - t_set, 4), unit="s",
             config={"B": params["B"], "L": params["L"],
                     "K": params["K"], "m": ccs.m})

        tr = G.ShaTranscript(ring)
        t_lin = time.time()
        lin_out = G.lin_prove(ring, ccs, cm_i, wit, tr)
        emit(suite="rings", ring=model.name, op="linearization",
             value=round(time.time() - t_lin, 4), unit="s")

        t_dec = time.time()
        G.dec_prove(ring, ccs, scheme, lin_out[0], wit, params,
                    G.ShaTranscript(ring))
        emit(suite="rings", ring=model.name, op="decomposition",
             value=round(time.time() - t_dec, 4), unit="s")

        tp = G.ShaTranscript(ring)
        t_full = time.time()
        folded, w0, proof = G.nifs_prove(ring, ccs, scheme, acc, w_acc,
                                         cm_i, wit, params, tp)
        emit(suite="rings", ring=model.name, op="nifs_prove",
             value=round(time.time() - t_full, 4), unit="s")

        tv = G.ShaTranscript(ring)
        t_ver = time.time()
        folded_v = G.nifs_verify(ring, ccs, acc, cm_i, proof, params, tv)
        emit(suite="rings", ring=model.name, op="nifs_verify",
             value=round(time.time() - t_ver, 4), unit="s",
             verified=bool(folded_v == folded and tv.state == tp.state))


def main():
    args = sys.argv[1:]
    device = "--device" in args
    if device:
        pass  # active JAX platform (axon tunnel -> real TPU)
    else:
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                              "/tmp/latticeum_jax_cache_cpu")
    suites = [a for a in args if not a.startswith("-")] or ["nifs"]
    for s in suites:
        if s == "nifs":
            grid = GOLDILOCKS_GRID if "--all" in args else SMALL_GRID
            if device:
                bench_nifs_device(grid)
            else:
                bench_nifs(grid)
        elif s == "poseidon2":
            bench_poseidon2()
        elif s == "rings":
            bench_rings()
        elif s == "guest-mem":
            steps = 2 if "--fold" in args else 0
            bench_guest_mem(fold_steps=steps, device=device)
        else:
            print(f"unknown suite {s}", file=sys.stderr)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
