"""IVC driver: run a guest, arithmetize each trace, commit, fold.

Mirrors the reference main loop (latticeum/crates/zkvm/src/main.rs:53-235):
per instruction — update memory commitments, build IVCStepInput, arithmetize,
(debug) check_relation, commit z, fold into the running accumulator with a
FRESH transcript per fold, collect verifier vars, recompute state/acc/step
commitments.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np

from .. import backend as B
from ..commit.ajtai import AjtaiScheme
from ..crypto import poseidon2 as p2b
from ..crypto.transcript import Transcript
from ..field import goldilocks as gl, host as H
from ..nifs import linearization as lin, nifs as nifs_mod
from ..nifs.nifs import DecompositionParams
from ..nifs.structs import CCCS, Witness
from ..vm.vm import VM, new_vm_8mb
from .builder import create_riscv_ccs
from .collect import generate_verification_witness_vars
from .commitments import ZERO_COMM, ZkVmCommitter, merkle_open
from .layout import CCSLayout
from .params import default_params
from .witness import IVCStepInput, arithmetize

P = H.P


class IncrementalMemTree:
    """Merkle tree over memory pages with O(log n) updates per write."""

    def __init__(self, vm: VM):
        from ..crypto import native
        rows = np.array([vm.page_words(i) for i in range(vm.page_count)],
                        dtype=np.uint64)
        if native.available():
            lvl = native.hash_rows_narrow(rows)
            self.levels = [[[int(v) for v in d] for d in lvl]]
            while len(self.levels[-1]) > 1:
                nxt = native.compress_level(
                    np.array(self.levels[-1], dtype=np.uint64))
                self.levels.append([[int(v) for v in d] for d in nxt])
        else:
            levels = p2b.merkle_root_rows(rows)
            self.levels = []
            for lv in levels:
                ints = gl.to_int(lv)
                self.levels.append([[int(v) for v in row] for row in ints])
        self.vm = vm

    def update_page(self, page_index: int):
        from .commitments import hash_narrow as _hn
        from ..crypto import poseidon2_ref as p2
        digest = _hn(self.vm.page_words(page_index))
        self.levels[0][page_index] = digest
        idx = page_index
        for lvl in range(len(self.levels) - 1):
            idx2 = idx ^ 1
            left = self.levels[lvl][min(idx, idx2)]
            right = self.levels[lvl][max(idx, idx2)]
            idx >>= 1
            self.levels[lvl + 1][idx] = p2.compress8(left, right)

    @property
    def root(self):
        return self.levels[-1][0]

    def open(self, page_index: int):
        return merkle_open(self.levels, page_index)


@dataclass
class IVCState:
    ivc_step_comm: tuple
    ivc_step: int
    z_0_comm: list
    z_i_comm: list
    acc_comm: list
    acc: object
    w_acc: object
    folding_proof: object
    folding_proof_vars: object


class ZkVmProver:
    def __init__(self, params=None, scheme_seed: int = 0, debug: bool = False,
                 device: bool = False, t_layout: bool = True,
                 tail_threshold: int = 2048, log=None,
                 reference_scheme: bool = False,
                 general_ajtai: bool = False):
        """device=True routes the fold hot path (witness pipeline, Ajtai,
        both sum-checks, evaluation claims) through jitted TPU kernels
        (accel.DeviceEngine + accel_nifs.DeviceNifs); t_layout selects the
        transposed bit-reversed memory layout needed at production scale.
        The transcript and all proof messages are bit-identical either way.
        """
        import time as _time
        _t0 = [_time.time()]

        def _mark(name):
            if log:
                now = _time.time()
                log(f"  init.{name}: {now-_t0[0]:.2f}s")
                _t0[0] = now

        self.params = params or default_params()
        self.layout = CCSLayout(self.params)
        _mark("layout")
        self.ccs = create_riscv_ccs(self.layout)
        _mark("ccs_build")
        self.dp = DecompositionParams(B=self.params.B, L=self.params.L,
                                      B_SMALL=self.params.B_SMALL,
                                      K=self.params.K)
        n_ajtai = self.layout.w_size * self.params.L
        if reference_scheme:
            # bit-exact ark_std::test_rng matrix for Rust-parity runs
            self.scheme = AjtaiScheme.from_reference_rng(self.params.KAPPA,
                                                         n_ajtai)
        elif general_ajtai:
            # binding mode: full dense uniform matrix, real device matvec
            self.scheme = AjtaiScheme.from_seed_general(self.params.KAPPA,
                                                        n_ajtai,
                                                        seed=scheme_seed)
        else:
            self.scheme = AjtaiScheme.from_seed(self.params.KAPPA, n_ajtai,
                                                seed=scheme_seed)
        _mark("ajtai_scheme")
        self.committer = ZkVmCommitter()
        self.debug = debug
        self.timings = {}
        self.log = log
        self.device = device
        self.dn = None
        if device:
            from .accel import DeviceEngine
            from .accel_nifs import DeviceNifs
            engine = DeviceEngine(self.ccs, self.params,
                                  tail_threshold=tail_threshold)
            _mark("device_engine")
            if getattr(self.scheme, "row_constant", False):
                rows_host = [[int(v) for v in r]
                             for r in gl.to_int(
                                 (np.asarray(self.scheme.rows_limbs[0]),
                                  np.asarray(self.scheme.rows_limbs[1])))]
            else:
                rows_host = None
            self.dn = DeviceNifs(engine, self.ccs, self.params, rows_host,
                                 t_layout=t_layout, scheme=self.scheme)
            _mark("device_nifs")

    # -- pieces ----------------------------------------------------------
    def initialize_accumulator(self, initial_step_comm=ZERO_COMM):
        """(main.rs:305-344): zero witness -> linearization -> initial acc."""
        x_ccs = [H.ntt_from_u64(int(v)) for v in initial_step_comm]
        if self.dn is not None:
            w = np.zeros((self.layout.w_size, 24), np.uint32)
            wit = self.dn.build_witness(self.dn.e.put((w, w)))
            cm_i = CCCS(cm=self.dn.commit(wit.f), x_ccs=x_ccs)
            acc, _, _ = self.dn.lin_prove(cm_i, wit, Transcript(),
                                          log=self.log)
            return acc, wit
        w = gl.zeros((self.layout.w_size, 24))
        wit = Witness.from_w_ccs(w, self.params.B, self.params.L)
        cm = self.scheme.commit_host(wit.f)
        cm_i = CCCS(cm=cm, x_ccs=x_ccs)
        acc, _, _ = lin.prove(cm_i, wit, Transcript(), self.ccs)
        return acc, wit

    def commit_z(self, z_rings):
        """(main.rs:347-367): split z, build Witness, Ajtai commit."""
        lcfg = self.layout
        x_ccs = z_rings[:self.ccs.l]
        w_host = z_rings[self.ccs.l + 1:]
        w_limbs = gl.from_int(np.array(w_host, dtype=object))
        if self.dn is not None:
            wit = self.dn.build_witness(self.dn.e.put(w_limbs))
            return CCCS(cm=self.dn.commit(wit.f), x_ccs=x_ccs), wit
        wit = Witness.from_w_ccs(w_limbs, self.params.B, self.params.L)
        cm = self.scheme.commit_host(wit.f)
        return CCCS(cm=cm, x_ccs=x_ccs), wit

    def fold(self, acc, w_acc, cm_i, w_i):
        """Fresh transcript per fold (main.rs:379-404).

        The transcript records its sample stream so the verifier-vars
        collector can replay challenges without re-hashing (~0.25 s/step
        of duplicated Poseidon2 absorbs at production scale)."""
        t = Transcript(record_samples=True)
        self._last_fold_samples = t.samples
        if self.dn is not None:
            return self.dn.prove(acc, w_acc, cm_i, w_i, t, log=self.log,
                                 timings=self.timings)
        return nifs_mod.prove(acc, w_acc, cm_i, w_i, t, self.ccs,
                              self.scheme, self.dp)

    def verify_fold(self, acc, cm_i, proof):
        return nifs_mod.verify(acc, cm_i, proof, Transcript(), self.ccs,
                               self.dp)

    # -- main loop --------------------------------------------------------
    def prove_vm(self, vm: VM, max_steps=None, on_step=None,
                 checkpoint_dir=None, checkpoint_every=10, resume=False):
        """Run the loaded VM, folding every instruction. Returns IVCState.

        With checkpoint_dir, the resumable IVC state is written every
        `checkpoint_every` folds; resume=True restores the newest checkpoint
        (VM machine state included) and continues from there.
        """
        from . import checkpoint as ckpt
        committer = self.committer
        raw_code = vm.elf.raw_code.bytes
        code_comm = committer.vm_code_comm(raw_code)

        start_cycle = 0
        resumed = None
        if resume and checkpoint_dir:
            path = ckpt.latest(checkpoint_dir)
            if path:
                meta, acc_r, w_acc_r, step_comm_r = ckpt.load(
                    path, vm, self.params)
                resumed = (meta, acc_r, w_acc_r, step_comm_r)

        mem_tree = IncrementalMemTree(vm)

        if resumed is None:
            mem_comm = committer.vm_mem_comm(vm)
            mem_ops_comm = list(ZERO_COMM)
            z_0_comm = self._state_comm(code_comm, vm.pc, mem_comm, vm.regs,
                                        mem_ops_comm)
            acc, w_acc = self.initialize_accumulator()
            acc_0_comm = committer.acc_comm(acc)
            step0_comm = committer.ivc_step_comm(0, z_0_comm, z_0_comm,
                                                 acc_0_comm)
            state = IVCState(ivc_step_comm=step0_comm, ivc_step=0,
                             z_0_comm=z_0_comm, z_i_comm=z_0_comm,
                             acc_comm=acc_0_comm, acc=acc, w_acc=w_acc,
                             folding_proof=None, folding_proof_vars=None)
        else:
            meta, acc_r, w_acc_r, step_comm_r = resumed
            if self.dn is not None:
                w_acc_r = self.dn.witness_from_f_coeff(
                    self.dn.e.put((np.asarray(w_acc_r.f_coeff[0]),
                                   np.asarray(w_acc_r.f_coeff[1]))))
            mem_comm = mem_tree.root
            mem_ops_comm = list(meta["mem_ops_comm"])
            state = IVCState(ivc_step_comm=step_comm_r,
                             ivc_step=meta["step"],
                             z_0_comm=meta["z_0_comm"],
                             z_i_comm=meta["z_i_comm"],
                             acc_comm=meta["acc_comm"], acc=acc_r,
                             w_acc=w_acc_r, folding_proof=None,
                             folding_proof_vars=meta["folding_proof_vars"])
            start_cycle = meta["step"]

        steps = [state.ivc_step]

        def intercept(trace, vm_ref):
            step = trace.cycle + 1
            if max_steps is not None and step > max_steps:
                raise StopIteration
            import os as _os
            if _os.environ.get("LATTICEUM_PROFILE_STEP") == str(step):
                import cProfile
                import pstats
                pr = cProfile.Profile()
                pr.enable()
                try:
                    return _intercept_body(trace, vm_ref, step)
                finally:
                    pr.disable()
                    pstats.Stats(pr).sort_stats("cumulative").dump_stats(
                        f"/tmp/step{step}.prof")
            return _intercept_body(trace, vm_ref, step)

        def _intercept_body(trace, vm_ref, step):
            t0 = time.time()
            mem_op = trace.side_effects.memory_op
            nonlocal mem_comm, mem_ops_comm
            if mem_op is not None:
                page_idx, _ = vm_ref.physical_addr(mem_op.address & ~0b11)
                mem_tree.update_page(page_idx)
                mem_comm = mem_tree.root
                mem_ops_comm = committer.vm_mem_ops_vec_comm(mem_ops_comm,
                                                             mem_op)

            inp = IVCStepInput(
                ivc_step_comm=state.ivc_step_comm,
                ivc_step=step - 1,
                state_0_comm=state.z_0_comm,
                state_comm=state.z_i_comm,
                acc_comm=state.acc_comm,
                acc=state.acc,
                folding_proof_vars=state.folding_proof_vars,
                w_acc=state.w_acc,
                trace=trace,
            )
            def mark(name, _t=[t0]):
                now = time.time()
                self.timings.setdefault(name, []).append(now - _t[0])
                if self.log:
                    self.log(f" step.{name}: {now-_t[0]:.2f}s")
                _t[0] = now

            z = arithmetize(inp, self.layout)
            mark("arithmetize")
            if self.debug:
                self._check_relation(z, trace)
                mark("relation_check")
            cm_i, w_i = self.commit_z(z)
            mark("commit_z")
            folded_acc, folded_w, proof = self.fold(state.acc, state.w_acc,
                                                    cm_i, w_i)
            mark("fold_total")
            if self.debug:
                self.verify_fold(state.acc, cm_i, proof)
                mark("native_verify")
            import os as _os
            # replay the prover's recorded transcript samples (bit-exact;
            # falls back to a full re-hashing replay if recording is off)
            samples = getattr(self, "_last_fold_samples", None)
            if samples is not None:
                from ..crypto.transcript import ReplayTranscript
                factory = (lambda: ReplayTranscript(samples))
            else:
                factory = Transcript
            if _os.environ.get("LATTICEUM_PROFILE_COLLECT"):
                import cProfile
                import pstats
                pr = cProfile.Profile()
                pr.enable()
                fvars = generate_verification_witness_vars(
                    state.acc, cm_i, proof, self.ccs, self.dp, factory)
                pr.disable()
                pstats.Stats(pr).sort_stats("cumulative").dump_stats(
                    f"/tmp/collect_step{step}.prof")
            else:
                fvars = generate_verification_witness_vars(
                    state.acc, cm_i, proof, self.ccs, self.dp, factory)
            mark("collector")

            state_i_comm = self._state_comm(code_comm, trace.output.pc,
                                            mem_comm, trace.output.regs,
                                            mem_ops_comm)
            mark("state_comms")
            acc_comm = committer.acc_comm(folded_acc)
            step_comm = committer.ivc_step_comm(step, state.z_0_comm,
                                                state_i_comm, acc_comm)
            state.ivc_step_comm = step_comm
            state.ivc_step = step
            state.z_i_comm = state_i_comm
            state.acc_comm = acc_comm
            state.acc = folded_acc
            state.w_acc = folded_w
            state.folding_proof = proof
            state.folding_proof_vars = fvars
            steps[0] = step
            self.timings.setdefault("step_times", []).append(time.time() - t0)
            if checkpoint_dir and step % checkpoint_every == 0:
                import os
                os.makedirs(checkpoint_dir, exist_ok=True)
                ckpt.save(os.path.join(checkpoint_dir,
                                       f"ivc_step_{step}.npz"),
                          state, vm_ref, mem_ops_comm, self.params)
            if on_step:
                on_step(step, state)

        try:
            vm.run(intercept, start_cycle=start_cycle)
        except StopIteration:
            pass
        state.steps = steps[0]
        return state

    def _state_comm(self, code_comm, pc, mem_comm, regs, mem_ops_comm):
        from .commitments import hash_wide
        regs_c = hash_wide(list(regs))
        return hash_wide(list(code_comm) + [pc] + list(mem_comm)
                         + list(regs_c) + list(mem_ops_comm))

    def _check_relation(self, z_rings, trace):
        if self.dn is not None:
            lo, hi = self._relation_residual_device(z_rings)
        else:
            z_dev = gl.from_int(np.array(z_rings, dtype=object))
            mz = self.ccs.matvecs(z_dev)
            res = self.ccs.relation_residual(mz)
            lo = np.asarray(res[0])
            hi = np.asarray(res[1])
        bad = np.nonzero((lo != 0).any(axis=-1) | (hi != 0).any(axis=-1))[0]
        if len(bad):
            raise AssertionError(
                f"CCS relation failed for {trace.instruction.name} at rows "
                f"{bad[:10].tolist()}")

    def _relation_residual_device(self, z_rings):
        """Residual on device: Mz matvecs + the batched lin comb with a
        ONES ring in the eq slot (so the final eq multiply is identity)."""
        from .accel_t import make_comb_lin_batched
        dn, e, ccs = self.dn, self.dn.e, self.ccs
        if not hasattr(self, "_relcomb"):
            self._relcomb = make_comb_lin_batched(
                tuple(tuple(s) for s in ccs.S), ccs.t)
        z_dev = e.put(gl.from_int(np.array(z_rings, dtype=object)))
        mz = e.matvecs(z_dev, dn._cap_pow2)

        def fn(mz_, consts):
            t_, rows = mz_[0].shape[0], mz_[0].shape[1]
            one = np.zeros((1, 24, 1), np.uint32)
            one[:, 0::3] = 1
            mt = (B.xp.moveaxis(mz_[0], -1, -2), B.xp.moveaxis(mz_[1], -1, -2))
            g = (B.xp.concatenate(
                    [mt[0], B.xp.broadcast_to(B.xp.asarray(one),
                                              (1, 24, rows))]),
                 B.xp.concatenate(
                    [mt[1], B.xp.zeros((1, 24, rows), np.uint32)]))
            return self._relcomb(g, consts)

        jf = e._jit(("relcheck", dn._cap_pow2), fn)
        with B.jax_mode():
            res = jf(mz, dn._lin_consts_dev)
        return np.asarray(res[0]).T, np.asarray(res[1]).T
