"""Multi-host (DCN) dryrun: the COMPLETE production fold sum-check across
2 jax.distributed processes on loopback.

Starts NUM_PROC local processes (each JAX_PLATFORMS=cpu with 4 virtual
devices), rendezvous via jax.distributed on 127.0.0.1, builds the global
(rows, slots) mesh over all 8 devices spanning both processes, and runs the
FULL fold sum-check (all 10 rounds at m=2^10, K=15 — the 95-MLE production
stack — with the real Fiat-Shamir transcript).  Every round's sums
all-reduce crosses the process boundary (the path that rides DCN on real
pods); per-round replicated outputs keep both processes' transcripts in
lockstep (multi-controller SPMD).

PASS = both processes produce the identical (proof, challenges, finals,
transcript state) digest AND it matches a single-process 8-device run.
Also reports the scaling-efficiency figure (single-process wall / 2-process
wall at fixed m; both legs use all 8 virtual devices, so the ratio isolates
the cross-process coordination overhead — BASELINE asks >=80% at 2+ hosts).
Log committed as MULTIHOST_r05.log.

Usage:  python scripts/dryrun_multihost.py            # parent launcher
        python scripts/dryrun_multihost.py --worker N # (internal)
"""

import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

NUM_PROC = 2
DEVS_PER_PROC = 4
PORT = 47313
M, K = 1 << 10, 15


def _digest(proof, chals, final, state):
    import hashlib
    return hashlib.sha256(
        repr((proof, chals, final[0].tolist(), final[1].tolist(),
              state)).encode()).hexdigest()[:16]


def worker(pid: int) -> int:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from latticeum_tpu import backend as B
    B.use_jax()
    from latticeum_tpu.parallel import multihost as MH

    ok = MH.init_distributed(f"127.0.0.1:{PORT}", NUM_PROC, pid)
    assert ok, "distributed init skipped"
    assert jax.process_count() == NUM_PROC
    assert len(jax.devices()) == NUM_PROC * DEVS_PER_PROC, len(jax.devices())
    mesh = MH.global_mesh()
    proof, chals, final, state, wall = MH.full_fold_global(mesh, m=M, K=K)
    print(f"[proc {pid}] global mesh "
          f"{dict(zip(mesh.axis_names, mesh.devices.shape))} "
          f"rounds={len(proof)} wall={wall:.2f}s", flush=True)
    print(f"[proc {pid}] fold digest {_digest(proof, chals, final, state)}",
          flush=True)
    return 0


def single_reference() -> tuple[str, float]:
    """Same full fold on one process / 8 local devices -> (digest, wall)."""
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from latticeum_tpu import backend as B; B.use_jax()\n"
        "from latticeum_tpu.parallel import multihost as MH\n"
        "import scripts.dryrun_multihost as D\n"
        f"p, c, f, s, w = MH.full_fold_global(MH.global_mesh(), m={M}, "
        f"K={K})\n"
        "print('REF', D._digest(p, c, f, s), f'{w:.2f}')\n")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("REF "):
            parts = line.split()
            return parts[1], float(parts[2])
    raise RuntimeError(f"reference run failed: {out.stderr[-2000:]}")


def main() -> int:
    if "--worker" in sys.argv:
        return worker(int(sys.argv[sys.argv.index("--worker") + 1]))
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS=f"--xla_force_host_platform_device_count="
                         f"{DEVS_PER_PROC}")
    env.pop("PALLAS_AXON_POOL_IPS", None)   # no axon plugin in workers
    procs = [subprocess.Popen(
        [sys.executable, __file__, "--worker", str(i)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(NUM_PROC)]
    outs = []
    rc = 0
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=1800)
        outs.append(out)
        print(f"--- worker {i} (rc={p.returncode}) ---\n{out}")
        rc |= p.returncode
    if rc:
        print("MULTIHOST FULL-FOLD: FAIL (worker error)")
        return 1
    digs, walls = set(), []
    for out in outs:
        for line in out.splitlines():
            if "fold digest" in line:
                digs.add(line.split()[-1])
            if "wall=" in line:
                walls.append(float(line.split("wall=")[1].rstrip("s")))
    if len(digs) != 1:
        print(f"MULTIHOST FULL-FOLD: FAIL (digest mismatch {digs})")
        return 1
    ref, ref_wall = single_reference()
    if ref not in digs:
        print(f"MULTIHOST FULL-FOLD: FAIL (2-proc {digs} != 1-proc {ref})")
        return 1
    sharded_wall = max(walls)
    eff = ref_wall / sharded_wall if sharded_wall > 0 else 0.0
    print(f"MULTIHOST FULL-FOLD: PASS (2 processes x {DEVS_PER_PROC} "
          f"devices, all rounds + transcript, digest {ref} == "
          f"single-process reference)")
    print(f"scaling efficiency (1-proc wall {ref_wall:.2f}s / 2-proc wall "
          f"{sharded_wall:.2f}s, fixed m=2^10, 8 devices both): "
          f"{eff:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
