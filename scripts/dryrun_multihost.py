"""Multi-host (DCN) dryrun: 2 jax.distributed processes on loopback.

Starts NUM_PROC local processes (each JAX_PLATFORMS=cpu with 4 virtual
devices), rendezvous via jax.distributed on 127.0.0.1, builds the global
(rows, slots) mesh over all 8 devices spanning both processes, and runs one
rows-sharded production-comb fold sum-check round (K=15, the 95-MLE stack).
The GSPMD all-reduce for the round sums crosses the process boundary — the
same code path that rides DCN on real multi-host TPU pods.

PASS = both processes compute identical round sums AND they match a
single-process reference.  Log committed as MULTIHOST_r03.log.

Usage:  python scripts/dryrun_multihost.py            # parent launcher
        python scripts/dryrun_multihost.py --worker N # (internal)
"""

import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

NUM_PROC = 2
DEVS_PER_PROC = 4
PORT = 47311
M, K = 1 << 10, 15


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
    sums = MH.fold_round_global(mesh, m=M, K=K)
    print(f"[proc {pid}] global mesh {dict(zip(mesh.axis_names, mesh.devices.shape))} "
          f"sums[0][:4]={sums[0][:4]}", flush=True)
    # cross-host agreement: every process hashes its sums; process 0 prints
    import hashlib
    digest = hashlib.sha256(repr(sums).encode()).hexdigest()[:16]
    print(f"[proc {pid}] sums digest {digest}", flush=True)
    return 0


def single_reference() -> str:
    """Same round on one process / 8 local devices -> digest."""
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from latticeum_tpu import backend as B; B.use_jax()\n"
        "from latticeum_tpu.parallel import multihost as MH\n"
        f"sums = MH.fold_round_global(MH.global_mesh(), m={M}, K={K})\n"
        "import hashlib\n"
        "print('REF', hashlib.sha256(repr(sums).encode()).hexdigest()[:16])\n")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=900)
    for line in out.stdout.splitlines():
        if line.startswith("REF "):
            return line.split()[1]
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
        out, _ = p.communicate(timeout=1200)
        outs.append(out)
        print(f"--- worker {i} (rc={p.returncode}) ---\n{out}")
        rc |= p.returncode
    if rc:
        print("MULTIHOST DRYRUN: FAIL (worker error)")
        return 1
    digs = set()
    for out in outs:
        for line in out.splitlines():
            if "sums digest" in line:
                digs.add(line.split()[-1])
    if len(digs) != 1:
        print(f"MULTIHOST DRYRUN: FAIL (digest mismatch {digs})")
        return 1
    ref = single_reference()
    if ref not in digs:
        print(f"MULTIHOST DRYRUN: FAIL (2-proc {digs} != 1-proc {ref})")
        return 1
    print(f"MULTIHOST DRYRUN: PASS (2 processes x {DEVS_PER_PROC} devices, "
          f"digest {ref} == single-process reference)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
