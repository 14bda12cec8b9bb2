"""Round-4 mesh validation (VERDICT r03 item 5): committed-log evidence for

  1. K=15 production-shape fold sum-check: FULL proof/transcript equality
     sharded-vs-single at reduced m (the r03 test only proved K=2;
     the K=15 dryrun only checked the chain invariant);
  2. the LIN sum-check (real 125-matrix/52-multiset structure) sharded over
     the same rows mesh, bit-exact, with GSPMD collective counts;
  3. the slots mesh axis exercised: CRT with the ring-coordinate axis
     sharded over 'slots' — measured cross-slot collectives + equality.

Runs on the 8-device virtual CPU mesh (xla_force_host_platform_device_count)
so it validates sharding semantics without TPU hardware.

Usage: python scripts/mesh_validate.py | tee MESH_r04.log
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

t0 = time.time()


def log(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)


def main():
    from latticeum_tpu.parallel import fold_mesh, lin_mesh

    ok = True

    log("1/3: K=15 fold sum-check sharded-vs-single (m=2^10, 95 MLEs)")
    res = fold_mesh.sharded_vs_single(8, m=1 << 10, K=15, tail=256,
                                      with_collective_count=True)
    log(json.dumps(res))
    ok &= all(res[k] for k in ("proof_equal", "chals_equal", "final_equal",
                               "transcript_equal", "ajtai_equal"))
    log(f"fold K=15 equality: {'PASS' if ok else 'FAIL'}")

    log("2/3: lin sum-check sharded-vs-single (m=2^10, t=125, q=52)")
    res2 = lin_mesh.sharded_lin_vs_single(8, m=1 << 10, tail=256)
    log(json.dumps(res2))
    ok2 = all(res2[k] for k in ("proof_equal", "chals_equal", "final_equal",
                                "transcript_equal"))
    ok &= ok2
    log(f"lin equality: {'PASS' if ok2 else 'FAIL'}")

    log("3/3: slots-axis CRT exchange (mesh rows=4 x slots=2)")
    res3 = lin_mesh.slots_crt_exchange(4, 2, batch=1 << 8)
    log(json.dumps(res3))
    ok3 = res3["equal"] and res3["exchanged"]
    ok &= ok3
    log(f"slots exchange: {'PASS' if ok3 else 'FAIL'} "
        f"(collectives: {res3['collectives']})")

    log("ALL PASS" if ok else "FAILURES PRESENT")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
