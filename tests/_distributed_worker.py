"""Worker for the real multi-process jax.distributed test (the analog
of the reference actually running Distributed workers,
src/util_parallel.jl:4-56). Spawned by tests/test_parallel.py with
  argv: <coordinator_address> <num_processes> <process_id>
and 4 virtual CPU devices per process; runs one sharded MAP_marg step
over the 2x4=8-device global mesh and prints a checksum every process
must agree on."""
import sys

import numpy as np


def main():
    addr, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from cmblensing_tpu.parallel.mesh import distributed_initialize, make_mesh
    distributed_initialize(coordinator_address=addr, num_processes=nproc,
                           process_id=pid)

    import jax
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert len(jax.local_devices()) == 4

    from cmblensing_tpu.models.dataset import load_sim
    from cmblensing_tpu.inference.maximization import MAP_marg

    out = load_sim(thetapix=5, Nside=16, pol="I", T=np.float32, seed=1)
    mesh = make_mesh(4 * nproc)
    phi, _ = MAP_marg(out["ds"], key=jax.random.PRNGKey(0), nsteps=1,
                      Nsims=4 * nproc, mesh=mesh,
                      conjgrad_kwargs=dict(tol=1e-1, nsteps=3))
    # fully-replicated output: every process computes the same phi
    checksum = float(jax.jit(lambda p: (p.arr ** 2).sum())(phi))
    print(f"MAPMARG_OK process={pid} checksum={checksum:.6e}", flush=True)


if __name__ == "__main__":
    main()
