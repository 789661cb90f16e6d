"""Maps bigger than one chip: the full posterior pipeline with every
array spatially sharded over the device mesh.

The reference stops at single-device maps (it warns above 1024^2,
src/proj_lambert.jl:54-56). Here the map's rows live across the mesh:
lensing (pencil all_to_all derivatives), Fourier-diagonal operators
(distributed pencil FFTs), the Wiener filter, a joint MAP, posterior
samples, one HMC step, and device-binned spectra — no device ever
holds a full map.

Run with a virtual CPU mesh:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/09_bigmap.py
or on a real TPU pod slice, where the all_to_alls ride the ICI.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
FAST = bool(int(os.environ.get("CMBL_EXAMPLE_FAST", "0")))  # CI smoke lane

import numpy as np
import jax

# pin the CPU platform unless the user asks for an accelerator: the
# tunneled-TPU plugin's backend init blocks indefinitely when its
# tunnel is down, which would hang any jax.devices() call below
if os.environ.get("CMBL_EXAMPLE_DEVICE", "cpu") == "cpu":
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

from cmblensing_tpu import (
    load_sim, spatial_mesh, shard_spatial, ShardedLenseFlow,
    sharded_wiener_filter, sharded_MAP_joint, sharded_sample_f,
    sharded_hmc_phi_step, get_Cl_sharded)

n = min(8, len(jax.devices()))
mesh = spatial_mesh(n)
N = 32 if FAST else 64
print(f"mesh: {n} devices; map {N}^2 (each device holds Ny/{n} rows)")

out = load_sim(thetapix=3, Nside=N, pol="P", T=np.float32, seed=0)
ds, phi_true = out["ds"], out["phi"]
phi_m = phi_true.to(phi_true.basis.with_space("map"))

# 1. lensed Wiener filter: one jitted CG whose iterates stay sharded
f_wf, info = sharded_wiener_filter(ds, phi_m, mesh,
                                   nsteps=10 if FAST else 40, tol=1e-7)
print("Wiener filter:", f_wf.arr.shape, f_wf.arr.sharding.spec,
      "CG iters:", int(info["iterations"]))

# 2. a posterior sample of f (constrained realization)
f_samp, _ = sharded_sample_f(jax.random.PRNGKey(1), ds, phi_m, mesh,
                             nsteps=10 if FAST else 40, tol=1e-7)
print("posterior f sample drawn, sharded as", f_samp.arr.sharding.spec)

# 3. joint MAP: sharded-WF f-steps + preconditioned phi ascent
res = sharded_MAP_joint(ds, mesh, nsteps=2 if FAST else 4,
                        cg_nsteps=10 if FAST else 30, ngrid=5,
                        progress=True)
pm = np.asarray(res["phi"].arr).ravel()
pt = np.asarray(phi_m.arr).ravel()
corr = float(pm @ pt / (np.linalg.norm(pm) * np.linalg.norm(pt) + 1e-30))
print(f"sharded MAP: corr(phi, phi_true) = {corr:.3f}")

# 4. one HMC step on phi, conditioned on the MAP's own f
phi_hmc, dH, acc = sharded_hmc_phi_step(jax.random.PRNGKey(2), ds,
                                        res["f"], res["phi"], mesh,
                                        N=3, eps=1e-8)
print(f"HMC step: dH={float(dH):.3g} accept={bool(acc)}")

# the lensing operator itself is also directly usable on sharded maps
relensed = ShardedLenseFlow(shard_spatial(phi_hmc, mesh), mesh=mesh) @ res["f"]
print("re-lensed at the HMC phi:", relensed.arr.sharding.spec)

# 5. spectra binned on device (only bin values leave the mesh)
cl = get_Cl_sharded(res["phi"], mesh, dl=500)
print("phi_MAP bandpowers:", np.asarray(cl.Cl[:4]))
