"""Multi-chip mass-simulation pipeline (mirrors the reference's
pmap-distributed MAP_marg/MUSE workflows, src/maximization.jl:247-343,
re-designed as sharded batch axes over a device mesh).

Run with a virtual CPU mesh:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/06_multichip.py
or on a real TPU pod slice, where the same code shards over ICI.
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

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cmblensing_tpu import load_sim, make_mesh
from cmblensing_tpu.core.field import Field, fgrad, repeat_batch
from cmblensing_tpu.inference.maximization import argmaxf_logpdf
from cmblensing_tpu.core import field as F

devices = jax.devices("cpu") if len(jax.devices()) < 2 else jax.devices()
n = min(8, len(devices))
mesh = make_mesh(n_devices=n, devices=devices)
print(f"mesh: {n} devices")

with jax.default_device(devices[0]):
    out = load_sim(thetapix=3, Nside=32, pol="P", T=np.float32, seed=0)
    ds = out["ds"]
    phi0 = out["phi"].to(out["phi"].basis.with_space("map"))

nbatch = n if FAST else 2 * n
bspec = NamedSharding(mesh, P("batch", None, None, None))
constrain = lambda f: Field(jax.lax.with_sharding_constraint(f.arr, bspec), f.basis, f.proj)


@jax.jit
def meanfield_step(key, phi):
    """One MAP_marg-style step: simulate nbatch datasets at phi (sharded
    over the mesh), Wiener-filter each, take the mean phi-gradient —
    the cross-shard mean is a psum over ICI."""
    phi_b = constrain(repeat_batch(phi, nbatch))
    sims = ds.simulate(key, phi=phi_b, batch_shape=(nbatch,))
    ds_b = ds.replace(d=constrain(sims["d"]))
    f_wf, _ = argmaxf_logpdf(ds_b, phi=phi_b,
                             conjgrad_kwargs=dict(tol=0.0, nsteps=5 if FAST else 20, fixed_iters=True),
                             jit=False)

    def lp(phi_b):
        return jnp.sum(ds_b.logpdf(f=f_wf, phi=phi_b))

    g = fgrad(lp)(phi_b)
    return Field(jnp.mean(g.arr, axis=0), g.basis, g.proj)


with mesh:
    key = jax.random.PRNGKey(0)
    gbar = meanfield_step(key, phi0)
    print("mean-field gradient norm:", float(F.norm(gbar)))
    print("sharded sim batch ran", nbatch, "sims over", n, "devices")


# ---------------------------------------------------------------------
# Spatial sharding: ONE map bigger than one chip. The Ny axis of f and
# phi lives across the mesh and the whole LenseFlow ODE (+ its
# continuous-adjoint gradient) runs as one shard_map program — the
# reference stops at single-device maps (src/proj_lambert.jl:54-56).
# ---------------------------------------------------------------------
from cmblensing_tpu import ShardedLenseFlow, shard_spatial, spatial_mesh

smesh = spatial_mesh(n_devices=n, devices=devices)
with jax.default_device(devices[0]):
    big = load_sim(thetapix=3, Nside=32 if FAST else 64, pol="P",
                   T=np.float32, seed=1)
    # lense basis (QU map) BEFORE sharding: a basis conversion on a
    # sharded field would FFT the full map across devices
    fm = big["f"].to_lense()
    pm = big["phi"].to(big["phi"].basis.with_space("map"))

f_sh, phi_sh = shard_spatial(fm, smesh), shard_spatial(pm, smesh)
L = ShardedLenseFlow(phi_sh, mesh=smesh)
lensed = jax.jit(lambda p, f: ShardedLenseFlow(p, mesh=smesh) @ f)(phi_sh, f_sh)
print("spatially-sharded lense:", lensed.arr.shape,
      "sharded as", lensed.arr.sharding.spec)

# gradients flow through the sharded ODE block-by-block
lp = lambda p: jnp.sum((ShardedLenseFlow(p, mesh=smesh) @ f_sh).arr ** 2)
g = jax.jit(jax.grad(lp))(phi_sh)
print("sharded flow gradient norm:", float(jnp.linalg.norm(g.arr)))

# ... and the whole posterior toolkit rides the same mesh: the lensed
# Wiener filter (argmaxf_logpdf's Gaussian solve) as ONE jitted
# program whose CG iterates never materialize a full map on any device
from cmblensing_tpu import sharded_wiener_filter

f_wf, info = sharded_wiener_filter(big["ds"], pm, smesh,
                                   nsteps=10 if FAST else 40, tol=1e-7)
print("sharded Wiener filter:", f_wf.arr.shape, "CG iters:",
      int(info["iterations"]))
