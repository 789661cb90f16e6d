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
