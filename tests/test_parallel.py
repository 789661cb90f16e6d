"""Multi-device sharding tests on the virtual 8-device CPU mesh —
a capability the reference's CI never had (SURVEY.md section 4)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cmblensing_tpu.parallel.mesh import make_mesh, shard_batch, replicate, proc_info
from cmblensing_tpu.models.dataset import load_sim
from cmblensing_tpu.core import field as F
from cmblensing_tpu.core.field import Field, repeat_batch, fgrad


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return make_mesh(devices=devs[:8])


def test_shard_batched_field(mesh8):
    from cmblensing_tpu.core.proj import ProjLambert
    proj = ProjLambert(16, 16, thetapix=3, T=np.float32)
    f = F.randn(jax.random.PRNGKey(0), proj, pol="I", batch_shape=(8,))
    fs = shard_batch(f, mesh8)
    assert fs.arr.sharding.spec == P("batch", None, None, None)
    # sharding survives a full fourier round trip and reductions work
    g = fs.to(fs.basis.with_space("fourier")).to(fs.basis)
    d = F.dot(g, g)
    assert d.shape == (8,)


def test_batched_posterior_gradient_sharded(mesh8):
    out = load_sim(thetapix=3, Nside=16, pol="P", T=np.float32, seed=0)
    ds = out["ds"]
    phi = out["phi"].to(out["phi"].basis.with_space("map"))

    nbatch = 8
    bspec = NamedSharding(mesh8, P("batch", None, None, None))

    def constrain(f):
        return Field(jax.lax.with_sharding_constraint(f.arr, bspec), f.basis, f.proj)

    @jax.jit
    def step(key, phi):
        phi_b = constrain(repeat_batch(phi, nbatch))
        sims = ds.simulate(key, phi=phi_b, batch_shape=(nbatch,))
        ds_b = ds.replace(d=constrain(sims["d"]))

        def lp(phi_b):
            return jnp.sum(ds_b.logpdf(f=sims["f"], phi=phi_b))

        g = fgrad(lp)(phi_b)
        return Field(jnp.mean(g.arr, axis=0), g.basis, g.proj)

    with mesh8:
        gbar = step(jax.random.PRNGKey(0), phi)
    assert np.isfinite(float(F.norm(gbar)))


def test_proc_info():
    info = proc_info()
    assert info["process_count"] >= 1


def test_sample_joint_chains_sharded(mesh8):
    """Full Gibbs sampler with the chains axis sharded over the mesh —
    the SPMD replacement for the reference's pmap of chains
    (src/sampling.jl:292-307)."""
    from cmblensing_tpu.inference.sampling import sample_joint
    out = load_sim(thetapix=3, Nside=16, pol="I", T=np.float32, seed=1)
    res = sample_joint(out["ds"], nsamps_per_chain=2, nchains=8,
                       key=jax.random.PRNGKey(0), mesh=mesh8,
                       symp_kwargs=[dict(N=3, eps=0.01)],
                       conjgrad_kwargs=dict(tol=1e-1, nsteps=15))
    lps = np.asarray(res["logpdf"][0])
    assert lps.shape == (2, 8) or lps.shape == (8,) or lps.size == 16
    assert np.isfinite(lps).all()


def test_MAP_marg_sims_sharded(mesh8):
    """MAP_marg with the Nsims mean-field axis sharded over the mesh."""
    from cmblensing_tpu.inference.maximization import MAP_marg
    out = load_sim(thetapix=3, Nside=16, pol="I", T=np.float32, seed=1)
    phi, hist = MAP_marg(out["ds"], key=jax.random.PRNGKey(0), nsteps=2,
                         Nsims=8, mesh=mesh8,
                         conjgrad_kwargs=dict(tol=1e-1, nsteps=15))
    assert np.isfinite(float(F.norm(phi)))
