"""Spatially-sharded LenseFlow on the virtual 8-device CPU mesh:
the map's Ny axis is sharded across devices and the flow runs as one
shard_map program with pencil all_to_all transposes (a capability the
reference does not have — it warns above 1024^2,
src/proj_lambert.jl:54-56)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cmblensing_tpu.core.proj import ProjLambert
from cmblensing_tpu.core import field as F
from cmblensing_tpu.core.basis import MAP
from cmblensing_tpu.core.cov import Cl_to_Cov
from cmblensing_tpu.core.ops import simulate_op
from cmblensing_tpu.core.field import fgrad
from cmblensing_tpu.models.lenseflow import LenseFlow
from cmblensing_tpu.parallel.spatial import (
    ShardedLenseFlow, lense_sharded, spatial_mesh, shard_spatial)
from cmblensing_tpu.ops import deriv
from cmblensing_tpu.utils.cls import camb


@pytest.fixture(scope="module")
def mesh4():
    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("needs 4 virtual CPU devices")
    return spatial_mesh(4, devices=devs)


@pytest.fixture(scope="module")
def setup():
    proj = ProjLambert(32, 32, thetapix=3, T=np.float32)
    Cl = camb()
    Cphi = Cl_to_Cov("I", proj, Cl["total"]["pp"])
    Cf = Cl_to_Cov("P", proj, Cl["unlensed_scalar"]["EE"],
                   Cl["unlensed_scalar"]["BB"])
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    phi = simulate_op(ks[0], Cphi).to(MAP)
    f = simulate_op(ks[1], Cf).to_lense()
    u = simulate_op(ks[2], Cf).to_lense()
    return proj, phi, f, u


def test_forward_matches_single_device(mesh4, setup):
    """The sharded program applies bitwise the same matmul operators as
    the single-device 'matmul' backend, exchanged exactly by
    all_to_all — outputs agree to f32 roundoff."""
    proj, phi, f, u = setup
    with deriv.mode_ctx("matmul"):
        ref = (LenseFlow(phi) @ f).arr
    out = (ShardedLenseFlow(phi, mesh=mesh4) @ f).arr
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5 * float(jnp.max(jnp.abs(ref))))


def test_sharded_input_layout(mesh4, setup):
    """shard_spatial lays Ny across the mesh and the flow preserves the
    sharding (no gather back to one device)."""
    proj, phi, f, u = setup
    fs = shard_spatial(f, mesh4)
    assert fs.arr.sharding.spec[-2] == "sp"
    out = ShardedLenseFlow(shard_spatial(phi, mesh4), mesh=mesh4) @ fs
    spec = out.arr.sharding.spec
    assert spec[-2] == "sp" and spec[-1] is None


def test_adjoint_identity(mesh4, setup):
    proj, phi, f, u = setup
    L = ShardedLenseFlow(phi, mesh=mesh4)
    lhs = float(jnp.vdot((L.H @ u).arr, f.arr))
    rhs = float(jnp.vdot(u.arr, (L @ f).arr))
    assert abs(lhs - rhs) < 1e-4 * abs(rhs)


def test_solve_roundtrip(mesh4, setup):
    proj, phi, f, u = setup
    L = ShardedLenseFlow(phi, mesh=mesh4)
    rt = L.solve(L @ f).arr
    scale = float(jnp.max(jnp.abs(f.arr)))
    assert float(jnp.max(jnp.abs(rt - f.arr))) < 5e-4 * scale
    # adjoint solve too
    rt2 = L.H.solve(L.H @ f).arr
    assert float(jnp.max(jnp.abs(rt2 - f.arr))) < 5e-4 * scale


def test_gradients_match_single_device(mesh4, setup):
    """phi- and f-cotangents of the sharded flow (continuous-adjoint
    custom_vjp inside shard_map) match the single-device operator."""
    proj, phi, f, u = setup
    w = u.arr

    from cmblensing_tpu.core.field import Field

    def lp_sharded(parr, farr):
        out = ShardedLenseFlow(Field(parr, phi.basis, phi.proj),
                               mesh=mesh4) @ Field(farr, f.basis, f.proj)
        return jnp.sum(out.arr * w)

    def lp_single(parr, farr):
        out = LenseFlow(Field(parr, phi.basis, phi.proj)) \
            @ Field(farr, f.basis, f.proj)
        return jnp.sum(out.arr * w)

    gp_s, gf_s = jax.grad(lp_sharded, argnums=(0, 1))(phi.arr, f.arr)
    with deriv.mode_ctx("matmul"):
        gp_1, gf_1 = jax.grad(lp_single, argnums=(0, 1))(phi.arr, f.arr)
    for gs, g1 in ((gp_s, gp_1), (gf_s, gf_1)):
        scale = float(jnp.max(jnp.abs(g1)))
        assert float(jnp.max(jnp.abs(gs - g1))) < 2e-5 * scale


def test_gradient_through_adjoint(mesh4, setup):
    proj, phi, f, u = setup
    w = u.arr

    def lp_sharded(phi):
        return jnp.sum((ShardedLenseFlow(phi, mesh=mesh4).H @ f).arr * w)

    def lp_single(phi):
        return jnp.sum((LenseFlow(phi).H @ f).arr * w)

    gs = fgrad(lp_sharded)(phi)
    with deriv.mode_ctx("matmul"):
        g1 = fgrad(lp_single)(phi)
    scale = float(jnp.max(jnp.abs(g1.arr)))
    assert float(jnp.max(jnp.abs(gs.arr - g1.arr))) < 2e-5 * scale


def test_functional_form_and_jit(mesh4, setup):
    proj, phi, f, u = setup

    @jax.jit
    def go(phi, f):
        return lense_sharded(phi, f, mesh=mesh4).arr

    out = go(phi, f)
    with deriv.mode_ctx("matmul"):
        ref = (LenseFlow(phi) @ f).arr
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5 * float(jnp.max(jnp.abs(ref))))


def test_divisibility_guard(mesh4, setup):
    proj31 = ProjLambert(30, 32, thetapix=3, T=np.float32)
    phi31 = F.randn(jax.random.PRNGKey(0), proj31, pol="I")
    with pytest.raises(ValueError, match="divisible"):
        ShardedLenseFlow(phi31, mesh=mesh4)


def test_2d_mesh_batch_times_space(setup):
    """2-D (batch, space) mesh: a batch of sims data-parallel on one
    mesh axis while each map's Ny rows shard over the other — the
    combined §2.4-strategy-1 + spatial decomposition."""
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    proj, phi, f, u = setup
    mesh2 = spatial_mesh(8, devices=devs, nbatch=2)
    assert mesh2.devices.shape == (2, 4)

    from cmblensing_tpu.core.field import Field, repeat_batch
    fb = repeat_batch(f, 4)
    # give each batch entry distinct content
    fb = Field(fb.arr * (1 + 0.1 * jnp.arange(4)[:, None, None, None]),
               fb.basis, fb.proj)
    pb = repeat_batch(phi, 4)

    fb_sh = shard_spatial(fb, mesh2, batch_axis="batch")
    pb_sh = shard_spatial(pb, mesh2, batch_axis="batch")
    assert fb_sh.arr.sharding.spec[0] == "batch"
    assert fb_sh.arr.sharding.spec[-2] == "sp"

    out = ShardedLenseFlow(pb_sh, mesh=mesh2, batch_axis="batch") @ fb_sh
    assert out.arr.sharding.spec[0] == "batch"

    with deriv.mode_ctx("matmul"):
        ref = (LenseFlow(pb) @ fb).arr
    np.testing.assert_allclose(np.asarray(out.arr), np.asarray(ref),
                               rtol=0, atol=2e-5 * float(jnp.max(jnp.abs(ref))))

    # gradient through the 2-D-sharded flow matches single-device
    w = np.asarray(ref)

    def lp2(parr):
        o = ShardedLenseFlow(Field(parr, pb.basis, proj), mesh=mesh2,
                             batch_axis="batch") @ fb_sh
        return jnp.sum(o.arr * w)

    def lp1(parr):
        return jnp.sum((LenseFlow(Field(parr, pb.basis, proj)) @ fb).arr * w)

    g2 = jax.grad(lp2)(pb_sh.arr)
    with deriv.mode_ctx("matmul"):
        g1 = jax.grad(lp1)(pb.arr)
    scale = float(jnp.max(jnp.abs(g1)))
    assert float(jnp.max(jnp.abs(g2 - g1))) < 2e-5 * scale


def test_lense_basis_guard(mesh4, setup):
    """EB-basis input must be rejected: converting a sharded field
    would FFT the full map across devices."""
    proj, phi, f, u = setup
    f_eb = f.to_harmonic()
    with pytest.raises(ValueError, match="lense basis"):
        ShardedLenseFlow(phi, mesh=mesh4) @ f_eb
