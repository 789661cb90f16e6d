"""Lensing operators: adjoint identities and FD gradient checks —
mirrors test/runtests.jl:533-581."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cmblensing_tpu.core.proj import ProjLambert
from cmblensing_tpu.core import field as F
from cmblensing_tpu.core.basis import MAP
from cmblensing_tpu.core.cov import Cl_to_Cov
from cmblensing_tpu.core.ops import simulate_op
from cmblensing_tpu.models.lenseflow import LenseFlow, get_max_lensing_step
from cmblensing_tpu.utils.cls import camb


@pytest.fixture(scope="module")
def setup():
    proj = ProjLambert(64, 64, thetapix=3, T=np.float32)
    Cl = camb()
    Cphi = Cl_to_Cov("I", proj, Cl["total"]["pp"])
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    phi = simulate_op(ks[0], Cphi).to(MAP)
    return proj, Cl, Cphi, phi, ks


@pytest.mark.parametrize("pol", ["I", "P"])
def test_lenseflow_adjoint(setup, pol):
    proj, Cl, Cphi, phi, ks = setup
    specs = {"I": ("TT",), "P": ("EE", "BB")}[pol]
    Cf = Cl_to_Cov(pol, proj, *[Cl["unlensed_scalar"][k] for k in specs])
    f = simulate_op(ks[1], Cf).to_lense()
    g = simulate_op(ks[2], Cf).to_lense()
    L = LenseFlow(phi, 7)
    lhs = float(F.dot(g, L @ f))
    rhs = float(F.dot(L.H @ g, f))
    assert abs(lhs - rhs) < 1e-4 * abs(lhs)


@pytest.mark.parametrize("pol", ["I", "P"])
def test_lenseflow_inverse(setup, pol):
    proj, Cl, Cphi, phi, ks = setup
    specs = {"I": ("TT",), "P": ("EE", "BB")}[pol]
    Cf = Cl_to_Cov(pol, proj, *[Cl["unlensed_scalar"][k] for k in specs])
    f = simulate_op(ks[1], Cf).to_lense()
    L = LenseFlow(phi, 7)
    r = F.norm(L.solve(L @ f) - f) / F.norm(f)
    assert float(r) < 1e-4


@pytest.mark.parametrize("pol", ["I", "P"])
def test_lenseflow_gradient_fd(setup, pol, x64):
    """FD directional-derivative check of norm(L(phi+a dphi)(f+a df))
    like the reference's lensing gradient tests (runtests.jl:552-568)."""
    proj64 = ProjLambert(32, 32, thetapix=3, T=np.float64)
    Cl = camb()
    Cphi = Cl_to_Cov("I", proj64, Cl["total"]["pp"])
    specs = {"I": ("TT",), "P": ("EE", "BB")}[pol]
    Cf = Cl_to_Cov(pol, proj64, *[Cl["unlensed_scalar"][k] for k in specs])
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    phi = simulate_op(ks[0], Cphi).to(MAP)
    f = simulate_op(ks[1], Cf).to_lense()
    dphi = simulate_op(ks[2], Cphi).to(MAP)
    df = simulate_op(ks[3], Cf).to_lense()

    def loss(a):
        L = LenseFlow(phi + a * dphi, 7)
        return F.norm(L @ (f + a * df))

    g = jax.grad(loss)(0.0)
    eps = 1e-5
    fd = (loss(eps) - loss(-eps)) / (2 * eps)
    assert abs(g - fd) < 1e-3 * abs(fd)


def test_max_lensing_step(setup):
    proj, Cl, Cphi, phi, ks = setup
    eta = simulate_op(ks[3], Cphi).to(MAP)
    amax = float(get_max_lensing_step(phi, eta))
    assert amax > 0


@pytest.mark.skipif(
    not __import__("os").environ.get("CMBLENSING_TEST_TPU"),
    reason="real-TPU pallas parity: set CMBLENSING_TEST_TPU=1 on a TPU host")
def test_pallas_backend_matches_scan_on_tpu(setup):
    """Compiled (not interpreted) Mosaic kernels equal the scan path on
    the actual chip: forward apply, adjoint, and the phi-gradient
    (VERDICT r1 item 4)."""
    import functools
    from cmblensing_tpu.models.lenseflow import lenseflow_backend_ctx
    from cmblensing_tpu.utils.transfer import device_put_safe
    from cmblensing_tpu.ops import deriv

    proj, Cl, Cphi, phi, ks = setup
    Cf = Cl_to_Cov("P", proj, Cl["unlensed_scalar"]["EE"],
                   Cl["unlensed_scalar"]["BB"])
    f = simulate_op(ks[1], Cf).to_lense()
    phi = phi.to(MAP)
    tpu = jax.devices("tpu")[0]
    f, phi = device_put_safe((f, phi), tpu)
    deriv.set_deriv_mode("matmul")

    jit_be = functools.partial(jax.jit, static_argnums=0)

    @jit_be
    def apply_(be, farr, parr):
        with lenseflow_backend_ctx(be):
            return (LenseFlow(F.Field(parr, phi.basis, proj), 7)
                    @ F.Field(farr, f.basis, proj)).arr

    @jit_be
    def adj_(be, farr, parr):
        with lenseflow_backend_ctx(be):
            return (LenseFlow(F.Field(parr, phi.basis, proj), 7).H
                    @ F.Field(farr, f.basis, proj)).arr

    @jit_be
    def grad_(be, parr, farr):
        with lenseflow_backend_ctx(be):
            ff = F.Field(farr, f.basis, proj)
            return F.fgrad(lambda p: F.norm(LenseFlow(p, 7) @ ff))(
                F.Field(parr, phi.basis, proj)).arr

    rel = lambda a, b: float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-30))
    for name, fn, args in [("apply", apply_, (f.arr, phi.arr)),
                           ("adjoint", adj_, (f.arr, phi.arr)),
                           ("grad", grad_, (phi.arr, f.arr))]:
        a = np.asarray(fn("scan", *args))
        b = np.asarray(fn("pallas", *args))
        assert rel(b, a) < 1e-4, (name, rel(b, a))


def test_adjoint_apply_gradient(setup):
    """Gradients flow through L.H @ f under BOTH backends (the fused
    pallas path has no native AD rule — a code-review-found regression:
    the adjoint apply needs its own custom_vjp, built from
    <u, L^H f> = <L u, f>), and the phi-gradient matches finite
    differences."""
    from cmblensing_tpu.models.dataset import load_sim
    from cmblensing_tpu.models.lenseflow import lenseflow_backend_ctx
    from cmblensing_tpu.ops import deriv

    deriv.set_deriv_mode("matmul")
    out = load_sim(thetapix=3, Nside=32, pol="I", T=np.float32, seed=0)
    f = out["f"].to(out["f"].basis.with_space("map"))
    u = out["ds"].simulate(jax.random.PRNGKey(9))["f"].to(f.basis)
    phi = out["phi"].to(out["phi"].basis.with_space("map"))
    dphi = out["ds"].simulate(jax.random.PRNGKey(11))["phi"].to(phi.basis)

    def loss(p):
        return F.dot(u, LenseFlow(p, 7).H @ f)

    grads = {}
    for be in ["scan", "pallas"]:
        from cmblensing_tpu.models.lenseflow import lenseflow_backend_ctx
        with lenseflow_backend_ctx(be):
            g = F.fgrad(loss)(phi)
            grads[be] = float(F.dot(g, dphi))
    eps = 1e-3
    fd = float((loss(phi + eps * dphi) - loss(phi - eps * dphi)) / (2 * eps))
    for be, ad in grads.items():
        assert abs(ad - fd) < 2e-2 * abs(fd), (be, ad, fd)


@pytest.mark.skipif(
    not __import__("os").environ.get("CMBLENSING_TEST_TPU"),
    reason="real-TPU factored-backend parity: set CMBLENSING_TEST_TPU=1")
def test_factored_backend_parity_on_tpu():
    """The MXU-factored derivative backend equals the FFT backend on
    the actual chip at a physical lensing configuration (512^2 where
    the radix engages), through a full LenseFlow apply and
    phi-gradient — the strict-f32 contract of the 1024^2 north-star
    path (ops/factored_deriv.py)."""
    import functools
    from cmblensing_tpu.utils.transfer import device_put_safe
    from cmblensing_tpu.models.lenseflow import lenseflow_backend_ctx
    from cmblensing_tpu.ops import deriv

    proj = ProjLambert(512, 512, thetapix=2, T=np.float32)
    Cl = camb()
    Cphi = Cl_to_Cov("I", proj, Cl["total"]["pp"])
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    phi = simulate_op(ks[0], Cphi).to(MAP)
    Cf = Cl_to_Cov("P", proj, Cl["unlensed_scalar"]["EE"],
                   Cl["unlensed_scalar"]["BB"])
    f = simulate_op(ks[1], Cf).to_lense()
    tpu = jax.devices("tpu")[0]
    f, phi = device_put_safe((f, phi), tpu)

    jit_m = functools.partial(jax.jit, static_argnums=0)

    @jit_m
    def apply_(mode, farr, parr):
        with deriv.mode_ctx(mode), lenseflow_backend_ctx("scan"):
            return (LenseFlow(F.Field(parr, phi.basis, proj), 7)
                    @ F.Field(farr, f.basis, proj)).arr

    @jit_m
    def grad_(mode, parr, farr):
        with deriv.mode_ctx(mode), lenseflow_backend_ctx("scan"):
            ff = F.Field(farr, f.basis, proj)
            return F.fgrad(lambda p: F.norm(LenseFlow(p, 7) @ ff))(
                F.Field(parr, phi.basis, proj)).arr

    rel = lambda a, b: float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-30))
    a = np.asarray(apply_("fft", f.arr, phi.arr))
    b = np.asarray(apply_("factored", f.arr, phi.arr))
    assert rel(b, a) < 1e-5, ("apply", rel(b, a))
    ga = np.asarray(grad_("fft", phi.arr, f.arr))
    gb = np.asarray(grad_("factored", phi.arr, f.arr))
    assert rel(gb, ga) < 1e-4, ("grad", rel(gb, ga))


def test_lenseflow_mixed_batching():
    """phi/f with different batch shapes broadcast to a common batch,
    and gradients sum cotangents over the broadcast axes (regression:
    the custom_vjp used to return a dphi with f's batch shape, breaking
    the bwd shape contract; batched-phi x unbatched-f broke the scan
    carry)."""
    import jax
    import jax.numpy as jnp
    from cmblensing_tpu.core.proj import ProjLambert
    from cmblensing_tpu.core import field as F
    from cmblensing_tpu.core.field import Field
    from cmblensing_tpu.models.lenseflow import LenseFlow

    from cmblensing_tpu.core.basis import MAP, QU_MAP
    proj = ProjLambert(16, 16, thetapix=3, T=np.float32)
    rs = np.random.RandomState(0)
    phi1 = Field(jnp.asarray(rs.randn(1, 16, 16).astype(np.float32) * 1e-6),
                 MAP, proj)
    fb = Field(jnp.asarray(rs.randn(3, 2, 16, 16).astype(np.float32)),
               QU_MAP, proj)

    # unbatched phi, batched f: forward + phi-gradient
    out = LenseFlow(phi1) @ fb
    assert out.arr.shape == (3, 2, 16, 16)

    def lp(parr):
        return jnp.sum((LenseFlow(Field(parr, MAP, proj)) @ fb).arr ** 2)

    g = jax.grad(lp)(phi1.arr)
    assert g.shape == phi1.arr.shape          # summed over broadcast axes
    assert np.all(np.isfinite(np.asarray(g)))
    # cotangent sum identity: gradient of the broadcast loss equals the
    # sum of per-entry gradients
    g_sum = sum(jax.grad(lambda p, i=i: jnp.sum(
        (LenseFlow(Field(p, MAP, proj)) @ Field(fb.arr[i], QU_MAP, proj)
         ).arr ** 2))(phi1.arr) for i in range(3))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_sum),
                               rtol=2e-4, atol=1e-8)

    # batched phi, unbatched f: forward + f-gradient
    phib = Field(jnp.asarray(rs.randn(3, 1, 16, 16).astype(np.float32) * 1e-6),
                 MAP, proj)
    f1 = Field(fb.arr[0], QU_MAP, proj)
    out2 = LenseFlow(phib) @ f1
    assert out2.arr.shape == (3, 2, 16, 16)
    gf = jax.grad(lambda a: jnp.sum(
        (LenseFlow(phib) @ Field(a, QU_MAP, proj)).arr ** 2))(f1.arr)
    assert gf.shape == f1.arr.shape
    assert np.all(np.isfinite(np.asarray(gf)))
