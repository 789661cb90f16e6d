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
