"""Spectral derivative backends agree bit-for-bit in intent (Nyquist
zeroed) and the fused Pallas kernel matches the scan integrator."""
import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cmblensing_tpu.core.proj import ProjLambert
from cmblensing_tpu.ops import deriv


@pytest.fixture(autouse=True)
def _restore_mode():
    yield
    deriv.set_deriv_mode("auto")


@pytest.mark.parametrize("Ny,Nx", [(16, 16), (8, 16), (16, 8)])
def test_backends_agree(Ny, Nx):
    proj = ProjLambert(Ny, Nx, thetapix=3, T=np.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, Ny, Nx))
    outs = {}
    for mode in ["fft", "matmul"]:
        deriv.set_deriv_mode(mode)
        gx, gy = deriv.grad_xy(x, proj)
        d = deriv.div_xy(gx, gy, proj)
        (hx, hy), (hxx, hxy, hyy) = deriv.gradhess(x[:1], proj)
        outs[mode] = (gx, gy, d, hx, hy, hxx, hxy, hyy)
    for a, b in zip(outs["fft"], outs["matmul"]):
        assert float(jnp.max(jnp.abs(a - b))) < 5e-3 * float(jnp.max(jnp.abs(a)) + 1e-9)


def test_deriv_exact_on_harmonic():
    """d/dx sin(kx) = k cos(kx) for both backends."""
    N = 32
    proj = ProjLambert(N, N, thetapix=3, T=np.float32)
    dx = float(proj.deltax)
    x = np.arange(N) * dx
    k = 2 * np.pi / (N * dx) * 5
    f = jnp.asarray(np.broadcast_to(np.sin(k * x)[None, :], (N, N)).astype(np.float32))[None]
    for mode in ["fft", "matmul"]:
        deriv.set_deriv_mode(mode)
        gx, gy = deriv.grad_xy(f, proj)
        expected = k * np.cos(k * x)[None, :]
        assert np.max(np.abs(np.asarray(gx[0]) - expected)) < 1e-2 * k, mode


def test_dij_sum_consistency():
    proj = ProjLambert(16, 16, thetapix=3, T=np.float32)
    s = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16))
    outs = []
    for mode in ["fft", "matmul"]:
        deriv.set_deriv_mode(mode)
        outs.append(deriv.dij_sum(s, proj))
    assert float(jnp.max(jnp.abs(outs[0] - outs[1]))) < 5e-3 * float(jnp.max(jnp.abs(outs[0])))


def test_pallas_kernel_interpret_matches_scan():
    """Fused Pallas LenseFlow (interpreter mode, CPU-safe) equals the
    lax.scan integrator."""
    from jax.experimental import pallas as pl
    from cmblensing_tpu.models.lenseflow import _gradhess_phi, _rk4, _velocity
    from cmblensing_tpu.ops import pallas_lenseflow as plf
    from cmblensing_tpu.ops.deriv import _deriv_matrices

    deriv.set_deriv_mode("matmul")
    N = 32
    proj = ProjLambert(N, N, thetapix=3, T=np.float32)
    key = jax.random.PRNGKey(0)
    # smooth, weak phi
    phi_f = jnp.zeros((1, N, N // 2 + 1), dtype=jnp.complex64)
    phi_f = phi_f.at[0, 1, 1].set(1e-3)   # weak-lensing-regime deflection
    phi = jnp.fft.irfft2(phi_f, s=(N, N))
    f = jax.random.normal(jax.random.fold_in(key, 1), (2, N, N))
    g, h = _gradhess_phi(phi, proj)
    ref = _rk4(lambda t, y: _velocity(t, y, g, h, proj), f, 0., 1., 7)

    Dx1, _ = _deriv_matrices(N, float(proj.deltax), "float32")
    Dy1, _ = _deriv_matrices(N, float(proj.deltax), "float32")
    kern = functools.partial(plf._kernel, nsteps=7, t0=0., t1=1., ncomp=2)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((2, N, N), jnp.float32),
        interpret=True,
    )(f, g[0], g[1], h[0], h[1], h[2], jnp.asarray(Dx1.T.copy()), jnp.asarray(Dy1))
    assert float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref))) < 1e-3


def test_matmul_precision_pinned_in_jaxpr():
    """Regression guard for the TPU default-matmul-precision pitfall:
    the f32 path must pin Precision.HIGHEST on every dot (TPU's default
    truncates f32 operands to bf16, corrupting lensing gradients), and
    the 'high'/'bf16' knobs must change that deliberately."""
    proj = ProjLambert(16, 16, thetapix=3, T=np.float32)
    x = jnp.ones((1, 16, 16), jnp.float32)

    def dots_of(fn, *args):
        jaxpr = jax.make_jaxpr(fn)(*args)
        return [e for e in jaxpr.jaxpr.eqns if e.primitive.name == "dot_general"]

    deriv.set_deriv_mode("matmul")
    try:
        for setting, expect in [("f32", jax.lax.Precision.HIGHEST),
                                ("high", jax.lax.Precision.HIGH)]:
            deriv.set_matmul_precision(setting)
            dots = dots_of(lambda a: deriv.grad_xy(a, proj), x)
            assert dots, "matmul backend should lower to dot_general"
            for e in dots:
                assert e.params["precision"] == (expect, expect), (setting, e.params)
        deriv.set_matmul_precision("bf16")
        dots = dots_of(lambda a: deriv.grad_xy(a, proj), x)
        for e in dots:
            assert e.invars[0].aval.dtype == jnp.bfloat16
            assert e.params["preferred_element_type"] == jnp.float32
    finally:
        deriv.set_matmul_precision("f32")

    # the matmul-DFT backend pins it too
    from cmblensing_tpu.ops import fft as _fft
    dots = dots_of(lambda a: _fft._matmul_irfft2(_fft._matmul_rfft2(a), 16), x)
    assert dots
    for e in dots:
        assert e.params["precision"] == (jax.lax.Precision.HIGHEST,) * 2
