"""NUFFT correctness and the fft projection mode."""
import numpy as np
import jax
import jax.numpy as jnp

from cmblensing_tpu.ops.nufft import nufft_eval, nufft_adjoint


def _nyquist_free(m):
    N1, N2 = m.shape
    F = np.fft.fft2(m)
    F[N1 // 2, :] = 0
    F[:, N2 // 2] = 0
    return np.real(np.fft.ifft2(F)).astype(np.float32)


def test_nufft_matches_direct_dft():
    rng = np.random.default_rng(0)
    Ny, Nx = 16, 24
    m = _nyquist_free(rng.normal(size=(Ny, Nx)))
    ys = rng.uniform(0, Ny, 40)
    xs = rng.uniform(0, Nx, 40)
    ky = np.fft.fftfreq(Ny) * Ny
    kx = np.fft.fftfreq(Nx) * Nx
    Fc = np.fft.fft2(m) / (Ny * Nx)
    direct = np.array([np.real(np.sum(Fc * np.exp(2j * np.pi * (ky[:, None] * y / Ny
                                                                + kx[None, :] * x / Nx))))
                       for y, x in zip(ys, xs)])
    got = np.asarray(nufft_eval(jnp.asarray(m), jnp.asarray(ys), jnp.asarray(xs)))
    assert np.abs(got - direct).max() < 1e-4


def test_nufft_reproduces_grid_samples():
    rng = np.random.default_rng(1)
    m = _nyquist_free(rng.normal(size=(16, 16)))
    iy = np.arange(16).astype(np.float64)
    got = np.asarray(nufft_eval(jnp.asarray(m), jnp.asarray(iy), jnp.zeros(16)))
    assert np.abs(got - m[:, 0]).max() < 1e-4


def test_nufft_adjoint_identity():
    rng = np.random.default_rng(2)
    m = jnp.asarray(_nyquist_free(rng.normal(size=(16, 16))))
    ys = jnp.asarray(rng.uniform(0, 16, 30))
    xs = jnp.asarray(rng.uniform(0, 16, 30))
    v = jnp.asarray(rng.normal(size=30).astype(np.float32))
    lhs = float(jnp.sum(nufft_eval(m, ys, xs) * v))
    rhs = float(jnp.sum(m * nufft_adjoint(v, ys, xs, 16, 16)))
    assert abs(lhs - rhs) < 1e-3 * abs(lhs)


def test_fft_projection_dense_regime():
    from cmblensing_tpu.core import healpix_pix as hp
    from cmblensing_tpu.core.proj_healpix import HealpixField, project, Projector
    from cmblensing_tpu.core.proj import ProjLambert
    nside, N, tp = 256, 16, 20.0
    th, ph = hp.pix2ang_ring(nside, np.arange(hp.nside2npix(nside)))
    f = lambda th, ph: np.sin(th) ** 2 * np.cos(2 * ph) + np.cos(th)
    m = f(th, ph).astype(np.float32)
    proj = ProjLambert(N, N, thetapix=tp, T=np.float32)
    hf = HealpixField.from_map(m)
    pr = Projector(hf.proj, proj)
    assert len(np.asarray(pr.hpx_idxs_in_patch)) > N * N  # dense regime
    flat = project(hf, proj, method="fft")
    err = np.abs(np.asarray(flat.arr[0]) - f(pr.thetas, pr.phis))
    assert np.median(err) < 0.01
    # cart -> sphere fft roundtrip
    back = project(flat, hf.proj, method="fft")
    sel = np.asarray(pr.hpx_idxs_in_patch)
    err2 = np.abs(np.asarray(back.arr[0])[sel] - m[sel])
    assert np.median(err2) < 0.02


def test_nufft_odd_sizes():
    """Regression: the centered-spectrum zero-padding was off by one
    frequency bin for odd axis lengths (~200% error)."""
    from cmblensing_tpu.ops.nufft import nufft_eval
    rs = np.random.RandomState(0)
    for (Ny, Nx) in [(17, 16), (16, 17), (15, 15)]:
        m = jnp.asarray(rs.randn(Ny, Nx).astype(np.float32))
        ys = jnp.asarray(rs.rand(30).astype(np.float32) * Ny)
        xs = jnp.asarray(rs.rand(30).astype(np.float32) * Nx)
        got = np.asarray(nufft_eval(m, ys, xs))
        ky, kx = np.fft.fftfreq(Ny), np.fft.fftfreq(Nx)
        F = np.fft.fft2(np.asarray(m)) / (Ny * Nx)
        ph = np.exp(2j * np.pi * (np.asarray(ys)[:, None, None] * ky[None, :, None]
                                  + np.asarray(xs)[:, None, None] * kx[None, None, :]))
        ref = np.real((F[None] * ph).sum(axis=(1, 2)))
        err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        assert err < 1e-4, (Ny, Nx, err)


def test_healpix_projection_batched():
    """Regression: cart->healpix projection silently dropped all batch
    entries but the first (full flatten mixed batch into pixel index)."""
    from cmblensing_tpu.core.proj_healpix import (ProjHealpix, Projector,
                                                  _project_cart_to_sph_comp)
    from cmblensing_tpu.core.proj import ProjLambert

    cart = ProjLambert(16, 16, thetapix=30, T=np.float32)
    hpx = ProjHealpix(32)
    pr = Projector(hpx, cart)
    rs = np.random.RandomState(0)
    arr = jnp.asarray(rs.randn(2, 16, 16).astype(np.float32))
    out_b = np.asarray(_project_cart_to_sph_comp(pr, arr))
    assert out_b.shape == (2, hpx.npix)
    for i in range(2):
        out_i = np.asarray(_project_cart_to_sph_comp(pr, arr[i]))
        np.testing.assert_allclose(out_b[i], out_i, rtol=0, atol=1e-6)
    assert np.max(np.abs(out_b[1])) > 0        # second entry not dropped
