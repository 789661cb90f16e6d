"""EquiRect and HEALPix projections — mirrors test/runtests.jl:625-752."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cmblensing_tpu.core.proj_equirect import (
    ProjEquiRect, EquiRectField, BlockDiagEquiRect, Cl_to_Cov_EquiRect,
    Cl_to_Beam_EquiRect, er_dot, mapblocks,
)
from cmblensing_tpu.core.proj_healpix import (
    ProjHealpix, HealpixField, project, ij_to_thetaphi, thetaphi_to_ij,
)
from cmblensing_tpu.core import healpix_pix as hp
from cmblensing_tpu.core.proj import ProjLambert
from cmblensing_tpu.utils.cls import Cls


@pytest.fixture(scope="module")
def er_proj():
    return ProjEquiRect(Ny=8, Nx=16, theta_span=(1.2, 1.8), phi_span=(0, 2 * np.pi))


@pytest.fixture(scope="module")
def spectra():
    lmax = 50
    ell = np.arange(lmax + 1)
    CE = np.where(ell >= 2, 1.0 / (ell + 1.0) ** 2, 0.0)
    CB = np.where(ell >= 2, 0.3 / (ell + 1.0) ** 2, 0.0)
    return lmax, ell, Cls(ell, CE), Cls(ell, CB)


def test_equirect_transform_roundtrips(er_proj):
    key = jax.random.PRNGKey(0)
    f = EquiRectField(jax.random.normal(key, (8, 16)), "map", er_proj)
    assert float(jnp.abs(f.to("az").to("map").arr - f.arr).max()) < 1e-5
    fq = EquiRectField(jax.random.normal(key, (2, 8, 16)), "qu_map", er_proj)
    assert float(jnp.abs(fq.to("qu_az").to("qu_map").arr - fq.arr).max()) < 1e-5


def test_equirect_qu_az_symmetry(er_proj):
    """m=0 column of the stacked spin-2 representation satisfies the
    conjugate-pair constraint (Fourier-symmetry invariant,
    runtests.jl:671-689-ish)."""
    key = jax.random.PRNGKey(1)
    fq = EquiRectField(jax.random.normal(key, (2, 8, 16)), "qu_map", er_proj).to("qu_az")
    nT = 8
    top0 = fq.arr[:nT, 0]
    bot0 = fq.arr[nT:, 0]
    assert float(jnp.abs(top0 - jnp.conj(bot0)).max()) < 1e-5


def test_equirect_cov_identities(er_proj, spectra):
    lmax, ell, CE, CB = spectra
    C = Cl_to_Cov_EquiRect("I", er_proj, CE, lmax=lmax)
    S = C.sqrt()
    assert float(jnp.abs((S * S).blocks - C.blocks).max()) < 1e-5 * float(jnp.abs(C.blocks).max())
    Pi = C.pinv()
    eye = jnp.eye(C.blocks.shape[-1])[None]
    assert float(jnp.abs((Pi * C).blocks - eye).max()) < 1e-4
    assert np.isfinite(float(C.logdet()))
    # adjoint: <g, C f> == <C' g, f>
    key = jax.random.PRNGKey(2)
    f = EquiRectField(jax.random.normal(key, (8, 16)), "map", er_proj)
    g = EquiRectField(jax.random.normal(jax.random.fold_in(key, 1), (8, 16)), "map", er_proj)
    lhs = float(er_dot(g, C @ f))
    rhs = float(er_dot(C.H @ g, f))
    assert abs(lhs - rhs) < 1e-3 * abs(lhs)


def test_equirect_cov_exact_two_point(er_proj, spectra):
    """Covariance from blocks equals the analytic Legendre two-point
    function — exactness of the Wigner-d construction."""
    from numpy.polynomial.legendre import legval
    lmax, ell, CE, _ = spectra
    C = Cl_to_Cov_EquiRect("I", er_proj, CE, lmax=lmax)
    blocks = np.asarray(C.blocks)
    nP = er_proj.Nx
    lam = np.array([1.0] + [2.0] * (nP // 2 - 1) + [1.0])
    cov = (1 / nP) * np.sum(lam[:, None, None] * blocks, axis=0)
    t1, t2 = er_proj.theta[1], er_proj.theta[6]
    cosb = np.cos(t1) * np.cos(t2) + np.sin(t1) * np.sin(t2)
    P = np.array([legval(cosb, np.eye(lmax + 1)[l]) for l in range(lmax + 1)])
    Gamma = np.sum((2 * ell + 1) / (4 * np.pi) * np.nan_to_num(CE(ell)) * P)
    assert abs(cov[1, 6] - Gamma) < 1e-4 * abs(Gamma)


def test_equirect_spin2_simulation_variance(er_proj, spectra):
    lmax, ell, CE, CB = spectra
    C = Cl_to_Cov_EquiRect("P", er_proj, CE, CB, lmax=lmax)
    var_th = np.sum((2 * ell + 1) / (4 * np.pi) * (np.nan_to_num(CE(ell)) + np.nan_to_num(CB(ell))))
    keys = jax.random.split(jax.random.PRNGKey(0), 150)
    tot = 0.0
    for k in keys:
        qu = np.asarray(C.simulate(k).to("qu_map").arr)
        tot += qu[0] ** 2 + qu[1] ** 2
    emp = tot.mean() / len(keys)
    assert abs(emp - var_th) < 0.15 * var_th


def test_equirect_mapblocks(er_proj, spectra):
    lmax, ell, CE, _ = spectra
    C = Cl_to_Cov_EquiRect("I", er_proj, CE, lmax=lmax)
    f = EquiRectField(jax.random.normal(jax.random.PRNGKey(0), (8, 16)), "map", er_proj)
    g1 = C @ f
    g2 = mapblocks(lambda B, x: B @ x, C, f)
    assert float(jnp.abs(g1.arr - g2.arr).max()) < 1e-4


def test_equirect_beam(er_proj, spectra):
    lmax, ell, CE, _ = spectra
    B = Cl_to_Beam_EquiRect("I", er_proj, CE, lmax=lmax)
    assert B.blocks.shape == (er_proj.Nx // 2 + 1, er_proj.Ny, er_proj.Ny)


def test_healpix_pix2ang_interp():
    nside = 16
    th, ph = hp.pix2ang_ring(nside, np.arange(hp.nside2npix(nside)))
    f = lambda th, ph: np.sin(th) ** 2 * np.cos(2 * ph) + np.cos(th)
    m = f(th, ph)
    assert np.abs(hp.interp_val(m, th, ph) - m).max() < 1e-12
    rng = np.random.default_rng(0)
    tq = np.arccos(rng.uniform(-0.9, 0.9, 500))
    pq = rng.uniform(0, 2 * np.pi, 500)
    assert np.abs(hp.interp_val(m, tq, pq) - f(tq, pq)).max() < 0.01


def test_healpix_coord_roundtrip():
    proj = ProjLambert(32, 32, thetapix=10, T=np.float32, rotator=(30.0, 60.0, 0.0))
    i = np.array([5.0, 16.0, 28.0])
    j = np.array([8.0, 16.0, 30.0])
    th, ph = ij_to_thetaphi(proj, i, j)
    i2, j2 = thetaphi_to_ij(proj, th, ph)
    assert np.abs(i2 - i).max() < 1e-6
    assert np.abs(j2 - j).max() < 1e-6


def test_healpix_projection_roundtrip():
    nside = 16
    th, ph = hp.pix2ang_ring(nside, np.arange(hp.nside2npix(nside)))
    m = (np.sin(th) ** 2 * np.cos(2 * ph)).astype(np.float32)
    hf = HealpixField.from_map(m)
    proj = ProjLambert(64, 64, thetapix=10, T=np.float32)
    flat = project(hf, proj)
    back = project(flat, hf.proj)
    from cmblensing_tpu.core.proj_healpix import Projector
    pr = Projector(hf.proj, proj)
    sel = np.asarray(pr.hpx_idxs_in_patch)
    err = np.abs(np.asarray(back.arr[0])[sel] - m[sel])
    assert np.median(err) < 0.01


def test_healpix_qu_projection():
    nside = 16
    npix = hp.nside2npix(nside)
    th, ph = hp.pix2ang_ring(nside, np.arange(npix))
    Q = np.cos(th).astype(np.float32)
    U = np.sin(th).astype(np.float32) * 0.5
    hf = HealpixField.from_map(np.stack([Q, U]), pol="QU")
    proj = ProjLambert(32, 32, thetapix=10, T=np.float32)
    flat = project(hf, proj)
    assert flat.basis.pol == "QU"
    # |P| is rotation invariant: check magnitudes preserved
    P_flat = np.asarray(flat.arr[0] ** 2 + flat.arr[1] ** 2)
    from cmblensing_tpu.core.proj_healpix import Projector
    pr = Projector(hf.proj, proj)
    P_expect = hp.interp_val(Q.astype(np.float64) ** 2 + U.astype(np.float64) ** 2,
                             pr.thetas.ravel(), pr.phis.ravel()).reshape(32, 32)
    assert np.abs(P_flat - P_expect).max() < 0.05


@pytest.mark.parametrize("pol", ["I", "P"])
def test_equirect_solve_roundtrip(er_proj, spectra, pol):
    """C.solve(C @ f) == f for spin-0 and spin-2 block covariances —
    guards the rank handling in BlockDiagEquiRect.solve."""
    lmax, ell, CE, CB = spectra
    if pol == "I":
        C = Cl_to_Cov_EquiRect("I", er_proj, CE, lmax=lmax)
    else:
        C = Cl_to_Cov_EquiRect("P", er_proj, CE, CB, lmax=lmax)
    f = C.simulate(jax.random.PRNGKey(2))
    rt = C.solve(C @ f)
    d = float(jnp.max(jnp.abs(rt.arr - f.to(rt.basis).arr)))
    m = float(jnp.max(jnp.abs(f.to(rt.basis).arr)))
    assert d < 1e-3 * m
