"""Field algebra, basis conversions, FFT backends — mirrors the
reference's algebra/transform testsets (test/runtests.jl:116-245)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cmblensing_tpu.core.proj import ProjLambert, rfft_degeneracy_fac
from cmblensing_tpu.core import field as F
from cmblensing_tpu.core.basis import (
    MAP, FOURIER, QU_MAP, QU_FOURIER, EB_MAP, EB_FOURIER,
    IQU_MAP, IQU_FOURIER, IEB_MAP, IEB_FOURIER,
)
from cmblensing_tpu.ops import fft as cfft

NSIDES = [(8, 8), (4, 8), (8, 4)]


def _proj(Ny, Nx):
    return ProjLambert(Ny, Nx, thetapix=3, T=np.float32)


@pytest.mark.parametrize("Ny,Nx", NSIDES)
def test_fft_roundtrip(Ny, Nx):
    proj = _proj(Ny, Nx)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, Ny, Nx))
    for mode in ["xla", "matmul"]:
        cfft.set_fft_mode(mode)
        assert jnp.max(jnp.abs(cfft.irfft2(cfft.rfft2(x), Nx) - x)) < 1e-5
    cfft.set_fft_mode("auto")


@pytest.mark.parametrize("Ny,Nx", NSIDES)
def test_fft_backends_agree(Ny, Nx):
    x = jax.random.normal(jax.random.PRNGKey(0), (1, Ny, Nx))
    cfft.set_fft_mode("xla")
    a = cfft.rfft2(x)
    cfft.set_fft_mode("matmul")
    b = cfft.rfft2(x)
    cfft.set_fft_mode("auto")
    assert jnp.max(jnp.abs(a - b)) < 1e-4


def test_unfold_matches_full_fft():
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8))
    full = jnp.fft.fft2(x)
    assert jnp.max(jnp.abs(cfft.unfold(jnp.fft.rfft2(x)) - full)) < 1e-4


@pytest.mark.parametrize("Ny,Nx", [(8, 8), (8, 6), (6, 8), (7, 8), (8, 7), (7, 9)])
def test_rfft2vec_roundtrip(Ny, Nx):
    """rfft2vec/vec2rfft pack the half-plane into exactly Ny*Nx real
    DOF and invert losslessly, incl. odd axes and rectangles
    (src/util_fft.jl:49-72 is square-even only)."""
    import numpy as np
    x = jax.random.normal(jax.random.PRNGKey(2), (Ny, Nx))
    X = jnp.fft.rfft2(x)
    v = cfft.rfft2vec(X, Nx=Nx)
    assert v.shape == (Ny * Nx,) and not np.iscomplexobj(np.asarray(v))
    X2 = cfft.vec2rfft(v, Ny=Ny, Nx=Nx)
    assert float(jnp.max(jnp.abs(X2 - X))) < 1e-5
    # map-level roundtrip
    x2 = jnp.fft.irfft2(X2, s=(Ny, Nx))
    assert float(jnp.max(jnp.abs(x2 - x))) < 1e-5
    # DOF masks are consistent and complete
    ireal, iimag, _, conj_mask = cfft.fftsyms(Ny, Nx)
    assert int(ireal.sum()) + int(iimag.sum()) == Ny * Nx
    assert not (conj_mask & (ireal | iimag)).any()


def test_rfft2vec_batched_jit_square_default():
    """Batched packing under jit; square-grid shape inference."""
    x = jax.random.normal(jax.random.PRNGKey(3), (3, 8, 8))
    X = jnp.fft.rfft2(x)
    v = jax.jit(cfft.rfft2vec)(X)
    assert v.shape == (3, 64)
    X2 = jax.jit(cfft.vec2rfft)(v)
    assert float(jnp.max(jnp.abs(X2 - X))) < 1e-5


@pytest.mark.parametrize("Ny,Nx", NSIDES)
@pytest.mark.parametrize("pol,bases", [
    ("I", [MAP, FOURIER]),
    ("QU", [QU_MAP, QU_FOURIER, EB_MAP, EB_FOURIER]),
    ("IQU", [IQU_MAP, IQU_FOURIER, IEB_MAP, IEB_FOURIER]),
])
def test_basis_conversion_roundtrips(Ny, Nx, pol, bases):
    proj = _proj(Ny, Nx)
    f = F.randn(jax.random.PRNGKey(0), proj, pol=pol)
    for b in bases:
        g = f.to(b).to(f.basis)
        assert jnp.max(jnp.abs(g.arr - f.arr)) < 1e-4, b


@pytest.mark.parametrize("Ny,Nx", NSIDES)
def test_parseval(Ny, Nx):
    proj = _proj(Ny, Nx)
    f = F.randn(jax.random.PRNGKey(0), proj, pol="QU")
    g = F.randn(jax.random.PRNGKey(1), proj, pol="QU")
    d_map = F.dot(f, g)
    d_fourier = F.dot(f.to(QU_FOURIER), g.to(QU_FOURIER))
    d_eb = F.dot(f.to(EB_FOURIER), g.to(EB_FOURIER))
    assert abs(d_map - d_fourier) < 1e-3 * abs(d_map) + 1e-5
    assert abs(d_map - d_eb) < 1e-3 * abs(d_map) + 1e-5


def test_rfft_degeneracy_fac():
    # identity from src/util_fft.jl:135: sum|fft|^2 == sum lam |rfft|^2
    x = np.random.default_rng(0).normal(size=(8, 8))
    lam = rfft_degeneracy_fac(8)
    assert np.allclose(np.sum(np.abs(np.fft.fft2(x)) ** 2),
                       np.sum(lam[None, :] * np.abs(np.fft.rfft2(x)) ** 2))


def test_field_arithmetic_and_promotion():
    proj = _proj(8, 8)
    f = F.randn(jax.random.PRNGKey(0), proj, pol="I")
    g = f.to(FOURIER)
    h = f + g          # map + fourier promotes to map
    assert h.basis == MAP
    assert jnp.max(jnp.abs(h.arr - 2 * f.arr)) < 1e-5
    assert ((2.0 * f - f) - f).arr.max() < 1e-6


def test_batching():
    proj = _proj(8, 8)
    fs = [F.randn(jax.random.PRNGKey(i), proj, pol="I") for i in range(3)]
    fb = F.batch(fs)
    assert fb.batch_shape == (3,)
    assert F.batch_length(fb) == 3
    parts = F.unbatch(fb)
    for a, b in zip(parts, fs):
        assert jnp.array_equal(a.arr, b.arr)
    assert jnp.array_equal(F.batch_index(fb, 1).arr, fs[1].arr)
    # batched scalar broadcast (BatchedReal semantics)
    s = jnp.asarray([1.0, 2.0, 3.0])
    fb2 = fb * s
    assert jnp.allclose(fb2.arr[2], 3 * fb.arr[2])


def test_component_indexing():
    proj = _proj(8, 8)
    f = F.randn(jax.random.PRNGKey(0), proj, pol="IQU")
    assert f["I"].arr.shape == (1, 8, 8)
    assert f["P"].basis == QU_MAP
    E = f["E"]
    assert E.basis == FOURIER
    # roundtrip E/B: build EB field, extract components
    eb = f.to(IEB_FOURIER)
    assert jnp.max(jnp.abs(eb["E"].arr - E.arr)) < 1e-4


def test_vmap_and_jit_through_fields():
    proj = _proj(8, 8)
    f = F.randn(jax.random.PRNGKey(0), proj, pol="I", batch_shape=(4,))

    @jax.jit
    def energy(f):
        return F.dot(f, f)

    e = energy(f)
    assert e.shape == (4,)
    # grad through conversion + dot
    g = jax.grad(lambda f: jnp.sum(F.dot(f.to(FOURIER), f.to(FOURIER))))(f)
    assert jnp.allclose(g.arr, 2 * f.arr, atol=1e-4)


def test_sum_accuracy_modes():
    """kahan / float64 sum modes (reference src/util.jl:288-316) beat
    plain f32 summation on an adversarial ill-conditioned sum, and all
    modes agree on well-conditioned data."""
    import jax
    from cmblensing_tpu.utils import summation as sm

    # adversarial: huge value + many tiny ones that f32-cancel
    n = 64
    arr = np.full((1, n, n), 1e-4, np.float32)
    arr[0, 0, 0] = 1e7
    arr[0, 0, 1] = -1e7
    z = jnp.asarray(arr)
    exact = 1e-4 * (n * n - 2)
    err = {}
    for mode in ["fast", "kahan"]:
        err[mode] = abs(float(sm.asum(z, mode=mode)) - exact)
    assert err["kahan"] <= err["fast"] + 1e-12
    assert err["kahan"] < 1e-3 * abs(exact)

    # well-conditioned random data: all modes agree closely
    key = jax.random.PRNGKey(0)
    y = jax.random.normal(key, (2, 3, 16, 16))
    s_fast = np.asarray(sm.asum(y, mode="fast"))
    s_kahan = np.asarray(sm.asum(y, mode="kahan"))
    assert np.allclose(s_fast, s_kahan, rtol=1e-5)
    assert s_fast.shape == (2,)

    # the global switch reaches field dot
    from cmblensing_tpu.core.proj import ProjLambert
    from cmblensing_tpu.core.field import Field, dot
    from cmblensing_tpu.core.basis import Basis
    proj = ProjLambert(16, 16, thetapix=3, T=np.float32)
    f = Field(jax.random.normal(key, (1, 16, 16)), Basis("I", "map"), proj)
    d_fast = float(dot(f, f))
    try:
        sm.set_sum_mode("kahan")
        d_kahan = float(dot(f, f))
    finally:
        sm.set_sum_mode("fast")
    assert abs(d_fast - d_kahan) < 1e-4 * abs(d_fast)


def test_small_util_exports():
    """Export-parity helpers: expnorm, firsthalf/lasthalf, fieldinfo,
    diag, cpu adapter (reference src/util.jl:235-325)."""
    import jax
    import cmblensing_tpu as cl
    from cmblensing_tpu.core.proj import ProjLambert
    from cmblensing_tpu.core.field import Field
    from cmblensing_tpu.core.basis import Basis

    x = jnp.asarray([0.0, 1.0, 2.0])
    e = np.asarray(cl.expnorm(x))
    assert abs(e[-1] - 1.0) < 1e-6 and e[0] < e[1] < e[2]

    assert cl.firsthalf([1, 2, 3, 4]) == [1, 2]
    assert cl.lasthalf([1, 2, 3, 4]) == [3, 4]

    proj = ProjLambert(8, 8, thetapix=3, T=np.float32)
    f = Field(jnp.ones((1, 8, 8)), Basis("I", "map"), proj)
    info = cl.fieldinfo(f)
    assert "Field" in info and "8" in info

    C = cl.Cl_to_Cov("I", proj, cl.camb()["unlensed_scalar"]["TT"])
    d = cl.diag(C)
    assert d.proj is proj

    f_cpu = cl.cpu(f)
    assert all(dev.platform == "cpu" for dev in f_cpu.arr.devices())


def test_sum_float64_mode(x64):
    """float64 sum mode accumulates at f64 (reference util.jl:288-316);
    under x64 it must beat plain f32-style accumulation on long sums."""
    from cmblensing_tpu.utils import summation as sm
    # 1 + many tiny increments that individually round away at f32
    n = 512
    arr = np.full((1, n, n), np.float32(1e-8), np.float32)
    arr[0, 0, 0] = 1.0
    z = jnp.asarray(arr)
    exact = 1.0 + 1e-8 * (n * n - 1)
    s64 = float(sm.asum(z, mode="float64"))
    assert abs(s64 - exact) < 1e-7 * exact


def test_progress_bar_print_fallback(capsys, monkeypatch):
    """Without tqdm the bar degrades to prints with showvalues."""
    import builtins
    real_import = builtins.__import__

    def no_tqdm(name, *a, **kw):
        if name == "tqdm":
            raise ImportError("tqdm disabled for test")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_tqdm)
    from cmblensing_tpu.utils.progress import progress_bar
    with progress_bar(total=2, desc="T", enabled=True) as pb:
        pb.update(logpdf=1.5)
        pb.update(logpdf=2.5)
    out = capsys.readouterr().out
    assert "T 1/2" in out and "logpdf=1.5" in out


def test_metadata_mismatch_errors():
    """Combining fields with differing projections raises (reference
    metadata-mismatch tests, runtests.jl:83-113)."""
    import pytest as _pytest
    from cmblensing_tpu.core.proj import ProjLambert
    from cmblensing_tpu.core.field import Field
    from cmblensing_tpu.core.basis import Basis
    p1 = ProjLambert(8, 8, thetapix=3, T=np.float32)
    p2 = ProjLambert(16, 16, thetapix=3, T=np.float32)
    f1 = Field(jnp.ones((1, 8, 8)), Basis("I", "map"), p1)
    f2 = Field(jnp.ones((1, 16, 16)), Basis("I", "map"), p2)
    with _pytest.raises(ValueError, match="differing projections"):
        f1 + f2


def test_cross_spectrum_and_rho():
    """get_Cl(f1, f2) cross-spectra: self-cross equals auto, and
    get_rho_l(f, f) = 1 (reference get_ρℓ)."""
    import jax
    from cmblensing_tpu.core.proj import ProjLambert
    from cmblensing_tpu.core.field import Field
    from cmblensing_tpu.core.basis import Basis
    from cmblensing_tpu.utils.spectra import get_Cl
    from cmblensing_tpu.utils.cls import get_rho_l

    proj = ProjLambert(64, 64, thetapix=3, T=np.float32)
    f = Field(jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64)),
              Basis("I", "map"), proj)
    auto = get_Cl(f, ledges=np.arange(200, 2000, 200))
    cross = get_Cl(f, f, ledges=np.arange(200, 2000, 200))
    assert np.allclose(np.asarray(auto.Cl), np.asarray(cross.Cl), rtol=1e-5)
    rho = get_rho_l(f, f, ledges=np.arange(200, 2000, 200))
    assert np.allclose(np.asarray(rho.Cl), 1.0, atol=1e-4)


def test_get_cl_odd_grid_and_dl_convention():
    """get_Cl works on odd-Nx grids (regression: unfold's even-Nx
    inference crashed the boolean lmag mask), and get_Dl uses the
    package-wide ell(ell+1)/2pi convention (matching toDl)."""
    import jax
    from cmblensing_tpu.core.proj import ProjLambert
    from cmblensing_tpu.core.field import Field
    from cmblensing_tpu.core.basis import Basis
    from cmblensing_tpu.utils.spectra import get_Cl, get_Dl

    for Ny, Nx in [(16, 15), (15, 16), (15, 15)]:
        proj = ProjLambert(Ny, Nx, thetapix=3, T=np.float32)
        f = Field(jax.random.normal(jax.random.PRNGKey(0), (1, Ny, Nx)),
                  Basis("I", "map"), proj)
        cl = get_Cl(f, ledges=np.arange(500, 3000, 500))
        assert np.isfinite(np.asarray(cl.Cl)).all()
    dl = get_Dl(f, ledges=np.arange(500, 3000, 500))
    cl = get_Cl(f, ledges=np.arange(500, 3000, 500))
    expect = cl.ell * (cl.ell + 1) * cl.Cl / (2 * np.pi)
    assert np.allclose(np.asarray(dl.Cl), np.asarray(expect), rtol=1e-6)


def test_cls_slice_semantics():
    """Cls[a:b:c] honors numpy slice semantics: step respected,
    open-ended stop allowed (regression: step was dropped and
    stop=None crashed)."""
    from cmblensing_tpu.utils.cls import Cls
    ell = np.arange(2, 101)
    cl = Cls(ell, ell.astype(np.float64))
    assert len(cl[10:20:2]) == 5
    assert np.allclose(cl[10:20:2], [10, 12, 14, 16, 18])
    out = cl[90:]
    assert len(out) == 11 and np.allclose(out[:-1][np.isfinite(out[:-1])],
                                          np.arange(90, 100))


def test_camb_nt_not_silently_cached():
    """camb() with a non-default nt must not return the cached fiducial
    tensor spectra (regression: nt was missing from the cache check)."""
    from cmblensing_tpu.utils.cls import camb
    camb()  # defaults hit the cache
    camb(nt=-0.2 / 8)  # the fiducial inflation-consistency value: cache ok
    with pytest.raises(RuntimeError, match="pycamb"):
        camb(nt=0.0)


def test_default_cls_pp_convention_marker():
    """The shipped fiducial phiphi uses CAMB's documented
    [L(L+1)]^2 C/2pi convention (scripts/fix_default_cls_pp.py), not
    the reference live path's ell^4 (src/cls.jl:186)."""
    import cmblensing_tpu.utils.cls as cls_mod
    import os
    z = np.load(os.path.join(os.path.dirname(cls_mod.__file__),
                             "..", "dat", "default_camb_cls.npz"))
    assert "pp_convention" in z.files


def test_cls_helpers():
    """Spectra helpers: toDl/toCl inverses, ell2/ell4, shift_l,
    noise/beam Cls shapes (reference cls.jl:50-81, 288-309)."""
    from cmblensing_tpu.utils.cls import (Cls, toDl, toCl, ell2, ell4,
                                          shift_l, noise_cls, beam_cls)
    ell = np.arange(2, 100)
    cl = Cls(ell, 1.0 / ell ** 2)
    dl = toDl * cl
    back = toCl * dl
    assert np.allclose(back(ell), cl(ell), rtol=1e-10)
    assert np.allclose((ell2 * cl)(ell), np.asarray(cl(ell)) * ell ** 2)
    assert np.allclose((ell4 * cl)(ell), np.asarray(cl(ell)) * ell ** 4)

    sh = shift_l(10, cl)
    assert np.allclose(np.asarray(sh.ell), ell + 10)
    sc = shift_l(2, cl, factor=True)
    assert np.allclose(np.asarray(sc.ell), ell * 2)

    ncl = noise_cls(muKarcminT=1, beamFWHM=2)
    assert np.all(np.asarray(ncl["TT"](np.arange(2, 1000))) > 0)
    assert np.allclose(np.asarray(ncl["EE"](np.arange(2, 1000))),
                       2 * np.asarray(ncl["TT"](np.arange(2, 1000))))
    bcl = beam_cls(beamFWHM=2)
    b = np.asarray(bcl(np.arange(2, 3000)))
    assert b[0] > b[-1] > 0 and abs(b[0] - 1.0) < 1e-3
