"""Operator algebra: Diag, BlockDiagIEB, logdet/tr identities, bandpass,
gradients — mirrors test/runtests.jl:137-285."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cmblensing_tpu.core.proj import ProjLambert
from cmblensing_tpu.core import field as F
from cmblensing_tpu.core.basis import MAP, FOURIER, EB_FOURIER, IEB_FOURIER
from cmblensing_tpu.core.field import Field
from cmblensing_tpu.core.ops import (
    Diag, Id, BlockDiagIEB, LazyOp, ParamDependentOp, logdet, tr,
    HighPass, LowPass, MidPass, gradient, gradhess, laplacian, simulate_op,
)
from cmblensing_tpu.core.cov import Cl_to_Cov
from cmblensing_tpu.utils.cls import camb
from cmblensing_tpu.ops.fft import unfold


def _proj(Ny=16, Nx=16):
    return ProjLambert(Ny, Nx, thetapix=3, T=np.float32)


def test_diag_apply_and_solve():
    proj = _proj()
    f = F.randn(jax.random.PRNGKey(0), proj, pol="I")
    Dop = Diag(Field(2.0 + jnp.abs(f.arr), MAP, proj))
    g = Dop @ f
    h = Dop.solve(g)
    assert jnp.max(jnp.abs(h.arr - f.arr)) < 1e-5
    # sqrt and pinv
    s = Dop.sqrt()
    assert jnp.max(jnp.abs((s * s).diag.arr - Dop.diag.arr)) < 1e-4
    assert jnp.max(jnp.abs((Dop.pinv() * Dop).diag.arr - 1.0)) < 1e-5


def test_lazy_ops():
    proj = _proj()
    f = F.randn(jax.random.PRNGKey(0), proj, pol="I")
    A = Diag(Field(2.0 + 0 * f.arr, MAP, proj))
    B = Diag(Field(3.0 + 0 * f.arr, MAP, proj))
    assert jnp.allclose(((A + B) @ f).arr, 5 * f.arr, atol=1e-5)
    L = LazyOp("*", A, B)
    assert jnp.allclose((L @ f).arr, 6 * f.arr, atol=1e-5)
    assert jnp.allclose(L.solve(f).arr, f.arr / 6, atol=1e-6)
    assert jnp.allclose(((2.0 * A) @ f).arr, 4 * f.arr, atol=1e-5)
    assert jnp.allclose(((A ** 2) @ f).arr, 4 * f.arr, atol=1e-5)


def test_logdet_fourier_vs_dense():
    """logdet of a Fourier-diagonal covariance equals the sum over the
    full plane (reference logdet identity, runtests.jl:249-285)."""
    proj = _proj(8, 8)
    Cl = camb()
    C = Cl_to_Cov("I", proj, Cl["unlensed_scalar"]["TT"] + 1.0)
    ld = float(logdet(C))
    full = np.asarray(unfold(C.diag.arr[0])).real
    nz = full != 0  # modes outside the spectrum support are excluded
    expected = np.sum(np.log(np.abs(full[nz])))
    assert abs(ld - expected) < 1e-3 * abs(expected)


def test_tr_fourier():
    proj = _proj(8, 8)
    arr = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (1,) + proj.shape_fourier)) + 1.0
    C = Diag(Field(arr.astype(jnp.complex64), FOURIER, proj))
    t = float(tr(C))
    expected = float(jnp.sum(jnp.real(unfold(arr[0]))))
    assert abs(t - expected) < 1e-2 * abs(expected)


def test_block_diag_ieb():
    proj = _proj()
    Cl = camb()
    C = Cl_to_Cov("IP", proj, Cl["total"]["TT"], Cl["total"]["EE"],
                  Cl["total"]["BB"], Cl["total"]["TE"])
    f = F.randn(jax.random.PRNGKey(0), proj, pol="IQU").to(IEB_FOURIER)
    g = C @ f
    h = C.solve(g)
    # solve(C @ f) == f on modes where C is nonsingular
    mask = jnp.abs(C.TT.arr) > 0
    assert jnp.max(jnp.abs(jnp.where(mask, h.arr[..., 0:1, :, :] - f.arr[..., 0:1, :, :], 0))) < 1e-3
    # sqrt(C) @ sqrt(C) == C
    s = C.sqrt()
    C2 = s * s
    assert jnp.max(jnp.abs(C2.TT.arr - C.TT.arr)) < 1e-2 * float(jnp.max(jnp.abs(C.TT.arr)))
    assert jnp.max(jnp.abs(C2.TE.arr - C.TE.arr)) < 1e-2 * float(jnp.max(jnp.abs(C.TT.arr)))
    # logdet finite
    assert np.isfinite(float(logdet(C)))


def test_param_dependent_op():
    proj = _proj()
    Cl = camb()
    C0 = Cl_to_Cov("I", proj, Cl["unlensed_scalar"]["TT"])
    Cf = ParamDependentOp(("A",), lambda deps, A=1.0: Diag(Field(A * deps[0].diag.arr,
                                                                 FOURIER, proj)), (C0,))
    f = F.randn(jax.random.PRNGKey(0), proj, pol="I")
    a = Cf(dict(A=2.0)) @ f
    b = Cf({}) @ f
    assert jnp.allclose(a.arr, 2 * b.arr, atol=1e-4)
    assert Cf.depends_on(dict(A=1.0))
    assert not Cf.depends_on(dict(B=1.0))


def test_bandpass():
    proj = ProjLambert(64, 64, thetapix=3, T=np.float32)
    lp = LowPass(1000).on(proj, pol="I")
    hp = HighPass(1000).on(proj, pol="I")
    lmag = np.asarray(proj.lmag)
    w_lp = np.asarray(lp.diag.arr[0].real)
    assert np.all(w_lp[lmag > 1100] == 0)
    assert np.all(w_lp[(lmag < 900) & (lmag > 0)] == 1)
    w_hp = np.asarray(hp.diag.arr[0].real)
    assert np.all(w_hp[(lmag < 900)] == 0)


def test_gradient_ops():
    """d/dx of sin(kx) is k cos(kx)."""
    proj = ProjLambert(32, 32, thetapix=3, T=np.float32)
    dx = float(proj.deltax)
    x = np.arange(32) * dx
    k = 2 * np.pi / (32 * dx) * 4     # 4th harmonic
    f = F.from_maps(np.broadcast_to(np.sin(k * x)[None, :], (32, 32)).astype(np.float32), proj)
    gx, gy = gradient(f)
    expected = k * np.cos(k * x)[None, :]
    got = gx.to(MAP).arr[0]
    assert np.max(np.abs(np.asarray(got) - expected)) < 1e-2 * k
    assert np.max(np.abs(np.asarray(gy.to(MAP).arr[0]))) < 1e-3 * k
    # laplacian
    lap = laplacian(f).to(MAP)
    assert np.max(np.abs(np.asarray(lap.arr[0]) + k * k * np.sin(k * x)[None, :])) < 2e-2 * k * k


def test_simulate_op_spectrum():
    """Simulated field has roughly the covariance's spectrum."""
    proj = ProjLambert(64, 64, thetapix=1, T=np.float32)
    arr = jnp.full((1,) + proj.shape_fourier, 10.0, dtype=jnp.complex64)
    C = Diag(Field(arr, FOURIER, proj))
    keys = jax.random.split(jax.random.PRNGKey(0), 50)
    tot = 0.0
    for k in keys:
        xi = simulate_op(k, C).to(FOURIER)
        tot = tot + jnp.mean(jnp.abs(xi.arr[..., :, 1:-1]) ** 2)
    var = float(tot / len(keys)) / (64 * 64)
    assert abs(var - 10.0) < 1.0


def test_cg_record_history():
    """In-jit CG residual trace (reference history_keys machinery,
    numerical_algorithms.jl:60-71): fixed-length, NaN past
    convergence, monotone-ish decreasing."""
    import jax
    import jax.numpy as jnp
    from cmblensing_tpu.ops.solvers import conjugate_gradient

    A = jnp.diag(jnp.arange(1.0, 9.0))
    b = jnp.ones(8)

    @jax.jit
    def solve(b):
        return conjugate_gradient(lambda r: r, lambda x: A @ x, b,
                                  nsteps=20, tol=1e-12,
                                  record_history=True)

    x, info = solve(b)
    hist = np.asarray(info["res_history"])
    assert hist.shape == (21,)
    assert np.isfinite(hist[0])
    # converges in <= 8 iters (8 distinct eigenvalues): tail is NaN
    assert np.isnan(hist[-1])
    fin = hist[np.isfinite(hist)]
    assert len(fin) >= 2 and fin[-1] < fin[0]
    assert np.allclose(np.asarray(x), np.asarray(b) / np.arange(1.0, 9.0),
                       rtol=1e-4)


def test_bandpass_filters():
    """HighPass/LowPass/MidPass cosine ramps (specialops.jl:232-242):
    pass-band unity, stop-band zero, smooth in between."""
    from cmblensing_tpu.core.ops import HighPass, LowPass, MidPass

    hp = HighPass(500, dl=100)
    assert hp(400) == 0.0 and abs(hp(700) - 1.0) < 1e-12
    assert 0.0 < hp(550) < 1.0

    lp = LowPass(2000, dl=100)
    assert abs(lp(1500) - 1.0) < 1e-12 and lp(2200) == 0.0

    mp = MidPass(500, 2000, dl=100)
    assert mp(300) == 0.0 and abs(mp(1000) - 1.0) < 1e-12 and mp(2300) == 0.0


def test_pixwin():
    """Pixel window function (proj_lambert.jl:200): ~1 at low ell,
    decreasing toward the pixel scale."""
    from cmblensing_tpu.utils.cls import pixwin
    theta = 3.0
    ell = np.arange(2, 3000)
    w = np.asarray(pixwin(theta, ell))
    assert abs(w[0] - 1.0) < 1e-3
    assert w[-1] < w[0]
    assert np.all(np.diff(w) <= 1e-6)


def test_cg_in_jit_xr_history():
    """In-jit CG can trace the iterate and residual pytrees, not just
    the residual norms (reference history_keys x/r,
    src/numerical_algorithms.jl:60-71; VERDICT r2 missing item 5)."""
    import jax
    import jax.numpy as jnp
    from cmblensing_tpu.ops.solvers import conjugate_gradient

    A = lambda x: 3.0 * x
    M = lambda r: r / 3.0
    b = jnp.asarray(np.random.RandomState(0).randn(16).astype(np.float32))
    x, info = jax.jit(lambda b: conjugate_gradient(
        M, A, b, nsteps=5, tol=1e-12,
        record_history=("res", "x", "r")))(b)
    assert np.allclose(np.asarray(x), np.asarray(b) / 3.0, atol=1e-5)
    assert info["x_history"].shape == (6, 16)
    assert info["r_history"].shape == (6, 16)
    # iterate trace converges to the solution; residual trace to 0
    assert np.allclose(np.asarray(info["x_history"][1]), np.asarray(x), atol=1e-5)
    assert np.nanmax(np.abs(np.asarray(info["r_history"][1]))) < 1e-5


def test_gmres_arnoldi_beats_power_basis():
    """Arnoldi GMRES (default) keeps converging where the reference's
    unorthogonalized power basis (method='power',
    numerical_algorithms.jl:193-214) goes rank-deficient (~10 iters)."""
    from cmblensing_tpu.ops.solvers import gmres

    rs = np.random.RandomState(0)
    n = 60
    # nonsymmetric, moderately conditioned
    A = np.eye(n) + 0.5 * rs.randn(n, n) / np.sqrt(n)
    x_true = rs.randn(n).astype(np.float64)
    b = jnp.asarray(A @ x_true)
    Aj = jnp.asarray(A)
    op = lambda v: Aj @ v

    x_arn = gmres(op, b, maxiter=25)
    with pytest.warns(UserWarning, match="power-Krylov"):
        x_pow = gmres(op, b, maxiter=25, method="power")
    err_arn = np.linalg.norm(np.asarray(x_arn) - x_true)
    err_pow = np.linalg.norm(np.asarray(x_pow) - x_true)
    assert err_arn < 1e-6 * np.linalg.norm(x_true)
    assert err_arn < err_pow / 10


def test_gmres_arnoldi_jit_pytree_preconditioned():
    """Arnoldi GMRES jits as one program, supports pytree unknowns and a
    left preconditioner, and is exact at maxiter = n."""
    from cmblensing_tpu.ops.solvers import gmres

    rs = np.random.RandomState(1)
    d1 = 2.0 + np.abs(rs.randn(4)).astype(np.float32)
    d2 = 2.0 + np.abs(rs.randn(3)).astype(np.float32)

    def op(t):
        return {"a": jnp.asarray(d1) * t["a"], "b": jnp.asarray(d2) * t["b"]}

    def pl(t):  # exact inverse as preconditioner -> 1-step convergence
        return {"a": t["a"] / jnp.asarray(d1), "b": t["b"] / jnp.asarray(d2)}

    b = {"a": jnp.asarray(rs.randn(4).astype(np.float32)),
         "b": jnp.asarray(rs.randn(3).astype(np.float32))}

    x = jax.jit(lambda b: gmres(op, b, maxiter=2, Pl=pl))(b)
    assert np.allclose(np.asarray(x["a"]), np.asarray(b["a"]) / d1, atol=1e-5)
    assert np.allclose(np.asarray(x["b"]), np.asarray(b["b"]) / d2, atol=1e-5)

    # happy breakdown: diagonal system with 2 distinct eigenvalues
    # solves exactly at maxiter > 2 without NaNs
    d = jnp.asarray(np.array([2.0, 2.0, 3.0, 3.0], np.float32))
    bb = jnp.asarray(rs.randn(4).astype(np.float32))
    xb = gmres(lambda v: d * v, bb, maxiter=4)
    assert np.allclose(np.asarray(xb), np.asarray(bb / d), atol=1e-5)


def test_cov_to_cl_roundtrip():
    """cov_to_Cl(Cl_to_Cov(Cl)) ~ Cl (regression: the output factor was
    sqrt(alpha) where the quadratic estimator needs alpha, leaving the
    round trip low by ~1/sqrt(alpha) ~ 1e-5)."""
    from cmblensing_tpu.core.cov import cov_to_Cl

    proj = _proj(64, 64)
    Cl = camb()["unlensed_scalar"]["TT"]
    back = cov_to_Cl(Cl_to_Cov("I", proj, Cl, units=1))
    ells, vals = np.asarray(back.ell), np.asarray(back.Cl)
    m = np.isfinite(vals) & (ells > 300) & (ells < 2000)
    ratio = vals[m] / np.asarray(Cl(ells[m]))
    assert abs(np.median(ratio) - 1) < 0.05, np.median(ratio)


def test_blockdiag_asymmetric_product():
    """(A*B)@f == A@(B@f) for non-commuting TE blocks, and the matrix
    sqrt of the (asymmetric) mixing product squares back (regression:
    the product used to be silently symmetrized, corrupting the IP
    mixing matrix D(r) = sqrt((Cf+A) pinv(Cf)))."""
    from cmblensing_tpu.core.basis import Basis
    proj = _proj(8, 8)
    rs = np.random.RandomState(0)
    mk = lambda a: Field(jnp.asarray(a.astype(np.complex64)), FOURIER, proj)
    tt = rs.rand(1, 8, 5) + 2.0
    ee = rs.rand(1, 8, 5) + 2.0
    te = rs.rand(1, 8, 5) * 0.5
    bb = rs.rand(1, 8, 5) + 1.0
    Cf = BlockDiagIEB(mk(tt), mk(te), mk(ee), mk(bb))
    num = BlockDiagIEB(mk(tt + 0.3), mk(te), mk(ee + 0.9), mk(bb + 0.5))

    f = Field(jnp.asarray(rs.randn(3, 8, 8).astype(np.float32)),
              Basis("IEB", "map"), proj)
    P = num * Cf.pinv()
    lhs = (P @ f).arr
    rhs = (num @ (Cf.solve(f))).arr
    assert float(jnp.max(jnp.abs(lhs - rhs))) < 1e-4

    S = P.sqrt()
    err = float(jnp.max(jnp.abs(((S * S) @ f).arr - lhs))) / \
        float(jnp.max(jnp.abs(lhs)))
    assert err < 1e-5, err


def test_theta_through_compositions():
    """Scaled/LazyOp wrappers around a ParamDependentOp evaluate theta
    recursively (regression: they silently applied the fiducial)."""
    from cmblensing_tpu.core.ops import evaluate_at, depends_on

    proj = _proj()
    Cl = camb()["unlensed_scalar"]["TT"]
    Cf = Cl_to_Cov("I", proj, (Cl, np.array([0.0, 5000.0]), "A"))
    f = F.randn(jax.random.PRNGKey(0), proj, pol="I")

    for op in (2.0 * Cf, Cf + Cf):
        assert depends_on(op, dict(A=np.array([3.0])))
        at = evaluate_at(op, dict(A=np.array([3.0])))
        base = evaluate_at(op, dict(A=np.array([1.0])))
        r = float(F.dot(f, at @ f) / F.dot(f, base @ f))
        assert abs(r - 3.0) < 1e-3, r


def test_logdet_scaled_counts_nonzero_modes():
    """logdet(s*A) = n_nonzero log s + logdet(A): zero modes of A must
    not contribute (regression: the full dimension was used)."""
    from cmblensing_tpu.core.ops import logdet

    proj = _proj()
    # half the modes zero
    arr = np.ones((1, 16, 9), np.complex64)
    arr[:, 8:, :] = 0.0
    D = Diag(Field(jnp.asarray(arr), FOURIER, proj))
    ld1 = float(logdet(D))
    ld2 = float(logdet(2.0 * D))
    lam = np.broadcast_to(np.asarray(proj.lam_rfft)[None, None, :], arr.shape)
    n_nonzero = float((lam * (arr != 0)).sum())
    assert abs((ld2 - ld1) - n_nonzero * np.log(2.0)) < 1e-3


def test_op_times_field_raises():
    """op * Field fails immediately with guidance (regression: it built
    a broken LazyOp that died far from the mistake)."""
    proj = _proj()
    f = F.randn(jax.random.PRNGKey(0), proj, pol="I")
    Dop = Diag(Field(jnp.abs(f.arr) + 1.0, MAP, proj))
    with pytest.raises(TypeError, match="@"):
        Dop * f


def test_banded_cov_pattern_free():
    """Pattern-free banded Cl_to_Cov: ANY subset of spectra may carry a
    (Cl, ledges, name) tuple — incl. a BB-banded P covariance and a
    fully-banded IP covariance, neither of which the reference's three
    hard-coded patterns allow (proj_lambert.jl:374-402)."""
    proj = _proj()
    Cl = camb()["total"]
    edges = np.array([0.0, 1000.0, 8000.0])  # covers the full |l| grid

    # BB-banded P covariance (EE fixed)
    Cp = Cl_to_Cov("P", proj, Cl["EE"], (Cl["BB"], edges, "A_BB"))
    f = F.randn(jax.random.PRNGKey(0), proj, pol="QU").to(EB_FOURIER)
    a = Cp(dict(A_BB=np.array([2.0, 2.0]))) @ f
    b = Cp({}) @ f
    # E block untouched, B block doubled
    assert jnp.allclose(a.arr[..., 0, :, :], b.arr[..., 0, :, :], atol=1e-5)
    sB = float(jnp.max(jnp.abs(b.arr[..., 1, :, :])))
    assert float(jnp.max(jnp.abs(a.arr[..., 1, :, :]
                                 - 2 * b.arr[..., 1, :, :]))) < 1e-5 * sB

    # per-bin amplitudes act on the right annuli
    Cp2 = Cl_to_Cov("P", proj, (Cl["EE"], edges, "A_EE"), Cl["BB"])
    c = Cp2(dict(A_EE=np.array([3.0, 1.0]))) @ f
    lm = np.asarray(proj.lmag)
    lo = jnp.asarray((lm >= 0) & (lm < 1000.0))
    E0, E1 = b.arr[..., 0, :, :], c.arr[..., 0, :, :]
    sE = float(jnp.max(jnp.abs(E0)))
    assert float(jnp.max(jnp.abs(
        jnp.where(lo, E1 - 3 * E0, E1 - E0)))) < 1e-5 * sE

    # fully-banded IP covariance: all four spectra parametrized
    Cip = Cl_to_Cov("IP", proj, (Cl["TT"], edges, "A_TT"),
                    (Cl["EE"], edges, "A_EE"), (Cl["BB"], edges, "A_BB"),
                    (Cl["TE"], edges, "A_TE"))
    assert set(Cip.params) == {"A_TT", "A_EE", "A_BB", "A_TE"}
    two = np.array([2.0, 2.0])
    at = Cip(dict(A_TT=two, A_EE=two, A_BB=two, A_TE=two))
    base = Cip({})
    for s in ("TT", "TE", "EE", "BB"):
        ga, gb = getattr(at, s).arr, getattr(base, s).arr
        sg = float(jnp.max(jnp.abs(gb))) + 1e-30
        assert float(jnp.max(jnp.abs(ga - 2 * gb))) < 1e-5 * sg, s

    # duplicate theta names are rejected
    with pytest.raises(ValueError):
        Cl_to_Cov("P", proj, (Cl["EE"], edges, "A"), (Cl["BB"], edges, "A"))
