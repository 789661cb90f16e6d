"""Inference algorithms: MAP_joint, MAP_marg, HMC/Gibbs sampling,
chains, MUSE — integration-level tests on tiny grids."""
import os
import tempfile

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cmblensing_tpu.models.dataset import load_sim
from cmblensing_tpu.inference.maximization import MAP_joint, MAP_marg
from cmblensing_tpu.inference.sampling import (
    sample_joint, symplectic_integrate, hmc_step, grid_and_sample, mass_matrix_phi,
)
from cmblensing_tpu.inference.chains import (
    load_chains, Chain, Chains, effective_sample_size, mean_std_and_errors,
)
from cmblensing_tpu.core import field as F
from cmblensing_tpu.core.ops import Diag
from cmblensing_tpu.core.field import Field
from cmblensing_tpu.core.basis import MAP


@pytest.fixture(scope="module")
def sim32():
    return load_sim(thetapix=3, Nside=32, pol="I", T=np.float32, seed=3)


def test_MAP_joint_increases_logpdf(sim32):
    ds, phi = sim32["ds"], sim32["phi"]
    res = MAP_joint(ds, nsteps=4, conjgrad_kwargs=dict(tol=1e-1, nsteps=50))
    lps = [h["logpdf"] for h in res["history"]]
    assert lps[-1] >= lps[0]
    corr = float(F.dot(res["phi"].to(phi.basis), phi) / (F.norm(phi) * F.norm(res["phi"])))
    assert corr > 0.3


def test_MAP_joint_hessian_update(sim32):
    ds = sim32["ds"]
    res = MAP_joint(ds, nsteps=4, nburnin_update_hessian=2,
                    conjgrad_kwargs=dict(tol=1e-1, nsteps=30))
    assert np.isfinite(res["history"][-1]["logpdf"])


def test_MAP_joint_quasi_sample(sim32):
    ds = sim32["ds"]
    res = MAP_joint(ds, nsteps=2, quasi_sample=True, key=jax.random.PRNGKey(1),
                    conjgrad_kwargs=dict(tol=1e-1, nsteps=30))
    assert np.isfinite(res["history"][-1]["logpdf"])


def test_grid_linesearch_chunked_parity(sim32, monkeypatch):
    """The memory-guarded (lax.map chunked) grid line search picks the
    same alpha as the single vmap: large maps chunk the 16-wide grid to
    stay inside HBM (a 2048^2 spin-2 MAP OOMs without it) and must not
    change the optimizer's decisions."""
    from cmblensing_tpu.inference import maximization as mx
    from cmblensing_tpu.models.dataset import mix
    ds, f, phi = sim32["ds"], sim32["f"], sim32["phi"]
    m = mix(ds, f=f, phi=phi)
    f_mix, phi_mix = m["f_mix"], m["phi_mix"]
    dphi = phi_mix * 0.5
    amax = jnp.float32(1.0)
    a0, d0 = mx._jit_grid_linesearch(ds, {}, f_mix, phi_mix, dphi,
                                     amax, 8, None,
                                     mx._linesearch_chunk(phi_mix, 8))
    # the chunk size is a STATIC jit arg decided by the caller, so the
    # env override takes effect at call time — no clear_cache needed
    monkeypatch.setenv("CMBL_LINESEARCH_CHUNK", "3")
    assert mx._linesearch_chunk(phi_mix, 8) == 3
    a1, d1 = mx._jit_grid_linesearch(ds, {}, f_mix, phi_mix, dphi,
                                     amax, 8, None,
                                     mx._linesearch_chunk(phi_mix, 8))
    np.testing.assert_allclose(float(a0), float(a1), rtol=1e-6)
    np.testing.assert_allclose(float(d0), float(d1), rtol=1e-4, atol=1e-4)


def test_grid_linesearch_path_consistent(sim32, monkeypatch):
    """Round-5 4096^2 regression: alpha=0 is evaluated THROUGH the same
    vmapped/scanned body as the trials (res0 from a separate unbatched
    subgraph acquires a TPU path-rounding bias that the Sigma^-1 metric
    amplifies past the true Delta-logpdf — see _jit_grid_linesearch
    docstring). Contract checked here: (1) the scan path with chunk
    padding (chunk=4, ngrid+1=9 -> pad=3) matches the vmap path;
    (2) a zero direction selects alpha=0 with dlp exactly 0 (the
    self-guard trial exists and is exact through the shared path);
    (3) the selected dlp is never negative."""
    from cmblensing_tpu.inference import maximization as mx
    from cmblensing_tpu.models.dataset import mix
    ds, f, phi = sim32["ds"], sim32["f"], sim32["phi"]
    m = mix(ds, f=f, phi=phi)
    f_mix, phi_mix = m["f_mix"], m["phi_mix"]
    dphi = phi_mix * 0.5
    amax = jnp.float32(1.0)
    a_v, d_v = mx._jit_grid_linesearch(ds, {}, f_mix, phi_mix, dphi,
                                       amax, 8, None, 8)
    a_s, d_s = mx._jit_grid_linesearch(ds, {}, f_mix, phi_mix, dphi,
                                       amax, 8, None, 4)
    np.testing.assert_allclose(float(a_v), float(a_s), rtol=1e-6)
    np.testing.assert_allclose(float(d_v), float(d_s), rtol=1e-4, atol=1e-4)
    assert float(d_v) >= 0.0
    a_z, d_z = mx._jit_grid_linesearch(ds, {}, f_mix, phi_mix, dphi * 0.0,
                                       amax, 8, None, 8)
    assert float(a_z) == 0.0
    assert float(d_z) == 0.0


def test_MAP_marg_runs(sim32):
    ds = sim32["ds"]
    phi, hist = MAP_marg(ds, nsteps=2, Nsims=4, nsteps_with_meanfield_update=1,
                         conjgrad_kwargs=dict(tol=1e-1, nsteps=30))
    assert np.isfinite(float(F.norm(phi)))


def test_symplectic_integrate_energy():
    """Leapfrog on a Gaussian conserves the Hamiltonian to O(eps^2)."""
    from cmblensing_tpu.core.proj import ProjLambert
    proj = ProjLambert(16, 16, thetapix=3, T=np.float32)
    key = jax.random.PRNGKey(0)
    x = F.randn(key, proj, pol="I")
    p = F.randn(jax.random.fold_in(key, 1), proj, pol="I")
    Lam = Diag(Field(jnp.ones_like(x.arr), MAP, proj))

    def U(x):
        return -F.dot(x, x) / 2

    from cmblensing_tpu.core.field import fgrad
    dH, x1, p1 = symplectic_integrate(x, p, Lam, fgrad(lambda x: jnp.sum(U(x))),
                                      N=50, eps=0.05, U=U)
    assert abs(float(dH)) < 1.0


def test_hmc_step_batched(sim32):
    ds = sim32["ds"]
    from cmblensing_tpu.core.field import repeat_batch
    phi = repeat_batch(sim32["phi"].to(sim32["phi"].basis.with_space("map")), 2)

    def U(p):
        return ds.logpdf(f=repeat_batch(sim32["f"], 2), phi=p)

    Lam = mass_matrix_phi({}, ds)
    x1, dH, accept = hmc_step(jax.random.PRNGKey(0), U, phi, Lam, N=3, eps=1e-3)
    assert x1.batch_shape == (2,)
    assert np.shape(np.asarray(dH)) == (2,)


def test_grid_and_sample():
    key = jax.random.PRNGKey(0)
    xs = np.linspace(-4, 4, 81)
    samp, interp, lps = grid_and_sample(key, lambda x: -x ** 2 / 2, xs, nsamples=200)
    samp = np.asarray(samp)
    assert abs(samp.mean()) < 0.3
    assert abs(samp.std() - 1.0) < 0.3


def test_sample_joint_checkpoint_resume(sim32, tmp_path):
    ds = sim32["ds"]
    fn = str(tmp_path / "chain")
    sample_joint(ds, nsamps_per_chain=2, nchains=2, filename=fn, nfilewrite=1,
                 symp_kwargs=[dict(N=3, eps=0.01)],
                 conjgrad_kwargs=dict(tol=1e-1, nsteps=20))
    loaded = load_chains(fn)
    assert len(loaded) == 2 and len(loaded[0]) == 2
    sample_joint(ds, nsamps_per_chain=3, nchains=2, filename=fn, resume=True,
                 symp_kwargs=[dict(N=3, eps=0.01)],
                 conjgrad_kwargs=dict(tol=1e-1, nsteps=20))
    loaded2 = load_chains(fn)
    assert len(loaded2[0]) == 3
    # fields unbatch per chain
    assert loaded2[0][0]["phi"].batch_shape == ()


def test_chain_stats():
    rng = np.random.default_rng(0)
    x = rng.normal(size=2000)
    ess = effective_sample_size(x)
    assert 500 < ess <= 2100
    st = mean_std_and_errors(x)
    assert abs(st["mean"]) < 0.1 and abs(st["std"] - 1) < 0.1


def test_theta_gradient(sim32):
    """logpdf is differentiable wrt theta scalings (needed for MUSE).
    FD in float32 is noise-limited here, so compare against the
    analytic d/dA of the Gaussian:  (phi' (A Cphi)^-1 phi - n_eff)/2A."""
    ds, f, phi = sim32["ds"], sim32["f"], sim32["phi"]

    def lp(a):
        return jnp.sum(ds.logpdf(f=f, phi=phi, theta=dict(Aphi=a)))

    g = float(jax.grad(lp)(1.0))
    assert np.isfinite(g)

    from cmblensing_tpu.inference.maximization import _fid
    Cphi = _fid(ds.Cphi)
    quad = float(F.dot(phi, Cphi.solve(phi)))
    lam = np.asarray(Cphi.diag.proj.lam_rfft)
    nz = np.abs(np.asarray(Cphi.diag.arr)) > 0
    n_eff = float((nz * lam[None, None, :]).sum())
    expected = (quad - n_eff) / 2
    assert abs(g - expected) < 1e-2 * max(abs(expected), 10.0)


@pytest.mark.slow
def test_gibbs_theta_posterior_calibrated():
    """Physical validation of the theta Gibbs block: data simulated at
    the fiducial Aphi=1 should give an Aphi chain that wanders around 1
    (not collapsed at a grid edge, nor stuck at its start value).
    Mirrors the reference's standard Aphi demo (src/dataset.jl:274)."""
    out = load_sim(thetapix=3, Nside=32, pol="I", T=np.float32, seed=7)
    ds = out["ds"]
    grid = np.linspace(0.2, 3.0, 32)
    res = sample_joint(ds, nsamps_per_chain=16, nchains=2,
                       key=jax.random.PRNGKey(11),
                       theta_range={"Aphi": grid},
                       theta_start={"Aphi": 2.5},
                       nburnin_always_accept=6,
                       symp_kwargs=[dict(N=10, eps=0.02)],
                       conjgrad_kwargs=dict(tol=1e-2, nsteps=60))
    A = np.array([th["Aphi"] for th in res["theta"][0]][6:])
    assert A.std() > 0.02, "theta chain never moved"
    assert grid.min() < A.min() and A.max() < grid.max(), "chain pinned at grid edge"
    # posterior on a 32^2 patch is broad; demand the mean is in a loose
    # bracket around the truth and far from the 2.5 start
    assert 0.3 < A.mean() < 2.2, f"Aphi mean {A.mean():.2f} inconsistent with truth 1.0"


def test_MAP_joint_batched_matches_solo(sim32):
    """Batched MAP_joint over distinct datasets: per-entry line-search
    alphas and entry-wise agreement with solo MAPs."""
    from cmblensing_tpu.core.field import batch_index, batch as batch_fields
    ds = sim32["ds"]
    sims = [ds.simulate(jax.random.PRNGKey(100 + i))["d"] for i in range(2)]
    ds_b = ds.replace(d=batch_fields(sims))
    res = MAP_joint(ds_b, nsteps=3, history_keys=("alpha",),
                    conjgrad_kwargs=dict(tol=1e-2, nsteps=30))
    assert res["phi"].batch_shape == (2,)
    a_last = np.atleast_1d(np.asarray(res["history"][-1]["alpha"]))
    assert a_last.shape == (2,)
    r0 = MAP_joint(ds.replace(d=sims[0]), nsteps=3,
                   conjgrad_kwargs=dict(tol=1e-2, nsteps=30))
    pb = np.asarray(batch_index(res["phi"], 0).arr).ravel()
    ps = np.asarray(r0["phi"].arr).ravel()
    corr = pb @ ps / (np.linalg.norm(pb) * np.linalg.norm(ps) + 1e-30)
    assert corr > 0.999


def test_argmaxf_mixed_precision_hessian():
    """CG with 'high'-precision (3-pass bf16) Hessian applies converges
    to the strict-f32 Wiener solution (inexact Krylov; VERDICT r1 item
    3c): relative difference bounded by the operator error, far below
    the CG tolerance."""
    from cmblensing_tpu.models.dataset import load_sim
    from cmblensing_tpu.inference.maximization import argmaxf_logpdf
    from cmblensing_tpu.core import field as F

    out = load_sim(thetapix=3, Nside=32, pol="P", T=np.float32, seed=3)
    ds, phi = out["ds"], out["phi"]
    f32, _ = argmaxf_logpdf(ds, phi=phi,
                            conjgrad_kwargs=dict(tol=1e-4, nsteps=200,
                                                 hessian_precision=None))
    fhi, info = argmaxf_logpdf(ds, phi=phi,
                               conjgrad_kwargs=dict(tol=1e-4, nsteps=200,
                                                    hessian_precision="high"))
    rel = float(F.norm(fhi - f32.to(fhi.basis)) / F.norm(f32))
    assert rel < 1e-3, rel


def test_argmaxf_auto_precision_verified(x64=None):
    """hessian_precision defaults to 'auto'=high with a STRICT-f32
    final-residual self-check: the solve meets the requested tolerance
    under a strict Hessian apply, or transparently falls back
    (VERDICT r2 next-round item 2)."""
    from cmblensing_tpu.models.dataset import load_sim
    from cmblensing_tpu.inference.maximization import argmaxf_logpdf

    out = load_sim(thetapix=3, Nside=32, pol="P", T=np.float32, seed=3)
    ds, phi = out["ds"], out["phi"]
    tol = 1e-4
    f, info = argmaxf_logpdf(ds, phi=phi,
                             conjgrad_kwargs=dict(tol=tol, nsteps=200))
    if not info.get("precision_fallback"):
        # the auto path recorded and met the strict-residual bound
        assert "res_strict" in info
        assert bool(np.asarray(info["precision_ok"]))
        bound = max(tol, 1e-10 * float(np.max(np.asarray(info["res0"]))))
        assert float(np.max(np.asarray(info["res_strict"]))) <= bound
    else:
        # fallback path: a strict solve was rerun and returned
        assert "res" in info


def test_sample_joint_verbose_timing(capsys):
    """verbose_timing prints per-step pass-timing deltas (reference
    sample_joint(verbose_timing=true), sampling.jl:296-328)."""
    from cmblensing_tpu.models.dataset import load_sim
    from cmblensing_tpu.inference.sampling import sample_joint

    out = load_sim(thetapix=5, Nside=16, pol="I", T=np.float32, seed=2)
    sample_joint(out["ds"], nsamps_per_chain=2, nchains=1,
                 key=jax.random.PRNGKey(0),
                 symp_kwargs=[dict(N=3, eps=0.01)],
                 conjgrad_kwargs=dict(tol=1e-1, nsteps=5),
                 verbose_timing=True)
    captured = capsys.readouterr()
    assert "gibbs step 1 timing" in captured.out
    assert "gibbs/sample_f" in captured.out
    assert "gibbs/sample_phi" in captured.out


def test_gibbs_pass_combinators():
    """once_every / start_after_burnin wrap gibbs passes
    (src/sampling.jl:469-487)."""
    from cmblensing_tpu.inference.sampling import once_every, start_after_burnin

    calls = []

    def mark(state, ds, **kw):
        calls.append(state["step"])
        return state

    every3 = once_every(3, mark)
    for step in range(1, 8):
        every3({"step": step}, None)
    assert calls == [3, 6]

    calls.clear()
    after4 = start_after_burnin(4, mark)
    for step in range(1, 8):
        after4({"step": step}, None)
    assert calls == [5, 6, 7]


def test_kde_boundary_correction():
    """Linear boundary kernel recovers a flat density at a hard edge
    where the plain KDE loses half its mass (reference delegates to
    getdist's boundary-corrected KDE, chains.jl:236-260)."""
    from cmblensing_tpu.inference.chains import kde
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, 4000)
    grid = np.linspace(0, 1, 201)
    _, f_plain = kde(x, grid=grid)
    _, f_corr = kde(x, grid=grid, boundary=(0.0, 1.0))
    # plain KDE collapses toward 0.5 at the edges; corrected stays ~1
    assert f_plain[0] < 0.75
    assert abs(f_corr[0] - 1.0) < 0.12, f_corr[0]
    assert abs(f_corr[-1] - 1.0) < 0.12, f_corr[-1]
    # corrected estimate still integrates to ~1 over the domain
    assert abs(np.trapezoid(f_corr, grid) - 1.0) < 0.02
    # half-normal at 0: corrected density at 0 ~ 2*phi(0) = 0.7979
    xh = np.abs(rng.normal(size=6000))
    gh = np.linspace(0, 4, 200)
    _, fh = kde(xh, grid=gh, boundary=(0.0, None))
    assert abs(fh[0] - 0.7979) < 0.09, fh[0]


def test_kde_2d_boundary_linear_kernel():
    """2-D boundary correction is the exact 2-D LINEAR boundary kernel
    (getdist's 2-D correction, chains.jl:236-260; local 3x3 moment
    solve) — unbiased to O(h^2) at edges and corners, not just
    mass-preserving."""
    from cmblensing_tpu.inference.chains import kde
    rng = np.random.default_rng(1)
    xy = rng.uniform(0, 1, (40000, 2))
    gx, gy, F = kde(xy, grid=(np.linspace(0, 1, 64), np.linspace(0, 1, 64)),
                    boundary=((0.0, 1.0), (0.0, 1.0)))
    integral = np.trapezoid(np.trapezoid(F, gx, axis=1), gy)
    assert abs(integral - 1.0) < 0.05, integral
    # interior and corner values both ~1; the corner is the hard case —
    # plain renormalization leaves an O(h) slope bias there (the
    # boundary kernel amplifies variance, hence the loose tolerance)
    assert abs(F[32, 32] - 1.0) < 0.15
    assert abs(F[0, 0] - 1.0) < 0.30
    # sloped density at the boundary: half-normal in x, uniform in y.
    # At x=0 the true density is 2*phi(0) = 0.7979 per unit y; the
    # renormalization-only correction underestimates it (slope bias)
    xy2 = np.stack([np.abs(rng.normal(size=40000)),
                    rng.uniform(0, 1, 40000)], axis=1)
    gx2, gy2, F2 = kde(xy2, grid=(np.linspace(0, 3, 64),
                                  np.linspace(0, 1, 64)),
                       boundary=((0.0, None), (0.0, 1.0)))
    edge = F2[8:56, 0].mean()   # x = 0 column, central y rows
    assert abs(edge - 0.7979) < 0.07, edge


def test_kde2d_corner_exact():
    """At a CORNER of a doubly-bounded density with nonzero cross
    curvature (independent Exp(2) marginals on [0, inf)^2: p(0,0) = 4,
    d2p/dxdy(0,0) = 16) the exact 2-D linear boundary kernel
    (inference/chains.py::_kde2d_linear_boundary) is less biased than
    the separable per-axis product it replaced — the separable form's
    forced beta_x*gamma_y*u*v term couples to p_xy and inflates the
    corner estimate. getdist (what the reference uses,
    src/chains.jl:236-260) computes the exact form."""
    from cmblensing_tpu.inference.chains import (
        kde, _kernel_matrix_corrected, _bandwidth)
    rng = np.random.default_rng(3)
    n = 120000
    xy = rng.exponential(0.5, (n, 2))
    g = np.linspace(0, 0.5, 41)
    gx, gy, F = kde(xy, grid=(g, g), boundary=((0.0, None), (0.0, None)))

    # the separable per-axis correction, for comparison
    hx = _bandwidth(xy[:, 0], 1.0)
    hy = _bandwidth(xy[:, 1], 1.0)
    Kx = _kernel_matrix_corrected(g, xy[:, 0], hx, (0.0, None))
    Ky = _kernel_matrix_corrected(g, xy[:, 1], hy, (0.0, None))
    F_sep = np.maximum(Ky @ Kx.T, 0.0) / (n * hx * hy)

    truth = 4.0 * np.exp(-2 * (gx[None, :] + gy[:, None]))
    err_exact = abs(F[0, 0] - truth[0, 0])
    err_sep = abs(F_sep[0, 0] - truth[0, 0])
    assert err_exact < err_sep, (F[0, 0], F_sep[0, 0], truth[0, 0])
    assert err_exact < 0.10 * truth[0, 0], (F[0, 0], truth[0, 0])
    # away from the boundary the two agree
    assert abs(F[30, 30] - F_sep[30, 30]) < 0.02 * truth[30, 30]
