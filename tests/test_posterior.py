"""Posterior-level tests: load_sim for all pols, mixed vs unmixed
agreement, FD gradients of logpdf, Wiener filter, QE — mirrors
test/runtests.jl:585-621."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cmblensing_tpu.models.dataset import load_sim, load_nolensing_sim, Mixed, mix, unmix
from cmblensing_tpu.models.quadratic_estimate import quadratic_estimate
from cmblensing_tpu.inference.maximization import argmaxf_logpdf
from cmblensing_tpu.core import field as F


@pytest.fixture(scope="module", params=["I", "P", "IP"])
def sim(request):
    out = load_sim(thetapix=3, Nside=32, pol=request.param, T=np.float32, seed=7)
    out["pol"] = request.param
    return out


def test_logpdf_finite(sim):
    ds, f, phi = sim["ds"], sim["f"], sim["phi"]
    assert np.isfinite(float(ds.logpdf(f=f, phi=phi)))


def test_mixed_unmixed_agree(sim):
    """rtol 3e-4 as in runtests.jl:600."""
    ds, f, phi = sim["ds"], sim["f"], sim["phi"]
    m = mix(ds, f=f, phi=phi)
    lp1 = float(ds.logpdf(f=f, phi=phi))
    lp2 = float(Mixed(ds).logpdf(f_mix=m["f_mix"], phi_mix=m["phi_mix"]))
    assert abs(lp1 - lp2) < 3e-4 * abs(lp1)


def test_mix_unmix_roundtrip(sim):
    ds, f, phi = sim["ds"], sim["f"], sim["phi"]
    m = mix(ds, f=f, phi=phi)
    u = unmix(ds, f_mix=m["f_mix"], phi_mix=m["phi_mix"])
    assert float(F.norm(u["f"].to(f.basis) - f) / F.norm(f)) < 1e-3
    assert float(F.norm(u["phi"].to(phi.basis) - phi) / F.norm(phi)) < 1e-4


def test_logpdf_gradient_fd(sim):
    """Directional FD check of the posterior gradient
    (runtests.jl:602-620 uses the same check via FiniteDifferences)."""
    ds, f, phi = sim["ds"], sim["f"], sim["phi"]
    key = jax.random.PRNGKey(11)
    # perturb along prior draws so the perturbation has support where
    # the priors do (white noise would put power at modes with ~zero
    # prior variance and drive logpdf to -inf)
    sim2 = ds.simulate(jax.random.fold_in(key, 0))
    df = sim2["f"].to(f.basis) * 0.1
    dphi = sim2["phi"].to(phi.basis) * 0.1

    def lp(a):
        return jnp.sum(ds.logpdf(f=f + a * df, phi=phi + a * dphi))

    g = jax.grad(lp)(0.0)
    eps = 1e-2
    fd = (lp(eps) - lp(-eps)) / (2 * eps)
    # float32-level FD agreement
    assert abs(g - fd) < 5e-2 * abs(fd) + 1.0


def test_theta_dependence(sim):
    ds, f, phi = sim["ds"], sim["f"], sim["phi"]
    lp1 = float(ds.logpdf(f=f, phi=phi, theta=dict(Aphi=1.0)))
    lp2 = float(ds.logpdf(f=f, phi=phi, theta=dict(Aphi=2.0)))
    assert lp1 != lp2
    # r-dependence
    lp3 = float(ds.logpdf(f=f, phi=phi, theta=dict(r=0.1)))
    assert np.isfinite(lp3)


def test_gradientf_matches_ad(sim):
    """Analytic f-gradient fast path equals the field-gradient (fgrad)
    of logpdf — the map-pixel-DOF AD convention (core.field.fgrad)."""
    ds, f, phi = sim["ds"], sim["f"], sim["phi"]
    g1 = ds.gradientf_logpdf(f, phi=phi)
    g2 = F.fgrad(lambda f: jnp.sum(ds.logpdf(f=f, phi=phi)))(f)
    g1m = g1.to(g2.basis)
    assert float(F.norm(g1m - g2) / (F.norm(g2) + 1e-9)) < 1e-3


def test_wiener_filter(sim):
    ds, f, phi = sim["ds"], sim["f"], sim["phi"]
    fwf, info = argmaxf_logpdf(ds, phi=phi, conjgrad_kwargs=dict(tol=1e-3, nsteps=200))
    corr = float(F.dot(fwf.to(f.basis), f) / (F.norm(f) * F.norm(fwf)))
    assert corr > 0.8
    # residual gradient at solution is small
    g = ds.gradientf_logpdf(fwf, phi=phi)
    assert float(F.norm(g)) < 0.3 * float(F.norm(ds.gradientf_logpdf(fwf * 0.0, phi=phi)))


def test_quadratic_estimate(sim):
    ds, phi = sim["ds"], sim["phi"]
    qe = quadratic_estimate(ds)
    corr = float(F.dot(qe["phiqe"].to(phi.basis), phi) / (F.norm(phi) * F.norm(qe["phiqe"])))
    assert corr > 0.2
    assert np.isfinite(float(F.norm(qe["Nphi"].diag)))


def test_nolensing_sim():
    out = load_nolensing_sim(thetapix=3, Nside=32, pol="I", T=np.float32, seed=7)
    ds, f = out["ds"], out["f"]
    assert np.isfinite(float(ds.logpdf(f=f)))


def test_quadratic_estimate_batched_one_program(sim):
    """Batched QE runs as ONE jitted program (A_L computed once, the
    estimate vmapped) and matches the per-entry loop exactly."""
    if sim["pol"] == "IP":
        return  # QE uses EB for P and IP alike; P covers it
    ds = sim["ds"]
    # batched data: 3 distinct realizations
    sims = [ds.simulate(jax.random.PRNGKey(100 + i))["d"] for i in range(3)]
    d_b = F.batch(sims)
    ds_b = ds.replace(d=d_b)
    out_b = quadratic_estimate(ds_b)
    assert out_b["phiqe"].batch_shape == (3,)
    for i in range(3):
        out_i = quadratic_estimate(ds.replace(d=F.batch_index(d_b, i)))
        a = np.asarray(F.batch_index(out_b["phiqe"], i).arr)
        b = np.asarray(out_i["phiqe"].arr)
        assert np.allclose(a, b, rtol=1e-5, atol=1e-8 * np.abs(b).max())
    # A_L identical between the batched and unbatched programs
    assert np.allclose(np.asarray(out_b["AL"].diag.arr),
                       np.asarray(out_i["AL"].diag.arr), rtol=1e-6)


def test_term_split_gradient_parity(sim, monkeypatch):
    """The >=4096^2 term-split phi-gradient (one sequenced backward
    pass per logpdf term, inference/maximization.py::_term_split_fgrad)
    must equal the plain whole-objective gradient bit-for-bit-ish."""
    from cmblensing_tpu.inference import maximization as mx
    ds, f, phi = sim["ds"], sim["f"], sim["phi"]
    dstheta = ds.at(None)
    pm = phi.to(phi.basis.with_space("map"))

    # terms sum to logpdf (both parametrizations)
    lp = float(ds.logpdf(f=f, phi=phi))
    tsum = float(ds.logpdf_term(f=f, phi=phi, which="prior")
                 + ds.logpdf_term(f=f, phi=phi, which="data"))
    assert abs(lp - tsum) < 1e-4 * abs(lp) + 1e-6
    m = mix(ds, f=f, phi=phi)
    lpm = float(Mixed(ds).logpdf(f_mix=m["f_mix"], phi_mix=m["phi_mix"]))
    tsumm = float(
        Mixed(ds).logpdf_term(f_mix=m["f_mix"], phi_mix=m["phi_mix"], which="prior")
        + Mixed(ds).logpdf_term(f_mix=m["f_mix"], phi_mix=m["phi_mix"], which="data"))
    assert abs(lpm - tsumm) < 1e-4 * abs(lpm) + 1e-6

    g_plain = mx._jit_phi_gradient(dstheta, None, pm, f, ds.d, None)
    fm_p, pmix_p, gm_plain = mx._jit_phi_grad_and_fmix(dstheta, None, f, phi, None)

    monkeypatch.setattr(mx, "_REMAT_MIN_N", 1)
    mx._jit_phi_gradient.clear_cache()
    mx._jit_phi_grad_and_fmix.clear_cache()
    try:
        g_split = mx._jit_phi_gradient(dstheta, None, pm, f, ds.d, None)
        fm_s, pmix_s, gm_split = mx._jit_phi_grad_and_fmix(dstheta, None, f, phi, None)
    finally:
        mx._jit_phi_gradient.clear_cache()
        mx._jit_phi_grad_and_fmix.clear_cache()

    gn = float(F.norm(g_plain)) + 1e-30
    assert float(F.norm(g_split - g_plain)) < 1e-4 * gn
    gmn = float(F.norm(gm_plain)) + 1e-30
    assert float(F.norm(gm_split - gm_plain)) < 1e-4 * gmn
