"""MUSE integration test (slow: run explicitly with -m slow)."""
import numpy as np
import pytest
import jax

from cmblensing_tpu.models.dataset import load_sim
from cmblensing_tpu.inference.muse import muse, score


@pytest.mark.slow
def test_muse_micro():
    out = load_sim(thetapix=5, Nside=16, pol="I", T=np.float32, seed=4)
    ds = out["ds"]
    res = muse(ds, dict(Aphi=1.0), nsims=4, nsteps=2,
               MAP_kwargs=dict(nsteps=2, conjgrad_kwargs=dict(tol=1e-1, nsteps=20)))
    assert np.isfinite(res["theta"]["Aphi"])
    assert np.isfinite(res["Sigma"]).all()


@pytest.mark.slow
def test_muse_sigma_consistency():
    """Recovered Aphi is within a few sigma of truth across seeds, with
    H recomputed at the converged theta by seed-matched two-sided
    differences (VERDICT r1 item 6; reference semantics
    ext/CMBLensingMuseInferenceExt.jl:45-88)."""
    pulls = []
    for seed in [1, 2, 3]:
        out = load_sim(thetapix=5, Nside=16, pol="I", T=np.float32, seed=seed)
        ds = out["ds"]
        truth = 1.5
        sim = ds.at(dict(Aphi=truth)).simulate(
            jax.random.PRNGKey(100 + seed), theta=dict(Aphi=truth))
        dsd = ds.replace(d=sim["d"])
        res = muse(dsd, dict(Aphi=1.0), nsims=8, nsteps=3,
                   key=jax.random.PRNGKey(seed),
                   MAP_kwargs=dict(nsteps=3,
                                   conjgrad_kwargs=dict(tol=1e-2, nsteps=30)))
        sigma = float(np.sqrt(res["Sigma"][0, 0]))
        assert np.isfinite(sigma) and sigma > 0
        pulls.append((res["theta"]["Aphi"] - truth) / sigma)
    # each seed within 4 sigma; tiny 16^2 maps have broad posteriors so
    # this mostly guards against bias from a stale/one-sided H
    assert np.all(np.abs(pulls) < 4.0), f"pulls={pulls}"


@pytest.mark.slow
def test_muse_score_monotone():
    """Score at fixed theta increases with the Aphi of the data."""
    out = load_sim(thetapix=3, Nside=32, pol="I", T=np.float32, seed=9)
    ds = out["ds"]
    MAPk = dict(nsteps=4, conjgrad_kwargs=dict(tol=1e-2, nsteps=40))
    scores = []
    for At in [0.5, 2.0]:
        sim = ds.at(dict(Aphi=At)).simulate(jax.random.PRNGKey(42), theta=dict(Aphi=At))
        s, _ = score(ds, dict(Aphi=1.0), ["Aphi"], d=sim["d"], MAP_kwargs=MAPk)
        scores.append(float(s[0]))
    assert scores[1] > scores[0]


def test_muse_problem_adapter():
    """MuseProblem exposes the reference bridge surface
    (ext/CMBLensingMuseInferenceExt.jl:45-88): logLike, score,
    simulate, and zhat consistency."""
    from cmblensing_tpu.inference.muse import MuseProblem
    out = load_sim(thetapix=5, Nside=16, pol="I", T=np.float32, seed=4)
    prob = MuseProblem(out["ds"], params=("Aphi",),
                       MAP_joint_kwargs=dict(nsteps=2,
                                             conjgrad_kwargs=dict(tol=1e-1, nsteps=20)))
    xz = prob.sample_x_z(jax.random.PRNGKey(0), dict(Aphi=1.0))
    lp = float(prob.logLike(xz["x"], xz["z"], dict(Aphi=1.0)))
    assert np.isfinite(lp)
    g = np.asarray(prob.grad_theta_logLike(xz["x"], xz["z"], dict(Aphi=1.0)))
    assert g.shape == (1,) and np.isfinite(g).all()
    zhat, hist = prob.zhat_at_theta(xz["x"], dict(Aphi=1.0))
    lp_hat = float(prob.logLike(xz["x"], zhat, dict(Aphi=1.0)))
    assert np.isfinite(lp_hat)


def test_theta_spec_helpers():
    """Flat-vector packing of mixed scalar/vector theta dicts (the
    bandpower-MUSE plumbing)."""
    from cmblensing_tpu.inference.muse import (
        _theta_spec, _spec_pack, _spec_unpack, _spec_size, _spec_labels)
    theta0 = dict(Aphi=1.0, Aphi_b=np.array([1.0, 2.0, 3.0]), r=0.1)
    spec = _theta_spec(theta0)
    assert spec == (("Aphi", None), ("Aphi_b", 3), ("r", None))
    assert _spec_size(spec) == 5
    v = _spec_pack(theta0, spec)
    assert v.shape == (5,) and v[1] == 1.0 and v[3] == 3.0 and v[4] == 0.1
    th = _spec_unpack(v, spec)
    assert float(th["Aphi"]) == 1.0
    assert np.allclose(np.asarray(th["Aphi_b"]), [1.0, 2.0, 3.0])
    assert _spec_labels(spec) == ["Aphi", "Aphi_b[0]", "Aphi_b[1]",
                                  "Aphi_b[2]", "r"]
    import pytest as _pt
    with _pt.raises(ValueError):
        _theta_spec(dict(A=np.ones((2, 2))))


def test_muse_score_vector_theta():
    """score() with a banded Cl_to_Cov Cphi returns one score entry per
    phi bandpower bin (MUSE bandpower inference, the reference's
    MuseInference headline use; banded ops: core/cov.py, reference
    proj_lambert.jl:374-411)."""
    from cmblensing_tpu.core.cov import Cl_to_Cov
    from cmblensing_tpu.utils.cls import camb
    out = load_sim(thetapix=5, Nside=16, pol="I", T=np.float32, seed=4)
    ds, proj = out["ds"], out["proj"]
    Cl = camb()
    edges = np.array([0.0, 2500.0, 1e6])  # 2 phi bandpower bins
    Cphi_b = Cl_to_Cov("I", proj, (Cl["total"]["pp"], edges, "Aphi_b"))
    dsb = ds.replace(Cphi=Cphi_b)
    theta = dict(Aphi_b=np.ones(2))
    MAPk = dict(nsteps=2, conjgrad_kwargs=dict(tol=1e-1, nsteps=20))
    s, _ = score(dsb, theta, MAP_kwargs=MAPk)
    s = np.asarray(s)
    assert s.shape == (2,) and np.isfinite(s).all()
    # amplitudes=1 must reproduce the unbanded covariance exactly
    import jax.numpy as jnp
    f = out["phi"]
    a = Cphi_b(dict(Aphi_b=np.ones(2))) @ f
    b = ds.Cphi(dict(Aphi=1.0)) @ f
    assert float(jnp.max(jnp.abs(a.arr - b.arr))) <= 1e-6 * float(
        jnp.max(jnp.abs(b.arr)))


@pytest.mark.slow
def test_muse_bandpower_micro():
    """End-to-end MUSE iteration over a VECTOR theta (2 phi bandpower
    bins as one flat parameter block): finite Sigma (2x2), labeled."""
    from cmblensing_tpu.core.cov import Cl_to_Cov
    from cmblensing_tpu.utils.cls import camb
    out = load_sim(thetapix=5, Nside=16, pol="I", T=np.float32, seed=4)
    ds, proj = out["ds"], out["proj"]
    Cl = camb()
    edges = np.array([0.0, 2500.0, 1e6])
    Cphi_b = Cl_to_Cov("I", proj, (Cl["total"]["pp"], edges, "Aphi_b"))
    dsb = ds.replace(Cphi=Cphi_b)
    res = muse(dsb, dict(Aphi_b=np.ones(2)), nsims=4, nsteps=2,
               MAP_kwargs=dict(nsteps=2,
                               conjgrad_kwargs=dict(tol=1e-1, nsteps=20)))
    assert res["labels"] == ["Aphi_b[0]", "Aphi_b[1]"]
    assert np.asarray(res["theta"]["Aphi_b"]).shape == (2,)
    assert np.isfinite(res["Sigma"]).all() and res["Sigma"].shape == (2, 2)


@pytest.mark.slow
def test_muse_bandpower_pull_calibrated():
    """Per-bin sigma consistency of bandpower MUSE on a small grid
    (VERDICT r4 item 5): data simulated at a TILTED per-bin truth, the
    recovered amplitudes pull within a few of their own estimated
    sigmas in EVERY bin, and Sigma is positive definite. Mirrors
    scripts/muse_bandpower.py at test scale. Reference headline use:
    ext/CMBLensingMuseInferenceExt.jl:45-88 + proj_lambert.jl:374-411."""
    from cmblensing_tpu.core.cov import Cl_to_Cov
    from cmblensing_tpu.utils.cls import camb
    nbins = 3
    out = load_sim(thetapix=3, Nside=64, pol="I", T=np.float32, seed=0)
    ds, proj = out["ds"], out["proj"]
    lm = np.asarray(proj.lmag).ravel()
    lm = lm[lm > 0]
    inner = np.percentile(lm, np.linspace(0, 100, nbins + 1)[1:-1])
    edges = np.concatenate([[0.0], inner, [1e9]])
    Cphi_b = Cl_to_Cov("I", proj, (camb()["total"]["pp"], edges, "Aphi_b"))
    ds = ds.replace(Cphi=Cphi_b)
    truth = np.linspace(1.5, 0.8, nbins)
    sim = ds.simulate(jax.random.PRNGKey(7), theta=dict(Aphi_b=truth))
    ds = ds.replace(d=sim["d"])

    res = muse(ds, dict(Aphi_b=np.ones(nbins)), nsims=6, nsteps=3,
               key=jax.random.PRNGKey(3),
               MAP_kwargs=dict(nsteps=4,
                               conjgrad_kwargs=dict(tol=0.0, nsteps=20,
                                                    fixed_iters=True)))
    A = np.asarray(res["theta"]["Aphi_b"])
    Sigma = np.asarray(res["Sigma"])
    evals = np.linalg.eigvalsh(Sigma)
    assert np.all(evals > 0), Sigma
    pulls = (A - truth) / np.sqrt(np.diag(Sigma))
    assert np.all(np.abs(pulls) < 3.5), (A, np.sqrt(np.diag(Sigma)), pulls)
