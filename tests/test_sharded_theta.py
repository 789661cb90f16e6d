"""Parity tests for the theta-dependent mixed parametrization on
spatially-sharded maps (parallel/sharded_wf.py::_sharded_mix_theta /
_sharded_unmix_theta / sharded_mixed_logpdf_theta /
sharded_sample_slice_theta) against the single-device mix/unmix/
Mixed.logpdf (models/dataset.py:272-322; reference src/dataset.jl:84-117
and the theta slice pass src/sampling.jl:427-437). Runs on the virtual
8-device CPU mesh set up by conftest.py."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cmblensing_tpu.core.field import Field
from cmblensing_tpu.core.basis import Basis
from cmblensing_tpu.models.dataset import load_sim, mix, unmix, Mixed
from cmblensing_tpu.parallel.spatial import spatial_mesh
from cmblensing_tpu.ops import deriv

QU_MAP = Basis("QU", "map")
I_MAP = Basis("I", "map")


@pytest.fixture(scope="module")
def mesh4():
    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("needs 4 virtual CPU devices")
    return spatial_mesh(4, devices=devs)


@pytest.fixture(scope="module")
def sim():
    out = load_sim(thetapix=3, Nside=32, pol="P", T=np.float32, seed=0)
    ds, phi, f = out["ds"], out["phi"], out["f"]
    return dict(ds=ds,
                f=f.to(QU_MAP),
                phi=phi.to(phi.basis.with_space("map")))


# theta moving BOTH parameter axes: r drives Cf and the D mixing op,
# Aphi drives Cphi and the G mixing op (models/dataset.py:494-547)
THETA = dict(r=0.1, Aphi=1.4)


def _mx(x):
    return float(jnp.max(jnp.abs(x)))


def test_sharded_mix_theta_parity(mesh4, sim):
    """_sharded_mix_theta == mix at a non-fiducial theta (exercises the
    non-identity D apply and the G Fourier-diagonal apply)."""
    from cmblensing_tpu.parallel.sharded_wf import _sharded_mix_theta
    ds, f, phi = sim["ds"], sim["f"], sim["phi"]

    with deriv.mode_ctx("matmul"):
        fm_sh, pm_sh = _sharded_mix_theta(ds, f, phi, THETA, mesh4)
        ref = mix(ds, f=f, phi=phi, theta=THETA)
    fm_ref = ref["f_mix"].to(QU_MAP)
    pm_ref = ref["phi_mix"].to(ref["phi_mix"].basis.with_space("map"))

    err_f = _mx(fm_sh.arr - fm_ref.arr) / (_mx(fm_ref.arr) + 1e-30)
    err_p = _mx(pm_sh.to(I_MAP).arr - pm_ref.arr) / (_mx(pm_ref.arr) + 1e-30)
    assert err_f < 2e-4, err_f
    assert err_p < 2e-4, err_p


def test_sharded_unmix_theta_parity(mesh4, sim):
    """_sharded_unmix_theta == unmix at traced theta, and it inverts
    _sharded_mix_theta (roundtrip through D, L(phi), G)."""
    from cmblensing_tpu.parallel.sharded_wf import (_sharded_mix_theta,
                                                    _sharded_unmix_theta)
    ds, f, phi = sim["ds"], sim["f"], sim["phi"]

    with deriv.mode_ctx("matmul"):
        ref = mix(ds, f=f, phi=phi, theta=THETA)
        fm = ref["f_mix"].to(QU_MAP)
        pm = ref["phi_mix"].to(ref["phi_mix"].basis.with_space("map"))
        f_sh, p_sh = _sharded_unmix_theta(ds, fm, pm, THETA, mesh4)
        u = unmix(ds, f_mix=fm, phi_mix=pm, theta=THETA)
    f_ref = u["f"].to(QU_MAP)
    p_ref = u["phi"].to(u["phi"].basis.with_space("map"))

    err_f = _mx(f_sh.arr - f_ref.arr) / (_mx(f_ref.arr) + 1e-30)
    err_p = _mx(p_sh.to(I_MAP).arr - p_ref.arr) / (_mx(p_ref.arr) + 1e-30)
    assert err_f < 5e-4, err_f
    assert err_p < 5e-4, err_p

    # roundtrip: unmix(mix(f, phi)) == (f, phi)
    with deriv.mode_ctx("matmul"):
        fm2, pm2 = _sharded_mix_theta(ds, f, phi, THETA, mesh4)
        f2, p2 = _sharded_unmix_theta(ds, fm2, pm2.to(I_MAP), THETA, mesh4)
    assert _mx(f2.arr - f.arr) / (_mx(f.arr) + 1e-30) < 5e-4
    assert _mx(p2.to(I_MAP).arr - phi.arr) / (_mx(phi.arr) + 1e-30) < 5e-4


def test_sharded_mixed_logpdf_theta_parity(mesh4, sim):
    """sharded_mixed_logpdf_theta == Mixed(ds).logpdf — FULL value
    (including the theta-dependent covariance logdets and the D/G
    mixing Jacobians), at the fiducial and at a moved theta, plus the
    theta-DIFFERENCE (what slice sampling actually weighs)."""
    from cmblensing_tpu.parallel.sharded_wf import sharded_mixed_logpdf_theta
    ds, f, phi = sim["ds"], sim["f"], sim["phi"]
    mixed = Mixed(ds)

    vals = {}
    with deriv.mode_ctx("matmul"):
        for tag, th in [("fid", dict(r=0.2, Aphi=1.0)), ("moved", THETA)]:
            ref = mix(ds, f=f, phi=phi, theta=th)
            fm = ref["f_mix"].to(QU_MAP)
            pm = ref["phi_mix"].to(ref["phi_mix"].basis.with_space("map"))
            lp_sh = float(sharded_mixed_logpdf_theta(ds, fm, pm, th, mesh4))
            lp_ref = float(jnp.sum(mixed.logpdf(f_mix=fm, phi_mix=pm,
                                                theta=th)))
            vals[tag] = (lp_sh, lp_ref)
            assert abs(lp_sh - lp_ref) < 3e-4 * abs(lp_ref), (tag, lp_sh,
                                                              lp_ref)

    d_sh = vals["moved"][0] - vals["fid"][0]
    d_ref = vals["moved"][1] - vals["fid"][1]
    assert abs(d_sh - d_ref) < 2e-2 * max(abs(d_ref), 1.0), (d_sh, d_ref)


def test_sharded_slice_theta_same_key(mesh4, sim):
    """sharded_sample_slice_theta draws the SAME theta value as an
    inverse-transform draw from the single-device mixed-logpdf grid at
    the same key (the sharded grid logpdfs match to f32 roundoff, so
    the smoothed CDFs and hence the draws coincide), and returns maps
    unmixed at the new theta."""
    from cmblensing_tpu.parallel.sharded_wf import sharded_sample_slice_theta
    from cmblensing_tpu.inference.sampling import grid_and_sample
    ds, f, phi = sim["ds"], sim["f"], sim["phi"]
    theta0 = dict(r=0.2, Aphi=1.0)
    xs = np.linspace(0.3, 2.4, 16)
    key = jax.random.PRNGKey(5)
    mixed = Mixed(ds)

    with deriv.mode_ctx("matmul"):
        th_new, f_new, p_new = sharded_sample_slice_theta(
            key, ds, f, phi, theta0, "Aphi", xs, mesh4)

        # reference draw from the single-device grid with the same key
        ref = mix(ds, f=f, phi=phi, theta=theta0)
        fm = ref["f_mix"].to(QU_MAP)
        pm = ref["phi_mix"].to(ref["phi_mix"].basis.with_space("map"))

        def lp_at(v):
            th = dict(theta0, Aphi=jnp.float32(v))
            return jnp.sum(mixed.logpdf(f_mix=fm, phi_mix=pm, theta=th))

        val_ref, _, _ = grid_and_sample(key, lp_at, xs)
        # unmix the reference maps at the new theta
        th_ref = dict(theta0, Aphi=float(np.asarray(val_ref).ravel()[0]))
        u = unmix(ds, f_mix=fm, phi_mix=pm, theta=th_ref)

    assert abs(th_new["Aphi"] - th_ref["Aphi"]) < 1e-3 * max(
        abs(th_ref["Aphi"]), 0.1), (th_new, th_ref)
    f_ref = u["f"].to(QU_MAP)
    p_ref = u["phi"].to(u["phi"].basis.with_space("map"))
    assert _mx(f_new.arr - f_ref.arr) / (_mx(f_ref.arr) + 1e-30) < 1e-3
    assert _mx(p_new.to(I_MAP).arr - p_ref.arr) / (_mx(p_ref.arr) + 1e-30) \
        < 1e-3


@pytest.mark.slow
def test_sharded_sample_joint_theta_calibrated(mesh4):
    """sharded_sample_joint(theta_range=...): the Aphi chain on data
    simulated at Aphi=1 moves off its start, never pins at a grid edge,
    and averages in a loose bracket around truth — mirroring the
    single-device calibration test (tests/test_inference.py::
    test_gibbs_theta_posterior_calibrated; reference Aphi demo,
    src/dataset.jl:274)."""
    from cmblensing_tpu.parallel.sharded_wf import sharded_sample_joint
    out = load_sim(thetapix=3, Nside=32, pol="P", T=np.float32, seed=7)
    ds = out["ds"]
    key = jax.random.PRNGKey(11)
    # start phi from a PRIOR draw (the single-device sample_joint's
    # phi_start="prior" default): from phi=0 the Aphi conditional is
    # pinned at the low grid edge until the HMC chain builds up phi
    # power — a warmup artifact, not a weighting bug
    phi0 = ds.simulate(jax.random.PRNGKey(123))["phi"]
    phi0 = phi0.to(phi0.basis.with_space("map"))

    with deriv.mode_ctx("matmul"):
        ch = sharded_sample_joint(
            key, ds, mesh4, nsamps=12, cg_nsteps=40, cg_tol=1e-2,
            hmc_N=10, hmc_eps=0.02, phistart=phi0,
            theta_range={"Aphi": (0.2, 3.0)}, theta_grid_n=24,
            theta_start={"Aphi": 2.5})
    A = np.array([e["Aphi"] for e in ch[0]][3:])
    assert A.std() > 0.02, "theta chain never moved"
    assert 0.2 < A.min() and A.max() < 3.0, "chain pinned at grid edge"
    assert 0.3 < A.mean() < 2.3, \
        f"Aphi mean {A.mean():.2f} inconsistent with truth 1.0"
