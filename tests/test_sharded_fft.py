"""Distributed pencil FFTs (parallel/sharded_fft.py) on the virtual
8-device CPU mesh: parity with the single-device transforms, gradient
flow, and a spatially-sharded Wiener-filter CG solve — the posterior
machinery for maps bigger than one chip (no reference counterpart;
src/util_fft.jl is single-device FFTW and proj_lambert.jl:54-56 warns
above 1024^2)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cmblensing_tpu.core.proj import ProjLambert
from cmblensing_tpu.core import field as F
from cmblensing_tpu.core.field import Field
from cmblensing_tpu.core.basis import MAP, QU_MAP
from cmblensing_tpu.parallel.spatial import spatial_mesh, shard_spatial
from cmblensing_tpu.parallel.sharded_fft import (
    rfft2_sharded, irfft2_sharded, pad_multiplier,
    fourier_diag_apply_sharded)


@pytest.fixture(scope="module")
def mesh4():
    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("needs 4 virtual CPU devices")
    return spatial_mesh(4, devices=devs)


@pytest.fixture(scope="module")
def setup():
    proj = ProjLambert(32, 32, thetapix=3, T=np.float32)
    rs = np.random.RandomState(0)
    arr = rs.randn(2, 32, 32).astype(np.float32)
    return proj, jnp.asarray(arr)


def test_rfft2_sharded_parity(mesh4, setup):
    """Pencil rfft2 equals jnp.fft.rfft2 on the first Kx columns and is
    exactly zero on the padded tail; Kp=20 at Kx=17, P=4 exercises the
    padding path."""
    proj, arr = setup
    X = rfft2_sharded(shard_spatial(Field(arr, QU_MAP, proj), mesh4).arr, mesh4)
    kx = 32 // 2 + 1
    assert X.shape == (2, 32, 20)
    ref = np.fft.rfft2(np.asarray(arr))
    np.testing.assert_allclose(np.asarray(X)[..., :kx], ref,
                               rtol=0, atol=1e-3)
    assert np.max(np.abs(np.asarray(X)[..., kx:])) == 0.0


def test_irfft2_sharded_roundtrip(mesh4, setup):
    proj, arr = setup
    fs = shard_spatial(Field(arr, QU_MAP, proj), mesh4).arr
    X = rfft2_sharded(fs, mesh4)
    back = irfft2_sharded(X, 32, mesh4)
    np.testing.assert_allclose(np.asarray(back), np.asarray(arr),
                               rtol=0, atol=1e-5)
    # output stays y-sharded
    assert back.sharding.spec[-2] == "sp"


def test_fourier_diag_apply_parity_and_grad(mesh4, setup):
    """A Fourier-diagonal operator (here a beam-like gaussian in ell)
    applied via the pencil scheme matches the single-device apply, and
    jax.grad flows through the two all_to_all transposes exactly."""
    proj, arr = setup
    ky = np.fft.fftfreq(32)[:, None]
    kx = np.fft.rfftfreq(32)[None, :]
    mult = np.exp(-50 * (ky ** 2 + kx ** 2)).astype(np.float32)

    ref = np.fft.irfft2(np.fft.rfft2(np.asarray(arr)) * mult, s=(32, 32))

    f_sh = shard_spatial(Field(arr, QU_MAP, proj), mesh4)
    mp = pad_multiplier(mult, mesh4)
    out = fourier_diag_apply_sharded(mp, f_sh, mesh4)
    np.testing.assert_allclose(np.asarray(out.arr), ref, rtol=0, atol=1e-5)

    w = jnp.asarray(ref)

    def loss_sh(a):
        return jnp.sum(
            fourier_diag_apply_sharded(mp, Field(a, QU_MAP, proj), mesh4).arr * w)

    def loss_1(a):
        return jnp.sum(jnp.fft.irfft2(
            jnp.fft.rfft2(a) * jnp.asarray(mult), s=(32, 32)) * w)

    g_sh = jax.jit(jax.grad(loss_sh))(f_sh.arr)
    g_1 = jax.grad(loss_1)(arr)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_1),
                               rtol=0, atol=2e-4 * float(jnp.max(jnp.abs(g_1))))


def test_sharded_wiener_filter_cg(mesh4, setup):
    """The Wiener filter (B^T Cn^-1 B + Cf^-1) x = B^T Cn^-1 d as one
    CG solve on a spatially-sharded map, every operator applied through
    the pencil FFTs — matches the single-device solve."""
    from cmblensing_tpu.ops.solvers import conjugate_gradient

    proj, arr = setup
    d = arr[:1]                                    # one 'I' plane
    ky = np.fft.fftfreq(32)[:, None]
    kx = np.fft.rfftfreq(32)[None, :]
    k2 = (ky ** 2 + kx ** 2).astype(np.float32)
    Cf = (1.0 / (1e-4 + k2)).astype(np.float32)    # red signal
    Cn = np.float32(1.0)                           # white noise
    Bm = np.exp(-10 * k2).astype(np.float32)       # beam

    def solve(apply_fd, dd):
        def A(x):
            return apply_fd(Bm ** 2 / Cn + 1.0 / Cf, x)

        def M(r):
            return apply_fd(1.0 / (Bm ** 2 / Cn + 1.0 / Cf), r)

        b = apply_fd(Bm / Cn, dd)
        x, info = conjugate_gradient(M, A, b, nsteps=40, tol=1e-12)
        return x

    # single-device reference
    def fd_local(mult, x):
        return jnp.fft.irfft2(jnp.fft.rfft2(x) * jnp.asarray(mult),
                              s=(32, 32))

    x_ref = solve(fd_local, d)

    # sharded
    d_sh = shard_spatial(Field(d, MAP, proj), mesh4).arr
    mults = {}

    def fd_sharded(mult, x):
        key = mult.tobytes()
        if key not in mults:
            mults[key] = pad_multiplier(mult, mesh4)
        return fourier_diag_apply_sharded(
            mults[key], Field(x, MAP, proj), mesh4).arr

    x_sh = solve(fd_sharded, d_sh)
    scale = float(jnp.max(jnp.abs(x_ref)))
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                               rtol=0, atol=3e-5 * scale)


def test_sharded_wiener_filter_dataset(mesh4):
    """sharded_wiener_filter on a real load_sim DataSet (unmasked):
    the fully-sharded lensed Gaussian solve matches the generic
    argmaxf_logpdf solution."""
    from cmblensing_tpu.models.dataset import load_sim
    from cmblensing_tpu.inference.maximization import argmaxf_logpdf
    from cmblensing_tpu.parallel.sharded_wf import sharded_wiener_filter
    from cmblensing_tpu.core.basis import Basis
    from cmblensing_tpu.ops import deriv

    out = load_sim(thetapix=3, Nside=32, pol="P", T=np.float32, seed=0)
    ds, phi = out["ds"], out["phi"]
    phi_m = phi.to(phi.basis.with_space("map"))

    f_ref, _ = argmaxf_logpdf(
        ds, phi=phi_m,
        conjgrad_kwargs=dict(tol=1e-10, nsteps=60, hessian_precision=None))
    f_ref_qu = f_ref.to(Basis("QU", "map"))

    with deriv.mode_ctx("matmul"):   # match the sharded flow's operators
        f_sh, info = sharded_wiener_filter(ds, phi_m, mesh4,
                                           nsteps=60, tol=1e-10)
    # axis -2 (= index 1 of the 3-d array) is sharded; trailing Nones
    # may be trimmed from the spec
    assert f_sh.arr.sharding.spec[1] == "sp"
    scale = float(jnp.max(jnp.abs(f_ref_qu.arr)))
    err = float(jnp.max(jnp.abs(f_sh.arr - f_ref_qu.arr)))
    assert err < 2e-3 * scale, f"sharded WF mismatch: {err} vs scale {scale}"


def test_sharded_logpdf_and_MAP(mesh4):
    """sharded_lensing_logpdf differences match ds.logpdf differences
    (logdet constants cancel), and sharded_MAP_joint increases the
    posterior monotonically while recovering phi on an unmasked 32^2
    dataset — a full joint-MAP pipeline where no device ever holds a
    full map."""
    from cmblensing_tpu.models.dataset import load_sim
    from cmblensing_tpu.parallel.sharded_wf import (
        sharded_lensing_logpdf, sharded_MAP_joint)
    from cmblensing_tpu.core.basis import Basis
    from cmblensing_tpu.core import field as F
    from cmblensing_tpu.ops import deriv

    out = load_sim(thetapix=3, Nside=32, pol="P", T=np.float32, seed=0)
    ds, phi, f = out["ds"], out["phi"], out["f"]
    phi_m = phi.to(phi.basis.with_space("map"))
    f_qu = f.to(Basis("QU", "map"))
    f2 = Field(0.8 * f_qu.arr, f_qu.basis, f_qu.proj)
    phi2 = Field(0.5 * phi_m.arr, phi_m.basis, phi_m.proj)

    with deriv.mode_ctx("matmul"):
        lp_a = float(sharded_lensing_logpdf(ds, f_qu, phi_m, mesh4))
        lp_b = float(sharded_lensing_logpdf(ds, f2, phi2, mesh4))
        ref_a = float(jnp.sum(ds.logpdf(f=f_qu, phi=phi_m)))
        ref_b = float(jnp.sum(ds.logpdf(f=f2, phi=phi2)))
    d_sh, d_ref = lp_a - lp_b, ref_a - ref_b
    assert abs(d_sh - d_ref) < 2e-3 * abs(d_ref), (d_sh, d_ref)

    res = sharded_MAP_joint(ds, mesh4, nsteps=3, cg_nsteps=25, cg_tol=1e-8,
                            ngrid=7, alpha_max=1.5)
    lps = [float(h["logpdf"]) for h in res["history"]]
    assert lps[1] >= lps[0] - 1e-3 and lps[2] >= lps[1] - 1e-3, lps
    # phi recovery: correlation with the true phi on the unmasked map
    # (the mixed-parametrization MAP converges fast: ~0.85 in 3 steps;
    # the iterate-level check is test_sharded_MAP_parity)
    pm = np.asarray(res["phi"].arr).ravel()
    pt = np.asarray(phi_m.arr).ravel()
    corr = float(pm @ pt / (np.linalg.norm(pm) * np.linalg.norm(pt) + 1e-30))
    assert corr > 0.75, corr


def test_sharded_MAP_parity(mesh4):
    """Same-key parity with the single-device MAP_joint: the sharded
    coordinate descent (mixed parametrization f° = L(phi) D f, warm-
    started CG f-step with the SAME hat-ops preconditioner, identical
    steps^1.5 grid line search and amax adaptation) reproduces
    MAP_joint's iterates to f32 roundoff — measured 8e-6 relative L2 on
    the step-3 phi at 32^2 (the r3 demo-grade version only reached
    corr > 0.4 vs truth)."""
    from cmblensing_tpu.models.dataset import load_sim
    from cmblensing_tpu.parallel.sharded_wf import sharded_MAP_joint
    from cmblensing_tpu.inference.maximization import MAP_joint

    out = load_sim(thetapix=3, Nside=32, pol="P", T=np.float32, seed=0)
    ds = out["ds"]
    res_sh = sharded_MAP_joint(ds, mesh4, nsteps=2, cg_nsteps=60,
                               cg_tol=1e-7, ngrid=8)
    res_1 = MAP_joint(ds, nsteps=2, linesearch="grid", ngrid=8,
                      precision=None,
                      conjgrad_kwargs=dict(tol=1e-7, nsteps=60,
                                           hessian_precision=None))
    p1 = res_1["phi"].to(res_1["phi"].basis.with_space("map"))
    psh = res_sh["phi"].to(res_sh["phi"].basis.with_space("map"))
    a = np.asarray(p1.arr).ravel()
    b = np.asarray(psh.arr).ravel()
    rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-30)
    assert rel < 1e-4, rel
    # history logpdfs carry the same normalization constants
    for h1, hs in zip(res_1["history"], res_sh["history"]):
        lp1, lps_ = float(h1["logpdf"]), float(np.sum(hs["logpdf"]))
        assert abs(lp1 - lps_) < 1e-4 * abs(lp1), (lp1, lps_)


def test_sharded_MAP_batched(mesh4):
    """Batched data support (r3 raised NotImplementedError): each batch
    entry gets its own phi, line-search alpha and amax adaptation, like
    MAP_joint."""
    from cmblensing_tpu.models.dataset import load_sim
    from cmblensing_tpu.parallel.sharded_wf import sharded_MAP_joint

    out = load_sim(thetapix=3, Nside=32, pol="P", T=np.float32, seed=1,
                   Nbatch=2)
    res = sharded_MAP_joint(out["ds"], mesh4, nsteps=1, cg_nsteps=20,
                            cg_tol=1e-7, ngrid=6)
    assert np.shape(res["history"][0]["alpha"]) == (2,)
    assert np.shape(res["history"][0]["logpdf"]) == (2,)
    assert res["phi"].batch_shape == (2,)
    assert np.all(np.isfinite(res["history"][0]["logpdf"]))


def test_sharded_sample_f_matches_single_device(mesh4):
    """Same-key parity: the sharded constrained-realization sampler
    reproduces inference.sample_f exactly (the solve is the same
    Gaussian system on the residual data)."""
    from cmblensing_tpu.models.dataset import load_sim
    from cmblensing_tpu.inference.maximization import sample_f
    from cmblensing_tpu.parallel.sharded_wf import sharded_sample_f
    from cmblensing_tpu.core.basis import Basis
    from cmblensing_tpu.ops import deriv

    out = load_sim(thetapix=3, Nside=32, pol="P", T=np.float32, seed=0)
    ds, phi = out["ds"], out["phi"]
    phi_m = phi.to(phi.basis.with_space("map"))
    key = jax.random.PRNGKey(7)

    f_ref, _ = sample_f(
        key, ds, phi=phi_m,
        conjgrad_kwargs=dict(tol=1e-10, nsteps=50, hessian_precision=None))
    f_ref_qu = f_ref.to(Basis("QU", "map"))

    with deriv.mode_ctx("matmul"):
        f_sh, _ = sharded_sample_f(key, ds, phi_m, mesh4,
                                   nsteps=50, tol=1e-10)
    scale = float(jnp.max(jnp.abs(f_ref_qu.arr)))
    err = float(jnp.max(jnp.abs(f_sh.arr - f_ref_qu.arr)))
    assert err < 2e-3 * scale, (err, scale)


def test_sharded_wiener_filter_masked(mesh4):
    """Masked dataset: the pixel mask rides the sharded solve as a
    LOCAL map-space multiply (M = Mf * Mpix decomposition) — matches
    the generic argmaxf_logpdf solution."""
    from cmblensing_tpu.models.dataset import load_sim
    from cmblensing_tpu.inference.maximization import argmaxf_logpdf
    from cmblensing_tpu.parallel.sharded_wf import sharded_wiener_filter
    from cmblensing_tpu.core.basis import Basis
    from cmblensing_tpu.ops import deriv

    out = load_sim(thetapix=3, Nside=32, pol="P", T=np.float32, seed=0,
                   pixel_mask_kwargs=dict(edge_padding_deg=0.2,
                                          apodization_deg=0.1))
    ds, phi = out["ds"], out["phi"]
    phi_m = phi.to(phi.basis.with_space("map"))

    f_ref, _ = argmaxf_logpdf(
        ds, phi=phi_m,
        conjgrad_kwargs=dict(tol=1e-10, nsteps=80, hessian_precision=None))
    f_ref_qu = f_ref.to(Basis("QU", "map"))

    with deriv.mode_ctx("matmul"):
        f_sh, info = sharded_wiener_filter(ds, phi_m, mesh4,
                                           nsteps=80, tol=1e-10)
    scale = float(jnp.max(jnp.abs(f_ref_qu.arr)))
    err = float(jnp.max(jnp.abs(f_sh.arr - f_ref_qu.arr)))
    assert err < 5e-3 * scale, (err, scale)


def test_sharded_logpdf_masked_parity(mesh4):
    """Masked dataset: sharded logpdf differences still match
    ds.logpdf (the pixel mask rides as a local multiply)."""
    from cmblensing_tpu.models.dataset import load_sim
    from cmblensing_tpu.parallel.sharded_wf import sharded_lensing_logpdf
    from cmblensing_tpu.core.basis import Basis
    from cmblensing_tpu.ops import deriv

    out = load_sim(thetapix=3, Nside=32, pol="P", T=np.float32, seed=0,
                   pixel_mask_kwargs=dict(edge_padding_deg=0.2,
                                          apodization_deg=0.1))
    ds, phi, f = out["ds"], out["phi"], out["f"]
    phi_m = phi.to(phi.basis.with_space("map"))
    f_qu = f.to(Basis("QU", "map"))
    f2 = Field(0.7 * f_qu.arr, f_qu.basis, f_qu.proj)
    phi2 = Field(0.4 * phi_m.arr, phi_m.basis, phi_m.proj)

    with deriv.mode_ctx("matmul"):
        d_sh = (float(sharded_lensing_logpdf(ds, f_qu, phi_m, mesh4))
                - float(sharded_lensing_logpdf(ds, f2, phi2, mesh4)))
        d_ref = (float(jnp.sum(ds.logpdf(f=f_qu, phi=phi_m)))
                 - float(jnp.sum(ds.logpdf(f=f2, phi=phi2))))
    assert abs(d_sh - d_ref) < 2e-3 * abs(d_ref), (d_sh, d_ref)


def test_sharded_hmc_phi_parity(mesh4):
    """Same-key HMC parity: identical momentum draw + gradient =>
    identical leapfrog trajectory, dH, and accept as the single-device
    hmc_step (the logpdf constant offset cancels in both the gradient
    and the energy difference)."""
    from cmblensing_tpu.models.dataset import load_sim
    from cmblensing_tpu.inference.sampling import hmc_step, mass_matrix_phi
    from cmblensing_tpu.parallel.sharded_wf import sharded_hmc_phi_step
    from cmblensing_tpu.core.basis import Basis
    from cmblensing_tpu.ops import deriv

    out = load_sim(thetapix=3, Nside=32, pol="P", T=np.float32, seed=0)
    ds, phi, f = out["ds"], out["phi"], out["f"]
    phi_m = phi.to(phi.basis.with_space("map"))
    f_qu = f.to(Basis("QU", "map"))
    Lam = mass_matrix_phi({}, ds)
    key = jax.random.PRNGKey(3)

    with deriv.mode_ctx("matmul"):
        U = lambda p: ds.logpdf(f=f_qu, phi=p)
        x_ref, dH_ref, acc_ref = hmc_step(key, U, phi_m, Lam, N=5, eps=3e-8)
        x_sh, dH_sh, acc_sh = sharded_hmc_phi_step(
            key, ds, f_qu, phi_m, mesh4, Lambda=Lam, N=5, eps=3e-8)

    assert bool(acc_sh) == bool(acc_ref)
    np.testing.assert_allclose(float(dH_sh), float(dH_ref),
                               rtol=2e-2, atol=1e-3)
    scale = float(jnp.max(jnp.abs(x_ref.arr)))
    err = float(jnp.max(jnp.abs(x_sh.arr - x_ref.to(x_sh.basis).arr)))
    assert err < 2e-4 * scale, (err, scale)


def test_sharded_gibbs_pass(mesh4):
    """Two sharded Gibbs passes run end-to-end: finite fields, sharded
    layouts preserved, HMC dH finite."""
    from cmblensing_tpu.models.dataset import load_sim
    from cmblensing_tpu.parallel.sharded_wf import sharded_gibbs_pass
    from cmblensing_tpu.ops import deriv

    out = load_sim(thetapix=3, Nside=32, pol="P", T=np.float32, seed=0)
    ds, phi = out["ds"], out["phi"]
    phi_m = phi.to(phi.basis.with_space("map"))

    key = jax.random.PRNGKey(11)
    with deriv.mode_ctx("matmul"):
        f1, p1, info1 = sharded_gibbs_pass(key, ds, phi_m, mesh4,
                                           cg_nsteps=20, hmc_N=3,
                                           hmc_eps=1e-8)
        f2, p2, info2 = sharded_gibbs_pass(jax.random.PRNGKey(12), ds, p1,
                                           mesh4, cg_nsteps=20, hmc_N=3,
                                           hmc_eps=1e-8)
    for x in (f1.arr, p1.arr, f2.arr, p2.arr):
        assert np.all(np.isfinite(np.asarray(x)))
    assert np.isfinite(float(info1["dH"])) and np.isfinite(float(info2["dH"]))
    assert p2.arr.sharding.spec[1] == "sp" or \
        p2.arr.sharding.spec == (None, "sp")


def test_get_Cl_sharded_parity(mesh4):
    """Device-binned sharded spectra match utils.spectra.get_Cl."""
    from cmblensing_tpu.utils.spectra import get_Cl
    from cmblensing_tpu.parallel.sharded_fft import get_Cl_sharded

    proj = ProjLambert(32, 32, thetapix=3, T=np.float32)
    rs = np.random.RandomState(4)
    arr = rs.randn(1, 32, 32).astype(np.float32)
    f = Field(jnp.asarray(arr), MAP, proj)

    ref = get_Cl(f, dl=500)
    f_sh = shard_spatial(f, mesh4)
    got = get_Cl_sharded(f_sh, mesh4, dl=500)
    m = np.isfinite(np.asarray(ref.Cl))
    np.testing.assert_allclose(np.asarray(got.ell)[m], np.asarray(ref.ell)[m],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got.Cl)[m], np.asarray(ref.Cl)[m],
                               rtol=2e-4)

    # cross-spectrum parity too
    arr2 = (arr + rs.randn(1, 32, 32).astype(np.float32))
    g = Field(jnp.asarray(arr2), MAP, proj)
    ref2 = get_Cl(f, g, dl=500)
    got2 = get_Cl_sharded(f_sh, mesh4, f2=shard_spatial(g, mesh4), dl=500)
    m2 = np.isfinite(np.asarray(ref2.Cl))
    np.testing.assert_allclose(np.asarray(got2.Cl)[m2],
                               np.asarray(ref2.Cl)[m2], rtol=2e-4)


def test_sharded_wiener_filter_2d_mesh_batched():
    """Batched data on a 2-D (batch x space) mesh: 2 sims data-parallel
    while each map's rows shard over 4 devices — solutions match the
    per-sim single-device solves."""
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    from cmblensing_tpu.models.dataset import load_sim
    from cmblensing_tpu.inference.maximization import argmaxf_logpdf
    from cmblensing_tpu.parallel.sharded_wf import sharded_wiener_filter
    from cmblensing_tpu.core.basis import Basis
    from cmblensing_tpu.core.field import repeat_batch
    from cmblensing_tpu.ops import deriv

    mesh2 = spatial_mesh(8, devices=devs, nbatch=2)
    out = load_sim(thetapix=3, Nside=32, pol="P", T=np.float32, seed=0)
    ds, phi = out["ds"], out["phi"]
    phi_m = phi.to(phi.basis.with_space("map"))

    # two distinct data realizations as a batch
    sims = ds.simulate(jax.random.PRNGKey(5), phi=repeat_batch(phi_m, 2),
                       batch_shape=(2,))
    ds_b = ds.replace(d=sims["d"])

    with deriv.mode_ctx("matmul"):
        f_sh, _ = sharded_wiener_filter(ds_b, phi_m, mesh2,
                                        batch_axis="batch",
                                        nsteps=40, tol=1e-10)
    assert f_sh.arr.shape[0] == 2

    for i in range(2):
        from cmblensing_tpu.core.field import batch_index
        di = batch_index(sims["d"], i)
        f_ref, _ = argmaxf_logpdf(
            ds.replace(d=di), phi=phi_m,
            conjgrad_kwargs=dict(tol=1e-10, nsteps=40,
                                 hessian_precision=None))
        f_ref_qu = f_ref.to(Basis("QU", "map"))
        scale = float(jnp.max(jnp.abs(f_ref_qu.arr)))
        err = float(jnp.max(jnp.abs(f_sh.arr[i] - f_ref_qu.arr)))
        assert err < 5e-3 * scale, (i, err, scale)


def test_sharded_hmc_batched_2d_mesh():
    """Batched HMC on a (batch x space) mesh: per-chain dH and accept,
    per-chain state update (regression: the energy used to mix a
    batch-summed potential with per-batch kinetic terms and the accept
    mask was never batch-broadcast)."""
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    from cmblensing_tpu.models.dataset import load_sim
    from cmblensing_tpu.parallel.sharded_wf import sharded_hmc_phi_step
    from cmblensing_tpu.core.basis import Basis
    from cmblensing_tpu.core.field import repeat_batch
    from cmblensing_tpu.ops import deriv

    mesh2 = spatial_mesh(8, devices=devs, nbatch=2)
    out = load_sim(thetapix=3, Nside=32, pol="P", T=np.float32, seed=0)
    ds, phi, f = out["ds"], out["phi"], out["f"]
    phi_b = repeat_batch(phi.to(phi.basis.with_space("map")), 2)
    f_b = repeat_batch(f.to(Basis("QU", "map")), 2)
    sims = ds.simulate(jax.random.PRNGKey(5), phi=phi_b, batch_shape=(2,))
    ds_b = ds.replace(d=sims["d"])

    with deriv.mode_ctx("matmul"):
        x, dH, acc = sharded_hmc_phi_step(jax.random.PRNGKey(0), ds_b, f_b,
                                          phi_b, mesh2, batch_axis="batch",
                                          N=3, eps=1e-8)
    assert x.arr.shape[0] == 2
    assert np.shape(np.asarray(dH)) == (2,)
    assert np.shape(np.asarray(acc)) == (2,)
    assert np.all(np.isfinite(np.asarray(x.arr)))


def test_sharded_sample_joint_resume(mesh4, tmp_path):
    """Sharded Gibbs chain with native CRC checkpoints: 4 steps, then
    resume for 2 more — continuous steps, finite scalars, periodic phi
    maps recorded."""
    from cmblensing_tpu.models.dataset import load_sim
    from cmblensing_tpu.parallel.sharded_wf import sharded_sample_joint
    from cmblensing_tpu.ops import deriv

    out = load_sim(thetapix=3, Nside=32, pol="P", T=np.float32, seed=0)
    ds = out["ds"]
    fn = str(tmp_path / "chain")
    key = jax.random.PRNGKey(0)

    with deriv.mode_ctx("matmul"):
        ch = sharded_sample_joint(key, ds, mesh4, nsamps=4, cg_nsteps=15,
                                  hmc_N=3, hmc_eps=1e-8, filename=fn,
                                  nfilewrite=2, nsavemaps=2)
        ch2 = sharded_sample_joint(key, ds, mesh4, nsamps=6, cg_nsteps=15,
                                   hmc_N=3, hmc_eps=1e-8, filename=fn,
                                   nfilewrite=2, nsavemaps=2, resume=True)
    c1 = ch[0]
    assert [e["step"] for e in c1] == [1, 2, 3, 4]
    assert all(np.isfinite(e["logpdf"]) for e in c1)
    assert "phi" in c1[1] and "phi" not in c1[0]
    c2 = ch2[0]
    assert [e["step"] for e in c2] == [5, 6]
    assert all(np.isfinite(e["logpdf"]) for e in c2)
