"""Spectral derivative backends agree bit-for-bit in intent (Nyquist
zeroed) and the fused Pallas kernel matches the scan integrator."""
import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cmblensing_tpu.core.proj import ProjLambert
from cmblensing_tpu.ops import deriv


@pytest.fixture(autouse=True)
def _restore_mode():
    yield
    deriv.set_deriv_mode("auto")


@pytest.mark.parametrize("Ny,Nx", [(16, 16), (8, 16), (16, 8)])
def test_backends_agree(Ny, Nx):
    proj = ProjLambert(Ny, Nx, thetapix=3, T=np.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, Ny, Nx))
    outs = {}
    for mode in ["fft", "matmul"]:
        deriv.set_deriv_mode(mode)
        gx, gy = deriv.grad_xy(x, proj)
        d = deriv.div_xy(gx, gy, proj)
        (hx, hy), (hxx, hxy, hyy) = deriv.gradhess(x[:1], proj)
        outs[mode] = (gx, gy, d, hx, hy, hxx, hxy, hyy)
    for a, b in zip(outs["fft"], outs["matmul"]):
        assert float(jnp.max(jnp.abs(a - b))) < 5e-3 * float(jnp.max(jnp.abs(a)) + 1e-9)


def test_deriv_exact_on_harmonic():
    """d/dx sin(kx) = k cos(kx) for both backends."""
    N = 32
    proj = ProjLambert(N, N, thetapix=3, T=np.float32)
    dx = float(proj.deltax)
    x = np.arange(N) * dx
    k = 2 * np.pi / (N * dx) * 5
    f = jnp.asarray(np.broadcast_to(np.sin(k * x)[None, :], (N, N)).astype(np.float32))[None]
    for mode in ["fft", "matmul"]:
        deriv.set_deriv_mode(mode)
        gx, gy = deriv.grad_xy(f, proj)
        expected = k * np.cos(k * x)[None, :]
        assert np.max(np.abs(np.asarray(gx[0]) - expected)) < 1e-2 * k, mode


def test_dij_sum_consistency():
    proj = ProjLambert(16, 16, thetapix=3, T=np.float32)
    s = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16))
    outs = []
    for mode in ["fft", "matmul"]:
        deriv.set_deriv_mode(mode)
        outs.append(deriv.dij_sum(s, proj))
    assert float(jnp.max(jnp.abs(outs[0] - outs[1]))) < 5e-3 * float(jnp.max(jnp.abs(outs[0])))


def _weak_lensing_setup(N=32, ncomp=2):
    proj = ProjLambert(N, N, thetapix=3, T=np.float32)
    phi_f = jnp.zeros((1, N, N // 2 + 1), dtype=jnp.complex64)
    phi_f = phi_f.at[0, 1, 1].set(1e-3)   # weak-lensing-regime deflection
    phi = jnp.fft.irfft2(phi_f, s=(N, N))
    f = jax.random.normal(jax.random.PRNGKey(1), (ncomp, N, N))
    return proj, phi, f


def test_pallas_flows_interpret_match_scan():
    """All three fused Pallas flows (forward, adjoint, backward
    transpose-delta) equal the lax.scan integrator, in interpreter mode
    (CPU-safe; a real-TPU compiled check lives in test_lensing.py)."""
    from cmblensing_tpu.models.lenseflow import (
        _gradhess_phi, _rk4, _velocity, _velocity_adj, _lenseflow_bwd)
    from cmblensing_tpu.ops import pallas_lenseflow as plf

    deriv.set_deriv_mode("matmul")
    proj, phi, f = _weak_lensing_setup()
    g, h = _gradhess_phi(phi, proj)
    nsteps = 3

    rel = lambda a, b: float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))

    ref = _rk4(lambda t, y: _velocity(t, y, g, h, proj), f, 0., 1., nsteps)
    out = plf.pallas_flow_apply(f, g, h, 0., 1., nsteps, proj, "forward",
                                interpret=True)
    assert rel(out, ref) < 1e-5

    ref = _rk4(lambda t, y: _velocity_adj(t, y, g, h, proj), f, 1., 0., nsteps)
    out = plf.pallas_flow_apply(f, g, h, 1., 0., nsteps, proj, "adjoint",
                                interpret=True)
    assert rel(out, ref) < 1e-5

    dy = jax.random.normal(jax.random.PRNGKey(2), f.shape)
    dphi_ref, df0_ref = _lenseflow_bwd(0., 1., nsteps, proj, "scan", None, (phi, f), dy)
    dphi, df0 = plf.pallas_flow_bwd(dy, f, g, h, 0., 1., nsteps, proj,
                                    interpret=True)
    assert rel(df0, df0_ref) < 1e-5
    assert rel(dphi, dphi_ref) < 1e-5


def test_pallas_split_backward_matches_scan():
    """The split (A/B kernels + XLA glue) backward path — used when the
    single-stage velocity kernel exceeds VMEM at 1024^2 — equals the
    scan integrator."""
    from cmblensing_tpu.models.lenseflow import _gradhess_phi, _lenseflow_bwd
    from cmblensing_tpu.ops import pallas_lenseflow as plf

    deriv.set_deriv_mode("matmul")
    proj, phi, f = _weak_lensing_setup()
    dy = jax.random.normal(jax.random.PRNGKey(2), f.shape)
    g, h = _gradhess_phi(phi, proj)
    dphi_ref, df0_ref = _lenseflow_bwd(0., 1., 3, proj, "scan", None, (phi, f), dy)
    state = jnp.concatenate([f, dy, jnp.zeros((1,) + f.shape[-2:], f.dtype)],
                            axis=0)
    mats = plf._mats_for(proj, np.float32)
    out = plf._split_call(state, (*g, *h), mats, "backward", 3, 1.0, 0.0,
                          "f32", True)
    rel = lambda a, b: float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))
    assert rel(out[2:4], df0_ref) < 1e-5
    assert rel(out[4:], dphi_ref) < 1e-5


def test_pallas_fa_kernel_matches_scan():
    """The component-gridded role-switched forward/adjoint kernel
    (pallas_lenseflow._fa_call; production path for 1024^2 applies)
    equals the scan integrators for both roles and both time
    directions, in interpreter mode."""
    from cmblensing_tpu.ops import pallas_lenseflow as plf
    from cmblensing_tpu.models.lenseflow import (
        _gradhess_phi, _rk4, _velocity, _velocity_adj)

    deriv.set_deriv_mode("matmul")
    proj, phi, f = _weak_lensing_setup()
    g, h = _gradhess_phi(phi, proj)
    mats = plf._mats_for(proj, np.float32)
    rel = lambda a, b: float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))

    ref = _rk4(lambda t, y: _velocity(t, y, g, h, proj), f, 0., 1., 3)
    out = plf._fa_call(f, (*g, *h), mats, "forward", 3, 0., 1., "f32", True)
    assert rel(out, ref) < 1e-5

    ref = _rk4(lambda t, y: _velocity(t, y, g, h, proj), f, 1., 0., 3)
    out = plf._fa_call(f, (*g, *h), mats, "forward", 3, 1., 0., "f32", True)
    assert rel(out, ref) < 1e-5

    ref = _rk4(lambda t, y: _velocity_adj(t, y, g, h, proj), f, 1., 0., 3)
    out = plf._fa_call(f, (*g, *h), mats, "adjoint", 3, 1., 0., "f32", True)
    assert rel(out, ref) < 1e-5

    # factored in-kernel derivatives, interpret mode
    fmats, _ = plf._fmats_for(proj, np.float32)
    if fmats is not None:
        fkey = (proj.Nx, proj.Ny, float(proj.deltax), "float32")
        ref = _rk4(lambda t, y: _velocity(t, y, g, h, proj), f, 0., 1., 3)
        out = plf._fa_call(f, (*g, *h), fmats, "forward", 3, 0., 1., "f32",
                           True, fkey)
        assert rel(out, ref) < 1e-5


def test_backward_dphi_hoisting_exact_f64(x64):
    """The delta-phi accumulation hoist (_backward_flow_scan: apply
    div_plus_dij ONCE to the RK4-accumulated integrands instead of
    inside every stage) is an exact linear-algebra identity, not an
    approximation: at float64 the hoisted flow matches a straightforward
    RK4 of _backward_velocity to near machine precision."""
    from cmblensing_tpu.models.lenseflow import (
        _gradhess_phi, _rk4, _backward_velocity, _backward_flow_scan)

    deriv.set_deriv_mode("matmul")
    N = 32
    proj = ProjLambert(N, N, thetapix=3, T=np.float64)
    phi_f = jnp.zeros((1, N, N // 2 + 1), dtype=jnp.complex128)
    phi_f = phi_f.at[0, 1, 1].set(1e-3)
    phi = jnp.fft.irfft2(phi_f, s=(N, N))
    f = jax.random.normal(jax.random.PRNGKey(1), (2, N, N), jnp.float64)
    dy = jax.random.normal(jax.random.PRNGKey(2), (2, N, N), jnp.float64)
    g, h = _gradhess_phi(phi, proj)

    dphi0 = jnp.zeros_like(phi)
    f0, df0_ref, dphi_ref = _rk4(
        lambda t, y: _backward_velocity(t, y, g, h, proj),
        (f, dy, dphi0), 1.0, 0.0, 4)
    df0, dphi = _backward_flow_scan(f, dy, g, h, proj, 1.0, 0.0, 4)

    rel = lambda a, b: float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))
    assert rel(df0, df0_ref) < 1e-12
    assert rel(dphi, dphi_ref) < 1e-12


def test_pallas_bv_backward_matches_scan():
    """The per-velocity bv-kernel backward path (production for 1024^2
    gradients) equals the scan backward flow, interpret mode."""
    from cmblensing_tpu.models.lenseflow import _gradhess_phi, _lenseflow_bwd
    from cmblensing_tpu.ops import pallas_lenseflow as plf

    deriv.set_deriv_mode("matmul")
    proj, phi, f = _weak_lensing_setup()
    dy = jax.random.normal(jax.random.PRNGKey(2), f.shape)
    g, h = _gradhess_phi(phi, proj)
    dphi_ref, df0_ref = _lenseflow_bwd(0., 1., 3, proj, "scan", None, (phi, f), dy)
    state = jnp.concatenate([f, dy, jnp.zeros((1,) + f.shape[-2:], f.dtype)],
                            axis=0)
    out = plf._bv_flow(state, (*g, *h), proj, 3, 1.0, 0.0, "f32",
                       interpret=True)
    rel = lambda a, b: float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))
    assert rel(out[2:4], df0_ref) < 1e-5
    assert rel(out[4:], dphi_ref) < 1e-5


def test_pallas_uni_granularity_matches_flow():
    """The universal-kernel path (used above the whole-flow size for
    every flow, incl. forward/adjoint roles) equals the whole-flow
    kernel: force it by shrinking the VMEM budget."""
    from cmblensing_tpu.ops import pallas_lenseflow as plf
    from cmblensing_tpu.models.lenseflow import (
        _gradhess_phi, _rk4, _velocity_adj)

    deriv.set_deriv_mode("matmul")
    proj, phi, f = _weak_lensing_setup(N=16)
    g, h = _gradhess_phi(phi, proj)
    ref = plf.pallas_flow_apply(f, g, h, 0., 1., 3, proj, "forward",
                                interpret=True)
    adj_ref = _rk4(lambda t, y: _velocity_adj(t, y, g, h, proj), f, 1., 0., 3)
    assert plf._flow_fits("backward", 5, 16, 16, np.float32)
    old = plf._VMEM_BUDGET_MB
    try:
        # force uni granularity: below flow-fit, above uni-fit. The
        # production policy routes forward/adjoint to the XLA scan at
        # uni sizes (measured faster at 1024^2), so exercise the uni
        # kernel's role-2/3 paths directly via _uni_call.
        plf._VMEM_BUDGET_MB = 0.018
        assert not plf._flow_fits("backward", 5, 16, 16, np.float32)
        assert plf._uni_fits("forward", 2, 16, 16, np.float32)
        out = plf.pallas_flow_apply(f, g, h, 0., 1., 3, proj, "forward",
                                    interpret=True)
        mats = plf._mats_for(proj, np.float32)
        uni_fwd = plf._uni_call(f, (*g, *h), mats, "forward", 3, 0., 1.,
                                "f32", True)
        uni_adj = plf._uni_call(f, (*g, *h), mats, "adjoint", 3, 1., 0.,
                                "f32", True)
    finally:
        plf._VMEM_BUDGET_MB = old
    # f32 association differs between the in-kernel RK combination and
    # the lax.scan one; ~1e-5 relative is expected rounding noise
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4 * float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(uni_fwd - ref))) < 1e-4 * float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(uni_adj - adj_ref))) < 1e-4 * float(jnp.max(jnp.abs(adj_ref)))


def test_matmul_precision_pinned_in_jaxpr():
    """Regression guard for the TPU default-matmul-precision pitfall:
    the f32 path must pin Precision.HIGHEST on every dot (TPU's default
    truncates f32 operands to bf16, corrupting lensing gradients), and
    the 'high'/'bf16' knobs must change that deliberately."""
    proj = ProjLambert(16, 16, thetapix=3, T=np.float32)
    x = jnp.ones((1, 16, 16), jnp.float32)

    def dots_of(fn, *args):
        jaxpr = jax.make_jaxpr(fn)(*args)
        return [e for e in jaxpr.jaxpr.eqns if e.primitive.name == "dot_general"]

    deriv.set_deriv_mode("matmul")
    try:
        for setting, expect in [("f32", jax.lax.Precision.HIGHEST),
                                ("high", jax.lax.Precision.HIGH)]:
            deriv.set_matmul_precision(setting)
            dots = dots_of(lambda a: deriv.grad_xy(a, proj), x)
            assert dots, "matmul backend should lower to dot_general"
            for e in dots:
                assert e.params["precision"] == (expect, expect), (setting, e.params)
        deriv.set_matmul_precision("bf16")
        dots = dots_of(lambda a: deriv.grad_xy(a, proj), x)
        for e in dots:
            assert e.invars[0].aval.dtype == jnp.bfloat16
            assert e.params["preferred_element_type"] == jnp.float32
    finally:
        deriv.set_matmul_precision("f32")

    # the matmul-DFT backend pins it too
    from cmblensing_tpu.ops import fft as _fft
    dots = dots_of(lambda a: _fft._matmul_irfft2(_fft._matmul_rfft2(a), 16), x)
    assert dots
    for e in dots:
        assert e.params["precision"] == (jax.lax.Precision.HIGHEST,) * 2


def test_div_plus_dij_backends_agree():
    """The regrouped delta-phi accumulation (div + sum_ij d_i d_j)
    agrees between the matmul and FFT backends and with the
    unregrouped primitives."""
    proj = ProjLambert(16, 16, thetapix=3, T=np.float32)
    key = jax.random.PRNGKey(4)
    ux, uy, s0, s1, s2, s3 = jax.random.normal(key, (6, 16, 16))
    outs = {}
    for mode in ["fft", "matmul"]:
        deriv.set_deriv_mode(mode)
        outs[mode] = deriv.div_plus_dij(ux, uy, s0, s1, s2, s3, proj)
        # unregrouped reference composition
        d = deriv.div_xy(ux[None], uy[None], proj)[0]
        dij = deriv.dij_sum(jnp.stack([s0, s1, s2, s3]), proj)[0]
        ref = d + dij
        rel = float(jnp.max(jnp.abs(outs[mode] - ref))
                    / (jnp.max(jnp.abs(ref)) + 1e-30))
        assert rel < 5e-3, (mode, rel)
    rel = float(jnp.max(jnp.abs(outs["fft"] - outs["matmul"]))
                / (jnp.max(jnp.abs(outs["fft"])) + 1e-30))
    assert rel < 5e-3, rel


def test_flow_kernel_policy_by_size():
    """Locks the measured backend policy: fused whole-flow kernels only
    where the whole backward integration fits VMEM (<=~512^2);
    scan-equivalent above; never for batched/vmapped states."""
    from cmblensing_tpu.ops import pallas_lenseflow as plf
    from cmblensing_tpu.models.lenseflow import _resolve_backend

    class _P:  # minimal proj stand-in for the fit formulas
        def __init__(self, n): self.Ny = self.Nx = n

    arr = jnp.zeros((2, 8, 8), jnp.float32)
    # whole-flow kernels available through ~512^2 (the flow-fit boundary)
    assert plf._flow_fits("backward", 5, 512, 512, np.float32)
    assert not plf._flow_fits("backward", 5, 1024, 1024, np.float32)
    # the component-gridded fa kernel covers forward/adjoint at 1024^2
    # (backward lowers to the optimized scan inside the pallas path)
    assert plf._fa_fits(1024, 1024, np.float32)
    assert not plf._fa_fits(2048, 2048, np.float32)
    # auto backend: 'pallas' while any fused kernel actually runs
    assert _resolve_backend(arr, _P(512), 5) == "pallas"
    assert _resolve_backend(arr, _P(1024), 5) == "pallas"
    assert _resolve_backend(arr, _P(2048), 5) == "scan"
    assert _resolve_backend(arr, _P(4096), 5) == "scan"


def test_factored_backend_agrees():
    """The MXU-factored circulant backend (radix-B block
    diagonalization, ops/factored_deriv.py) matches fft/matmul at f32
    tolerance on every primitive, at a size where the radix engages
    (512 -> B=2) and a size where it degenerates to dense (16 -> B=1)."""
    for N in (512, 16):
        proj = ProjLambert(N, N, thetapix=3, T=np.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, N, N))
        outs = {}
        for mode in ["fft", "factored"]:
            deriv.set_deriv_mode(mode)
            gx, gy = deriv.grad_xy(x, proj)
            d = deriv.div_xy(gx, gy, proj)
            (hx, hy), (hxx, hxy, hyy) = deriv.gradhess(x[:1], proj)
            dp = deriv.div_plus_dij(x[0], x[1], x[0], x[1], x[0], x[1], proj)
            outs[mode] = (gx, gy, d, hx, hy, hxx, hxy, hyy, dp)
        for a, b in zip(outs["fft"], outs["factored"]):
            rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-30))
            assert rel < 5e-5, (N, rel)


def test_factored_batched_matches_unrolled():
    """The batched-block factored apply (constant HLO-op count, the
    4096^2 compile-tractability fix — ops/factored_deriv.py::
    _apply_factored_batched) is the SAME linear operator as the
    unrolled form, exactly in f64, at every radix incl. the B=16 the
    4096^2 path uses."""
    from cmblensing_tpu.ops.factored_deriv import (
        _factored_ops, _apply_factored, _apply_factored_batched)
    prec = jax.lax.Precision.HIGHEST
    rng = np.random.RandomState(0)
    with jax.enable_x64(True):
        for N, B in [(64, 8), (64, 16), (64, 32), (256, 4), (128, 2)]:
            for op in _factored_ops(N, 1.3, "float64", B):
                # fresh per-dtype cache entries keep x64 leaves here
                op._jcache = None
                op._jbcache = None
                x = jnp.asarray(rng.randn(3, N, N))
                for side in ("x", "y"):
                    a = _apply_factored(x, op, prec, side)
                    b = _apply_factored_batched(x, op, prec, side)
                    err = float(jnp.max(jnp.abs(a - b))
                                / jnp.max(jnp.abs(a)))
                    assert err < 1e-12, (N, B, side, err)
                op._jcache = None
                op._jbcache = None


def test_factored_radix_policy():
    """Locks the measured radix policy: A = N/B >= 256, except the
    measured A=128 win at N=1024 (v5e r4: fa apply 4.35 vs 4.97 ms,
    backward scan 11.7 vs 12.66 at B=8 vs 4)."""
    assert deriv._pick_B_measured(1024) == 8
    assert deriv._pick_B_measured(2048) == 8
    assert deriv._pick_B_measured(4096) == 16
    assert deriv._pick_B_measured(512) == 2
    assert deriv._pick_B_measured(256) == 1
    assert deriv._pick_B_measured(48) == 1


def test_bwd_radix_table():
    """The backward-flow trace prefers smaller blocks at >= 2048
    (measured v5e: 2048^2 bwd 114.7 ms B=16 vs 129.8 B=8; 4096^2
    695 ms B=32 vs 833 B=16); env override still wins."""
    def eff_B(n):
        # what _fops would pick inside the ctx
        B = deriv._pick_B_measured(n)
        import os
        if deriv._BWD_TRACE and not os.environ.get("CMBL_RADIX_B"):
            B = deriv._BWD_RADIX_TABLE.get(n, B)
        return B

    assert not deriv._BWD_TRACE
    with deriv.bwd_radix_ctx():
        assert deriv._BWD_TRACE
        assert eff_B(2048) == 16
        assert eff_B(4096) == 32
        assert eff_B(1024) == 8      # table silent -> forward policy
        assert eff_B(256) == 1
    assert not deriv._BWD_TRACE


def test_pallas_factored_inkernel_matches_dense():
    """The factored in-kernel derivative closures (_fact_apply through
    a pallas interpreter kernel) match the dense in-kernel matmuls."""
    from cmblensing_tpu.ops import pallas_lenseflow as plf
    from cmblensing_tpu.ops.factored_deriv import _factored_ops
    if not plf._HAS_PALLAS:
        pytest.skip("no pallas")
    from jax.experimental import pallas as pl

    N, B = 64, 2
    delta = 0.01
    op = _factored_ops(N, delta, "float32", B)[0]
    FXt = jnp.asarray(plf._pack_factored(op, True))
    FY = jnp.asarray(plf._pack_factored(op, False))
    fmeta = ((B, op.A, op.Rf, op.Ri), (B, op.A, op.Rf, op.Ri))
    DxT, Dy = plf._mats_for(ProjLambert(N, N, thetapix=delta / np.pi * 180 * 60,
                                        T=np.float32), np.float32)

    x = jax.random.normal(jax.random.PRNGKey(0), (N, N), jnp.float32)

    def kern_fact(x_ref, fx_ref, fy_ref, o_ref):
        ddx, ddy = plf._make_dd_any(fx_ref[:], fy_ref[:], "f32", fmeta)
        o_ref[0] = ddx(x_ref[:])
        o_ref[1] = ddy(x_ref[:])

    def kern_dense(x_ref, fx_ref, fy_ref, o_ref):
        ddx, ddy = plf._make_dd_any(fx_ref[:], fy_ref[:], "f32", None)
        o_ref[0] = ddx(x_ref[:])
        o_ref[1] = ddy(x_ref[:])

    out_f = pl.pallas_call(
        kern_fact, out_shape=jax.ShapeDtypeStruct((2, N, N), jnp.float32),
        interpret=True)(x, FXt, FY)
    # dense comparison uses the FactoredOp's own circulant for an
    # apples-to-apples operator (same delta)
    from cmblensing_tpu.ops.deriv import _deriv_matrices
    D1 = _deriv_matrices(N, delta, "float32")[0]
    out_d = pl.pallas_call(
        kern_dense, out_shape=jax.ShapeDtypeStruct((2, N, N), jnp.float32),
        interpret=True)(x, jnp.asarray(D1.T.copy()), jnp.asarray(D1))
    rel = float(jnp.max(jnp.abs(out_f - out_d)) / (jnp.max(jnp.abs(out_d)) + 1e-30))
    assert rel < 5e-6, rel


def test_factored_policy_precision_aware():
    """auto backend: factored only at strict f32 (measured: factored
    wins f32 57.6 vs 78.9 ms; dense wins 'high' 42.4 vs 45.8 ms at
    1024^2 on v5e)."""

    class _P:
        Ny = Nx = 1024

    # force the "on accelerator" branch by passing no array and
    # monkeypatching the platform check
    orig = deriv._default_platform_is_accel
    deriv._default_platform_is_accel = lambda: True
    try:
        assert deriv._backend(_P) == "factored"
        with deriv.precision_ctx("high"):
            assert deriv._backend(_P) == "matmul"
        assert deriv._backend(_P) == "factored"
    finally:
        deriv._default_platform_is_accel = orig


def test_backend_policy_by_size():
    """The auto policy per size on an accelerator, strict f32 (measured
    on v5e forward/backward flow: 2048^2 35.0/131.6 ms factored vs
    149.5/356.1 fft; 4096^2 298.6/833.0 factored-batched vs 948/1886
    fft — compile-tractable since r4's batched-block apply):

        256 -> matmul, 512..4096 -> factored, 8192+ -> fft."""
    orig = deriv._default_platform_is_accel
    deriv._default_platform_is_accel = lambda: True
    try:
        for n, want in [(256, "matmul"), (512, "factored"),
                        (1024, "factored"), (2048, "factored"),
                        (4096, "factored"), (8192, "fft")]:
            class _P:
                Ny = Nx = n
            assert deriv._backend(_P) == want, (n, deriv._backend(_P))
        # the cap is a knob (CMBL_FACTORED_MAX at import; module var)
        prev_max = deriv._FACTORED_MAX
        try:
            deriv._FACTORED_MAX = 8192

            class _P4:
                Ny = Nx = 8192
            assert deriv._backend(_P4) == "factored"
        finally:
            deriv._FACTORED_MAX = prev_max
    finally:
        deriv._default_platform_is_accel = orig


def test_lenseflow_go_pin_uses_full_policy():
    """LenseFlow pins the deriv mode host-side before tracing (tracers
    can't reveal placement); the pin must follow the SAME policy as
    _backend — in particular the factored path at 1024^2 f32 (a
    regression: the pin predated the factored backend and silently
    forced 'matmul')."""
    from cmblensing_tpu.core import field as F
    from cmblensing_tpu.core.basis import MAP, QU_MAP
    from cmblensing_tpu.models.lenseflow import LenseFlow

    N = 64
    proj = ProjLambert(N, N, thetapix=3, T=np.float32)
    f = F.Field(jnp.zeros((2, N, N), jnp.float32), QU_MAP, proj)
    phi = F.Field(jnp.zeros((1, N, N), jnp.float32), MAP, proj)

    seen = {}
    real_ctx = deriv.mode_ctx

    def spy_ctx(mode):
        seen["mode"] = mode
        return real_ctx(mode)

    orig_accel = deriv._arr_on_accel
    orig_ctx = deriv.mode_ctx
    deriv._arr_on_accel = lambda a: True
    deriv.mode_ctx = spy_ctx   # _go resolves mode_ctx via the module
    try:
        # N=64: no radix pays -> matmul
        _ = LenseFlow(phi, 2) @ f
        assert seen["mode"] == "matmul", seen
    finally:
        deriv._arr_on_accel = orig_accel
        deriv.mode_ctx = orig_ctx

    # and the pure policy resolution at 1024 f32 is 'factored'
    class _P:
        Ny = Nx = 1024
    orig = deriv._default_platform_is_accel
    deriv._default_platform_is_accel = lambda: True
    try:
        assert deriv._backend(_P) == "factored"
    finally:
        deriv._default_platform_is_accel = orig
