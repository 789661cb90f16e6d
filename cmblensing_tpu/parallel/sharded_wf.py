"""Spatially-sharded Wiener filter on real DataSets.

Composes the pencil FFTs (parallel/sharded_fft.py) with the sharded
LenseFlow (parallel/spatial.py) into the lensed Gaussian solve the
inference layer runs per posterior step (argmaxf_logpdf,
reference src/maximization.jl:30-40):

    (Cf^-1 + L^H (MB)^H Cn^-1 (MB) L) f  =  L^H (MB)^H Cn^-1 d

entirely on maps whose Ny axis is sharded over a device mesh: the
covariance/beam/transfer applies are EB-Fourier-diagonal multiplies in
the kx-sharded pencil layout (QU->EB rotation is elementwise there),
the lensing runs as the shard_map flow, and the CG iterates never
materialize a full map on any device. The reference has no analog —
its fields, FFTs, and solves are all single-device.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.field import Field
from ..core.basis import Basis
from ..core.ops import Diag
from ..ops.solvers import conjugate_gradient
from .spatial import ShardedLenseFlow, shard_spatial
from .sharded_fft import (rfft2_sharded, irfft2_sharded, pad_multiplier,
                          fourier_diag_apply_sharded)


def _safe_inv(x):
    return jnp.where(x > 0, 1.0 / jnp.where(x > 0, x, 1.0), 0.0)


def _pad_grids(proj, mesh, axis_name, *grids):
    return [pad_multiplier(jnp.asarray(g), mesh, axis_name) for g in grids]


class ShardedEBDiag:
    """An EB-Fourier-diagonal operator applied to y-sharded QU maps:
    pencil rfft2 -> QU->EB rotation (elementwise in the kx-sharded
    layout) -> per-mode multiply -> EB->QU rotation -> pencil irfft2.
    The rotation is orthogonal, and the padded kx columns stay exactly
    zero end-to-end."""

    def __init__(self, mult_eb, proj, mesh, axis_name="sp",
                 batch_axis=None):
        self.mesh, self.axis_name = mesh, axis_name
        self.batch_axis = batch_axis
        self.proj = proj
        self.mE, self.mB, self.c2, self.s2 = _pad_grids(
            proj, mesh, axis_name, mult_eb[0], mult_eb[1],
            proj.cos2phi, proj.sin2phi)

    def __call__(self, arr_qu):
        X = rfft2_sharded(arr_qu, self.mesh, self.axis_name,
                          self.batch_axis)
        Ql, Ul = X[..., 0, :, :], X[..., 1, :, :]
        El = -Ql * self.c2 - Ul * self.s2
        Bl = Ql * self.s2 - Ul * self.c2
        El = El * self.mE
        Bl = Bl * self.mB
        Qo = -El * self.c2 + Bl * self.s2
        Uo = -El * self.s2 - Bl * self.c2
        out = jnp.stack([Qo, Uo], axis=-3)
        return irfft2_sharded(out, arr_qu.shape[-1], self.mesh,
                              self.axis_name, self.batch_axis)


def _eb_diag_grids(op, name):
    """(2, Ny, Kx) EB-Fourier diagonal grids of a Diag operator."""
    if not isinstance(op, Diag):
        raise NotImplementedError(
            f"sharded_wiener_filter needs {name} to be a (EB-)Fourier "
            f"Diag operator; got {type(op).__name__}")
    d = op.diag
    if not d.basis.is_fourier:
        raise NotImplementedError(f"{name} must be Fourier-diagonal")
    arr = jnp.asarray(d.arr)
    if arr.ndim == 2:
        arr = jnp.stack([arr, arr])
    if jnp.iscomplexobj(arr):
        arr = jnp.real(arr)
    return arr


def _split_M(op):
    """Decompose ds.M into (EB-Fourier grids, pixel-mask map or None).
    load_sim builds masked datasets as LazyOp('*', Mfourier, Mpix)
    (models/dataset.py::load_sim) — the Fourier leg joins the diagonal
    sandwich, the pixel leg stays a LOCAL elementwise multiply on
    y-sharded maps (zero communication)."""
    from ..core.ops import LazyOp
    if isinstance(op, LazyOp) and op.kind == "*":
        fourX = isinstance(op.X, Diag) and op.X.diag.basis.is_fourier
        pixY = isinstance(op.Y, Diag) and op.Y.diag.basis.is_map
        if fourX and pixY:
            return _eb_diag_grids(op.X, "M"), jnp.asarray(op.Y.diag.arr)
        # the sharded sandwich hard-codes mask-innermost (Mf @ (m @ x));
        # a mask-OUTERMOST product is a different, non-commuting
        # operator — refuse rather than silently solve the wrong system
        pixX = isinstance(op.X, Diag) and op.X.diag.basis.is_map
        fourY = isinstance(op.Y, Diag) and op.Y.diag.basis.is_fourier
        if pixX and fourY:
            raise NotImplementedError(
                "sharded solve supports M = Mfourier * Mpix (mask applied "
                "innermost, as load_sim builds); got the mask as the "
                "OUTER leg, which is a different operator")
    return _eb_diag_grids(op, "M"), None


def sharded_wiener_filter(ds, phi: Field, mesh, axis_name="sp",
                          batch_axis=None, theta=None, d=None,
                          nsteps=100, tol=1e-8, nsteps_flow=7, jit=True,
                          fstart=None):
    """argmaxf_logpdf for spatially-sharded maps: solve the lensed
    Wiener filter of `ds` at fixed phi with every iterate y-sharded
    over `mesh`. ds's Cf/Cn/B must be Fourier-diagonal; M may
    additionally carry a pixel-mask leg (load_sim's
    LazyOp('*', Mfourier, Mpix)) — the mask is a LOCAL elementwise
    multiply on the y-sharded maps, zero extra communication. phi may
    be sharded (shard_spatial) or replicated. Returns
    (f_wf_QU_map_sharded, info).

    Preconditioned exactly like the single-device solve: the
    Fourier-diagonal Hessian (Cf^-1 + mean(mask^2) (MB)^2 / Cn)^-1 per
    EB mode. The whole solve runs as ONE jitted program (jit=True is
    also required for the CG while_loop to trace through the shard_map
    flow)."""
    from ..inference.maximization import _fid

    proj = phi.proj
    if theta:
        ds = ds.at(theta)
    Cf = _eb_diag_grids(_fid(ds.Cf), "Cf")
    Cn = _eb_diag_grids(ds.Cn, "Cn")
    Bm = _eb_diag_grids(_fid(ds.B), "B")
    Mm, mask = _split_M(_fid(ds.M))

    MB = Mm * Bm
    iCf = _safe_inv(Cf)
    iCn = _safe_inv(Cn)
    # Fourier-diagonal Hessian preconditioner (ill-conditioned modes
    # where both terms vanish get 0 — they are absent from b too)
    m2bar = 1.0 if mask is None else jnp.mean(mask ** 2)
    prec = _safe_inv(iCf + m2bar * MB * MB * iCn)
    # masked legs: d = Mf (mask (B L f)) + n  (load_sim's M = Mf * Mpix),
    # so the sandwich is B^T mask (Mf^2 Cn^-1) mask B and the data term
    # B^T mask (Mf Cn^-1) d — Mf^2 Cn^-1 / Mf Cn^-1 fuse into single
    # EB-diag grids
    grids = (iCf, MB * iCn, MB * iCn * MB, prec,
             Bm, Mm * Mm * iCn, Mm * iCn)

    if d is None:
        d = ds.d
    d_qu = d.to(Basis("QU", "map"))
    d_sh = shard_spatial(d_qu, mesh, axis_name, batch_axis).arr
    phi_m = phi.to(phi.basis.with_space("map"))
    QU = Basis("QU", "map")
    if mask is not None:
        mask = shard_spatial(Field(mask, Basis("I", "map"), proj), mesh,
                             axis_name).arr

    if jit:
        # module-level jit keyed on the STATIC solve shape: repeated
        # calls (MAP steps, Gibbs passes) hit the same compile cache
        # instead of re-tracing the whole CG-over-LenseFlow program
        run = _swf_run_jit
    else:
        run = _swf_run
    x, info = run(grids, d_sh, phi_m.arr, mask, mesh=mesh,
                  axis_name=axis_name, batch_axis=batch_axis,
                  nsteps=int(nsteps), tol=float(tol),
                  nsteps_flow=int(nsteps_flow), proj=proj,
                  phi_basis=phi_m.basis)
    return Field(x, QU, proj), info


def _swf_run(grids, d_sh, phi_arr, mask, *, mesh, axis_name, batch_axis,
             nsteps, tol, nsteps_flow, proj, phi_basis):
    QU = Basis("QU", "map")
    (op_iCf, op_MBiCn, op_NL, op_prec, op_B, op_Mf2iCn,
     op_MfiCn) = (ShardedEBDiag(g, proj, mesh, axis_name, batch_axis)
                  for g in grids)
    L = ShardedLenseFlow(Field(phi_arr, phi_basis, proj),
                         nsteps=nsteps_flow, mesh=mesh,
                         axis_name=axis_name, batch_axis=batch_axis)

    if mask is None:
        # fused sandwich: ONE EB-diag apply per likelihood term
        def NL(y):
            return op_NL(y)

        def bterm(dd):
            return op_MBiCn(dd)
    else:
        # B^T mask (Mf^2 Cn^-1) mask B: beam/transfer in the pencil
        # layout, the pixel mask as a local map-space multiply
        def NL(y):
            return op_B(mask * op_Mf2iCn(mask * op_B(y)))

        def bterm(dd):
            return op_B(mask * op_MfiCn(dd))

    def A(a):
        return op_iCf(a) + (L.H @ Field(
            NL((L @ Field(a, QU, proj)).arr), QU, proj)).arr

    b = (L.H @ Field(bterm(d_sh), QU, proj)).arr
    x, info = conjugate_gradient(op_prec, A, b, nsteps=nsteps, tol=tol)
    # keep the result y-sharded on the way out of the jit
    from jax.sharding import NamedSharding
    from .spatial import _yspec
    sh = NamedSharding(mesh, _yspec(x.ndim, axis_name, batch_axis))
    return jax.lax.with_sharding_constraint(x, sh), info


from functools import partial as _partial

_swf_run_jit = _partial(jax.jit, static_argnames=(
    "mesh", "axis_name", "batch_axis", "nsteps", "tol", "nsteps_flow",
    "proj", "phi_basis"))(_swf_run)


# =========================================================================
# joint MAP on sharded maps
# =========================================================================

def _lensing_quadforms(ds, mesh, axis_name, batch_axis):
    """Shared appliers for the sharded logpdf/MAP: EB-diag Cn^-1 and
    Cf^-1, and the forward response fwd(x) = M B x (with the pixel-mask
    leg, when present, as a local map-space multiply)."""
    from ..inference.maximization import _fid

    if getattr(ds, "logprior", None) is not None:
        raise NotImplementedError(
            "sharded logpdf/MAP/HMC do not evaluate ds.logprior (it may "
            "depend on f/phi); drop it or use the single-device path")
    Cf = _eb_diag_grids(_fid(ds.Cf), "Cf")
    Cn = _eb_diag_grids(ds.Cn, "Cn")
    Bm = _eb_diag_grids(_fid(ds.B), "B")
    Mm, mask = _split_M(_fid(ds.M))
    proj = _fid(ds.Cf).diag.proj
    mk = lambda g: ShardedEBDiag(g, proj, mesh, axis_name, batch_axis)
    if mask is None:
        op_MB = mk(Mm * Bm)
        fwd = op_MB
    else:
        op_B, op_Mf = mk(Bm), mk(Mm)
        mask_sh = shard_spatial(Field(jnp.asarray(mask), Basis("I", "map"),
                                      proj), mesh, axis_name).arr
        fwd = lambda x: op_Mf(mask_sh * op_B(x))
    return dict(
        iCn=mk(_safe_inv(Cn)), iCf=mk(_safe_inv(Cf)), MB=fwd,
        proj=proj)


def sharded_lensing_logpdf(ds, f: Field, phi: Field, mesh, axis_name="sp",
                           batch_axis=None, nsteps_flow=7, _ops=None):
    """The (f, phi) lensing posterior density evaluated on y-sharded
    maps — equal to ds.logpdf(f=f, phi=phi) up to the (f, phi)-
    independent logdet constants (reference dataset.jl mixed posterior;
    every dot reduces with a cross-shard psum)."""
    from ..core.field import dot as fdot
    from ..inference.maximization import _fid

    ops = _ops or _lensing_quadforms(ds, mesh, axis_name, batch_axis)
    proj = ops["proj"]
    QU = Basis("QU", "map")
    L = ShardedLenseFlow(phi, nsteps=nsteps_flow, mesh=mesh,
                         axis_name=axis_name, batch_axis=batch_axis)
    d_qu = ds.d.to(QU)
    Lf = (L @ f).arr
    r = Field(d_qu.arr - ops["MB"](Lf), QU, proj)
    chi2 = fdot(r, Field(ops["iCn"](r.arr), QU, proj))
    pri_f = fdot(f, Field(ops["iCf"](f.arr), QU, proj))
    iCphi = _safe_inv(jnp.real(jnp.asarray(_fid(ds.Cphi).diag.arr)))
    icp = pad_multiplier(iCphi, mesh, axis_name)
    pri_p = fdot(phi, fourier_diag_apply_sharded(icp, phi, mesh, axis_name,
                                                 batch_axis))
    return -0.5 * (chi2 + pri_f + pri_p)


def sharded_MAP_joint(ds, mesh, axis_name="sp", batch_axis=None, nsteps=5,
                      cg_nsteps=50, cg_tol=1e-8, nsteps_flow=7, ngrid=9,
                      alpha_max=2.0, progress=False):
    """Joint MAP on spatially-sharded maps: alternate the sharded
    Wiener filter f-step with a Cphi/Nphi-preconditioned phi gradient
    ascent + grid line search, every array y-sharded over the mesh
    (the sharded analog of MAP_joint's coordinate descent,
    src/maximization.jl:116-233). Demonstration-grade: unmixed
    parametrization, fixed line-search grid. Returns
    dict(f=..., phi=..., history=[logpdf per step])."""
    from ..inference.maximization import _fid

    if isinstance(ds.d, Field) and ds.d.batch_shape:
        raise NotImplementedError(
            "sharded_MAP_joint optimizes ONE phi; batched data would "
            "need per-entry phis and line-search alphas (as MAP_joint "
            "does) — run per-entry, or use sharded_wiener_filter which "
            "does support the batched 2-D mesh")
    ops = _lensing_quadforms(ds, mesh, axis_name, batch_axis)
    proj = ops["proj"]
    I_MAP = Basis("I", "map")

    # phi-step preconditioner: the Fourier-diagonal phi Hessian
    # (Cphi^-1 + Nphi^-1)^-1 (maximization.jl's Hpre)
    Cphi = jnp.real(jnp.asarray(_fid(ds.Cphi).diag.arr))
    if getattr(ds, "Nphi", None) is not None:
        Nphi = jnp.real(jnp.asarray(_fid(ds.Nphi).diag.arr))
        Hpre = _safe_inv(_safe_inv(Cphi) + _safe_inv(Nphi))
    else:
        Hpre = Cphi
    hpre_p = pad_multiplier(Hpre, mesh, axis_name)

    from jax.sharding import NamedSharding
    from .spatial import _yspec
    ysh = NamedSharding(mesh, _yspec(3, axis_name, batch_axis))
    phi = Field(jax.device_put(jnp.zeros((1, proj.Ny, proj.Nx), proj.T.type),
                               ysh), I_MAP, proj)

    def lp(f, phi):
        return sharded_lensing_logpdf(ds, f, phi, mesh, axis_name,
                                      batch_axis, nsteps_flow, _ops=ops)

    @jax.jit
    def phi_step(f, phi):
        g = jax.grad(lambda p: jnp.sum(lp(f, p)))(phi)
        h = fourier_diag_apply_sharded(hpre_p, g, mesh, axis_name,
                                       batch_axis)
        # 0 plus a log-spaced grid: robust to the step scale (a linear
        # grid can straddle a small optimum and null every step);
        # non-positive alpha_max degrades to the all-zero grid instead
        # of NaNs from log10
        amax = max(float(alpha_max), 0.0)
        if amax > 0:
            tail = jnp.logspace(np.log10(amax) - 2.5, np.log10(amax),
                                ngrid - 1, dtype=jnp.float32)
        else:
            tail = jnp.zeros((ngrid - 1,), jnp.float32)
        alphas = jnp.concatenate([jnp.zeros((1,), jnp.float32), tail])

        def eval_alpha(_, a):
            return None, jnp.sum(lp(f, Field(phi.arr + a * h.arr,
                                             I_MAP, proj)))

        _, lps = jax.lax.scan(eval_alpha, None, alphas)
        best = jnp.argmax(lps)
        return (Field(phi.arr + alphas[best] * h.arr, I_MAP, proj),
                lps[best], alphas[best])

    history = []
    f = None
    for step in range(nsteps):
        f, _ = sharded_wiener_filter(ds, phi, mesh, axis_name, batch_axis,
                                     nsteps=cg_nsteps, tol=cg_tol,
                                     nsteps_flow=nsteps_flow)
        phi, lpv, alpha = phi_step(f, phi)
        history.append(dict(logpdf=float(lpv), alpha=float(alpha)))
        if progress:
            print(f"sharded_MAP_joint step {step + 1}: logpdf={float(lpv):.6g} "
                  f"alpha={float(alpha):.3g}", flush=True)
    return dict(f=f, phi=phi, history=history)


def sharded_sample_f(key, ds, phi: Field, mesh, axis_name="sp",
                     batch_axis=None, theta=None, **wf_kwargs):
    """Posterior sample of f on y-sharded maps via the constrained-
    simulation trick (reference src/maximization.jl:56-62): simulate
    (f_sim, d_sim) at phi, sharded-Wiener-filter the residual data
    d - d_sim, and add f_sim back. The CG solve — the expensive part —
    runs fully sharded; the one-FFT simulation is generated replicated
    and then sharded. Same key => same sample as inference.sample_f
    (the sharded b is linear in d, so the residual solve IS the
    offset=True solve)."""
    if phi is None:
        raise ValueError("sharded_sample_f needs an explicit phi (the "
                         "solve is conditioned on it); pass a zero map "
                         "for the unlensed conditional")
    theta = theta or {}
    sim = ds.simulate(key, theta=theta, phi=phi)
    dres = ds.d - sim["d"]
    df, info = sharded_wiener_filter(ds, phi, mesh, axis_name, batch_axis,
                                     theta=theta, d=dres, **wf_kwargs)
    QU = Basis("QU", "map")
    f_sim = shard_spatial(sim["f"].to(QU), mesh, axis_name, batch_axis)
    return Field(f_sim.arr + df.arr, QU, df.proj), info


def sharded_hmc_phi_step(key, ds, f: Field, phi: Field, mesh,
                         axis_name="sp", batch_axis=None, Lambda=None,
                         N=25, eps=0.01, nsteps_flow=7,
                         always_accept=False):
    """One HMC step on phi with f fixed, entirely on y-sharded maps
    (the sharded analog of inference.sampling.hmc_step,
    src/sampling.jl:405-419): mass-matrix solves are pencil
    Fourier-diagonal applies, the potential gradient flows through the
    shard_map lensing adjoint, and the leapfrog is one jitted
    lax.scan. The momentum draw replicates inference.hmc_step's
    exactly (same key => same trajectory => same accept)."""
    from ..inference.sampling import mass_matrix_phi
    from ..core.ops import simulate_op
    from ..core.field import dot as fdot

    ops = _lensing_quadforms(ds, mesh, axis_name, batch_axis)
    proj = ops["proj"]
    if Lambda is None:
        Lambda = mass_matrix_phi({}, ds)
    lam = jnp.real(jnp.asarray(Lambda.diag.arr))
    inv_lam = pad_multiplier(_safe_inv(lam), mesh, axis_name)

    def U(p):
        # per-batch log-posterior (sharded_lensing_logpdf's dots return
        # per-batch scalars)
        return sharded_lensing_logpdf(ds, f, p, mesh, axis_name,
                                      batch_axis, nsteps_flow, _ops=ops)

    U_grad = jax.grad(lambda x: jnp.sum(U(x)))

    def solve(parr):
        return fourier_diag_apply_sharded(
            inv_lam, Field(parr, phi.basis, proj), mesh, axis_name,
            batch_axis).arr

    k1, k2 = jax.random.split(key)
    p0 = simulate_op(k1, Lambda, batch_shape=phi.batch_shape).to(phi.basis)
    p0 = shard_spatial(p0, mesh, axis_name, batch_axis)

    # (the trajectory re-traces per call — fine for one-off steps; the
    # loop-heavy WF solve is the module-level-cached one)
    @jax.jit
    def traj(phi_arr, p_arr):
        x0 = Field(phi_arr, phi.basis, proj)

        def energy(xa, pa):
            # per-batch H: both the potential and the kinetic quad are
            # per-batch scalars
            quad = fdot(Field(pa, phi.basis, proj),
                        Field(solve(pa), phi.basis, proj))
            return U(Field(xa, phi.basis, proj)) - quad / 2

        def step(carry, _):
            xa, pa, gU = carry
            x1 = xa - eps * solve(pa - (eps / 2) * gU)
            gU1 = U_grad(Field(x1, phi.basis, proj)).arr
            p1 = pa - (eps / 2) * (gU1 + gU)
            return (x1, p1, gU1), None

        g0 = U_grad(x0).arr
        (xa, pa, _), _ = jax.lax.scan(step, (phi_arr, p_arr, g0), None,
                                      length=N)
        dH = energy(xa, pa) - energy(phi_arr, p_arr)
        return xa, dH

    xt, dH = traj(phi.arr, p0.arr)
    logu = jnp.log(jax.random.uniform(k2, shape=jnp.shape(dH)))
    accept = jnp.logical_or(always_accept, logu < dH)
    # per-batch accept: broadcast against the field's trailing axes
    from ..core.field import batch_broadcast
    acc = batch_broadcast(jnp.asarray(accept, phi.arr.dtype),
                          Field(phi.arr, phi.basis, proj))
    x_new = Field(acc * xt + (1 - acc) * phi.arr, phi.basis, proj)
    return x_new, dH, accept


def sharded_gibbs_pass(key, ds, phi: Field, mesh, axis_name="sp",
                       batch_axis=None, cg_nsteps=50, cg_tol=1e-8,
                       hmc_N=25, hmc_eps=0.01, nsteps_flow=7,
                       Lambda=None):
    """One Gibbs pass of sample_joint's core alternation
    (src/sampling.jl:180-335) on y-sharded maps: draw
    f ~ P(f | phi, d) by the sharded constrained realization, then
    phi ~ P(phi | f, d) by one sharded HMC step. Returns
    (f, phi, info)."""
    kf, kp = jax.random.split(key)
    f, wf_info = sharded_sample_f(kf, ds, phi, mesh, axis_name, batch_axis,
                                  nsteps=cg_nsteps, tol=cg_tol,
                                  nsteps_flow=nsteps_flow)
    phi_new, dH, accept = sharded_hmc_phi_step(
        kp, ds, f, phi.to(phi.basis.with_space("map")), mesh, axis_name,
        batch_axis, Lambda=Lambda, N=hmc_N, eps=hmc_eps,
        nsteps_flow=nsteps_flow)
    return f, phi_new, dict(cg_iters=wf_info["iterations"], dH=dH,
                            accept=accept)


def sharded_sample_joint(key, ds, mesh, nsamps=100, axis_name="sp",
                         batch_axis=None, cg_nsteps=50, cg_tol=1e-8,
                         hmc_N=25, hmc_eps=0.01, nsteps_flow=7,
                         Lambda=None, phistart=None, filename=None,
                         resume=False, nfilewrite=10, nsavemaps=10,
                         progress=False):
    """Gibbs chain on spatially-sharded maps: repeated
    sharded_gibbs_pass (f by constrained realization, phi by HMC) with
    the same native CRC-checkpoint/resume machinery as sample_joint
    (reference src/sampling.jl:180-335). Per-step scalars (logpdf, dH,
    accept, cg_iters) are recorded every step; the phi map (gathered to
    host) every `nsavemaps` steps. Returns inference.chains.Chains."""
    import pickle
    from ..inference.chains import Chains
    from ..utils.transfer import device_get_safe
    from jax.sharding import NamedSharding
    from .spatial import _yspec

    ops = _lensing_quadforms(ds, mesh, axis_name, batch_axis)
    proj = ops["proj"]
    I_MAP = Basis("I", "map")
    ysh = NamedSharding(mesh, _yspec(3, axis_name, batch_axis))

    start_step = 0
    if phistart is not None:
        phi = phistart.to(I_MAP)
    else:
        phi = Field(jax.device_put(
            jnp.zeros((1, proj.Ny, proj.Nx), proj.T.type), ysh), I_MAP, proj)

    ckpt = f"{filename}.ckpt" if filename else None
    if ckpt and resume:
        import os as _os
        if _os.path.exists(ckpt):
            from ..native import read_records
            recs = read_records(ckpt)
            if recs:
                payload = pickle.loads(recs[-1])
                st = payload["state"]
                phi = Field(jax.device_put(jnp.asarray(st["phi"]), ysh),
                            I_MAP, proj)
                key = jnp.asarray(st["key"])   # raw uint32 key data
                start_step = int(st["step"])

    writer = None
    if ckpt:
        from ..native import CheckpointWriter
        writer = CheckpointWriter(ckpt, append=bool(resume))

    chain, chunk = [], []
    f = None
    try:
        for step in range(start_step + 1, nsamps + 1):
            key, sk = jax.random.split(key)
            f, phi, info = sharded_gibbs_pass(
                sk, ds, phi, mesh, axis_name, batch_axis,
                cg_nsteps=cg_nsteps, cg_tol=cg_tol, hmc_N=hmc_N,
                hmc_eps=hmc_eps, nsteps_flow=nsteps_flow, Lambda=Lambda)
            lp = sharded_lensing_logpdf(ds, f, phi, mesh, axis_name,
                                        batch_axis, nsteps_flow, _ops=ops)
            entry = dict(step=step,
                         logpdf=np.asarray(device_get_safe(lp)),
                         dH=np.asarray(device_get_safe(info["dH"])),
                         accept=np.asarray(device_get_safe(info["accept"])),
                         cg_iters=int(info["cg_iters"]))
            if step % nsavemaps == 0:
                entry["phi"] = np.asarray(device_get_safe(phi.arr))
            chain.append(entry)
            chunk.append(entry)
            if progress:
                print(f"sharded_sample_joint step {step}: "
                      f"logpdf={float(entry['logpdf']):.6g} "
                      f"accept={bool(np.all(entry['accept']))}", flush=True)
            if writer and (step % nfilewrite == 0 or step == nsamps):
                payload = dict(chunk=chunk, state=dict(
                    step=step,
                    phi=np.asarray(device_get_safe(phi.arr)),
                    key=np.asarray(device_get_safe(key))))
                writer.write(pickle.dumps(payload))
                chunk = []
    finally:
        if writer:
            writer.flush()
            writer.close()
    return Chains([chain])
