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
    # Fourier-diagonal Hessian preconditioner: the SAME operator the
    # single-device argmaxf_logpdf uses (hessian_f_preconditioner,
    # i.e. pinv(Cf) + B_hat' M_hat' pinv(Cn_hat) M_hat B_hat,
    # src/dataset.jl:129-132) so the two CG trajectories are identical
    # to roundoff (ill-conditioned modes where both terms vanish get 0
    # — they are absent from b too)
    from ..inference.maximization import hessian_f_preconditioner
    prec = _safe_inv(_eb_diag_grids(hessian_f_preconditioner(ds), "prec"))
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
    x0 = None
    if fstart is not None:
        x0 = shard_spatial(fstart.to(QU), mesh, axis_name, batch_axis).arr

    if jit:
        # module-level jit keyed on the STATIC solve shape: repeated
        # calls (MAP steps, Gibbs passes) hit the same compile cache
        # instead of re-tracing the whole CG-over-LenseFlow program
        run = _swf_run_jit
    else:
        run = _swf_run
    x, info = run(grids, d_sh, phi_m.arr, mask, x0, mesh=mesh,
                  axis_name=axis_name, batch_axis=batch_axis,
                  nsteps=int(nsteps), tol=float(tol),
                  nsteps_flow=int(nsteps_flow), proj=proj,
                  phi_basis=phi_m.basis)
    return Field(x, QU, proj), info


def _swf_run(grids, d_sh, phi_arr, mask, x0, *, mesh, axis_name, batch_axis,
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
    x, info = conjugate_gradient(op_prec, A, b, x0=x0, nsteps=nsteps, tol=tol)
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


class ShardedMixedCtx:
    """Precomputed sharded appliers for the MIXED parametrization
    (f°, phi°) = (L(phi) D f, G phi) with G = Id (MAP_joint pins G=Id —
    the MAP is invariant to it, maximization.jl:146): the sharded
    counterparts of mix/unmix/Mixed.logpdf (models/dataset.py:261-290,
    reference src/dataset.jl:84-117), every array y-sharded over the
    mesh. ds must already be evaluated at theta (ds.at(theta))."""

    def __init__(self, ds, mesh, axis_name="sp", batch_axis=None,
                 nsteps_flow=7):
        from ..core.ops import logdet, _Identity
        from ..inference.maximization import _fid

        if not isinstance(ds.G, _Identity):
            raise NotImplementedError(
                "sharded mixed parametrization supports G = Id only "
                "(MAP_joint itself pins G=Id; replace(G=Id) first)")
        self.mesh, self.axis_name = mesh, axis_name
        self.batch_axis, self.nsteps_flow = batch_axis, nsteps_flow
        self.ops = _lensing_quadforms(ds, mesh, axis_name, batch_axis)
        proj = self.proj = self.ops["proj"]
        mk = lambda g: ShardedEBDiag(g, proj, mesh, axis_name, batch_axis)
        Dop = _fid(ds.D)
        if isinstance(Dop, _Identity):
            self.D = self.Dinv = None
        else:
            Dg = _eb_diag_grids(Dop, "D")
            self.D, self.Dinv = mk(Dg), mk(_safe_inv(Dg))
        Cphi = jnp.real(jnp.asarray(_fid(ds.Cphi).diag.arr))
        self.icphi_pad = pad_multiplier(_safe_inv(Cphi), mesh, axis_name)
        # the (f, phi)-independent MvNormal normalizations of ds.logpdf
        # (-1/2 logdet each; models/distributions.py:51-54). logdet_rel
        # of D/G is 0 here: ds is concretized at theta
        self.logdet_const = -0.5 * (logdet(_fid(ds.Cf))
                                    + logdet(_fid(ds.Cphi))
                                    + logdet(ds.Cn))
        self.QU = Basis("QU", "map")
        self.d_sh = shard_spatial(ds.d.to(self.QU), mesh, axis_name,
                                  batch_axis).arr

    def flow(self, phi):
        return ShardedLenseFlow(phi, nsteps=self.nsteps_flow,
                                mesh=self.mesh, axis_name=self.axis_name,
                                batch_axis=self.batch_axis)

    def mix(self, f, phi):
        """(f, phi) -> (f_mix, phi_mix); G = Id so phi_mix = phi."""
        fD = Field(self.D(f.arr), self.QU, self.proj) if self.D else f
        return self.flow(phi) @ fD, phi

    def unmix(self, f_mix, phi_mix):
        phi = phi_mix
        fi = self.flow(phi).solve(f_mix)
        f = Field(self.Dinv(fi.arr), self.QU, self.proj) if self.Dinv else fi
        return f, phi

    def gaussian_residuals(self, f_mix, phi_mix):
        """The (z_i, Sigma_i^-1-applier) pairs of the mixed posterior's
        Gaussian terms (the sharded _mixed_gaussian_residuals,
        inference/maximization.py:298-310)."""
        from ..core.field import dot as fdot  # noqa: F401 (callers)
        f, phi = self.unmix(f_mix, phi_mix)
        ft = self.flow(phi) @ f
        rd = Field(self.d_sh - self.ops["MB"](ft.arr), self.QU, self.proj)
        return [(f, self._icf), (phi, self._icphi), (rd, self._icn)]

    # Sigma^-1 appliers on Fields
    def _icf(self, z):
        return Field(self.ops["iCf"](z.arr), z.basis, z.proj)

    def _icn(self, z):
        return Field(self.ops["iCn"](z.arr), z.basis, z.proj)

    def _icphi(self, z):
        return fourier_diag_apply_sharded(self.icphi_pad, z, self.mesh,
                                          self.axis_name, self.batch_axis)

    def mixed_logpdf(self, f_mix, phi_mix):
        """Mixed(ds).logpdf on sharded maps — INCLUDING the logdet
        normalizations, so values match the single-device
        Mixed.logpdf to roundoff (per batch entry)."""
        from ..core.field import dot as fdot
        quads = [fdot(z, icov(z)) for z, icov in
                 self.gaussian_residuals(f_mix, phi_mix)]
        return -0.5 * sum(quads) + self.logdet_const


def _sharded_grid_linesearch(ctx: ShardedMixedCtx, f_mix, phi_mix, dphi,
                             amax, ngrid):
    """The cancellation-free batched grid line search of MAP_joint
    (_jit_grid_linesearch, inference/maximization.py:313-380) on
    y-sharded maps: same steps^1.5 grid, same Delta-logpdf objective
        lp(a)-lp(0) = -1/2 sum_i <z_i(a)-z_i(0), S_i^-1 (z_i(a)+z_i(0))>,
    same per-batch argmax with the alpha=0 self-guard. Alphas evaluate
    sequentially (each trial is two sharded lensing flows)."""
    from ..core.field import dot as fdot

    rdt = phi_mix.arr.real.dtype
    steps = (jnp.arange(1, ngrid + 1, dtype=rdt) / ngrid) ** 1.5
    amax = jnp.asarray(amax, rdt)
    alphas = amax * steps if amax.ndim == 0 else steps[:, None] * amax[None, :]

    def _bcast(alpha):
        if jnp.ndim(alpha) == 0:
            return alpha
        return alpha.reshape(alpha.shape
                             + (1,) * (phi_mix.arr.ndim - jnp.ndim(alpha)))

    res0 = ctx.gaussian_residuals(f_mix, phi_mix)

    def dlp_at(alpha):
        pm = Field(phi_mix.arr + _bcast(alpha) * dphi.arr, phi_mix.basis,
                   phi_mix.proj)
        res_a = ctx.gaussian_residuals(f_mix, pm)
        total = 0.0
        for (za, ic), (z0, _) in zip(res_a, res0):
            dz = Field(za.arr - z0.arr, za.basis, za.proj)
            s = Field(za.arr + z0.arr, za.basis, za.proj)
            total = total - 0.5 * fdot(dz, ic(s))
        return total

    dlps = jax.lax.map(dlp_at, alphas)
    alphas = jnp.concatenate([jnp.zeros_like(alphas[:1]), alphas])
    dlps = jnp.concatenate([jnp.zeros_like(dlps[:1]), dlps])
    dlps = jnp.where(jnp.isfinite(dlps), dlps, -jnp.inf)
    i = jnp.argmax(dlps, axis=0)
    if alphas.ndim == 1:
        alpha_sel = alphas[i]
    else:
        alpha_sel = jnp.take_along_axis(alphas, i[None, :], axis=0)[0]
    return alpha_sel, jnp.max(dlps, axis=0)


def sharded_MAP_joint(ds, mesh, axis_name="sp", batch_axis=None, theta=None,
                      nsteps=10, cg_nsteps=500, cg_tol=1e-1, nsteps_flow=7,
                      ngrid=16, alpha_max=None, phistart=None, fstart=None,
                      progress=False):
    """Joint MAP of (f, phi) on spatially-sharded maps — the SAME
    coordinate descent as the single-device MAP_joint
    (src/maximization.jl:116-233): an exact f-step (CG Wiener filter,
    warm-started from the previous f) alternating with a
    Hpre-preconditioned gradient step in the MIXED parametrization
    (f° = L(phi) D f; G pinned to Id as MAP_joint does) plus the
    steps^1.5 grid line search with adaptive alpha_max. Batched data is
    supported: each entry gets its own phi, line-search alpha and amax
    adaptation, exactly like MAP_joint. Iterates match MAP_joint's to
    f32 roundoff (tests/test_sharded_fft.py parity test).

    Returns dict(f=..., phi=..., history=[{logpdf, alpha} per step])
    with logpdf the full mixed logpdf (same constants as Mixed.logpdf).
    """
    from ..core.ops import Id
    from ..core.field import repeat_batch
    from ..inference.maximization import (_fid,
                                          hessian_phimix_preconditioner)
    from jax.sharding import NamedSharding
    from .spatial import _yspec

    dstheta = ds.at(theta or {}).replace(G=Id)
    ctx = ShardedMixedCtx(dstheta, mesh, axis_name, batch_axis, nsteps_flow)
    proj = ctx.proj
    I_MAP = Basis("I", "map")

    # phi-step preconditioner (maximization.jl Hpre = Cphi^-1 + Nphi^-1)
    if getattr(dstheta, "Nphi", None) is not None:
        hdiag = jnp.real(jnp.asarray(
            hessian_phimix_preconditioner(dstheta).diag.arr))
        hinv = _safe_inv(hdiag)
    else:
        hinv = jnp.real(jnp.asarray(_fid(dstheta.Cphi).diag.arr))
    hpre_pad = pad_multiplier(hinv, mesh, axis_name)

    nb = dstheta.d.batch_shape if isinstance(dstheta.d, Field) else ()
    if phistart is not None:
        phi = phistart.to(I_MAP)
    else:
        ysh = NamedSharding(mesh, _yspec(3 + len(nb), axis_name, batch_axis))
        phi = Field(jax.device_put(
            jnp.zeros(nb + (1, proj.Ny, proj.Nx), proj.T.type), ysh),
            I_MAP, proj)
    if nb and not phi.batch_shape:
        phi = repeat_batch(phi, nb[0])

    @jax.jit
    def _grad_and_mix(f, phi):
        f_mix, phi_mix = ctx.mix(f, phi)

        def obj(pm_arr):
            return jnp.sum(ctx.mixed_logpdf(
                f_mix, Field(pm_arr, I_MAP, proj)))

        g_arr = jax.grad(obj)(phi_mix.arr)
        dphi = fourier_diag_apply_sharded(
            hpre_pad, Field(g_arr, I_MAP, proj), mesh, axis_name, batch_axis)
        return f_mix, phi_mix, dphi

    @jax.jit
    def _search_and_update(f_mix, phi_mix, dphi, amax):
        alpha, _ = _sharded_grid_linesearch(ctx, f_mix, phi_mix, dphi,
                                            amax, int(ngrid))
        ab = alpha if jnp.ndim(alpha) == 0 else alpha.reshape(
            alpha.shape + (1,) * (phi_mix.arr.ndim - 1))
        pm = Field(phi_mix.arr + ab * dphi.arr, I_MAP, proj)
        lp = ctx.mixed_logpdf(f_mix, pm)
        return pm, lp, alpha

    history = []
    f = fstart
    alpha = jnp.ones(nb or (), jnp.float32)
    amax = 2.0 * jnp.ones(nb or (), jnp.float32)
    alpha_max0 = alpha_max
    for step in range(1, nsteps + 1):
        f, cg_info = sharded_wiener_filter(
            dstheta, phi, mesh, axis_name, batch_axis, nsteps=cg_nsteps,
            tol=cg_tol, nsteps_flow=nsteps_flow, fstart=f)
        f_mix, phi_mix, dphi = _grad_and_mix(f, phi)
        if alpha_max0 is not None:
            amax = jnp.asarray(alpha_max0, jnp.float32)
        else:
            # grow/shrink with the accepted step; a null step (alpha=0
            # self-guard) keeps the previous scale (MAP_joint parity)
            amax = jnp.where(alpha > 0, 2.0 * jnp.asarray(alpha, jnp.float32),
                             amax)
        phi_mix, lp, alpha = _search_and_update(f_mix, phi_mix, dphi, amax)
        phi = phi_mix  # G = Id
        entry = dict(logpdf=np.asarray(lp),
                     alpha=np.asarray(alpha),
                     cg_iters=int(cg_info["iterations"]))
        history.append(entry)
        if progress:
            print(f"sharded_MAP_joint step {step}: "
                  f"logpdf={float(np.sum(entry['logpdf'])):.6g} "
                  f"alpha={float(np.max(entry['alpha'])):.3g}", flush=True)
    return dict(f=f, phi=phi, history=history)


# -------------------------------------------------------------------------
# theta-dependent mixed parametrization on sharded maps (for the Gibbs
# sampler's theta slice pass; general G and D, traced theta)
# -------------------------------------------------------------------------

def _pdiag_grids(op):
    """Real (…, Ny, Kx) Fourier-diagonal grids of a phi-space operator
    (G, Cphi): None for identity."""
    from ..core.ops import _Identity
    if op is None or isinstance(op, _Identity):
        return None
    return jnp.real(jnp.asarray(op.diag.arr))


def _sharded_mix_theta(ds, f, phi, theta, mesh, axis_name="sp",
                       batch_axis=None, nsteps_flow=7):
    """(f, phi) -> (f°, phi°) = (L(phi) D(theta) f, G(theta) phi) on
    y-sharded maps (models/dataset.py::mix; src/dataset.jl:96-101).
    theta may hold traced scalars — the ParamDependentOp recomputes
    trace through."""
    from ..models.dataset import _op_call
    from ..core.ops import _Identity
    proj = f.proj
    QU = Basis("QU", "map")
    D = _op_call(ds.D, theta)
    G = _op_call(ds.G, theta)
    fD = f if isinstance(D, _Identity) else Field(
        ShardedEBDiag(_eb_diag_grids(D, "D"), proj, mesh, axis_name,
                      batch_axis)(f.arr), QU, proj)
    L = ShardedLenseFlow(phi, nsteps=nsteps_flow, mesh=mesh,
                         axis_name=axis_name, batch_axis=batch_axis)
    gg = _pdiag_grids(G)
    if gg is None:
        phi_mix = phi
    else:
        phi_mix = fourier_diag_apply_sharded(
            pad_multiplier(gg, mesh, axis_name), phi, mesh, axis_name,
            batch_axis)
    return L @ fD, phi_mix


def _sharded_unmix_theta(ds, f_mix, phi_mix, theta, mesh, axis_name="sp",
                         batch_axis=None, nsteps_flow=7):
    """(f°, phi°) -> (f, phi) at theta on y-sharded maps
    (models/dataset.py::unmix; src/dataset.jl:112-117)."""
    from ..models.dataset import _op_call
    from ..core.ops import _Identity
    proj = f_mix.proj
    QU = Basis("QU", "map")
    D = _op_call(ds.D, theta)
    G = _op_call(ds.G, theta)
    gg = _pdiag_grids(G)
    if gg is None:
        phi = phi_mix
    else:
        phi = fourier_diag_apply_sharded(
            pad_multiplier(_safe_inv(gg), mesh, axis_name), phi_mix, mesh,
            axis_name, batch_axis)
    L = ShardedLenseFlow(phi, nsteps=nsteps_flow, mesh=mesh,
                         axis_name=axis_name, batch_axis=batch_axis)
    fi = L.solve(f_mix)
    f = fi if isinstance(D, _Identity) else Field(
        ShardedEBDiag(_safe_inv(_eb_diag_grids(D, "D")), proj, mesh,
                      axis_name, batch_axis)(fi.arr), QU, proj)
    return f, phi


def sharded_mixed_logpdf_theta(ds, f_mix, phi_mix, theta, mesh,
                               axis_name="sp", batch_axis=None,
                               nsteps_flow=7):
    """Mixed(ds).logpdf(f_mix, phi_mix, theta) on y-sharded maps —
    full value including the theta-dependent logdet normalizations and
    the D/G mixing Jacobians (models/dataset.py:261-270; reference
    src/dataset.jl:84-117), so theta slice sampling on sharded chains
    weighs theta values exactly like the single-device sampler."""
    from ..core.field import dot as fdot
    from ..models.dataset import _op_call
    from ..core.ops import logdet, logdet_rel

    proj = f_mix.proj
    QU = Basis("QU", "map")
    f, phi = _sharded_unmix_theta(ds, f_mix, phi_mix, theta, mesh,
                                  axis_name, batch_axis, nsteps_flow)
    Cf = _op_call(ds.Cf, theta)
    Cphi = _op_call(ds.Cphi, theta)
    Cn = _op_call(ds.Cn, theta)
    M = _op_call(ds.M, theta)
    B = _op_call(ds.B, theta)
    mk = lambda g: ShardedEBDiag(g, proj, mesh, axis_name, batch_axis)
    iCf = mk(_safe_inv(_eb_diag_grids(Cf, "Cf")))
    iCn = mk(_safe_inv(_eb_diag_grids(Cn, "Cn")))
    Mm, mask = _split_M(M)
    Bm = _eb_diag_grids(B, "B")
    if mask is None:
        fwd = mk(Mm * Bm)
    else:
        opB, opMf = mk(Bm), mk(Mm)
        mask_sh = shard_spatial(Field(jnp.asarray(mask), Basis("I", "map"),
                                      proj), mesh, axis_name).arr
        fwd = lambda x: opMf(mask_sh * opB(x))
    L = ShardedLenseFlow(phi, nsteps=nsteps_flow, mesh=mesh,
                         axis_name=axis_name, batch_axis=batch_axis)
    d_sh = shard_spatial(ds.d.to(QU), mesh, axis_name, batch_axis).arr
    rd = Field(d_sh - fwd((L @ f).arr), QU, proj)
    chi2 = fdot(rd, Field(iCn(rd.arr), QU, proj))
    pri_f = fdot(f, Field(iCf(f.arr), QU, proj))
    icphi = pad_multiplier(_safe_inv(_pdiag_grids(Cphi)), mesh, axis_name)
    pri_p = fdot(phi, fourier_diag_apply_sharded(icphi, phi, mesh,
                                                 axis_name, batch_axis))
    lp = -0.5 * (chi2 + pri_f + pri_p
                 + logdet(Cf) + logdet(Cphi) + logdet(Cn))
    return lp - logdet_rel(ds.D, theta) - logdet_rel(ds.G, theta)


def sharded_sample_slice_theta(key, ds, f: Field, phi: Field, theta, name,
                               xs, mesh, axis_name="sp", batch_axis=None,
                               nsteps_flow=7):
    """One gridded slice-sampling pass for scalar theta[name] on
    y-sharded chains (the sharded gibbs_sample_slice_theta; reference
    gibbs_sample_slice_θ!, src/sampling.jl:427-437): mix at the current
    theta, grid-evaluate the sharded mixed logpdf over xs, draw by
    inverse transform, and unmix at the NEW theta (which is what lets a
    theta move reuse the current maps). Returns (theta', f', phi')."""
    from ..inference.sampling import grid_and_sample

    theta = dict(theta or {})
    f_mix, phi_mix = _jit_sh_mix(ds, f, phi, theta, mesh=mesh,
                                 axis_name=axis_name, batch_axis=batch_axis,
                                 nsteps_flow=nsteps_flow)

    def lp_at(v):
        th = dict(theta)
        th[name] = jnp.float32(v)
        return _jit_sh_mixed_lp(ds, f_mix, phi_mix, th, mesh=mesh,
                                axis_name=axis_name, batch_axis=batch_axis,
                                nsteps_flow=nsteps_flow)

    val, _, _ = grid_and_sample(key, lp_at, xs)
    theta[name] = (float(np.asarray(val).ravel()[0])
                   if np.ndim(val) == 0 or np.size(val) == 1 else val)
    f, phi = _jit_sh_unmix(ds, f_mix, phi_mix, theta, mesh=mesh,
                           axis_name=axis_name, batch_axis=batch_axis,
                           nsteps_flow=nsteps_flow)
    return theta, f, phi


from functools import partial as _p

_jit_sh_mix = _p(jax.jit, static_argnames=(
    "mesh", "axis_name", "batch_axis", "nsteps_flow"))(_sharded_mix_theta)
_jit_sh_unmix = _p(jax.jit, static_argnames=(
    "mesh", "axis_name", "batch_axis", "nsteps_flow"))(_sharded_unmix_theta)
_jit_sh_mixed_lp = _p(jax.jit, static_argnames=(
    "mesh", "axis_name", "batch_axis",
    "nsteps_flow"))(sharded_mixed_logpdf_theta)


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


def _hmc_traj_program(U, U_grad, solve, phi_basis, proj, N, eps):
    """The jitted leapfrog trajectory of sharded_hmc_phi_step as a
    standalone program (factored out so tests/test_comm_model.py can
    lower it and CI-assert its per-leapfrog collective bytes). The
    trajectory re-traces per call — fine for one-off steps; the
    loop-heavy WF solve is the module-level-cached one."""
    from ..core.field import dot as fdot

    @jax.jit
    def traj(phi_arr, p_arr):
        x0 = Field(phi_arr, phi_basis, proj)

        def energy(xa, pa):
            # per-batch H: both the potential and the kinetic quad are
            # per-batch scalars
            quad = fdot(Field(pa, phi_basis, proj),
                        Field(solve(pa), phi_basis, proj))
            return U(Field(xa, phi_basis, proj)) - quad / 2

        def step(carry, _):
            xa, pa, gU = carry
            x1 = xa - eps * solve(pa - (eps / 2) * gU)
            gU1 = U_grad(Field(x1, phi_basis, proj)).arr
            p1 = pa - (eps / 2) * (gU1 + gU)
            return (x1, p1, gU1), None

        g0 = U_grad(x0).arr
        (xa, pa, _), _ = jax.lax.scan(step, (phi_arr, p_arr, g0), None,
                                      length=N)
        dH = energy(xa, pa) - energy(phi_arr, p_arr)
        return xa, dH

    return traj


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

    traj = _hmc_traj_program(U, U_grad, solve, phi.basis, proj, N, eps)
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
                         theta_range=None, theta_start=None, theta_grid_n=32,
                         progress=False):
    """Gibbs chain on spatially-sharded maps: repeated
    sharded_gibbs_pass (f by constrained realization, phi by HMC) with
    the same native CRC-checkpoint/resume machinery as sample_joint
    (reference src/sampling.jl:180-335). Per-step scalars (logpdf, dH,
    accept, cg_iters) are recorded every step; the phi map (gathered to
    host) every `nsavemaps` steps. Returns inference.chains.Chains.

    theta_range: optional {name: (lo, hi)} — adds a gridded
    slice-sampling pass per scalar theta parameter each Gibbs step
    (sharded_sample_slice_theta; reference gibbs_sample_slice_θ!,
    src/sampling.jl:427-437), mixing at the current theta and unmixing
    at the accepted one. Sampled theta values are recorded per step."""
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
    theta = dict(theta_start or {})
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
                theta = dict(st.get("theta", theta))

    writer = None
    if ckpt:
        from ..native import CheckpointWriter
        writer = CheckpointWriter(ckpt, append=bool(resume))

    chain, chunk = [], []
    f = None
    try:
        for step in range(start_step + 1, nsamps + 1):
            key, sk = jax.random.split(key)
            dsth = ds.at(theta) if theta else ds
            f, phi, info = sharded_gibbs_pass(
                sk, dsth, phi, mesh, axis_name, batch_axis,
                cg_nsteps=cg_nsteps, cg_tol=cg_tol, hmc_N=hmc_N,
                hmc_eps=hmc_eps, nsteps_flow=nsteps_flow, Lambda=Lambda)
            if theta_range:
                for nm, (lo, hi) in theta_range.items():
                    key, kt = jax.random.split(key)
                    xs = np.linspace(float(lo), float(hi),
                                     int(theta_grid_n))
                    theta, f, phi = sharded_sample_slice_theta(
                        kt, ds, f, phi, theta, nm, xs, mesh, axis_name,
                        batch_axis, nsteps_flow)
                dsth = ds.at(theta)
                phi = phi.to(I_MAP)
            lp = sharded_lensing_logpdf(dsth, f, phi, mesh, axis_name,
                                        batch_axis, nsteps_flow,
                                        _ops=None if theta_range else ops)
            entry = dict(step=step,
                         logpdf=np.asarray(device_get_safe(lp)),
                         dH=np.asarray(device_get_safe(info["dH"])),
                         accept=np.asarray(device_get_safe(info["accept"])),
                         cg_iters=int(info["cg_iters"]),
                         **{k: float(v) for k, v in theta.items()})
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
                    key=np.asarray(device_get_safe(key)),
                    theta=dict(theta)))
                writer.write(pickle.dumps(payload))
                chunk = []
    finally:
        if writer:
            writer.flush()
            writer.close()
    return Chains([chain])
