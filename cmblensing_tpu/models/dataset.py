"""Problem-definition containers and the simulated-dataset factory.

TPU-native analog of src/dataset.jl: the data model is

    d = M(theta) B(theta) L(phi) f + n
    f ~ N(0, Cf(theta)),  phi ~ N(0, Cphi(theta)),  n ~ N(0, Cn(theta))

(src/dataset.jl:59-66). DataSets are registered pytrees: operators and
fields are children (so nothing gets baked into jit traces as hidden
constants), the lensing-operator factory and prior are static aux.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field as dfield
from functools import partial
from typing import Any, Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.basis import Basis
from ..core.field import Field, repeat_batch
from ..core.ops import (
    Diag, Id, Identity, _Identity, BlockDiagIEB, ParamDependentOp, Scaled,
    OpAlgebra, logdet_rel, evaluate_at,
)
from ..core.cov import Cl_to_Cov
from ..core.proj import ProjLambert
from ..utils.cls import camb as camb_cls, noise_cls, beam_cls
from .distributions import MvNormal
from .lenseflow import LenseFlow


def _op_call(op, theta):
    """Evaluate a (possibly parameter-dependent) operator at theta —
    recursive through Scaled/LazyOp compositions."""
    return evaluate_at(op, theta)


# module-level singleton so DataSets from different load_sim calls share
# pytree aux-data (jit caches key on it)
_default_lenseflow = partial(LenseFlow, nsteps=7)


# --- module-level ParamDependentOp recompute functions (picklable) --------

def _cf_recompute(deps, r=None):
    """Cf(r) = Cfs + (r/r0) Cft (src/dataset.jl:273)."""
    Cfs, Cft, r0 = deps
    r = r0 if r is None else r
    return _op_lincomb(Cfs, r / r0, Cft)


def _cphi_recompute(deps, Aphi=None):
    """Cphi(Aphi) = Aphi * Cphi0 (src/dataset.jl:274)."""
    Cphi0, Aphi0 = deps
    Aphi = Aphi0 if Aphi is None else Aphi
    return _op_scale(Aphi, Cphi0)


def _G_of(Cphi_at, Nphi):
    """sqrt(I + 2 Nphi pinv(Cphi))."""
    from ..core.ops import safe_reciprocal
    cp = Cphi_at.diag if isinstance(Cphi_at, Diag) else Cphi_at
    arr = 1.0 + 2.0 * Nphi.diag.arr * safe_reciprocal(cp.arr)
    return Diag(Field(jnp.sqrt(arr), cp.basis, cp.proj))


def _g_recompute(deps, Aphi=None):
    """G(Aphi) = pinv(G0) sqrt(I + 2 Nphi pinv(Cphi(Aphi)))
    (src/dataset.jl:318-320)."""
    G0, Cphi, Nphi, Aphi0 = deps
    Aphi = Aphi0 if Aphi is None else Aphi
    Ga = _G_of(Cphi(dict(Aphi=Aphi)), Nphi)
    return Diag(Field(Ga.diag.arr / G0.diag.arr, Ga.diag.basis, Ga.diag.proj))


def _d_recompute(deps, r=None):
    """D(r) = sqrt((Cf(r) + sigma2len I + 2 Cn_hat) pinv(Cf(r)))
    (src/dataset.jl:321-329)."""
    Cf, Cn_hat, r0, sigma2len = deps
    r = r0 if r is None else r
    Cfr = Cf(dict(r=r))
    num = _add_scalar_identity(_op_lincomb(Cfr, 2.0, Cn_hat), sigma2len)
    return _op_mul_sqrt_pinv(num, Cfr)


@jax.tree_util.register_pytree_node_class
@dataclass
class DataSet:
    """Base dataset: all operators of the data model
    (reference BaseDataSet, src/dataset.jl:49-57)."""
    d: Any = None              # data
    Cf: Any = None             # unlensed field covariance
    Cn: Any = None             # noise covariance
    Cn_hat: Any = None         # approx. noise covariance (fourier diag)
    M: Any = Id                # mask
    M_hat: Any = Id            # approx. (fourier-diagonal) mask
    B: Any = Id                # beam / transfer function
    B_hat: Any = Id            # approx. beam
    Cphi: Any = None           # phi covariance
    Cf_tilde: Any = None       # lensed field covariance
    D: Any = Id                # mixing matrix for mixed parametrization
    G: Any = Id                # phi reparametrization
    Nphi: Any = None           # phi noise estimate (preconditioning)
    L: Any = LenseFlow         # lensing operator factory (static)
    logprior: Any = None       # callable (static)

    _static_fields = ("L", "logprior")

    def tree_flatten(self):
        ch = tuple(getattr(self, f.name) for f in dataclasses.fields(self)
                   if f.name not in self._static_fields)
        aux = tuple(getattr(self, f.name) for f in dataclasses.fields(self)
                    if f.name in self._static_fields)
        return ch, aux

    @classmethod
    def tree_unflatten(cls, aux, ch):
        names = [f.name for f in dataclasses.fields(cls) if f.name not in cls._static_fields]
        snames = [f.name for f in dataclasses.fields(cls) if f.name in cls._static_fields]
        return cls(**dict(zip(names, ch)), **dict(zip(snames, aux)))

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    def at(self, theta):
        """Evaluate every parameter-dependent operator at theta —
        recursively through Scaled/LazyOp compositions, and with
        theta={} at the fiducial, so ds.at({}) returns CONCRETE
        operators like the reference's ds() (src/dataset.jl:12-18)."""
        from ..core.ops import evaluate_at
        theta = theta or {}
        kw = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            ev = evaluate_at(v, theta) if isinstance(v, OpAlgebra) else v
            if ev is not v:
                kw[f.name] = ev
        return self.replace(**kw) if kw else self

    # --- generative model (reference @fwdmodel, src/dataset.jl:59-66) ----
    def model(self, theta=None, sample=None):
        theta = theta or {}
        f = sample("f", MvNormal(0, _op_call(self.Cf, theta)))
        phi = sample("phi", MvNormal(0, _op_call(self.Cphi, theta)))
        ft = self.L(phi) @ f
        mu = _op_call(self.M, theta) @ (_op_call(self.B, theta) @ ft)
        d = sample("d", MvNormal(mu, _op_call(self.Cn, theta)))
        return dict(f=f, phi=phi, ft=ft, d=d)

    def logpdf(self, f=None, phi=None, theta=None, d=None):
        return (self.logpdf_term(f=f, phi=phi, theta=theta, d=d, which="prior")
                + self.logpdf_term(f=f, phi=phi, theta=theta, d=d, which="data"))

    def logpdf_term(self, f=None, phi=None, theta=None, d=None, which="prior"):
        """One additive piece of logpdf: "prior" (Cf + Cphi Gaussians +
        logprior) or "data" (the M B L(phi) f likelihood term). logpdf
        is their sum. Evaluating terms separately lets gradients be
        taken term-by-term so the two terms' AD residuals never coexist
        in HBM — the lever that fits the 4096^2 phi-gradient on one
        16 GB chip (inference/maximization.py::_term_split_fgrad)."""
        theta = theta or {}
        if which == "prior":
            lp = MvNormal(0, _op_call(self.Cf, theta)).logpdf(f)
            lp = lp + MvNormal(0, _op_call(self.Cphi, theta)).logpdf(phi)
            if self.logprior is not None:
                lp = lp + self.logprior(theta=theta, f=f, phi=phi)
            return lp
        if d is None:
            d = self.d
        ft = self.L(phi) @ f
        mu = _op_call(self.M, theta) @ (_op_call(self.B, theta) @ ft)
        return MvNormal(mu, _op_call(self.Cn, theta)).logpdf(d)

    def simulate(self, key, theta=None, phi=None, f=None, batch_shape=None):
        theta = theta or {}
        if batch_shape is None:
            batch_shape = self.d.batch_shape if isinstance(self.d, Field) else ()
        k1, k2, k3 = jax.random.split(key, 3)
        if f is None:
            f = MvNormal(0, _op_call(self.Cf, theta)).sample(k1, batch_shape)
        if phi is None:
            phi = MvNormal(0, _op_call(self.Cphi, theta)).sample(k2, batch_shape)
        ft = self.L(phi) @ f
        mu = _op_call(self.M, theta) @ (_op_call(self.B, theta) @ ft)
        n = MvNormal(0, _op_call(self.Cn, theta)).sample(k3, batch_shape)
        d = mu + n
        return dict(f=f, phi=phi, ft=ft, n=n, d=d)

    # fast analytic gradient wrt f (reference src/dataset.jl:76-80).
    # NOTE: Gaussian terms only, like the reference's hand-written
    # gradientf — an f-dependent logprior is NOT included (and the
    # CG f-step assumes a Gaussian conditional anyway; argmaxf_logpdf
    # warns when a logprior is present).
    def gradientf_logpdf(self, f, phi=None, theta=None, d=None):
        theta = theta or {}
        if d is None:
            d = self.d
        Lphi = self.L(phi)
        M = _op_call(self.M, theta)
        B = _op_call(self.B, theta)
        Cn = _op_call(self.Cn, theta)
        Cf = _op_call(self.Cf, theta)
        r = d - M @ (B @ (Lphi @ f))
        return (Lphi.H @ (B.H @ (M.H @ Cn.solve(r)))) - Cf.solve(f)


BaseDataSet = DataSet


@jax.tree_util.register_pytree_node_class
@dataclass
class NoLensingDataSet:
    """Dataset without lensing (reference src/dataset.jl:37-47)."""
    d: Any = None
    Cf: Any = None
    Cn: Any = None
    Cn_hat: Any = None
    M: Any = Id
    M_hat: Any = Id
    B: Any = Id
    B_hat: Any = Id
    logprior: Any = None

    _static_fields = ("logprior",)

    tree_flatten = DataSet.tree_flatten
    tree_unflatten = classmethod(DataSet.tree_unflatten.__func__)
    replace = DataSet.replace
    at = DataSet.at

    def logpdf(self, f=None, theta=None, d=None):
        theta = theta or {}
        if d is None:
            d = self.d
        lp = MvNormal(0, _op_call(self.Cf, theta)).logpdf(f)
        mu = _op_call(self.M, theta) @ (_op_call(self.B, theta) @ f)
        lp = lp + MvNormal(mu, _op_call(self.Cn, theta)).logpdf(d)
        if self.logprior is not None:
            lp = lp + self.logprior(theta=theta, f=f)
        return lp

    def simulate(self, key, theta=None, f=None, batch_shape=()):
        theta = theta or {}
        k1, k3 = jax.random.split(key, 2)
        if f is None:
            f = MvNormal(0, _op_call(self.Cf, theta)).sample(k1, batch_shape)
        mu = _op_call(self.M, theta) @ (_op_call(self.B, theta) @ f)
        n = MvNormal(0, _op_call(self.Cn, theta)).sample(k3, batch_shape)
        return dict(f=f, n=n, d=mu + n)

    def gradientf_logpdf(self, f, theta=None, d=None, **_):
        theta = theta or {}
        if d is None:
            d = self.d
        M = _op_call(self.M, theta)
        B = _op_call(self.B, theta)
        Cn = _op_call(self.Cn, theta)
        Cf = _op_call(self.Cf, theta)
        r = d - M @ (B @ f)
        return (B.H @ (M.H @ Cn.solve(r))) - Cf.solve(f)


# =========================================================================
# mixed parametrization (reference src/dataset.jl:28, 84-117)
# =========================================================================

@dataclass
class Mixed:
    """Wrapper marking the mixed parametrization (f°, phi°)."""
    ds: DataSet

    def logpdf(self, f_mix=None, phi_mix=None, theta=None, d=None):
        ds = self.ds
        theta = theta or {}
        u = unmix(ds, f_mix=f_mix, phi_mix=phi_mix, theta=theta)
        lp = ds.logpdf(f=u["f"], phi=u["phi"], theta=theta, d=d)
        return lp - logdet_rel(ds.D, theta) - logdet_rel(ds.G, theta)

    def logpdf_term(self, f_mix=None, phi_mix=None, theta=None, d=None,
                    which="prior"):
        """One additive piece of the mixed logpdf (see
        DataSet.logpdf_term). The theta-only D/G logdets ride the
        "prior" term so the terms still sum to logpdf exactly."""
        ds = self.ds
        theta = theta or {}
        u = unmix(ds, f_mix=f_mix, phi_mix=phi_mix, theta=theta)
        lp = ds.logpdf_term(f=u["f"], phi=u["phi"], theta=theta, d=d,
                            which=which)
        if which == "prior":
            lp = lp - logdet_rel(ds.D, theta) - logdet_rel(ds.G, theta)
        return lp


def mix(ds: DataSet, f=None, phi=None, theta=None):
    """(f, phi) -> (f°, phi°): f° = L(phi) D(theta) f, phi° = G(theta) phi
    (src/dataset.jl:96-101)."""
    theta = theta or {}
    D = _op_call(ds.D, theta)
    G = _op_call(ds.G, theta)
    f_mix = ds.L(phi) @ (D @ f)
    phi_mix = G @ phi
    return dict(f_mix=f_mix, phi_mix=phi_mix, theta=theta)


def unmix(ds: DataSet, f_mix=None, phi_mix=None, theta=None):
    """(f°, phi°) -> (f, phi) (src/dataset.jl:112-117)."""
    theta = theta or {}
    D = _op_call(ds.D, theta)
    G = _op_call(ds.G, theta)
    phi = G.solve(phi_mix)
    f = D.solve(ds.L(phi).solve(f_mix))
    return dict(f=f, phi=phi, theta=theta)


# =========================================================================
# module-level functional API
# =========================================================================

def simulate(key, ds, **kw):
    return ds.simulate(key, **kw)


def logpdf(ds, **kw):
    return ds.logpdf(**kw)


def gradientf_logpdf(ds, **kw):
    return ds.gradientf_logpdf(**kw)


def Hessian_logpdf_preconditioner(which, ds):
    """Fast approximate Hessian of logpdf wrt `which`
    (reference src/dataset.jl:127-137)."""
    if which == "f":
        Cf = ds.Cf
        Bh, Mh, Cnh = ds.B_hat, ds.M_hat, ds.Cn_hat
        # pinv(Cf) + B' M' pinv(Cn̂) M B, all fourier-diagonal
        from ..core.ops import LazyOp
        op_cf = Cf.fiducial if isinstance(Cf, ParamDependentOp) else Cf
        term = LazyOp("*", Bh.H, LazyOp("*", Mh.H, LazyOp("*", FuncSolve(Cnh), LazyOp("*", Mh, Bh))))
        return LazyOp("+", op_cf.pinv(), term)
    if which in ("phi_mix", ("phi_mix",)):
        Cphi, Nphi = ds.Cphi, ds.Nphi
        op_cphi = Cphi.fiducial if isinstance(Cphi, ParamDependentOp) else Cphi
        return _diag_add(op_cphi.pinv(), Nphi.pinv())
    raise ValueError(which)


class FuncSolve:
    """Wrap an operator so that `@` applies its solve (pinv action)."""

    def __init__(self, op):
        self.op = op

    def __matmul__(self, f):
        return self.op.solve(f)

    @property
    def H(self):
        return FuncSolve(self.op.H)


jax.tree_util.register_pytree_node(
    FuncSolve, lambda s: ((s.op,), None), lambda aux, ch: FuncSolve(ch[0]))


def _diag_add(a: Diag, b: Diag) -> Diag:
    gb = b.diag.to(a.diag.basis)
    return Diag(Field(a.diag.arr + gb.arr, a.diag.basis, a.diag.proj))


def _add_scalar_identity(op, s):
    """op + s*I for Diag / BlockDiagIEB."""
    if isinstance(op, Diag):
        return Diag(Field(op.diag.arr + s, op.diag.basis, op.diag.proj))
    if isinstance(op, BlockDiagIEB):
        F = lambda a: Field(a, op.TT.basis, op.proj)
        return BlockDiagIEB(F(op.TT.arr + s), op.TE, F(op.EE.arr + s),
                            F(op.BB.arr + s), op.ET)
    raise TypeError(type(op))


# =========================================================================
# load_sim (reference src/dataset.jl:186-338)
# =========================================================================

def _mask_cov(pol, proj, bandpass, zero_TE=True):
    """Fourier mask operator from a BandPass, with TE block zero for IP."""
    from ..core.ops import BandPass as BP
    W = bandpass.on(proj, pol="I").diag.arr  # (1, Ny, Nxh)
    if pol == "I":
        return Diag(Field(W, Basis("I", "fourier"), proj))
    if pol == "P":
        W2 = jnp.concatenate([W, W], axis=-3)
        return Diag(Field(W2, Basis("EB", "fourier"), proj))
    if pol == "IP":
        F = lambda a: Field(a, Basis("I", "fourier"), proj)
        return BlockDiagIEB(F(W), F(jnp.zeros_like(W)), F(W), F(W))
    raise ValueError(pol)


def load_sim(
    thetapix,
    Nside,
    pol,
    T=np.float32,
    Nbatch=None,
    # noise
    muKarcminT=3,
    lknee=100,
    alphaknee=3,
    Cln=None,
    Cn=None,
    # beam
    beamFWHM=0,
    B=None, B_hat=None,
    # mask
    pixel_mask_kwargs=None,
    bandpass_mask=None,
    M=None, M_hat=None,
    # theory
    Cl=None,
    fiducial_theta=None,
    seed=0,
    key=None,
    D=None,
    G=None,
    Nphi_fac=2,
    L=None,
    rotator=(0.0, 90.0, 0.0),
):
    """End-to-end simulated-dataset factory (reference load_sim,
    src/dataset.jl:186-338). Returns a dict with f, ft, phi, d, ds,
    ds0 (fiducial-evaluated), Cl, proj."""
    from ..core.ops import LowPass
    from .quadratic_estimate import quadratic_estimate

    fiducial_theta = dict(fiducial_theta or {})
    if key is None:
        key = jax.random.PRNGKey(seed)
    if L is None:
        L = _default_lenseflow
    if bandpass_mask is None:
        bandpass_mask = LowPass(3000)

    Ny, Nx = (Nside, Nside) if np.isscalar(Nside) else Nside
    proj = ProjLambert(Ny, Nx, thetapix=thetapix, T=T, rotator=rotator)
    lmax = int(np.ceil(np.sqrt(2) * float(proj.nyquist)) + 1)

    # theory spectra
    Aphi0 = float(fiducial_theta.pop("Aphi", 1.0))
    if Cl is None:
        Cl = camb_cls(lmax=lmax, **fiducial_theta)
    else:
        if fiducial_theta:
            # the reference errors on this exact combination
            # (dataset.jl:242-246): a user Cl already encodes its
            # cosmology, so fiducial_theta would be silently ignored
            raise ValueError("pass either Cl or fiducial_theta, not both "
                             "(the provided Cl fixes the fiducial cosmology)")
        try:
            cl_lmax = float(np.max(np.asarray(Cl["unlensed_scalar"]["TT"].ell)))
        except Exception:
            cl_lmax = np.inf
        if cl_lmax < lmax:
            raise ValueError(
                f"provided Cl extends only to ell={cl_lmax:.0f} but this "
                f"grid needs lmax={lmax} (ceil(sqrt(2)*nyquist)+1) — the "
                f"covariance would be silently zero at high ell")
    r0 = float(Cl["params"].get("r", 0.2))

    if Cln is None:
        Cln = noise_cls(muKarcminT=muKarcminT, beamFWHM=0, lknee=lknee,
                        alphaknee=alphaknee, lmax=lmax)

    pol = str(pol)
    if pol not in ("I", "P", "IP"):
        raise ValueError(f"pol should be one of 'I', 'P', or 'IP' (got {pol!r})")
    ks = {"I": ("TT",), "P": ("EE", "BB"), "IP": ("TT", "EE", "BB", "TE")}[pol]

    # covariances
    Cphi0 = Cl_to_Cov("I", proj, Cl["total"]["pp"])
    Cfs = Cl_to_Cov(pol, proj, *[Cl["unlensed_scalar"][k] for k in ks])
    Cft = Cl_to_Cov(pol, proj, *[Cl["tensor"][k] for k in ks])
    Cf_tilde = Cl_to_Cov(pol, proj, *[Cl["total"][k] for k in ks])
    Cn_hat = Cl_to_Cov(pol, proj, *[Cln[k] for k in ks])
    if Cn is None:
        Cn = Cn_hat

    Cf = ParamDependentOp(("r",), _cf_recompute, (Cfs, Cft, r0))
    Cphi = ParamDependentOp(("Aphi",), _cphi_recompute, (Cphi0, Aphi0))

    # masks
    if M is None:
        Mfourier = _mask_cov(pol, proj, bandpass_mask)
        if pixel_mask_kwargs is not None:
            from ..utils.masking import make_mask
            mask_arr = make_mask((Ny, Nx), thetapix,
                                 rng=np.random.default_rng(seed), **pixel_mask_kwargs)
            ncomp = {"I": 1, "P": 2, "IP": 3}[pol]
            pix = np.broadcast_to(mask_arr[None], (ncomp, Ny, Nx))
            bmap = {"I": "I", "P": "QU", "IP": "IQU"}[pol]
            Mpix = Diag(Field(jnp.asarray(pix.copy()), Basis(bmap, "map"), proj))
            from ..core.ops import LazyOp
            M = LazyOp("*", Mfourier, Mpix)
        else:
            M = Mfourier
        if M_hat is None:
            M_hat = Mfourier
    elif M_hat is None:
        M_hat = M

    # beam
    if B is None:
        Bl = beam_cls(beamFWHM=beamFWHM, lmax=lmax).sqrt()
        from ..core.ops import BandPass as BPcls
        bp = BPcls(Bl.ell, Bl.Cl)
        B = _mask_cov(pol, proj, bp)
    if B_hat is None:
        B_hat = B

    ds = DataSet(Cn=Cn, Cn_hat=Cn_hat, Cf=Cf, Cf_tilde=Cf_tilde, Cphi=Cphi,
                 M=M, M_hat=M_hat, B=B, B_hat=B_hat, D=D or Id, G=G or Id, L=L)

    # simulate data
    sim = ds.simulate(key, batch_shape=())
    ds = ds.replace(d=sim["d"])

    # Nphi from quadratic estimate
    qe = quadratic_estimate(ds)
    Nphi = _op_scale(1.0 / Nphi_fac, qe["Nphi"])
    ds = ds.replace(Nphi=Nphi)

    # G mixing (src/dataset.jl:317-320)
    if G is None:
        G0 = _G_of(Cphi(dict(Aphi=Aphi0)), Nphi)
        ds = ds.replace(G=ParamDependentOp(("Aphi",), _g_recompute,
                                           (G0, Cphi, Nphi, Aphi0)))

    # D mixing (src/dataset.jl:321-329)
    if D is None:
        sigma2len = float(np.deg2rad(5 / 60) ** 2)
        ds = ds.replace(D=ParamDependentOp(("r",), _d_recompute,
                                           (Cf, Cn_hat, r0, sigma2len)))

    if Nbatch is not None:
        d_b = repeat_batch(sim["d"], Nbatch)
        ds = ds.replace(d=d_b)

    return dict(f=sim["f"], ft=sim["ft"], phi=sim["phi"], d=ds.d,
                ds=ds, ds0=ds.at({}), Cl=Cl, proj=proj)


def load_nolensing_sim(lensed_covariance=False, **kwargs):
    """Reference load_nolensing_sim (src/dataset.jl:341-352)."""
    out = load_sim(**kwargs)
    ds = out["ds"]
    Cf_nl = ds.Cf_tilde if lensed_covariance else ds.Cf
    ds_nl = NoLensingDataSet(d=ds.d, Cf=Cf_nl, Cn=ds.Cn, Cn_hat=ds.Cn_hat,
                             M=ds.M, M_hat=ds.M_hat, B=ds.B, B_hat=ds.B_hat)
    out = dict(out)
    out["ds"] = ds_nl
    out["ds0"] = ds_nl.at({})
    return out


# --- small eager operator helpers (keep Diag/BlockDiagIEB eager) ---------

def _bscal(s):
    """Reshape a batched scalar (leading batch axes) so it broadcasts
    against (..., ncomp, Ny, Nx) field arrays (BatchedReal semantics)."""
    if jnp.ndim(s) >= 1:
        return jnp.reshape(jnp.asarray(s), jnp.shape(s) + (1, 1, 1))
    return s


def _op_scale(s, op):
    s = _bscal(s)
    if isinstance(op, Diag):
        return Diag(Field(s * op.diag.arr, op.diag.basis, op.diag.proj))
    if isinstance(op, BlockDiagIEB):
        F = lambda a: Field(s * a.arr, a.basis, a.proj)
        return BlockDiagIEB(F(op.TT), F(op.TE), F(op.EE), F(op.BB), F(op.ET))
    return Scaled(s, op)


def _op_lincomb(a, s, b):
    """a + s*b for Diag/BlockDiagIEB of matching type."""
    s = _bscal(s)
    if isinstance(a, Diag) and isinstance(b, Diag):
        gb = b.diag.to(a.diag.basis)
        return Diag(Field(a.diag.arr + s * gb.arr, a.diag.basis, a.diag.proj))
    if isinstance(a, BlockDiagIEB) and isinstance(b, BlockDiagIEB):
        F = lambda x, y: Field(x.arr + s * y.arr, x.basis, x.proj)
        return BlockDiagIEB(F(a.TT, b.TT), F(a.TE, b.TE), F(a.EE, b.EE),
                            F(a.BB, b.BB), F(a.ET, b.ET))
    raise TypeError((type(a), type(b)))


def _op_mul_sqrt_pinv(num, den):
    """sqrt(num * pinv(den)) for Diag/BlockDiagIEB."""
    from ..core.ops import safe_divide
    if isinstance(num, Diag) and isinstance(den, Diag):
        arr = safe_divide(num.diag.arr, den.diag.arr)
        return Diag(Field(jnp.sqrt(arr), num.diag.basis, num.diag.proj))
    if isinstance(num, BlockDiagIEB) and isinstance(den, BlockDiagIEB):
        prod = num * den.pinv()
        return prod.sqrt()
    raise TypeError((type(num), type(den)))


def _op_axpy(a, s, b):
    return _op_lincomb(a, s, b)
