"""Angular power spectra containers and theory-spectrum sources.

TPU-native analog of the reference's Cls layer (src/cls.jl): a `Cls`
container with ell-interpolation and arithmetic, the (host-side) CAMB
interface with a cached fiducial-spectra file, analytic noise/beam
spectra, and CAMB-file loaders. All host-side numpy — spectra are
input preparation, not hot path (SURVEY.md 2.3)."""
from __future__ import annotations

import functools
import os

import numpy as np

_DAT = os.path.join(os.path.dirname(__file__), "..", "dat")


class Cls:
    """A power spectrum with ell labels; interpolates to any ell
    (reference Cℓs, src/cls.jl:11-35)."""

    def __init__(self, ell, Cl, concrete=True):
        ell = np.asarray(ell, dtype=np.float64)
        Cl = np.asarray(Cl, dtype=np.float64)
        mask = ~np.isnan(Cl)
        self.ell = ell[mask]
        self.Cl = Cl[mask]
        self.concrete = concrete

    def __call__(self, ell):
        """Linear interpolation; NaN->0 outside support is applied by
        consumers (Cl_to_2D)."""
        ell = np.asarray(ell, dtype=np.float64)
        out = np.interp(ell, self.ell, self.Cl, left=np.nan, right=np.nan)
        return out

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            stop = idx.stop if idx.stop is not None else (
                int(self.ell[-1]) + 1 if len(self.ell) else 0)
            return self(np.arange(idx.start or 0, stop, idx.step or 1))
        return self(idx)

    # arithmetic (src/cls.jl:67-81)
    def _binop(self, other, op):
        if isinstance(other, Cls):
            if self.concrete and other.concrete:
                ell = np.union1d(self.ell, other.ell)
            elif self.concrete:
                ell = self.ell
            elif other.concrete:
                ell = other.ell
            else:
                ell = np.union1d(self.ell, other.ell)
            return Cls(ell, op(self(ell), other(ell)), concrete=self.concrete or other.concrete)
        if callable(other):
            return Cls(self.ell, op(self.Cl, other(self.ell)), concrete=self.concrete)
        return Cls(self.ell, op(self.Cl, other), concrete=self.concrete)

    def __add__(self, o):
        return self._binop(o, np.add)

    def __radd__(self, o):
        return self._binop(o, lambda a, b: b + a)

    def __sub__(self, o):
        return self._binop(o, np.subtract)

    def __rsub__(self, o):
        return self._binop(o, lambda a, b: b - a)

    def __mul__(self, o):
        return self._binop(o, np.multiply)

    def __rmul__(self, o):
        return self._binop(o, lambda a, b: b * a)

    def __truediv__(self, o):
        return self._binop(o, np.divide)

    def __pow__(self, p):
        return Cls(self.ell, self.Cl ** p, concrete=self.concrete)

    def sqrt(self):
        return Cls(self.ell, np.sqrt(self.Cl), concrete=self.concrete)

    def __repr__(self):
        return f"Cls(ell={self.ell[0]:.0f}..{self.ell[-1]:.0f}, n={len(self.ell)})"


class FuncCls:
    """Lazy functional spectrum, e.g. ell^2 (reference FuncCℓs,
    src/cls.jl:50-60)."""

    def __init__(self, f):
        self.f = f
        self.concrete = False

    def __call__(self, ell):
        return self.f(np.asarray(ell, dtype=np.float64))

    def __mul__(self, o):
        if isinstance(o, Cls):
            return Cls(o.ell, self.f(o.ell) * o.Cl, concrete=o.concrete)
        if isinstance(o, FuncCls):
            return FuncCls(lambda l: self.f(l) * o.f(l))
        return FuncCls(lambda l: self.f(l) * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, Cls):
            return Cls(o.ell, self.f(o.ell) / o.Cl, concrete=o.concrete)
        return FuncCls(lambda l: self.f(l) / o)


ell2 = FuncCls(lambda l: l ** 2)
ell4 = FuncCls(lambda l: l ** 4)
toDl = FuncCls(lambda l: l * (l + 1) / (2 * np.pi))
toCl = FuncCls(lambda l: 2 * np.pi / (l * (l + 1)))


def _lowess(x, y, frac=0.75, it=0):
    """Plain numpy LOWESS (locally weighted linear regression) —
    equivalent of the reference's Loess smoothing (src/cls.jl:113-126)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(x)
    r = max(2, int(np.ceil(frac * n)))
    out = np.empty(n)
    for i in range(n):
        d = np.abs(x - x[i])
        idx = np.argsort(d)[:r]
        dmax = d[idx].max()
        w = (1 - np.clip(d[idx] / max(dmax, 1e-300), 0, 1) ** 3) ** 3
        xw = x[idx]
        yw = y[idx]
        sw = w.sum()
        xm = (w * xw).sum() / sw
        ym = (w * yw).sum() / sw
        cov = (w * (xw - xm) * (yw - ym)).sum()
        var = (w * (xw - xm) ** 2).sum()
        b = cov / var if var > 0 else 0.0
        out[i] = ym + b * (x[i] - xm)
    return out


def smooth(cl: "Cls", newells=None, xscale="linear", yscale="linear", smoothing=0.75):
    """LOWESS-smooth a spectrum, optionally in log-log
    (reference smooth, src/cls.jl:113-126)."""
    fx = np.log if xscale == "log" else (lambda v: v)
    fxi = np.exp if xscale == "log" else (lambda v: v)
    fy = np.log if yscale == "log" else (lambda v: v)
    fyi = np.exp if yscale == "log" else (lambda v: v)
    if newells is None:
        newells = np.arange(cl.ell.min(), cl.ell.max() + 1)
    mask = np.isfinite(fy(cl.Cl)) if yscale == "log" else np.ones(len(cl.Cl), bool)
    ys = _lowess(fx(cl.ell[mask]), fy(cl.Cl[mask]), frac=smoothing)
    out = np.interp(fx(np.asarray(newells, dtype=np.float64)), fx(cl.ell[mask]), ys)
    return Cls(newells, fyi(out), concrete=cl.concrete)


def shift_l(dl, cl: "Cls", factor=False):
    """Shift (or scale) the ell labels of a spectrum
    (reference shiftℓ, src/cls.jl:82)."""
    ell = cl.ell * dl if factor else cl.ell + dl
    return Cls(ell, cl.Cl, concrete=cl.concrete)


def get_l4Cl(f1, f2=None, **kwargs):
    """ell^4 * C_ell (reference get_ℓ⁴Cℓ, src/cls.jl:87)."""
    from .spectra import get_Cl
    cl = get_Cl(f1, f2, **kwargs)
    return Cls(cl.ell, cl.ell ** 4 * cl.Cl, concrete=cl.concrete)


def get_rho_l(f1, f2, **kwargs):
    """Cross-correlation coefficient spectrum (src/cls.jl:88-97)."""
    from .spectra import get_Cl
    cl1 = get_Cl(f1, **kwargs)
    cl2 = get_Cl(f2, **kwargs)
    clx = get_Cl(f1, f2, **kwargs)
    return Cls(cl1.ell, clx.Cl / np.sqrt(cl1.Cl * cl2.Cl))


def extrapolate_cls(ell_out, ell_in, Cl_in):
    """Power-law extrapolate spectra to high ell (src/cls.jl:102-111)."""
    ell_out = np.asarray(ell_out, dtype=np.float64)
    ell_in = np.asarray(ell_in, dtype=np.float64)
    Cl_in = np.asarray(Cl_in, dtype=np.float64)
    if np.all(Cl_in > 0):
        logC = np.interp(np.log(ell_out), np.log(ell_in), np.log(Cl_in))
        # linear extrapolation in log-log beyond support
        lo, hi = np.log(ell_in[0]), np.log(ell_in[-1])
        slope_lo = (np.log(Cl_in[1]) - np.log(Cl_in[0])) / (np.log(ell_in[1]) - np.log(ell_in[0]))
        slope_hi = (np.log(Cl_in[-1]) - np.log(Cl_in[-2])) / (np.log(ell_in[-1]) - np.log(ell_in[-2]))
        lout = np.log(ell_out)
        logC = np.where(lout < lo, np.log(Cl_in[0]) + slope_lo * (lout - lo), logC)
        logC = np.where(lout > hi, np.log(Cl_in[-1]) + slope_hi * (lout - hi), logC)
        out = np.exp(logC)
    else:
        out = np.interp(ell_out, ell_in, Cl_in, left=0.0, right=0.0)
    return Cls(ell_out, out, concrete=False)


class CMBSpectra(dict):
    """Dict of spectrum-component dicts: keys unlensed_scalar,
    lensed_scalar, tensor, unlensed_total, total; each a dict with
    TT/EE/BB/TE/pp Cls plus .params."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


class SpecSet(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


_DEFAULT_PARAMS = dict(r=0.2, ombh2=0.0224567, omch2=0.118489, tau=0.055, mnu=0.06,
                       theta_s=0.0104098, H0=None, logA=3.043, ns=0.968602,
                       AL=1, k_pivot=0.002)


@functools.lru_cache(maxsize=None)
def _load_default_cls():
    path = os.path.join(_DAT, "default_camb_cls.npz")
    z = np.load(path)
    out = CMBSpectra()
    for comp in ["unlensed_scalar", "lensed_scalar", "tensor", "unlensed_total", "total"]:
        d = SpecSet()
        for spec in ["TT", "EE", "BB", "TE", "pp"]:
            ell = z[f"{comp}_{spec}_l"]
            Cl = z[f"{comp}_{spec}"]
            d[spec] = Cls(ell, Cl)
        d["phiphi"] = d["pp"]
        out[comp] = d
    out["params"] = SpecSet({k.replace("param_", ""): float(z[k]) for k in z.files if k.startswith("param_")})
    return out


def camb(lmax=6000, r=0.2, ombh2=0.0224567, omch2=0.118489, tau=0.055, mnu=0.06,
         theta_s=0.0104098, H0=None, logA=3.043, ns=0.968602, nt=None,
         AL=1, k_pivot=0.002):
    """CMB theory spectra (reference src/cls.jl:135-200).

    Returns the cached fiducial spectra (shipped in dat/, computed with
    pycamb at the reference's fiducial parameters) when called at
    defaults; otherwise calls pycamb on host (gated on availability)."""
    if nt is None:
        nt = -r / 8
    # nt participates in the cache check too (the fiducial was computed
    # at the inflation-consistency value -r/8): an explicit non-default
    # nt must NOT silently return the cached tensor spectra
    asked = dict(r=r, ombh2=ombh2, omch2=omch2, tau=tau, mnu=mnu, theta_s=theta_s,
                 H0=H0, logA=logA, ns=ns, nt=nt, AL=AL, k_pivot=k_pivot)
    defaults = dict(_DEFAULT_PARAMS, nt=-_DEFAULT_PARAMS["r"] / 8)
    cached = _load_default_cls()
    p = cached["params"]
    if (lmax <= p.get("lmax", 0)
            and all(asked[k] == defaults[k] for k in asked)):
        return cached
    return _camb_live(lmax=lmax, **asked)


def _camb_live(lmax, r, ombh2, omch2, tau, mnu, theta_s, H0, logA, ns, nt, AL, k_pivot):
    try:
        import camb as pycamb
    except ImportError:
        raise RuntimeError(
            "Non-fiducial theory parameters require pycamb, which is not "
            "installed in this environment. Use the fiducial parameters, "
            "pass Cl explicitly, or use load_camb_cls() with CAMB output files."
        )
    lmax_p = min(5000, lmax)
    cp = pycamb.set_params(
        ombh2=ombh2, omch2=omch2, tau=tau, mnu=mnu, cosmomc_theta=theta_s,
        H0=H0, ns=ns, nt=nt, As=np.exp(logA) * 1e-10, pivot_scalar=k_pivot,
        pivot_tensor=k_pivot, lmax=lmax_p, r=r, Alens=AL,
    )
    cp.max_l_tensor = 2 * lmax_p
    cp.max_eta_k_tensor = 4 * lmax_p
    cp.WantScalars = True
    cp.WantTensors = True
    cp.DoLensing = True
    pycamb.model.has_cl_2D_array = True
    res = pycamb.get_results(cp)
    ell = np.arange(2, lmax)
    ellp = np.arange(2, lmax_p)
    alpha = (1e6 * cp.TCMB) ** 2
    toClp = 1 / (ellp * (ellp + 1) / (2 * np.pi))
    powers = res.get_cmb_power_spectra(cp)
    out = CMBSpectra()
    Clpp_raw = res.get_lens_potential_cls(lmax_p)[2:lmax_p, 0]
    # CAMB's get_lens_potential_cls returns [L(L+1)]^2 C_L^phiphi / 2pi
    # (its documented convention, and the one the reference's own
    # file-reading path uses, src/cls.jl:236). The reference's LIVE camb
    # path divides by ell^4 instead (src/cls.jl:186) — a (1+1/L)^2
    # low-L bias (21% at L=10) we deliberately do NOT reproduce; the
    # shipped dat/default_camb_cls.npz is corrected the same way.
    Clpp = extrapolate_cls(ell, ellp,
                           2 * np.pi * Clpp_raw / (ellp * (ellp + 1.0)) ** 2)
    for k in ["unlensed_scalar", "lensed_scalar", "tensor", "unlensed_total", "total"]:
        d = SpecSet()
        for i, x in enumerate(["TT", "EE", "BB", "TE"]):
            d[x] = extrapolate_cls(ell, ellp, alpha * powers[k][2:lmax_p, i] * toClp)
        d["pp"] = Clpp
        d["phiphi"] = Clpp
        out[k] = d
    out["params"] = SpecSet(r=r, ombh2=ombh2, omch2=omch2, tau=tau, mnu=mnu,
                            theta_s=theta_s, H0=H0, logA=logA, ns=ns, nt=nt,
                            AL=AL, k_pivot=k_pivot, lmax=lmax)
    return out


def load_camb_cls(path_prefix, lmax=None,
                  unlensed_scalar_postfix="scalCls.dat",
                  unlensed_tensor_postfix="tensCls.dat",
                  lensed_scalar_postfix="lensedCls.dat",
                  lenspotential_postfix="lenspotentialCls.dat"):
    """Load spectra from CAMB output text files (src/cls.jl:219-276)."""
    def _ext(ell, Cl):
        return Cls(ell, Cl, concrete=False) if lmax is None else extrapolate_cls(np.arange(2, lmax), ell, Cl)

    lp = np.loadtxt(path_prefix + lenspotential_postfix, skiprows=1)
    ell = lp[:, 0]
    Clpp = lp[:, 5] / ((ell * (ell + 1)) ** 2 / (2 * np.pi))
    Clpp = _ext(ell, Clpp)

    us = np.loadtxt(path_prefix + unlensed_scalar_postfix, skiprows=1)
    ell = us[:, 0]
    fac = ell * (ell + 1) / (2 * np.pi)
    unlensed_scalar = SpecSet(
        TT=_ext(ell, us[:, 1] / fac), EE=_ext(ell, us[:, 2] / fac),
        TE=_ext(ell, us[:, 3] / fac), BB=_ext(ell, 0 * ell), pp=Clpp, phiphi=Clpp)

    ls = np.loadtxt(path_prefix + lensed_scalar_postfix, skiprows=1)
    ell = ls[:, 0]
    fac = ell * (ell + 1) / (2 * np.pi)
    lensed_scalar = SpecSet(
        TT=_ext(ell, ls[:, 1] / fac), EE=_ext(ell, ls[:, 2] / fac),
        BB=_ext(ell, ls[:, 3] / fac), TE=_ext(ell, ls[:, 4] / fac), pp=Clpp, phiphi=Clpp)

    ts = np.loadtxt(path_prefix + unlensed_tensor_postfix, skiprows=1)
    ell = ts[:, 0]
    fac = ell * (ell + 1) / (2 * np.pi)
    tensor = SpecSet(
        TT=_ext(ell, ts[:, 1] / fac), EE=_ext(ell, ts[:, 2] / fac),
        BB=_ext(ell, ts[:, 3] / fac), TE=_ext(ell, ts[:, 4] / fac), pp=Clpp, phiphi=Clpp)

    unlensed_total = SpecSet({k: unlensed_scalar[k] + tensor[k] for k in ["TT", "EE", "BB", "TE"]},
                             pp=Clpp, phiphi=Clpp)
    total = SpecSet({k: lensed_scalar[k] + tensor[k] for k in ["TT", "EE", "BB", "TE"]},
                    pp=Clpp, phiphi=Clpp)
    return CMBSpectra(unlensed_scalar=unlensed_scalar, tensor=tensor,
                      lensed_scalar=lensed_scalar, unlensed_total=unlensed_total,
                      total=total, params=SpecSet())


def noise_cls(muKarcminT, beamFWHM=0, lmax=8000, lknee=100, alphaknee=3):
    """White + 1/f noise spectra; polarization noise scaled by sqrt(2)
    (reference src/cls.jl:288-299)."""
    ell = np.arange(2, lmax + 1)
    Bl = beam_cls(beamFWHM=beamFWHM, lmax=lmax)(ell)
    Nl1f = 1 + (lknee / ell) ** alphaknee
    out = SpecSet()
    for x in ["TT", "EE", "BB"]:
        fac = 1 if x == "TT" else 2
        out[x] = Cls(ell, fac * np.deg2rad(muKarcminT / 60) ** 2 / Bl * Nl1f)
    out["TE"] = Cls(ell, np.zeros_like(ell, dtype=np.float64))
    return out


def beam_cls(beamFWHM, lmax=8000):
    """Gaussian beam power spectrum W_ell (src/cls.jl:307-309)."""
    ell = np.arange(2, lmax + 1)
    return Cls(ell, np.exp(-ell ** 2 * np.deg2rad(beamFWHM / 60) ** 2 / (8 * np.log(2))))


from ..core.proj import pixwin  # noqa: E402,F401  (re-export)
