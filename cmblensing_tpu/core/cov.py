"""Building covariance operators from angular power spectra.

TPU-native analog of Cℓ_to_Cov (src/proj_lambert.jl:361-411): a
covariance diagonal in 2-D Fourier space is Cl(|l|)/Omega_pix, built
host-side in numpy (setup-time) and stored as device constants.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .basis import Basis, FOURIER, EB_FOURIER, IEB_FOURIER
from .field import Field
from .ops import Diag, BlockDiagIEB, ParamDependentOp, nan2zero
from .proj import ProjLambert
from ..utils.cls import Cls


def Cl_to_2D(Cl, proj: ProjLambert):
    """Evaluate a 1-D spectrum on the 2-D |l| grid, NaN->0
    (src/proj_lambert.jl:173-175)."""
    v = Cl(np.asarray(proj.lmag, dtype=np.float64))
    v = np.nan_to_num(v, nan=0.0, posinf=0.0, neginf=0.0)
    return v.astype(proj.T)


def _fourier_field(arrs, proj, pol):
    arr = np.stack(arrs, axis=0)
    return Field(jnp.asarray(arr, dtype=proj.T.type), Basis(pol, "fourier"), proj)


def Cl_to_Cov(pol, proj: ProjLambert, *Cl, units=None):
    """Build a Fourier-diagonal covariance operator.

    pol='I':  Cl_to_Cov('I', proj, ClTT)
    pol='P':  Cl_to_Cov('P', proj, ClEE, ClBB)          -> Diag on EB
    pol='IP': Cl_to_Cov('IP', proj, ClTT, ClEE, ClBB, ClTE) -> BlockDiagIEB

    Any spectrum may instead be a tuple (Cl, ledges, name) to produce a
    bandpower-rescalable ParamDependentOp (src/proj_lambert.jl:374-402).
    units defaults to Omega_pix (covariance of *pixel-unit* maps).
    """
    if units is None:
        units = float(proj.Omega_pix)
    pol = str(pol)

    has_banded = any(isinstance(c, tuple) for c in Cl)
    if not has_banded:
        return _cl_to_cov_fixed(pol, proj, Cl, units)
    return _cl_to_cov_banded(pol, proj, Cl, units)


def _cl_to_cov_fixed(pol, proj, Cl, units):
    if pol == "I":
        (ClTT,) = Cl
        return Diag(_fourier_field([Cl_to_2D(ClTT, proj) / units], proj, "I"))
    if pol == "P":
        ClEE, ClBB = Cl
        return Diag(_fourier_field(
            [Cl_to_2D(ClEE, proj) / units, Cl_to_2D(ClBB, proj) / units], proj, "EB"))
    if pol == "IP":
        ClTT, ClEE, ClBB, ClTE = Cl
        F = lambda c: _fourier_field([Cl_to_2D(c, proj) / units], proj, "I")
        return BlockDiagIEB(F(ClTT), F(ClTE), F(ClEE), F(ClBB))
    raise ValueError(pol)


def _find_bins(ledges, lmag):
    """Bin index of each |l| grid entry; out-of-range -> nbins
    (reference findbin, src/proj_lambert.jl:405-407)."""
    ledges = np.asarray(ledges, dtype=np.float64)
    idx = np.searchsorted(ledges, np.asarray(lmag, dtype=np.float64), side="right") - 1
    nbins = len(ledges) - 1
    idx = np.where((lmag < ledges[0]) | (lmag >= ledges[-1]), nbins, idx)
    return idx.astype(np.int32)


def _bandpower_rescale(arr0, bin_idx, amplitudes):
    """Rescale a 2-D covariance array by per-bin amplitudes (with an
    implicit trailing amplitude 1 for out-of-range)."""
    amps = jnp.concatenate([jnp.atleast_1d(amplitudes), jnp.ones(1, dtype=amplitudes.dtype)])
    return amps[bin_idx] * arr0


def _cl_to_cov_banded(pol, proj, Cl, units):
    """Pattern-free banded covariances: ANY subset of the spectra may
    be a (Cl, ledges, name) tuple, each becoming an independent
    bandpower-amplitude theta parameter. Goes beyond the reference,
    which hard-codes three patterns — TT / EE-only / TT+EE+TE
    (src/proj_lambert.jl:374-402) — so e.g. a BB-banded P covariance
    (delensing-efficiency inference) or a jointly TT+EE+BB+TE-banded
    IP covariance works here."""
    slots = {"I": ("TT",), "P": ("EE", "BB"),
             "IP": ("TT", "EE", "BB", "TE")}[pol]
    if len(Cl) != len(slots):
        raise ValueError(f"Cl_to_Cov('{pol}') takes {len(slots)} spectra "
                         f"({', '.join(slots)}); got {len(Cl)}")
    base, banded, names = [], {}, []
    for slot, c in zip(slots, Cl):
        if isinstance(c, tuple):
            cl0, ledges, name = c
            base.append(cl0)
            banded[slot] = (jnp.asarray(_find_bins(ledges, proj.lmag)),
                            name, len(ledges) - 1)
            names.append(name)
        else:
            base.append(c)
    if len(set(names)) != len(names):
        raise ValueError(f"banded spectra must use distinct theta names; "
                         f"got {names}")
    C0 = _cl_to_cov_fixed(pol, proj, tuple(base), units)

    def _amps(theta, slot):
        bins, name, nbins = banded[slot]
        a = jnp.asarray(theta.get(name, np.ones(nbins)), dtype=proj.T.type)
        return bins, a

    if pol in ("I", "P"):
        basis = FOURIER if pol == "I" else EB_FOURIER

        def fn(deps, **theta):
            (C0,) = deps
            planes = []
            for k, slot in enumerate(slots):
                plane = C0.diag.arr[..., k:k + 1, :, :]
                if slot in banded:
                    bins, a = _amps(theta, slot)
                    plane = _bandpower_rescale(plane, bins[None], a)
                planes.append(plane)
            arr = planes[0] if len(planes) == 1 else jnp.concatenate(
                planes, axis=-3)
            return Diag(Field(arr, basis, proj))

        return ParamDependentOp(tuple(names), fn, (C0,))

    def fn(deps, **theta):
        (C0,) = deps
        comp = {}
        for slot, fld in (("TT", C0.TT), ("TE", C0.TE),
                          ("EE", C0.EE), ("BB", C0.BB)):
            if slot in banded:
                bins, a = _amps(theta, slot)
                comp[slot] = Field(
                    _bandpower_rescale(fld.arr, bins[None], a),
                    FOURIER, proj)
            else:
                comp[slot] = fld
        return BlockDiagIEB(comp["TT"], comp["TE"], comp["EE"], comp["BB"])

    return ParamDependentOp(tuple(names), fn, (C0,))


def cov_to_Cl(C, **kwargs):
    """Convert a spin-0 Fourier-diagonal covariance back to binned Cls
    (src/proj_lambert.jl:415-419)."""
    from ..utils.spectra import get_Cl
    d = C.diag if isinstance(C, Diag) else C
    proj = d.proj
    alpha = proj.Nx * proj.Ny / float(proj.deltax) ** 2
    # the reference scales the sqrt-diagonal FIELD by sqrt(alpha)
    # (proj_lambert.jl:417); get_Cl is quadratic in the field, so the
    # equivalent output factor is alpha (a sqrt(alpha) output factor
    # left the round trip cov_to_Cl(Cl_to_Cov(Cl)) low by 1/sqrt(alpha))
    f = Field(jnp.sqrt(jnp.abs(d.arr)).astype(d.arr.dtype), d.basis, proj)
    return get_Cl(f, **kwargs) * alpha
