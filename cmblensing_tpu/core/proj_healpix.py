"""HEALPix fields and sphere <-> flat projection.

TPU-native analog of src/proj_healpix.jl: HealpixField holds a RING
map; `project` maps between the sphere and ProjLambert flat patches by
bilinear interpolation, with polarization-angle flattening. Projector
precomputation (pixel-center coordinate maps, psi_pol) is host numpy;
the interpolation applies as jnp gathers so it jits and differentiates.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from .basis import Basis
from .field import Field
from .proj import ProjLambert
from . import healpix_pix as hp


class ProjHealpix:
    """Healpix projection metadata (src/proj_healpix.jl:6-8)."""

    _cache = {}

    def __new__(cls, nside):
        if nside in cls._cache:
            return cls._cache[nside]
        self = super().__new__(cls)
        self.Nside = int(nside)
        self.npix = 12 * nside * nside
        cls._cache[nside] = self
        return self

    def __repr__(self):
        return f"ProjHealpix(Nside={self.Nside})"

    def __hash__(self):
        return hash((ProjHealpix, self.Nside))

    def __eq__(self, other):
        return self is other


@jax.tree_util.register_pytree_node_class
class HealpixField:
    """(ncomp, npix) RING-scheme map field; pol in {I, QU, IQU}."""

    __slots__ = ("arr", "pol", "proj")

    def __init__(self, arr, pol, proj):
        self.arr = arr
        self.pol = pol
        self.proj = proj

    def tree_flatten(self):
        return (self.arr,), (self.pol, self.proj)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(ch[0], *aux)

    @classmethod
    def from_map(cls, m, pol=None):
        m = jnp.atleast_2d(jnp.asarray(m))
        pol = pol or {1: "I", 2: "QU", 3: "IQU"}[m.shape[0]]
        return cls(m, pol, ProjHealpix(hp.npix2nside(m.shape[-1])))

    def __getitem__(self, k):
        comp = {"I": 0, "Q": {"QU": 0, "IQU": 1}, "U": {"QU": 1, "IQU": 2}}[k]
        if isinstance(comp, dict):
            comp = comp[self.pol]
        return HealpixField(self.arr[comp:comp + 1], "I", self.proj)

    def __repr__(self):
        return f"HealpixField({self.pol}, Nside={self.proj.Nside})"


# --- coordinate maps (src/proj_healpix.jl:89-119) --------------------------

def _rot_zyx(rotator):
    """R = Rz(a) Ry(b) Rx(c), rotator in degrees (matching the
    reference's RotZYX(deg2rad.(rotator)))."""
    a, b, c = np.deg2rad(rotator)

    def Rz(t):
        return np.array([[np.cos(t), -np.sin(t), 0],
                         [np.sin(t), np.cos(t), 0], [0, 0, 1]])

    def Ry(t):
        return np.array([[np.cos(t), 0, np.sin(t)], [0, 1, 0],
                         [-np.sin(t), 0, np.cos(t)]])

    def Rx(t):
        return np.array([[1, 0, 0], [0, np.cos(t), -np.sin(t)],
                         [0, np.sin(t), np.cos(t)]])

    return Rz(a) @ Ry(b) @ Rx(c)


def _sph_to_cart(theta, phi):
    st = np.sin(theta)
    return np.stack([st * np.cos(phi), st * np.sin(phi), np.cos(theta)], axis=0)


def _cart_to_sph(v):
    x, y, z = v
    r = np.sqrt(x * x + y * y + z * z)
    theta = np.arccos(np.clip(z / r, -1, 1))
    phi = np.arctan2(y, x)
    return theta, phi


def ij_to_thetaphi(proj: ProjLambert, i, j):
    """(theta, phi) on the sphere of (fractional, 1-based) pixel indices
    of a Lambert patch (src/proj_healpix.jl:89-99)."""
    dx = float(proj.deltax)
    x = dx * (np.asarray(j) - proj.Nx // 2 - 0.5)
    y = dx * (np.asarray(i) - proj.Ny // 2 - 0.5)
    r = np.sqrt(x ** 2 + y ** 2)
    theta = 2 * np.arccos(np.clip(r / 2, 0, 1))
    phi = np.arctan2(-x, -y)
    R = _rot_zyx(proj.rotator)
    v = _sph_to_cart(theta, phi)
    vr = np.linalg.solve(R, v.reshape(3, -1)).reshape(v.shape)
    return _cart_to_sph(vr)


def thetaphi_to_ij(proj: ProjLambert, theta, phi):
    """Inverse map (src/proj_healpix.jl:101-112)."""
    R = _rot_zyx(proj.rotator)
    v = _sph_to_cart(np.asarray(theta), np.asarray(phi))
    vr = (R @ v.reshape(3, -1)).reshape(v.shape)
    th, ph = _cart_to_sph(vr)
    r = 2 * np.cos(th / 2)
    x = -r * np.sin(ph)
    y = -r * np.cos(ph)
    dx = float(proj.deltax)
    i = y / dx + proj.Ny // 2 + 0.5
    j = x / dx + proj.Nx // 2 + 0.5
    return i, j


def ij_to_thetaphi_equirect(proj, i, j):
    """(theta, phi) of (fractional, 1-based) EquiRect pixel indices
    (src/proj_healpix.jl:65-70): the grid IS (theta, phi), so the map
    is affine. Deliberate deviation: the reference's affine map lacks
    the -0.5 its Lambert maps have (proj_healpix.jl:91-92,109-110), so
    its integer i lands a half pixel past the pixel center defined by
    proj_equirect.jl:117-120; here integer (i, j) map exactly to
    (proj.theta[i-1], proj.phi[j-1])."""
    dth = abs(proj.theta_span[1] - proj.theta_span[0])
    dph = abs(proj.phi_span[1] - proj.phi_span[0])
    theta = (dth / proj.Ny * (np.asarray(i, np.float64) - 0.5)
             + proj.theta_span[0])
    phi = (dph / proj.Nx * (np.asarray(j, np.float64) - 0.5)
           + proj.phi_span[0])
    return theta, phi


def thetaphi_to_ij_equirect(proj, theta, phi):
    """Inverse map (src/proj_healpix.jl:58-63), pixel-centered (see
    ij_to_thetaphi_equirect); phi wraps mod 2pi."""
    dth = abs(proj.theta_span[1] - proj.theta_span[0])
    dph = abs(proj.phi_span[1] - proj.phi_span[0])
    i = ((np.asarray(theta, np.float64) - proj.theta_span[0]) / dth
         * proj.Ny + 0.5)
    j = (np.mod(np.asarray(phi, np.float64) - proj.phi_span[0], 2 * np.pi)
         / dph * proj.Nx + 0.5)
    return i, j


def _ij2tp(proj, i, j):
    from .proj_equirect import ProjEquiRect
    if isinstance(proj, ProjEquiRect):
        return ij_to_thetaphi_equirect(proj, i, j)
    return ij_to_thetaphi(proj, i, j)


def _tp2ij(proj, theta, phi):
    from .proj_equirect import ProjEquiRect
    if isinstance(proj, ProjEquiRect):
        return thetaphi_to_ij_equirect(proj, theta, phi)
    return thetaphi_to_ij(proj, theta, phi)


def _psipol(proj, theta, phi):
    from .proj_equirect import ProjEquiRect
    if isinstance(proj, ProjEquiRect):
        # the EquiRect grid is aligned with the spherical coordinate
        # basis: no polarization rotation (src/proj_healpix.jl:74-76)
        return np.zeros(np.broadcast(np.asarray(theta),
                                     np.asarray(phi)).shape)
    return get_psipol(proj, theta, phi)


def get_psipol(proj: ProjLambert, theta, phi, eps=1e-6):
    """Rotation angle of the coordinate basis between sphere and
    projection (src/proj_healpix.jl:114-119), via FD jacobian."""
    theta = np.asarray(theta, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    i_t1, j_t1 = thetaphi_to_ij(proj, theta + eps, phi)
    i_t0, j_t0 = thetaphi_to_ij(proj, theta - eps, phi)
    i_p1, j_p1 = thetaphi_to_ij(proj, theta, phi + eps)
    i_p0, j_p0 = thetaphi_to_ij(proj, theta, phi - eps)
    J11 = (i_t1 - i_t0) / (2 * eps)   # di/dtheta
    J21 = (j_t1 - j_t0) / (2 * eps)   # dj/dtheta
    J12 = (i_p1 - i_p0) / (2 * eps)   # di/dphi
    J22 = (j_p1 - j_p0) / (2 * eps)   # dj/dphi
    return (np.arctan2(J11, J21) + np.arctan2(-J22, J12) - np.pi) / 2


# --- Projector precomputation (src/proj_healpix.jl:254-294) ----------------

class Projector:
    _cache = {}

    def __new__(cls, hpx_proj: ProjHealpix, cart_proj: ProjLambert):
        # key on the proj itself (dict equality), not its hash — a hash
        # collision between distinct grids must not alias projectors
        key = (hpx_proj.Nside, cart_proj)
        if key in cls._cache:
            return cls._cache[key]
        self = super().__new__(cls)
        self._init(hpx_proj, cart_proj)
        cls._cache[key] = self
        return self

    def _init(self, hpx_proj, cart_proj):
        self.hpx_proj = hpx_proj
        self.cart_proj = cart_proj
        Ny, Nx = cart_proj.Ny, cart_proj.Nx
        nside = hpx_proj.Nside

        # theta/phi of cartesian pixel centers (1-based indices);
        # coordinate maps dispatch on the flat projection type
        # (Lambert: src/proj_healpix.jl:89-112; EquiRect: :58-76)
        ii, jj = np.meshgrid(np.arange(1, Ny + 1), np.arange(1, Nx + 1), indexing="ij")
        ths, phs = _ij2tp(cart_proj, ii, jj)
        self.thetas = ths
        self.phis = phs
        self.psipol_thetaphi = _psipol(cart_proj, ths, phs).astype(cart_proj.T)

        # interpolation weights sphere -> cart (gather on device)
        idxs, wgts = hp.get_interp_weights(nside, ths.ravel(), phs.ravel())
        self.sph2cart_idx = jnp.asarray(idxs.astype(np.int32))
        self.sph2cart_w = jnp.asarray(wgts.astype(cart_proj.T))

        # fractional (i,j) of healpix pixel centers in the patch
        th_h, ph_h = hp.pix2ang_ring(nside, np.arange(hp.nside2npix(nside)))
        is_, js_ = _tp2ij(cart_proj, th_h, ph_h)
        self.is_ = is_
        self.js_ = js_
        self.psipol_ij_full = _psipol(cart_proj, th_h, ph_h).astype(cart_proj.T)
        inpatch = (is_ >= 1) & (is_ <= Ny) & (js_ >= 1) & (js_ <= Nx)
        self.hpx_idxs_in_patch = jnp.asarray(np.nonzero(inpatch)[0].astype(np.int32))
        # clamp bilinear stencil inside patch (0-based)
        i0 = np.clip(np.floor(is_ - 1), 0, Ny - 2).astype(np.int32)
        j0 = np.clip(np.floor(js_ - 1), 0, Nx - 2).astype(np.int32)
        wi = np.clip((is_ - 1) - i0, 0, 1).astype(cart_proj.T)
        wj = np.clip((js_ - 1) - j0, 0, 1).astype(cart_proj.T)
        self.cart2sph = (jnp.asarray(i0), jnp.asarray(j0),
                         jnp.asarray(wi), jnp.asarray(wj))


# --- projection (src/proj_healpix.jl:217-341) ------------------------------

def _project_sph_to_cart_comp(projector, m):
    """One spin-0 healpix component (npix,) -> (Ny, Nx)."""
    idx, w = projector.sph2cart_idx, projector.sph2cart_w
    vals = jnp.sum(m[idx] * w, axis=0)
    return vals.reshape(projector.cart_proj.Ny, projector.cart_proj.Nx)


def _project_cart_to_sph_comp(projector, arr):
    """One spin-0 (..., Ny, Nx) map -> (..., npix), zeros off-patch.
    Interpolation is evaluated ONLY at the in-patch healpix pixels
    (like the fft sibling below), and leading batch axes ride through
    (a full flatten used to silently return only batch 0)."""
    i0, j0, wi, wj = projector.cart2sph
    Nx = projector.cart_proj.Nx
    sel = projector.hpx_idxs_in_patch
    i0s, j0s = i0[sel], j0[sel]
    wis, wjs = wi[sel], wj[sel]
    flat = arr.reshape(arr.shape[:-2] + (-1,))
    g = lambda di, dj: flat[..., (i0s + di) * Nx + (j0s + dj)]
    vals = ((1 - wis) * (1 - wjs) * g(0, 0) + (1 - wis) * wjs * g(0, 1)
            + wis * (1 - wjs) * g(1, 0) + wis * wjs * g(1, 1))
    npix = projector.hpx_proj.npix
    out = jnp.zeros(arr.shape[:-2] + (npix,), dtype=arr.dtype)
    return out.at[..., sel].set(vals)


def _project_cart_to_sph_comp_fft(projector, arr):
    """Band-limited (Fourier-series) interpolation of the flat map at
    the healpix pixel centers — the reference's NFFT method
    (src/proj_healpix.jl:314-325), via ops.nufft. Differentiable."""
    from ..ops.nufft import nufft_eval
    sel = projector.hpx_idxs_in_patch
    ys = jnp.asarray(projector.is_, dtype=arr.dtype)[sel] - 1.0
    xs = jnp.asarray(projector.js_, dtype=arr.dtype)[sel] - 1.0
    vals = nufft_eval(arr, ys, xs)                  # (..., npts)
    # leading batch axes ride through (like the bilinear sibling above)
    out = jnp.zeros(arr.shape[:-2] + (projector.hpx_proj.npix,),
                    dtype=arr.dtype)
    return out.at[..., sel].set(vals)


def _project_sph_to_cart_comp_fft(projector, m, cg_iters=15):
    """NUFFT resampling of in-patch healpix values onto the flat grid:
    a short fixed-iteration CG solve of the normal equations
    (A^T A + lam) x = A^T v with A the Fourier interpolant sampled at
    the healpix centers. (The reference's NFFT route,
    src/proj_healpix.jl:229-236, uses plain A^T v / n, valid only when
    the sphere sampling is much denser than the flat band-limit; the
    tiny CG solve is robust at any density.)"""
    from ..ops.nufft import nufft_adjoint, nufft_eval
    sel = projector.hpx_idxs_in_patch
    Ny, Nx = projector.cart_proj.Ny, projector.cart_proj.Nx
    ys = jnp.asarray(projector.is_, dtype=m.dtype)[sel] - 1.0
    xs = jnp.asarray(projector.js_, dtype=m.dtype)[sel] - 1.0
    vals = m[sel]
    npts = ys.shape[0]
    lam = 1e-3 * npts / (Ny * Nx)

    def AtA(x):
        return nufft_adjoint(nufft_eval(x, ys, xs), ys, xs, Ny, Nx) + lam * x

    b = nufft_adjoint(vals, ys, xs, Ny, Nx)
    from ..ops.solvers import conjugate_gradient
    x, _ = conjugate_gradient(lambda r: r, AtA, b, nsteps=cg_iters,
                              tol=0.0, fixed_iters=True)
    return x


def project(field, to, method="bilinear"):
    """Project a HealpixField to a flat patch (ProjLambert OR
    ProjEquiRect), or a flat field up to a ProjHealpix sphere, with
    polarization flattening (src/proj_healpix.jl:217-341; the EquiRect
    coordinate maps are :58-76). method in {'bilinear', 'fft'} — 'fft'
    uses the NUFFT (band-limited, differentiable)."""
    from .proj_equirect import ProjEquiRect, EquiRectField
    assert method in ("bilinear", "fft")
    sph2cart = (_project_sph_to_cart_comp if method == "bilinear"
                else _project_sph_to_cart_comp_fft)
    cart2sph = (_project_cart_to_sph_comp if method == "bilinear"
                else _project_cart_to_sph_comp_fft)

    if isinstance(field, HealpixField) and isinstance(to, ProjEquiRect):
        projector = Projector(field.proj, to)
        comps = [sph2cart(projector, field.arr[c])
                 for c in range(field.arr.shape[0])]
        if field.pol == "I":
            return EquiRectField(comps[0], "map", to)
        if field.pol == "QU":
            # psipol = 0 on the (theta, phi)-aligned grid: no rotation
            return EquiRectField(jnp.stack(comps, axis=0), "qu_map", to)
        raise NotImplementedError(
            "EquiRect fields carry I ('map') or QU ('qu_map') "
            "components; project I and P separately for IQU")

    if isinstance(field, EquiRectField) and isinstance(to, ProjHealpix):
        projector = Projector(to, field.proj)
        if field.basis in ("map", "az"):
            fm = field.to("map")
            return HealpixField(
                cart2sph(projector, fm.arr)[None], "I", to)
        fm = field.to("qu_map")
        comps = [cart2sph(projector, fm.arr[..., c, :, :])
                 for c in range(2)]
        return HealpixField(jnp.stack(comps, axis=0), "QU", to)

    if isinstance(field, HealpixField) and isinstance(to, ProjLambert):
        projector = Projector(field.proj, to)
        psi = jnp.asarray(projector.psipol_thetaphi)
        comps = [sph2cart(projector, field.arr[c])
                 for c in range(field.arr.shape[0])]
        if field.pol == "I":
            arr = jnp.stack(comps, axis=0)
            return Field(arr, Basis("I", "map"), to)
        off = 1 if field.pol == "IQU" else 0
        Q, U = comps[off], comps[off + 1]
        c2, s2 = jnp.cos(2 * psi), jnp.sin(2 * psi)
        Qf = Q * c2 - U * s2
        Uf = U * c2 + Q * s2
        parts = ([comps[0]] if off else []) + [Qf, Uf]
        return Field(jnp.stack(parts, axis=0), Basis(field.pol, "map"), to)

    if isinstance(field, Field) and isinstance(to, ProjHealpix):
        projector = Projector(to, field.proj)
        fm = field.to(field.basis.with_space("map"))
        psi = jnp.asarray(projector.psipol_ij_full)
        pol = fm.basis.pol
        if pol in ("EB", "IEB"):
            fm = fm.to(fm.basis.with_pol("QU" if pol == "EB" else "IQU"))
            pol = fm.basis.pol
        comps = [cart2sph(projector, fm.arr[..., c, :, :])
                 for c in range(fm.arr.shape[-3])]
        if pol == "I":
            return HealpixField(jnp.stack(comps, axis=0), "I", to)
        off = 1 if pol == "IQU" else 0
        Q, U = comps[off], comps[off + 1]
        c2, s2 = jnp.cos(2 * psi), jnp.sin(2 * psi)
        Qf = Q * c2 + U * s2
        Uf = U * c2 - Q * s2
        parts = ([comps[0]] if off else []) + [Qf, Uf]
        return HealpixField(jnp.stack(parts, axis=0), pol, to)

    raise TypeError(f"can't project {type(field)} -> {type(to)}")
