"""EquiRect (cylindrical / ring-pixelized) curved-sky band fields.

TPU-native analog of src/proj_equirect.jl: fields on an equirectangular
grid with azimuthal-FFT bases (AzFourier / QUAzFourier), and isotropic
covariances block-diagonal in azimuthal m with dense n_theta x n_theta
(or 2n_theta x 2n_theta for spin-2) blocks per m.

Design differences vs the reference, TPU-motivated:

* Block linear algebra (matvec/matmul, reference Tullio kernels at
  src/proj_equirect.jl:230-268) is jnp.einsum over the stacked
  (m, p, q) block axis — batched matmuls straight onto the MXU.
  sqrt/pinv are batched jnp.linalg SVD; logabsdet batched slogdet.

* Cl_to_Cov builds blocks *exactly* from spin-weighted spherical
  harmonics via Wigner-d recurrences,

      block_m[t1, t2] = nphi * sum_alias sum_l C_l lam_{l m}(t1) lam_{l m}(t2)

  (each block one (ntheta x lmax)(lmax x ntheta) matmul) instead of the
  reference's optional CirculantCov route (interpolated correlation
  function + FFT, src/proj_equirect.jl:434-503) — exact, deterministic,
  and matmul-shaped.
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


class ProjEquiRect:
    """Equirect projection metadata (src/proj_equirect.jl:2-17)."""

    _cache = {}

    def __new__(cls, Ny=None, Nx=None, theta_span=None, phi_span=None,
                T=np.float32):
        T = np.dtype(T)
        key = (Ny, Nx, tuple(sorted(theta_span)), tuple(sorted(phi_span)), T.str)
        if key in cls._cache:
            return cls._cache[key]
        self = super().__new__(cls)
        self._init(Ny, Nx, key[2], key[3], T)
        cls._cache[key] = self
        return self

    def _init(self, Ny, Nx, theta_span, phi_span, T):
        self.Ny = Ny
        self.Nx = Nx
        self.theta_span = theta_span
        self.phi_span = phi_span
        self.T = T
        self.complex_T = np.dtype(np.complex64) if T == np.dtype(np.float32) else np.dtype(np.complex128)
        # pixel centers/edges (src/proj_equirect.jl:117-120)
        self.phi_edges = np.mod(np.linspace(phi_span[0], phi_span[1], Nx + 1), 2 * np.pi)
        self.phi = np.mod(np.linspace(phi_span[0], phi_span[1], 2 * Nx + 1)[1::2], 2 * np.pi)
        self.theta_edges = np.linspace(theta_span[0], theta_span[1], Ny + 1)
        self.theta = np.linspace(theta_span[0], theta_span[1], 2 * Ny + 1)[1::2]
        # pixel areas Omega (src/proj_equirect.jl:73)
        dphi = np.mod(self.phi_edges[1] - self.phi_edges[0], 2 * np.pi)
        self.Omega = (dphi * np.diff(-np.cos(self.theta_edges))).astype(np.float64)
        self.phi_full_circle = abs(abs(phi_span[1] - phi_span[0]) - 2 * np.pi) < 1e-8

    def __hash__(self):
        return hash((ProjEquiRect, self.Ny, self.Nx, self.theta_span, self.phi_span, self.T.str))

    # serialization by parameters only, rehydrating through the
    # memoized constructor — like ProjLambert.__reduce__ — so unpickled
    # fields share the SAME proj singleton (identity __eq__ / pytree
    # aux-data comparisons depend on it)
    def __reduce__(self):
        return (ProjEquiRect, (self.Ny, self.Nx, self.theta_span,
                               self.phi_span, self.T))

    def __eq__(self, other):
        return self is other

    def __repr__(self):
        return f"ProjEquiRect(Ny={self.Ny}, Nx={self.Nx})"


@jax.tree_util.register_pytree_node_class
class EquiRectField:
    """Field on an EquiRect grid.

    bases: 'map' (..., nT, nP) real | 'az' (..., nT, nP//2+1) complex
           'qu_map' (..., 2, nT, nP) real | 'qu_az' (..., 2nT, nP//2+1) complex
    The qu_az layout stacks [P_m(theta); conj(P_{-m})(theta)]
    (src/proj_equirect.jl:160-178).

    Gradient convention: like Lambert fields (core/field.py::fgrad),
    take gradients w.r.t. MAP-basis ('map'/'qu_map') pixel DOF — there
    the raw jax.grad cotangent IS the gradient field, with no
    rfft-degeneracy bookkeeping. Differentiating w.r.t. the 'az'
    half-plane representation would need λ_rfft-style weights (the
    problem the reference solves in autodiff.jl:27-57); the AD tests
    (tests/test_projections.py) pin the map-basis convention."""

    __slots__ = ("arr", "basis", "proj")

    def __init__(self, arr, basis, proj):
        self.arr = arr
        self.basis = basis
        self.proj = proj

    def tree_flatten(self):
        return (self.arr,), (self.basis, self.proj)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(ch[0], *aux)

    def __repr__(self):
        return f"EquiRectField({self.basis}, {self.arr.shape})"

    # --- conversions ----------------------------------------------------
    def to(self, basis):
        if basis == self.basis:
            return self
        nP = self.proj.Nx
        nT = self.proj.Ny
        rsq = np.sqrt(nP)
        if self.basis == "map" and basis == "az":
            return EquiRectField(jnp.fft.rfft(self.arr, axis=-1) / rsq, "az", self.proj)
        if self.basis == "az" and basis == "map":
            return EquiRectField(jnp.fft.irfft(self.arr, n=nP, axis=-1) * rsq, "map", self.proj)
        if self.basis == "qu_map" and basis == "qu_az":
            if nP % 2:
                raise NotImplementedError(
                    "qu_map <-> qu_az needs even Nx (the m-column "
                    "folding assumes it); the spin-0 'az' path supports "
                    "odd Nx")
            P = self.arr[..., 0, :, :] + 1j * self.arr[..., 1, :, :]
            F = jnp.fft.fft(P, axis=-1) / rsq             # (..., nT, nP)
            top = F[..., :, : nP // 2 + 1]
            # bottom: conj(P_{-m}) for m = 0..nP//2 — columns [0, nP-1, ..., nP//2]
            idx = np.concatenate([[0], np.arange(nP - 1, nP // 2 - 1, -1)])
            bot = jnp.conj(F[..., :, idx])
            return EquiRectField(jnp.concatenate([top, bot], axis=-2), "qu_az", self.proj)
        if self.basis == "qu_az" and basis == "qu_map":
            top = self.arr[..., :nT, :]                    # P_m, m=0..nP//2
            bot = self.arr[..., nT:, :]                    # conj(P_{-m})
            F = jnp.zeros(self.arr.shape[:-2] + (nT, nP), dtype=self.arr.dtype)
            F = F.at[..., :, : nP // 2 + 1].set(top)
            idx = np.concatenate([[0], np.arange(nP - 1, nP // 2 - 1, -1)])
            F = F.at[..., :, idx].set(jnp.conj(bot))
            P = jnp.fft.ifft(F, axis=-1) * np.sqrt(nP)
            qu = jnp.stack([jnp.real(P), jnp.imag(P)], axis=-3)
            return EquiRectField(qu, "qu_map", self.proj)
        raise ValueError(f"no conversion {self.basis} -> {basis}")

    # --- algebra --------------------------------------------------------
    def _binop(self, other, op):
        if isinstance(other, EquiRectField):
            o = other.to(self.basis)
            return EquiRectField(op(self.arr, o.arr), self.basis, self.proj)
        return EquiRectField(op(self.arr, other), self.basis, self.proj)

    def __add__(self, o):
        return self._binop(o, jnp.add)

    def __sub__(self, o):
        return self._binop(o, jnp.subtract)

    def __mul__(self, o):
        return self._binop(o, jnp.multiply)

    __rmul__ = __mul__

    def __neg__(self):
        return EquiRectField(-self.arr, self.basis, self.proj)

    def __truediv__(self, o):
        return self._binop(o, jnp.divide)

    @property
    def batch_shape(self):
        """Leading batch axes (the generic Field protocol; lets the
        inference stack treat EquiRect fields like Lambert ones)."""
        ncore = 3 if self.basis in ("qu_map",) else 2
        return self.arr.shape[: self.arr.ndim - ncore]


def er_dot(a: EquiRectField, b: EquiRectField):
    """Pixel-space dot product (src/proj_equirect.jl:355). Leading
    batch axes are preserved (per-sim scalars), matching the Lambert
    Field dot convention."""
    am = a.to("map" if a.basis in ("map", "az") else "qu_map")
    bm = b.to(am.basis)
    nred = 2 if am.basis == "map" else 3
    axes = tuple(range(-nred, 0))
    return jnp.sum(am.arr * bm.arr, axis=axes)


# =========================================================================
# BlockDiagEquiRect
# =========================================================================

@jax.tree_util.register_pytree_node_class
class BlockDiagEquiRect:
    """Operator block-diagonal in azimuthal m: blocks (nm, n, n),
    n = nT (spin-0, basis 'az') or 2nT (spin-2, basis 'qu_az')."""

    __slots__ = ("blocks", "basis", "proj")

    def __init__(self, blocks, basis, proj):
        self.blocks = blocks
        self.basis = basis   # 'az' or 'qu_az'
        self.proj = proj

    def tree_flatten(self):
        return (self.blocks,), (self.basis, self.proj)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(ch[0], *aux)

    def _fld(self, f):
        return f.to(self.basis)

    def __matmul__(self, f: EquiRectField) -> EquiRectField:
        g = self._fld(f)
        out = jnp.einsum("mpq,...qm->...pm", self.blocks, g.arr,
                         precision=jax.lax.Precision.HIGHEST)
        return EquiRectField(out, self.basis, self.proj)

    @property
    def H(self):
        return BlockDiagEquiRect(jnp.conj(jnp.swapaxes(self.blocks, -1, -2)),
                                 self.basis, self.proj)

    def __mul__(self, other):
        if isinstance(other, BlockDiagEquiRect):
            return BlockDiagEquiRect(
                jnp.einsum("mpj,mjq->mpq", self.blocks, other.blocks,
                           precision=jax.lax.Precision.HIGHEST),
                self.basis, self.proj)
        return BlockDiagEquiRect(other * self.blocks, self.basis, self.proj)

    __rmul__ = __mul__

    def __add__(self, other):
        if isinstance(other, BlockDiagEquiRect):
            return BlockDiagEquiRect(self.blocks + other.blocks, self.basis, self.proj)
        return NotImplemented

    def __sub__(self, other):
        if isinstance(other, BlockDiagEquiRect):
            return BlockDiagEquiRect(self.blocks - other.blocks, self.basis, self.proj)
        return NotImplemented

    def sqrt(self):
        """Per-block SVD sqrt (src/proj_equirect.jl:313-323), batched."""
        U, S, Vh = jnp.linalg.svd(self.blocks)
        s = jnp.sqrt(jnp.maximum(jnp.real(S), 0)).astype(self.blocks.dtype)
        return BlockDiagEquiRect(
            jnp.einsum("mij,mj,mjk->mik", U, s, Vh,
                       precision=jax.lax.Precision.HIGHEST),
            self.basis, self.proj)

    def pinv(self, rtol=1e-6):
        # pinv = V S^+ U^H from blocks = U S V^H, batched over m
        U, S, Vh = jnp.linalg.svd(self.blocks)
        smax = jnp.max(S, axis=-1, keepdims=True)
        sinv = jnp.where(S > rtol * smax, 1.0 / S, 0.0).astype(self.blocks.dtype)
        return BlockDiagEquiRect(
            jnp.einsum("mji,mj,mkj->mik", jnp.conj(Vh), sinv, jnp.conj(U),
                       precision=jax.lax.Precision.HIGHEST),
            self.basis, self.proj)

    inv = pinv

    def solve(self, f: EquiRectField) -> EquiRectField:
        g = self._fld(f)
        x = jnp.moveaxis(g.arr, -1, 0)[..., None]      # (m, ..., n, 1)
        nb = x.ndim - 3                                # extra batch dims
        B = jnp.reshape(self.blocks,
                        (self.blocks.shape[0],) + (1,) * nb + self.blocks.shape[1:])
        out = jnp.linalg.solve(B.astype(x.dtype), x)[..., 0]
        return EquiRectField(jnp.moveaxis(out, 0, -1), self.basis, self.proj)

    def logabsdet(self):
        sign, ld = jnp.linalg.slogdet(self.blocks)
        return jnp.sum(ld), jnp.prod(sign)

    def logdet(self):
        """Pseudo-logdet: sum of log|det| over blocks (the package's
        safe_log_abs convention; the reference only exposes logabsdet,
        proj_equirect.jl:342-347). A negative-determinant block would
        otherwise yield a silent NaN from log(sign)."""
        l, _ = self.logabsdet()
        return l

    def zero_field(self, batch_shape=()):
        """Zero field in the map-space domain of this operator (the
        generic Field/operator protocol hook used by argmaxf_logpdf to
        build CG starting points — curved-sky Wiener filtering runs
        through the SAME inference code as Lambert, cf. the reference
        where EquiRect fields are BaseFields, src/proj_equirect.jl:39-55)."""
        proj = self.proj
        if self.basis == "az":
            sh, b = batch_shape + (proj.Ny, proj.Nx), "map"
        else:
            sh, b = batch_shape + (2, proj.Ny, proj.Nx), "qu_map"
        return EquiRectField(jnp.zeros(sh, dtype=proj.T.type), b, proj)

    def simulate(self, key, batch_shape=()):
        """sqrt(M) @ white map noise (src/proj_equirect.jl:399-405);
        batch_shape adds leading batch axes (one sim per entry)."""
        proj = self.proj
        if self.basis == "az":
            xi = jax.random.normal(key, batch_shape + (proj.Ny, proj.Nx),
                                   dtype=proj.T.type)
            f = EquiRectField(xi, "map", proj)
        else:
            xi = jax.random.normal(key, batch_shape + (2, proj.Ny, proj.Nx),
                                   dtype=proj.T.type)
            f = EquiRectField(xi, "qu_map", proj)
        return self.sqrt() @ f


def mapblocks(fun, M: BlockDiagEquiRect, f: EquiRectField):
    """Apply fun(block, vec) per m (src/proj_equirect.jl:367-381), via
    vmap over the m axis."""
    g = f.to(M.basis)
    x = jnp.moveaxis(g.arr, -1, 0)           # (m, ..., n)
    out = jax.vmap(fun)(M.blocks, x)
    return EquiRectField(jnp.moveaxis(out, 0, -1), M.basis, M.proj)


# =========================================================================
# Wigner-d based exact covariance construction
# =========================================================================

def _wigner_d_column(lmax, m, s, costheta):
    """d^l_{m s}(theta) for l = 0..lmax at the given points, via the
    standard 3-term recurrence in l. Returns (lmax+1, npts) float64.
    Entries with l < max(|m|,|s|) are zero."""
    x = np.asarray(costheta, dtype=np.float64)
    npts = x.shape[0]
    out = np.zeros((lmax + 1, npts))
    l0 = max(abs(m), abs(s))
    if l0 > lmax:
        return out
    # starting value d^{l0}_{m s}
    # (e.g. Varshalovich 4.3.4): with l0 = |m| >= |s| or |s| > |m|
    from math import lgamma

    def start(m, s, x):
        # d^{l0}_{ms} for l0 = max(|m|,|s|)
        if abs(m) >= abs(s):
            l = abs(m)
            # d^l_{ms} with |m|=l:
            # d^l_{l s} = sqrt((2l)!/((l+s)!(l-s)!)) cos(t/2)^{l+s} (-sin(t/2))^{l-s} ... sign conventions
            if m >= 0:
                mm, ss = m, s
                lnc = 0.5 * (lgamma(2 * l + 1) - lgamma(l + ss + 1) - lgamma(l - ss + 1))
                c = np.cos(np.arccos(x) / 2)
                sn = np.sin(np.arccos(x) / 2)
                return np.exp(lnc) * (c ** (l + ss)) * ((-sn) ** (l - ss))
            else:
                # d^l_{-m',s}(t) = (-1)^{m'+s}? use symmetry d^l_{m s} = (-1)^{m-s} d^l_{-m -s}
                return ((-1.0) ** (m - s)) * start(-m, -s, x)
        else:
            # |s| > |m|: use d^l_{m s} = (-1)^{m-s} d^l_{s m}
            return ((-1.0) ** (m - s)) * start(s, m, x)

    out[l0] = start(m, s, x)
    if l0 + 1 <= lmax:
        # one-step recurrence needs d^{l0-1} = 0, standard formula
        for l in range(l0, lmax):
            if l == 0:
                # d^1_{00} = x
                out[1] = x * out[0]
                continue
            a = (2 * l + 1) * (l * (l + 1) * x - m * s)
            b = (l + 1) * np.sqrt(max(l * l - m * m, 0) * max(l * l - s * s, 0))
            c = l * np.sqrt(((l + 1) ** 2 - m * m) * ((l + 1) ** 2 - s * s))
            if c == 0:
                break
            out[l + 1] = (a * out[l] - b * out[l - 1]) / c
    return out


def _lambda(lmax, m, s, theta):
    """sqrt((2l+1)/4pi) (-1)^m d^l_{-m, s}(theta) — the theta part of
    the spin-s harmonic sYlm. (lmax+1, ntheta)."""
    x = np.cos(np.asarray(theta, dtype=np.float64))
    d = _wigner_d_column(lmax, -m, s, x)
    l = np.arange(lmax + 1)[:, None]
    return np.sqrt((2 * l + 1) / (4 * np.pi)) * ((-1.0) ** m) * d


def _alias_ms(m, nphi, lmax):
    """All aliased azimuthal orders m + j*nphi with |.| <= lmax."""
    ms = []
    j = 0
    while True:
        hit = False
        for mm in ({m} if j == 0 else {m + j * nphi, m - j * nphi}):
            if abs(mm) <= lmax:
                ms.append(mm)
                hit = True
        if not hit:
            break
        j += 1
    return ms


def Cl_to_Cov_EquiRect(pol, proj: ProjEquiRect, *Cls, lmax=3000, units=1):
    """Exact isotropic covariance, block-diagonal in m.

    pol='I':  Cl_to_Cov_EquiRect('I', proj, ClTT)
    pol='P':  Cl_to_Cov_EquiRect('P', proj, ClEE, ClBB)

    Requires a full-circle phi span (like the reference,
    src/proj_equirect.jl:96-98)."""
    assert proj.phi_full_circle, "Cl_to_Cov requires phi span = 2 pi"
    theta = proj.theta
    nT, nP = proj.Ny, proj.Nx
    nm = nP // 2 + 1
    ell = np.arange(lmax + 1)

    if pol == "I":
        (Cl,) = Cls
        Cl_arr = np.nan_to_num(Cl(ell)) * units
        blocks = np.zeros((nm, nT, nT))
        for m in range(nm):
            for mm in _alias_ms(m, nP, lmax):
                lam = _lambda(lmax, mm, 0, theta)          # (L, nT)
                blocks[m] += (lam * Cl_arr[:, None]).T @ lam
        blocks *= nP
        # host numpy blocks: this is a setup-time constructor, and an
        # eager complex h2d here would break on remotely-attached TPUs;
        # move with utils.transfer.device_put_safe (or let jit upload)
        return BlockDiagEquiRect(blocks.astype(proj.T), "az", proj)

    if pol == "P":
        ClEE, ClBB = Cls
        CE = np.nan_to_num(ClEE(ell)) * units
        CB = np.nan_to_num(ClBB(ell)) * units
        blocks = np.zeros((nm, 2 * nT, 2 * nT), dtype=np.complex128)
        for m in range(nm):
            # rows: [P_m(theta); conj(P_{-m})(theta)]
            # P_m(theta) = sum_l (E_lm + i B_lm) (-lam2_{lm}) with
            # sP = Q+iU = -sum (E+iB) 2Ylm ... conventions absorb into
            # the quadratic forms below:
            # <P_m P_m^dag>    = sum (CE+CB) lam2_m lam2_m
            # <P_m (P_-m)^T>   = sum (CE-CB) lam2_m lam2neg_m
            for mm in _alias_ms(m, nP, lmax):
                lam_p = _lambda(lmax, mm, 2, theta)        # (L, nT) for spin +2
                lam_n = _lambda(lmax, mm, -2, theta)
                gam = (lam_p * (CE + CB)[:, None]).T @ lam_p      # <P Pbar>
                xi = (lam_p * (CE - CB)[:, None]).T @ lam_n       # <P P(-m)>
                gam_c = (lam_n * (CE + CB)[:, None]).T @ lam_n    # <Pbar(-m) ...>
                blocks[m, :nT, :nT] += gam
                blocks[m, :nT, nT:] += xi
                blocks[m, nT:, :nT] += xi.T.conj()
                blocks[m, nT:, nT:] += gam_c
        # factor 1/2: the P = Q+iU white-noise convention used by
        # simulate (QU map randn) has <xi xi^H> = 2I, so operator
        # blocks are half the P-covariance (matching the reference's
        # CirculantCov normalization so simulate() reproduces C_l)
        blocks *= nP / 2
        return BlockDiagEquiRect(blocks.astype(proj.complex_T), "qu_az", proj)

    raise ValueError(pol)


def Cl_to_Beam_EquiRect(pol, proj: ProjEquiRect, Cl, lmax=3000, units=1):
    """Beam operator: covariance blocks right-multiplied by pixel areas
    (src/proj_equirect.jl:505-535)."""
    cov = Cl_to_Cov_EquiRect("I", proj, Cl, lmax=lmax, units=units)
    # keep construction on HOST numpy like Cl_to_Cov_EquiRect — an
    # eager device transfer at setup time breaks on remotely-attached
    # TPUs (complex h2d is unimplemented there), and keeps blocks
    # uniformly typed between Cov and Beam operators
    blocks = np.asarray(cov.blocks)
    Om = proj.Omega.astype(np.float64)
    if pol == "I":
        return BlockDiagEquiRect(blocks * Om[None, None, :].astype(proj.T),
                                 "az", proj)
    if pol == "P":
        Z = np.zeros_like(blocks)
        big = np.concatenate([np.concatenate([blocks, Z], axis=-1),
                              np.concatenate([Z, blocks], axis=-1)], axis=-2)
        OmOm = np.concatenate([Om, Om])
        return BlockDiagEquiRect(
            (big * OmOm[None, None, :].astype(proj.T)).astype(proj.complex_T),
            "qu_az", proj)
    raise ValueError(pol)
