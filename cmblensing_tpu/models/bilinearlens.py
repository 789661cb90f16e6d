"""BilinearLens: lensing by bilinear interpolation at deflected pixels.

TPU-native redesign of src/bilinearlens.jl: where the reference builds
a CUSPARSE sparse matrix of 4-tap interpolation weights (with a custom
CUDA kernel, ext/CMBLensingCUDAExt.jl:140-201), TPUs have no sparse
matvec — instead the apply is a fused 4-tap gather-weighted sum (pure
XLA gathers), the adjoint is its exact linear transpose
(jax.linear_transpose → scatter-adds), and the inverse is GMRES
preconditioned with anti-lensing (src/bilinearlens.jl:127-151).
Gradients w.r.t. phi flow through the interpolation weights via plain
jax AD (exact for the piecewise-linear interpolant)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.basis import lense_basis
from ..core.field import Field


def _displacements(phi: Field):
    from .lenseflow import _grad_f
    pm = phi.to(phi.basis.with_space("map"))
    gx, gy = _grad_f(pm.arr, pm.proj)
    dx = gx[..., 0, :, :] / pm.proj.deltax   # in pixels
    dy = gy[..., 0, :, :] / pm.proj.deltax
    return dx, dy


def _bilinear_apply(f_map, dx, dy):
    """Resample each component of f_map (..., ncomp, Ny, Nx) at
    (i+dy, j+dx) with periodic wrap, bilinear weights."""
    Ny, Nx = f_map.shape[-2], f_map.shape[-1]
    ii = jnp.arange(Ny, dtype=f_map.dtype)[:, None] + dy
    jj = jnp.arange(Nx, dtype=f_map.dtype)[None, :] + dx
    i0 = jnp.floor(ii)
    j0 = jnp.floor(jj)
    wi = ii - i0
    wj = jj - j0
    i0 = i0.astype(jnp.int32)
    j0 = j0.astype(jnp.int32)
    i1 = (i0 + 1) % Ny
    j1 = (j0 + 1) % Nx
    i0 = i0 % Ny
    j0 = j0 % Nx

    def gather(fi, fj):
        idx = fi * Nx + fj
        flat = f_map.reshape(f_map.shape[:-2] + (-1,))
        if idx.ndim == 2:
            return jnp.take(flat, idx.reshape(-1), axis=-1).reshape(
                f_map.shape[:-2] + (Ny, Nx))
        # batched phi: per-batch gather (a flat take would mix batch
        # entries into the index space)
        b = jnp.broadcast_shapes(idx.shape[:-2], f_map.shape[:-3])
        flat_b = jnp.broadcast_to(flat, b + flat.shape[-2:])
        idx_b = jnp.broadcast_to(
            idx.reshape(idx.shape[:-2] + (1, Ny * Nx)), b + (1, Ny * Nx))
        out = jnp.take_along_axis(flat_b, idx_b, axis=-1)
        return out.reshape(b + (f_map.shape[-3], Ny, Nx))

    def cax(w):
        # batched weights (B, Ny, Nx) need an explicit comp axis, or
        # broadcasting would align the batch with the COMPONENT axis of
        # (B, C, Ny, Nx)
        return w if w.ndim == 2 else w[..., None, :, :]

    wi, wj = cax(wi), cax(wj)
    out = ((1 - wi) * (1 - wj) * gather(i0, j0)
           + (1 - wi) * wj * gather(i0, j1)
           + wi * (1 - wj) * gather(i1, j0)
           + wi * wj * gather(i1, j1))
    return out


@jax.tree_util.register_pytree_node_class
class BilinearLens:
    """Bilinear-interpolation lensing operator."""

    __slots__ = ("phi", "gmres_iters", "_adjoint")

    def __init__(self, phi: Field, gmres_iters: int = 5, _adjoint=False):
        self.phi = phi
        self.gmres_iters = gmres_iters
        self._adjoint = _adjoint

    def tree_flatten(self):
        return (self.phi,), (self.gmres_iters, self._adjoint)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(ch[0], *aux)

    def __call__(self, phi_or_theta):
        if isinstance(phi_or_theta, Field):
            return BilinearLens(phi_or_theta, self.gmres_iters, self._adjoint)
        return self

    @property
    def H(self):
        return BilinearLens(self.phi, self.gmres_iters, not self._adjoint)

    def _fwd_arr(self, arr, dx, dy):
        return _bilinear_apply(arr, dx, dy)

    def _adj_arr(self, arr, dx, dy):
        fwd = lambda a: _bilinear_apply(a, dx, dy)
        (out,) = jax.linear_transpose(fwd, arr)(arr)
        return out

    def __matmul__(self, f: Field) -> Field:
        B = f.basis
        fl = f.to(lense_basis(B))
        dx, dy = _displacements(self.phi)
        if self._adjoint:
            out = self._adj_arr(fl.arr, dx, dy)
        else:
            out = self._fwd_arr(fl.arr, dx, dy)
        return Field(out, fl.basis, f.proj).to(B)

    def solve(self, f: Field) -> Field:
        """Inverse lensing by GMRES preconditioned with anti-lensing
        (src/bilinearlens.jl:127-151)."""
        from ..ops.solvers import gmres
        B = f.basis
        fl = f.to(lense_basis(B))
        dx, dy = _displacements(self.phi)
        # anti-lensing displacements are exactly the negation (the
        # gradient is linear in phi) — no second FFT pipeline needed
        mdx, mdy = -dx, -dy
        if self._adjoint:
            A = lambda a: self._adj_arr(a, dx, dy)
            Pl = lambda a: self._adj_arr(a, mdx, mdy)
        else:
            A = lambda a: self._fwd_arr(a, dx, dy)
            Pl = lambda a: self._fwd_arr(a, mdx, mdy)
        out = gmres(A, fl.arr, maxiter=self.gmres_iters, Pl=Pl)
        return Field(out, fl.basis, f.proj).to(B)

    def __repr__(self):
        return f"BilinearLens({'adjoint' if self._adjoint else 'fwd'})"
