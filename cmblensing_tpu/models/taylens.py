"""Taylens (Naess & Louis 2013): nearest-pixel permutation plus a
PowerLens Taylor expansion in the sub-pixel residual displacement
(reference src/taylens.jl)."""
from __future__ import annotations

from math import factorial

import jax
import jax.numpy as jnp

from ..core.basis import lense_basis
from ..core.field import Field
from ..ops import fft as _fft
from .powerlens import _deriv_ab


@jax.tree_util.register_pytree_node_class
class Taylens:
    """Nearest-pixel remap + residual PowerLens (src/taylens.jl:12-66)."""

    __slots__ = ("phi", "order")

    def __init__(self, phi: Field, order: int = 4):
        self.phi = phi
        self.order = order

    def tree_flatten(self):
        return (self.phi,), (self.order,)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(ch[0], *aux)

    def __call__(self, phi_or_theta):
        if isinstance(phi_or_theta, Field):
            return Taylens(phi_or_theta, self.order)
        return self

    def _setup(self):
        from .lenseflow import _grad_f
        pm = self.phi.to(self.phi.basis.with_space("map"))
        proj = pm.proj
        gx, gy = _grad_f(pm.arr, proj)
        dx = gx[..., 0, :, :]                      # physical displacement
        dy = gy[..., 0, :, :]
        deltax = proj.deltax
        dj = jnp.round(dx / deltax).astype(jnp.int32)
        di = jnp.round(dy / deltax).astype(jnp.int32)
        Ny, Nx = proj.Ny, proj.Nx
        ii = (di + jnp.arange(Ny, dtype=jnp.int32)[:, None]) % Ny
        jj = (dj + jnp.arange(Nx, dtype=jnp.int32)[None, :]) % Nx
        rx = dx - dj * deltax                       # residual displacement
        ry = dy - di * deltax
        return (ii, jj), (rx, ry), proj

    def __matmul__(self, f: Field) -> Field:
        B = f.basis
        (ii, jj), (rx, ry), proj = self._setup()
        Ny, Nx = proj.Ny, proj.Nx
        idx2 = ii * Nx + jj                     # (..., Ny, Nx), maybe batched

        def remap(arr):
            flat = arr.reshape(arr.shape[:-2] + (-1,))
            if idx2.ndim == 2:
                return jnp.take(flat, idx2.reshape(-1), axis=-1).reshape(
                    arr.shape[:-2] + (Ny, Nx))
            # batched phi: per-batch gather (a flat take would mix
            # batch entries into the index space)
            b = jnp.broadcast_shapes(idx2.shape[:-2], arr.shape[:-3])
            flat_b = jnp.broadcast_to(flat, b + flat.shape[-2:])
            idx_b = jnp.broadcast_to(
                idx2.reshape(idx2.shape[:-2] + (1, Ny * Nx)),
                b + (1, Ny * Nx))
            out = jnp.take_along_axis(flat_b, idx_b, axis=-1)
            return out.reshape(b + (arr.shape[-3], Ny, Nx))

        fl = f.to(lense_basis(B))
        Ff = _fft.rfft2(fl.arr)
        # batched residuals (B, Ny, Nx) need an explicit comp axis, or
        # broadcasting would align the batch with the COMPONENT axis
        cax = lambda w: w if w.ndim == 2 else w[..., None, :, :]
        rx, ry = cax(rx), cax(ry)
        p1 = {p: (1.0 if p == 0 else rx ** p) for p in range(self.order + 1)}
        p2 = {p: (1.0 if p == 0 else ry ** p) for p in range(self.order + 1)}
        out = remap(fl.arr)
        for n in range(1, self.order + 1):
            for a in range(0, n + 1):
                b = n - a
                dab = _fft.irfft2(_deriv_ab(Ff, a, b, proj), proj.Nx)
                out = out + p1[a] * p2[b] * remap(dab) / (factorial(a) * factorial(b))
        return Field(out, fl.basis, proj).to(B)

    def __repr__(self):
        return f"Taylens(order={self.order})"
