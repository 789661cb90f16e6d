"""Spatially-sharded LenseFlow: maps bigger than one chip.

The reference caps out at single-device maps and merely *warns* above
1024^2 (src/proj_lambert.jl:54-56); its process parallelism
(src/util_parallel.jl) only distributes independent sims. This module
shards the MAP ITSELF: the Ny axis of f and phi is laid out across a
1-D device mesh, and the LenseFlow ODE (src/lenseflow.jl:150-214, the
framework's hot loop) runs as ONE shard_map program in which

  * every elementwise op (velocity algebra, in-flight M^-1(t), RK4
    combinations) touches only the local (Ny/P, Nx) block,
  * x-derivatives are local MXU matmuls (contraction over the
    unsharded last axis),
  * y-derivatives use the classic pencil scheme — one tiled
    `all_to_all` to the x-sharded layout, the full-Ny circulant apply
    locally, one `all_to_all` back (ops/deriv.py::_ywrap). Each
    all_to_all moves only the local block over the ICI, a factor
    mesh_size less traffic than the all_gather XLA inserts for a
    sharded-contraction matmul.

Gradients use the same continuous-adjoint transpose-delta flow as the
single-device operator (models/lenseflow.py::_backward_flow_scan) —
the sharded derivative primitives ARE the exact global operators, so
the custom_vjp math carries over block-by-block unchanged.

Memory per device is the full-map footprint / mesh_size, so a v5e-8
pod slice holds 8x the map area of one chip: 16384^2 spin-2 flows fit
where a single chip OOMs.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.basis import lense_basis
from ..core.field import Field
from ..ops import deriv as _deriv
from ..models import lenseflow as _lf

from .mesh import make_mesh


def spatial_mesh(n_devices=None, axis_name="sp", devices=None, nbatch=None,
                 batch_axis="batch"):
    """1-D mesh over the spatial (Ny) axis, or — with nbatch — a 2-D
    (batch, space) mesh: sims/chains data-parallel on one axis, each
    map's rows sharded over the other (§2.4 strategies 1+new)."""
    if nbatch is None:
        return make_mesh(n_devices=n_devices, axis_name=axis_name,
                         devices=devices)
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if len(devices) % nbatch:
        raise ValueError(f"{len(devices)} devices not divisible by "
                         f"nbatch={nbatch}")
    grid = np.asarray(devices).reshape(nbatch, len(devices) // nbatch)
    return Mesh(grid, (batch_axis, axis_name))


def _yspec(ndim, axis_name, batch_axis=None):
    """PartitionSpec sharding axis -2 (Ny), and — for arrays with a
    leading batch axis (ndim >= 4) — optionally axis 0 over batch_axis."""
    lead = [batch_axis if ndim >= 4 else None] + [None] * (ndim - 3)
    return P(*(lead + [axis_name, None]))


def shard_spatial(f: Field, mesh, axis_name="sp", batch_axis=None) -> Field:
    """Lay a map-basis Field's Ny axis out across the mesh (and its
    leading batch axis over batch_axis, if given)."""
    arr = f.arr
    sh = NamedSharding(mesh, _yspec(arr.ndim, axis_name, batch_axis))
    return Field(jax.device_put(arr, sh), f.basis, f.proj)


def _check_divisible(proj, mesh, axis_name):
    nsp = dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis_name,
                                                             mesh.size)
    if proj.Ny % nsp or proj.Nx % nsp:
        raise ValueError(
            f"spatial sharding needs Ny ({proj.Ny}) and Nx ({proj.Nx}) "
            f"divisible by the spatial mesh axis size ({nsp}) for the "
            f"pencil all_to_all transposes")


# =========================================================================
# local-block flow primitives (run INSIDE shard_map)
# =========================================================================
#
# Each is a custom_vjp whose fwd and bwd open deriv.shard_ctx
# themselves: the ctx is a trace-time global, and the bwd function is
# traced in a separate pass (shard_map transposition) after the
# forward `with` block has exited.

@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _flow_local(phi_blk, f_blk, t0, t1, nsteps, proj, axis):
    with _deriv.shard_ctx(axis):
        g, h = _lf._gradhess_phi(phi_blk, proj)
        return _lf._rk4(lambda t, y: _lf._velocity(t, y, g, h, proj),
                        f_blk, t0, t1, nsteps, proj)


def _flow_fwd(phi_blk, f_blk, t0, t1, nsteps, proj, axis):
    out = _flow_local(phi_blk, f_blk, t0, t1, nsteps, proj, axis)
    return out, (phi_blk, out)


def _flow_bwd(t0, t1, nsteps, proj, axis, res, dy):
    """Continuous-adjoint transpose-delta flow on sharded blocks
    (reference negδvelocityᴴ, src/lenseflow.jl:176-214)."""
    phi_blk, f1 = res
    with _deriv.shard_ctx(axis):
        g, h = _lf._gradhess_phi(phi_blk, proj)
        df0, dphi = _lf._backward_flow_scan(f1, dy, g, h, proj, t1, t0,
                                            nsteps)
    return (dphi, df0)


_flow_local.defvjp(_flow_fwd, _flow_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _flow_adj_local(phi_blk, f_blk, t0, t1, nsteps, proj, axis):
    """L(phi)^H on local blocks: adjoint velocity integrated t1->t0
    (reference flowops.jl:12)."""
    with _deriv.shard_ctx(axis):
        g, h = _lf._gradhess_phi(phi_blk, proj)
        return _lf._rk4(lambda t, y: _lf._velocity_adj(t, y, g, h, proj),
                        f_blk, t1, t0, nsteps, proj)


def _flow_adj_fwd(phi_blk, f_blk, t0, t1, nsteps, proj, axis):
    out = _flow_adj_local(phi_blk, f_blk, t0, t1, nsteps, proj, axis)
    return out, (phi_blk, f_blk)


def _flow_adj_bwd(t0, t1, nsteps, proj, axis, res, u):
    """VJP of out = L^H f via <u, L^H f> = <L u, f> — forward-apply u,
    then the transpose-delta flow with (primal := Lu, cotangent := f)
    (mirrors models/lenseflow.py::_lenseflow_adj_bwd)."""
    phi_blk, f_blk = res
    Lu = _flow_local(phi_blk, u, t0, t1, nsteps, proj, axis)
    dphi, _ = _flow_bwd(t0, t1, nsteps, proj, axis, (phi_blk, Lu), f_blk)
    return (dphi, Lu)


_flow_adj_local.defvjp(_flow_adj_fwd, _flow_adj_bwd)


# =========================================================================
# public operator
# =========================================================================

@jax.tree_util.register_pytree_node_class
class ShardedLenseFlow:
    """LenseFlow over a spatially-sharded map.

    Same FlowOp surface as models/lenseflow.py::LenseFlow (L@f, L.H@f,
    L.solve, L.H.solve, logdet = 0), but f and phi live with their Ny
    axis sharded over `mesh` and the integration runs as one shard_map
    program (pencil all_to_all transposes around y-derivatives).

    Fields should be in a map-space basis (QU/IQU/map); Fourier-basis
    inputs are converted outside the sharded region (a full-map FFT —
    fine at moderate sizes, but at the sizes sharding exists for, keep
    data in map space end-to-end).
    """

    __slots__ = ("phi", "nsteps", "mesh", "axis_name", "t0", "t1",
                 "_adjoint", "batch_axis")

    def __init__(self, phi: Field, nsteps: int = 7, mesh=None,
                 axis_name="sp", t0=0.0, t1=1.0, _adjoint=False,
                 batch_axis=None):
        if mesh is None:
            mesh = spatial_mesh(axis_name=axis_name)
        _check_divisible(phi.proj, mesh, axis_name)
        self.phi = phi
        self.nsteps = nsteps
        self.mesh = mesh
        self.axis_name = axis_name
        self.t0 = t0
        self.t1 = t1
        self._adjoint = _adjoint
        self.batch_axis = batch_axis

    def tree_flatten(self):
        return (self.phi,), (self.nsteps, self.mesh, self.axis_name,
                             self.t0, self.t1, self._adjoint,
                             self.batch_axis)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(ch[0], *aux)

    def __call__(self, phi_or_theta):
        if isinstance(phi_or_theta, Field):
            return ShardedLenseFlow(phi_or_theta, self.nsteps, self.mesh,
                                    self.axis_name, self.t0, self.t1,
                                    self._adjoint, self.batch_axis)
        return self

    @property
    def H(self):
        return ShardedLenseFlow(self.phi, self.nsteps, self.mesh,
                                self.axis_name, self.t0, self.t1,
                                not self._adjoint, self.batch_axis)

    def inv(self):
        return ShardedLenseFlow(self.phi, self.nsteps, self.mesh,
                                self.axis_name, self.t1, self.t0,
                                self._adjoint, self.batch_axis)

    pinv = inv

    def _go(self, f: Field, t0, t1, adjoint):
        B = f.basis
        if lense_basis(B) != B:
            # a basis conversion here would be a FULL-map FFT on a
            # spatially-sharded array — a cross-device gather, outside
            # the pencil scheme. Refuse loudly instead of silently
            # paying it (convert before shard_spatial()).
            raise ValueError(
                f"ShardedLenseFlow needs fields in their lense basis "
                f"(e.g. QU map); got {B}. Convert with f.to_lense() "
                f"BEFORE shard_spatial() — converting a sharded field "
                f"would FFT the full map across devices.")
        fl = f
        phi_map = self.phi.to(self.phi.basis.with_space("map")).arr
        proj = f.proj
        axis = self.axis_name
        prim = _flow_adj_local if adjoint else _flow_local

        def body(pb, fb):
            return prim(pb, fb, t0, t1, self.nsteps, proj, axis)

        ba = self.batch_axis
        out = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(_yspec(phi_map.ndim, axis, ba),
                      _yspec(fl.arr.ndim, axis, ba)),
            out_specs=_yspec(fl.arr.ndim, axis, ba),
            check_vma=True,
        )(phi_map, fl.arr)
        return Field(out, fl.basis, proj).to(B)

    def __matmul__(self, f: Field) -> Field:
        if self._adjoint:
            return self._go(f, self.t0, self.t1, adjoint=True)
        return self._go(f, self.t0, self.t1, adjoint=False)

    def solve(self, f: Field) -> Field:
        if self._adjoint:
            return self._go(f, self.t1, self.t0, adjoint=True)
        return self._go(f, self.t1, self.t0, adjoint=False)

    def __repr__(self):
        return (f"ShardedLenseFlow(nsteps={self.nsteps}, "
                f"mesh={self.mesh.shape}"
                f"{', adjoint' if self._adjoint else ''})")


def lense_sharded(phi: Field, f: Field, nsteps: int = 7, mesh=None,
                  axis_name="sp", batch_axis=None) -> Field:
    """Functional form: lense f by phi with the map sharded over the
    mesh's spatial axis (and any leading batch axis over batch_axis)."""
    return ShardedLenseFlow(phi, nsteps, mesh, axis_name,
                            batch_axis=batch_axis) @ f
