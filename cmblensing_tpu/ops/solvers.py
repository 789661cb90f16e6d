"""ODE and linear solvers, built on lax control flow so they live
inside jit (reference src/numerical_algorithms.jl).

- rk4_integrate:      fixed-step RK4 over arbitrary pytrees (lax.scan)
- conjugate_gradient: preconditioned CG with batched tolerances and
                      best-x tracking (lax.while_loop)
- gmres:              small-Krylov GMRES (Arnoldi/MGS default; the
                      reference's power-basis scheme as method="power")
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..core.field import Field, dot as field_dot


def _tmap(f, *trees):
    return jax.tree_util.tree_map(f, *trees)


def tree_axpy(a, x, y):
    """y + a*x over pytrees (a scalar)."""
    return _tmap(lambda xi, yi: yi + a * xi, x, y)


def tree_dot(a, b):
    """Inner product over a pytree; Field leaves use the field dot
    (pixel-space-equivalent), arrays use vdot. Returns per-batch scalar
    if the Fields are batched."""
    la, ta = jax.tree_util.tree_flatten(a, is_leaf=lambda x: isinstance(x, Field))
    lb, _ = jax.tree_util.tree_flatten(b, is_leaf=lambda x: isinstance(x, Field))
    tot = None
    for xa, xb in zip(la, lb):
        if isinstance(xa, Field):
            d = field_dot(xa, xb)
        else:
            d = jnp.sum(jnp.real(jnp.conj(xa) * xb))
        tot = d if tot is None else tot + d
    return tot


def rk4_integrate(F: Callable, y0, t0, t1, nsteps: int):
    """Integrate dy/dt = F(t, y) from t0 to t1 with `nsteps` RK4 steps.
    y0 is an arbitrary pytree. Matches reference RK4Solver
    (src/numerical_algorithms.jl:3-38) but out-of-place and scan-based."""
    h = (t1 - t0) / nsteps

    def step(y, i):
        t = t0 + i * h
        k1 = F(t, y)
        k2 = F(t + h / 2, tree_axpy(h / 2, k1, y))
        k3 = F(t + h / 2, tree_axpy(h / 2, k2, y))
        k4 = F(t + h, tree_axpy(h, k3, y))
        y = _tmap(lambda yi, a, b, c, d: yi + (h / 6) * (a + 2 * (b + c) + d),
                  y, k1, k2, k3, k4)
        return y, None

    y, _ = jax.lax.scan(step, y0, jnp.arange(nsteps))
    return y


def conjugate_gradient(M, A, b, x0=None, nsteps=500, tol=1e-1, fixed_iters=False,
                       record_history=False):
    """Solve A x = b (A positive definite) by preconditioned CG.

    M, A: callables applying the preconditioner-inverse-ish solve and
    the operator. Following the reference convention
    (src/numerical_algorithms.jl:73-134), M is an *operator like A*
    and M.solve is used; pass callables apply/solve via OperatorPair,
    or plain callables A(x), Minv(x).

    Stops when the (per-batch) residual dot(r, z) < tol for all batch
    entries, or after nsteps. Returns (bestx, info) where info has the
    final iteration count and residual; with record_history=True, info
    also carries "res_history", a fixed-length (nsteps+1, ...) residual
    trace recorded *inside* jit (NaN past the converged iteration) —
    the in-graph analog of the reference's history_keys machinery
    (src/numerical_algorithms.jl:60-71). record_history may also be a
    tuple of keys from ("res", "x", "r") to additionally trace the
    iterate and residual pytrees in-graph as (nsteps+1, ...) stacked
    buffers ("x_history"/"r_history"; memory = (nsteps+1) states — use
    small nsteps). Wall-clock "t" traces need host stepping: see
    conjugate_gradient_with_history.
    """
    def _apply(op, x):
        if callable(op) and not hasattr(op, "solve"):
            return op(x)
        return op @ x

    def _solve(op, x):
        if callable(op) and not hasattr(op, "solve"):
            return op(x)
        return op.solve(x)

    if x0 is None:
        x0 = _tmap(jnp.zeros_like, b)

    r0 = _tmap(lambda bi, axi: bi - axi, b, _apply(A, x0))
    z0 = _solve(M, r0)
    p0 = z0
    res0 = tree_dot(r0, z0)

    def cond(carry):
        i, x, r, z, p, res, bestres, bestx, hist = carry
        return jnp.logical_and(i < nsteps, jnp.any(res > tol))

    def body(carry):
        i, x, r, z, p, res, bestres, bestx, hist = carry
        Ap = _apply(A, p)
        pAp = tree_dot(p, Ap)
        # guarded divisions: in fixed-iteration mode the loop runs past
        # convergence, where res and pAp underflow to 0
        alpha = jnp.where(pAp != 0, res / jnp.where(pAp != 0, pAp, 1.0), 0.0)
        x = _tmap(lambda xi, pi: xi + _bb(alpha, pi) * pi, x, p)
        r = _tmap(lambda ri, api: ri - _bb(alpha, api) * api, r, Ap)
        z = _solve(M, r)
        res_new = tree_dot(r, z)
        beta = jnp.where(res != 0, res_new / jnp.where(res != 0, res, 1.0), 0.0)
        p = _tmap(lambda zi, pi: zi + _bb(beta, pi) * pi, z, p)
        better = res_new < bestres
        bestx = _tmap(lambda bxi, xi: jnp.where(_bb_arr(better, xi), xi, bxi), bestx, x)
        bestres = jnp.where(better, res_new, bestres)
        if hist is not None:
            if "res" in hist:
                hist = dict(hist, res=hist["res"].at[i + 1].set(res_new))
            for key, val in (("x", x), ("r", r)):
                if key in hist:
                    hist = dict(hist, **{key: _tmap(
                        lambda buf, leaf: buf.at[i + 1].set(leaf),
                        hist[key], val)})
        return (i + 1, x, r, z, p, res_new, bestres, bestx, hist)

    def _bb(s, leaf):
        """Broadcast per-batch scalar s against a leaf's array."""
        s = jnp.asarray(s)
        if s.ndim == 0:
            return s
        return s.reshape(s.shape + (1,) * (leaf.ndim - s.ndim))

    _bb_arr = _bb

    hist_keys = (("res",) if record_history is True
                 else tuple(record_history) if record_history else ())
    hist0 = None
    if hist_keys:
        hist0 = {}
        if "res" in hist_keys:
            res0a = jnp.asarray(res0)
            hist0["res"] = jnp.full((nsteps + 1,) + res0a.shape, jnp.nan,
                                    dtype=res0a.dtype).at[0].set(res0a)
        for key, val in (("x", x0), ("r", r0)):
            if key in hist_keys:
                hist0[key] = _tmap(
                    lambda leaf: jnp.full((nsteps + 1,) + leaf.shape, jnp.nan,
                                          dtype=leaf.dtype).at[0].set(leaf),
                    val)
    carry0 = (jnp.asarray(0), x0, r0, z0, p0, res0, res0, x0, hist0)
    if fixed_iters:
        # static trip count (lax.scan): no data-dependent control flow —
        # preferred on TPU (no host sync; some backends can't run
        # dynamic while_loops at all)
        def sbody(carry, _):
            return body(carry), None
        carry, _ = jax.lax.scan(sbody, carry0, None, length=nsteps)
        i, x, r, z, p, res, bestres, bestx, hist = carry
    else:
        i, x, r, z, p, res, bestres, bestx, hist = jax.lax.while_loop(cond, body, carry0)
    info = {"iterations": i, "res": bestres, "res0": res0}
    if hist is not None:
        if "res" in hist:
            info["res_history"] = hist["res"]
        if "x" in hist:
            info["x_history"] = hist["x"]
        if "r" in hist:
            info["r_history"] = hist["r"]
    return bestx, info


def conjugate_gradient_with_history(M, A, b, x0=None, nsteps=100, tol=1e-1,
                                    history_keys=("i", "res")):
    """Host-driven CG (Python loop over jittable pieces) that records a
    history like the reference's history_keys machinery. Use for
    diagnostics; prefer conjugate_gradient inside jit."""
    def _apply(op, x):
        return op(x) if callable(op) and not hasattr(op, "solve") else op @ x

    def _solve(op, x):
        return op(x) if callable(op) and not hasattr(op, "solve") else op.solve(x)

    import time
    t0 = time.time()
    if x0 is None:
        x0 = _tmap(jnp.zeros_like, b)
    x = x0
    r = _tmap(lambda bi, ai: bi - ai, b, _apply(A, x))
    z = _solve(M, r)
    p = z
    res = tree_dot(r, z)
    bestres, bestx = res, x
    history = []

    def rec(i):
        entry = {}
        if "i" in history_keys:
            entry["i"] = i
        if "res" in history_keys:
            entry["res"] = res
        if "x" in history_keys:
            entry["x"] = x
        if "r" in history_keys:
            entry["r"] = r
        if "t" in history_keys:
            entry["t"] = time.time() - t0
        history.append(entry)

    rec(0)
    for i in range(1, nsteps + 1):
        Ap = _apply(A, p)
        alpha = res / tree_dot(p, Ap)
        x = _tmap(lambda xi, pi: xi + alpha * pi, x, p)
        r = _tmap(lambda ri, api: ri - alpha * api, r, Ap)
        z = _solve(M, r)
        res_new = tree_dot(r, z)
        p = _tmap(lambda zi, pi: zi + (res_new / res) * pi, z, p)
        res = res_new
        if bool(jnp.all(res < bestres)):
            bestres, bestx = res, x
        rec(i)
        if bool(jnp.all(res < tol)):
            break
    return bestx, history


def gmres(A, b, maxiter, Pl=None, method="arnoldi"):
    """Small-Krylov GMRES over flattened pytrees (left-preconditioned
    by Pl). Reference: src/numerical_algorithms.jl:193-214.

    method="arnoldi" (default): textbook GMRES with a modified
    Gram-Schmidt-orthonormalized Krylov basis — numerically stable at
    any maxiter, monotone residual. The loop is a Python loop over a
    *static* maxiter (a handful of dots per step), so the whole solve
    still jits into one XLA program.

    method="power": the reference's scheme — an *unorthogonalized*
    power basis (Pl A)^i Pl b solved by lstsq. Kept for parity; its
    columns become numerically dependent after ~10 iterations, so
    larger maxiter stops improving (a warning flags it).
    """
    if method == "power" and maxiter > 12:
        import warnings
        warnings.warn("gmres: the unorthogonalized power-Krylov basis "
                      "degenerates beyond ~10 iterations; extra "
                      "iterations will not improve the solution "
                      "(use method='arnoldi')",
                      stacklevel=2)
    leaves, treedef = jax.tree_util.tree_flatten(b)
    shapes = [l.shape for l in leaves]
    sizes = [int(jnp.size(l)) for l in leaves]

    def to_vec(t):
        ls = jax.tree_util.tree_leaves(t)
        return jnp.concatenate([l.reshape(-1) for l in ls])

    def from_vec(v):
        out = []
        o = 0
        for s, sh in zip(sizes, shapes):
            out.append(v[o:o + s].reshape(sh))
            o += s
        return jax.tree_util.tree_unflatten(treedef, out)

    def apply_A(v):
        return to_vec(A(from_vec(v)))

    def apply_P(v):
        if Pl is None:
            return v
        return to_vec(Pl(from_vec(v)))

    n = maxiter
    bv = apply_P(to_vec(b))
    hi = jax.lax.Precision.HIGHEST

    if method == "power":
        K = [bv]
        for i in range(n):
            K.append(apply_P(apply_A(K[-1])))
        Kmat = jnp.stack(K[1:], axis=1)   # columns (Pl A)^i Pl b, i=1..n
        alpha, *_ = jnp.linalg.lstsq(Kmat, K[0])
        xv = jnp.matmul(jnp.stack(K[:n], axis=1), alpha, precision=hi)
        return from_vec(xv)

    # Arnoldi / modified Gram-Schmidt. x0 = 0, r0 = Pl b. Static trip
    # count; happy breakdown handled by zeroing the dead directions
    # (lstsq on the padded Hessenberg stays exact for the live block).
    eps = jnp.finfo(bv.dtype).tiny ** 0.5
    beta = jnp.linalg.norm(bv)
    V = [bv / jnp.maximum(beta, eps)]
    Hcols = []
    for j in range(n):
        w = apply_P(apply_A(V[j]))
        hj = []
        for i in range(j + 1):
            h = jnp.vdot(V[i], w)
            w = w - h * V[i]
            hj.append(h)
        hnext = jnp.linalg.norm(w)
        hj.append(hnext)
        live = hnext > eps * jnp.maximum(beta, 1.0)
        V.append(jnp.where(live, w / jnp.maximum(hnext, eps),
                           jnp.zeros_like(w)))
        Hcols.append(jnp.stack(hj + [jnp.zeros((), bv.dtype)] * (n - 1 - j)))
    H = jnp.stack(Hcols, axis=1)          # (n+1, n) upper Hessenberg
    e1 = jnp.zeros((n + 1,), bv.dtype).at[0].set(beta)
    y, *_ = jnp.linalg.lstsq(H, e1)
    xv = jnp.matmul(jnp.stack(V[:n], axis=1), y, precision=hi)
    return from_vec(xv)
