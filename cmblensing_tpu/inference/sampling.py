"""Gibbs/HMC sampling of the joint lensing posterior.

TPU-native analog of src/sampling.jl: the leapfrog integrator is a
lax.scan, HMC accept/reject is batched over chains/sims, chains run as
a *sharded batch axis* (the TPU replacement for the reference's
pmap-over-workers, src/sampling.jl:292-307), and checkpointing is
chunked append-only files with resume (src/sampling.jl:247-319).
"""
from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.field import Field, dot as field_dot, zeros_like_field, repeat_batch
from ..core.ops import Diag, ParamDependentOp, nan2zero, safe_reciprocal
from ..models.dataset import DataSet, Mixed, mix, unmix
from .maximization import argmaxf_logpdf, sample_f, _fid


# =========================================================================
# symplectic integration (reference src/sampling.jl:14-46)
# =========================================================================

def symplectic_integrate(x0, p0, Lambda, U_grad, N=50, eps=0.1, U=None):
    """Leapfrog integration of potential U with mass matrix Lambda.

    U_grad(x) returns grad of U at x (a Field). Returns (dH, x, p).
    Convention matches the reference: H(x,p) = U(x) - p' Lambda^-1 p / 2
    with the sign conventions of src/sampling.jl:14-46 (U = logpdf).
    eps may be a traced scalar (it only scales field updates)."""

    def energy(x, p):
        quad = field_dot(p, Lambda.solve(p))
        if U is None:
            return -quad / 2
        return U(x) - quad / 2

    def step(carry, _):
        x, p, gU = carry
        x1 = x - eps * (Lambda.solve(p - (eps / 2) * gU))
        gU1 = U_grad(x1)
        p1 = p - (eps / 2) * (gU1 + gU)
        return (x1, p1, gU1), None

    g0 = U_grad(x0)
    (x, p, _), _ = jax.lax.scan(step, (x0, p0, g0), None, length=N)
    if U is not None:
        dH = energy(x, p) - energy(x0, p0)
    else:
        dH = None
    return dH, x, p


def mass_matrix_phi(theta, ds: DataSet):
    """pinv(G)^2 (pinv(Cphi) + pinv(Nphi)) (src/sampling.jl:422-425)."""
    dst = ds.at(theta or {})
    G = _fid(dst.G)
    Cphi = _fid(dst.Cphi)
    Nphi = _fid(dst.Nphi)
    icp = safe_reciprocal(Cphi.diag.arr)
    inp = safe_reciprocal(Nphi.diag.to(Cphi.diag.basis).arr)
    if isinstance(G, Diag):
        ig2 = safe_reciprocal(G.diag.to(Cphi.diag.basis).arr) ** 2
    else:
        ig2 = 1.0
    return Diag(Field(ig2 * (icp + inp), Cphi.diag.basis, Cphi.diag.proj))


def hmc_step(key, U, x, Lambda, U_grad=None, N=25, eps=0.01,
             always_accept=False):
    """One HMC step with batched accept/reject
    (src/sampling.jl:405-419). U is the log-posterior (to maximize)."""
    if U_grad is None:
        from ..core.field import fgrad
        U_grad = fgrad(lambda x: jnp.sum(U(x)))
    k1, k2 = jax.random.split(key)
    # momentum ~ N(0, Lambda)
    from ..core.ops import simulate_op
    batch_shape = x.batch_shape
    p = simulate_op(k1, Lambda, batch_shape=batch_shape)

    def U_full(x):
        return U(x)

    dH, xt, pt = symplectic_integrate(x, p.to(x.basis), Lambda, U_grad,
                                      N=N, eps=eps, U=U_full)
    logu = jnp.log(jax.random.uniform(k2, shape=jnp.shape(dH)))
    accept = jnp.logical_or(always_accept, logu < dH)
    from ..core.field import batch_broadcast
    acc = batch_broadcast(accept.astype(x.arr.real.dtype) if hasattr(accept, "astype")
                          else accept, x)
    x_new = Field(acc * xt.to(x.basis).arr + (1 - acc) * x.arr, x.basis, x.proj)
    return x_new, dH, accept


# =========================================================================
# 1-D griddded slice sampling (reference grid_and_sample,
# src/sampling.jl:80-135)
# =========================================================================

def grid_and_sample(key, logpdf_fn, xs, nsamples=1, smooth_frac=0.1,
                    batched=False):
    """Grid-evaluate a 1-D logpdf, smooth it, and draw samples by
    inverse-transform sampling. logpdf_fn may return per-batch arrays,
    in which case sampling is per batch entry.

    With batched=True, logpdf_fn takes the whole grid at once and
    returns (nx,) or (nx, nbatch) — one device dispatch for the whole
    grid instead of nx round trips (vital on remotely-attached chips).

    Returns (samples, interp_logpdf_callable, logpdfs_grid)."""
    xs = np.asarray(xs, dtype=np.float64)
    if batched:
        lps = np.asarray(jax.device_get(logpdf_fn(xs)), dtype=np.float64)
        lps = lps.reshape(len(xs), -1)                  # (nx, nbatch)
    else:
        lps = np.stack([np.atleast_1d(np.asarray(logpdf_fn(float(x)), dtype=np.float64))
                        for x in xs])                   # (nx, nbatch)
    nb = lps.shape[1]
    out = np.zeros((nsamples, nb))
    interp_fns = []
    for b in range(nb):
        lp = lps[:, b].copy()
        finite = np.isfinite(lp)
        if not finite.any():
            # a poisoned chain (NaN state / -inf grid everywhere):
            # sample uniformly from the grid rather than killing the
            # whole run with a zero-size reduction
            import warnings
            warnings.warn("grid_and_sample: no finite logpdf on the grid "
                          f"for batch entry {b}; sampling uniformly",
                          stacklevel=2)
            finite = np.ones_like(finite)
            lp = np.zeros_like(lp)
        xs_b, lp_b = xs[finite], lp[finite]
        lp_b = lp_b - lp_b.max()
        # mild smoothing of the log pdf (reference uses loess)
        if smooth_frac and len(lp_b) > 4:
            w = max(3, int(len(lp_b) * smooth_frac) | 1)
            kern = np.hanning(w)
            kern /= kern.sum()
            lp_s = np.convolve(np.pad(lp_b, w // 2, mode="edge"), kern, mode="valid")
        else:
            lp_s = lp_b
        pdf = np.exp(lp_s - lp_s.max())
        cdf = np.cumsum((pdf[1:] + pdf[:-1]) / 2 * np.diff(xs_b))
        cdf = np.concatenate([[0], cdf])
        if cdf[-1] > 0:
            cdf /= cdf[-1]
        else:  # fully underflowed pdf: fall back to uniform sampling
            cdf = np.linspace(0.0, 1.0, len(xs_b))
        key, sub = jax.random.split(key)
        r = np.asarray(jax.random.uniform(sub, (nsamples,)))
        out[:, b] = np.interp(r, cdf, xs_b)
        interp_fns.append(partial(np.interp, xp=xs_b, fp=lp_s))
    samples = out[0] if nsamples == 1 else out
    if nb == 1:
        samples = samples[..., 0] if np.ndim(samples) else samples
        return (float(samples) if np.ndim(samples) == 0 else samples,
                interp_fns[0], lps[:, 0])
    return samples, interp_fns, lps


# =========================================================================
# Gibbs sampler (reference sample_joint, src/sampling.jl:180-335)
# =========================================================================
# Each default pass is one module-level jit taking (ds, theta, fields)
# as pytree ARGUMENTS: repeated Gibbs steps hit the same compile cache,
# and — critically on remotely-attached TPUs — no field op ever runs
# eagerly (eager complex primitives are unimplemented there, and eager
# dispatch latency would dominate a leapfrog trajectory).

@partial(jax.jit, static_argnums=(5, 6, 7))
def _jit_gibbs_sample_f(ds, key, phi, theta, fstart, nsteps, tol, fixed_iters):
    """Posterior f-sample by constrained simulation, fully in-graph
    (reference src/maximization.jl:56-62 inside src/sampling.jl:388)."""
    from .maximization import _argmaxf_core
    sim = ds.simulate(key, theta=theta, phi=phi)
    df, _ = _argmaxf_core(ds, theta, phi, ds.d - sim["d"], fstart,
                          nsteps, tol, fixed_iters, True)
    return sim["f"] + df.to(sim["f"].basis)


@jax.jit
def _jit_gibbs_mix(ds, f, phi, theta):
    m = mix(ds, f=f, phi=phi, theta=theta)
    # keep phi_mix in map basis: HMC momenta/gradients live on the
    # pixel DOF (see core.field.fgrad)
    return m["f_mix"], m["phi_mix"].to(m["phi_mix"].basis.with_space("map"))


@jax.jit
def _jit_gibbs_unmix(ds, f_mix, phi_mix, theta):
    u = unmix(ds, f_mix=f_mix, phi_mix=phi_mix, theta=theta)
    return u["f"], u["phi"]


@partial(jax.jit, static_argnums=(5,))
def _jit_hmc_phi(ds, key, f_mix, phi_mix, theta, N, eps, always_accept):
    """One full HMC trajectory (leapfrog scan + accept/reject) as a
    single XLA program."""
    mixed = Mixed(ds)

    def U(pm):
        return mixed.logpdf(f_mix=f_mix, phi_mix=pm, theta=theta)

    Lam = mass_matrix_phi(theta, ds)
    return hmc_step(key, U, phi_mix, Lam, N=N, eps=eps,
                    always_accept=always_accept)


def gibbs_sample_f(state, ds, conjgrad_kwargs):
    key, sub = jax.random.split(state["key"])
    cg = dict(tol=1e-1, nsteps=500)
    cg.update(conjgrad_kwargs or {})
    f = _jit_gibbs_sample_f(ds, sub, state["phi"], state["theta"],
                            state.get("f"), int(cg["nsteps"]),
                            float(cg["tol"]), bool(cg.get("fixed_iters", False)))
    return dict(state, key=key, f=f)


def gibbs_mix(state, ds):
    f_mix, pm = _jit_gibbs_mix(ds, state["f"], state["phi"], state["theta"])
    return dict(state, f_mix=f_mix, phi_mix=pm)


def gibbs_unmix(state, ds):
    f, phi = _jit_gibbs_unmix(ds, state["f_mix"], state["phi_mix"],
                              state["theta"])
    return dict(state, f=f, phi=phi)


def gibbs_sample_phi(state, ds, symp_kwargs, always_accept=False):
    key, sub = jax.random.split(state["key"])
    phi_mix = state["phi_mix"]
    dH = accept = None
    for kw in symp_kwargs:
        sub, k = jax.random.split(sub)
        phi_mix, dH, accept = _jit_hmc_phi(
            ds, k, state["f_mix"], phi_mix, state["theta"],
            int(kw.get("N", 25)), float(kw.get("eps", 0.01)),
            bool(always_accept))
    return dict(state, key=key, phi_mix=phi_mix, dH=dH, accept=accept)


@jax.jit
def _jit_mixed_logpdf_theta(ds, f_mix, phi_mix, theta):
    return Mixed(ds).logpdf(f_mix=f_mix, phi_mix=phi_mix, theta=theta)


@partial(jax.jit, static_argnums=(4,))
def _jit_mixed_logpdf_theta_grid(ds, f_mix, phi_mix, theta, name, vals):
    """Mixed logpdf vmapped over a grid of values for theta[name]:
    the whole slice-sampling grid in one dispatch."""
    mixed = Mixed(ds)

    def lp(v):
        th = dict(theta)
        th[name] = v
        return mixed.logpdf(f_mix=f_mix, phi_mix=phi_mix, theta=th)

    return jax.vmap(lp)(vals)


def gibbs_sample_slice_theta(name, xs):
    """Slice-sample one scalar theta parameter on a grid
    (reference gibbs_sample_slice_θ!, src/sampling.jl:427-437)."""

    def pass_fn(state, ds, **_):
        key = state["key"]
        key, sub = jax.random.split(key)
        theta = dict(state["theta"])

        def lp_grid(vs):
            return _jit_mixed_logpdf_theta_grid(
                ds, state["f_mix"], state["phi_mix"], theta, name,
                jnp.asarray(np.asarray(vs, dtype=np.float32)))

        val, _, _ = grid_and_sample(sub, lp_grid, xs, batched=True)
        theta[name] = float(np.asarray(val).ravel()[0]) if np.ndim(val) == 0 or np.size(val) == 1 else val
        return dict(state, key=key, theta=theta)

    return pass_fn


@jax.jit
def _jit_gibbs_postprocess(ds, f, phi, theta):
    lp = ds.logpdf(f=f, phi=phi, theta=theta)
    ft = ds.L(phi) @ f
    return lp, ft


def gibbs_postprocess(state, ds):
    lp, ft = _jit_gibbs_postprocess(ds, state["f"], state["phi"],
                                    state["theta"])
    return dict(state, logpdf=lp, ft=ft)


def sample_joint(
    ds: DataSet,
    nsamps_per_chain,
    nchains=1,
    key=None,
    theta_range=None,
    theta_start=None,
    phi_start="prior",
    nhmc=1,
    symp_kwargs=None,
    nburnin_always_accept=10,
    conjgrad_kwargs=None,
    filename=None,
    resume=None,
    nfilewrite=5,
    nsavemaps=1,
    progress=False,
    verbose_timing=False,
    gibbs_passes=None,
    mesh=None,
):
    """Gibbs-sample P(f, phi, theta | d).

    With mesh (a jax.sharding.Mesh), the chains axis is sharded across
    the mesh devices — the SPMD replacement for the reference's
    pmap-over-workers (src/sampling.jl:292-307); XLA propagates the
    sharding through every jitted Gibbs pass with zero collectives.

    Default pass: f ~ Wiener CG -> mix -> HMC on phi_mix -> optional
    theta slice sampling -> unmix -> postprocess
    (src/sampling.jl:186-193). Chains are a batch axis: fields carry a
    leading nchains dimension which vmaps/shards over the device mesh.

    Checkpointing: appends chunk files `<filename>.chunk_i.pkl` every
    nfilewrite steps; resume=True continues from the last chunk."""
    key = key if key is not None else jax.random.PRNGKey(0)
    symp_kwargs = symp_kwargs or [dict(N=25, eps=0.01)] * nhmc
    cg = dict(tol=1e-1, nsteps=500)
    cg.update(conjgrad_kwargs or {})
    theta_range = theta_range or {}

    Cphi = _fid(ds.Cphi)

    # --- init or resume -------------------------------------------------
    start_step = 0
    chain = []
    if filename and resume and os.path.exists(_ckpt_name(filename)):
        states, start_step = _load_last_chunk(filename)
        if progress:
            print(f"Resuming chains at step {start_step}")
    else:
        key, k_phi, k_th = jax.random.split(key, 3)
        theta = dict(theta_start or {})
        for name, rng_ in theta_range.items():
            if name not in theta:
                k_th, sub = jax.random.split(k_th)
                theta[name] = float(jax.random.uniform(
                    sub, (), minval=float(np.min(rng_)), maxval=float(np.max(rng_))))
        if phi_start == "prior":
            from ..core.ops import simulate_op
            phi = simulate_op(k_phi, Cphi, batch_shape=(nchains,))
            phi = phi.to(phi.basis.with_space("map"))
        elif phi_start == 0 or phi_start is None:
            phi = repeat_batch(zeros_like_field(Cphi.diag).to(
                Cphi.diag.basis.with_space("map")), nchains)
        else:
            phi = phi_start if phi_start.batch_shape else repeat_batch(phi_start, nchains)
        d_b = ds.d if ds.d.batch_shape else repeat_batch(ds.d, nchains)
        ds = ds.replace(d=d_b)
        states = dict(key=key, phi=phi, theta=theta, step=0)

    ds_b = ds if ds.d.batch_shape else ds.replace(d=repeat_batch(ds.d, nchains))

    if mesh is not None:
        from ..parallel.mesh import shard_batch
        ds_b = ds_b.replace(d=shard_batch(ds_b.d, mesh))
        states = {k: (shard_batch(v, mesh)
                      if isinstance(v, Field) and v.batch_shape else v)
                  for k, v in states.items()}

    from ..utils.timing import timed
    if gibbs_passes is None:
        def default_passes(state):
            with timed("gibbs/sample_f") as s:
                state = s(gibbs_sample_f(state, ds_b, cg))
            with timed("gibbs/mix") as s:
                state = s(gibbs_mix(state, ds_b))
            with timed("gibbs/sample_phi") as s:
                state = s(gibbs_sample_phi(state, ds_b, symp_kwargs,
                                           always_accept=(state["step"] <= nburnin_always_accept)))
            with timed("gibbs/sample_theta") as s:
                for name, rng_ in theta_range.items():
                    state = gibbs_sample_slice_theta(name, rng_)(state, ds_b)
                state = s(state)
            with timed("gibbs/unmix") as s:
                state = s(gibbs_unmix(state, ds_b))
            with timed("gibbs/postprocess") as s:
                state = s(gibbs_postprocess(state, ds_b))
            return state
        passes = default_passes
    else:
        def passes(state):
            for p in gibbs_passes:
                with timed(f"gibbs/{getattr(p, '__name__', 'pass')}") as s:
                    state = s(p(state, ds_b))
            return state

    # async native chunk writer (cmblensing_tpu.native) — sampling never
    # blocks on disk; records are CRC-protected for crash resume
    writer = None
    if filename:
        from ..native import CheckpointWriter
        writer = CheckpointWriter(_ckpt_name(filename), append=bool(resume))

    chunk = []
    from ..utils.progress import progress_bar
    pbar_cm = progress_bar(nsamps_per_chain - start_step, "sample_joint",
                           enabled=progress)
    pbar = pbar_cm.__enter__()
    try:
        for step in range(start_step + 1, nsamps_per_chain + 1):
            states["step"] = step
            if verbose_timing:
                from ..utils.timing import timers_snapshot, timer_report
                snap = timers_snapshot()
            states = passes(states)
            if verbose_timing:
                print(f"--- gibbs step {step} timing ---\n"
                      + timer_report(since=snap), flush=True)
            entry = _filter_for_saving(states, step, nsavemaps)
            chain.append(entry)
            chunk.append(entry)
            if progress:
                lp = states.get("logpdf")
                acc = states.get("accept")
                sv = {}
                if lp is not None:
                    sv["logpdf"] = float(np.mean(np.asarray(lp)))
                if acc is not None:
                    sv["accept"] = float(np.mean(np.asarray(acc)))
                pbar.update(**sv)
            if writer and (step % nfilewrite == 0):
                _write_chunk(writer, chunk, states)
                chunk = []

        if writer and chunk:
            _write_chunk(writer, chunk, states)
    finally:
        pbar_cm.__exit__(None, None, None)
        if writer:
            writer.flush()
            writer.close()

    from .chains import Chains
    return Chains([chain])


def once_every(n, gibbs_pass):
    """Run a gibbs pass only every n steps (src/sampling.jl:469-477)."""

    def wrapped(state, ds, **kw):
        if state["step"] % n == 0:
            return gibbs_pass(state, ds, **kw)
        return state

    return wrapped


def start_after_burnin(n, gibbs_pass):
    """Run a gibbs pass only after n burn-in steps
    (src/sampling.jl:479-487)."""

    def wrapped(state, ds, **kw):
        if state["step"] > n:
            return gibbs_pass(state, ds, **kw)
        return state

    return wrapped


def _filter_for_saving(state, step, nsavemaps):
    from ..utils.transfer import device_get_safe
    out = {}
    for k, v in state.items():
        if k in ("key",):
            continue
        if isinstance(v, Field) and (step % nsavemaps != 0):
            continue
        if isinstance(v, Field):
            out[k] = Field(device_get_safe(v.arr), v.basis, v.proj)
        elif hasattr(v, "shape"):
            out[k] = device_get_safe(v)
        else:
            out[k] = v
    out["step"] = step
    return out


def _ckpt_name(filename):
    return f"{filename}.ckpt"


def _write_chunk(writer, chunk, states):
    from ..utils.transfer import device_get_safe
    payload = dict(chunk=chunk, state=jax.tree_util.tree_map(
        lambda x: device_get_safe(x) if hasattr(x, "shape") else x, states))
    writer.write(pickle.dumps(payload))


def _load_last_chunk(filename):
    from ..native import read_records
    recs = read_records(_ckpt_name(filename))
    if not recs:
        raise FileNotFoundError(f"no valid checkpoint records in {_ckpt_name(filename)}")
    payload = pickle.loads(recs[-1])
    # device_put_safe, not jnp.asarray: complex h2d is unimplemented on
    # remotely-attached TPUs, so complex leaves stage as re/im pairs
    from ..utils.transfer import device_put_safe
    dev = getattr(jax.config, "jax_default_device", None) or jax.devices()[0]
    states = jax.tree_util.tree_map(
        lambda x: device_put_safe(x, dev) if isinstance(x, np.ndarray) else x,
        payload["state"])
    return states, int(payload["state"]["step"])
