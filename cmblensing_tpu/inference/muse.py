"""MUSE: Marginal Unbiased Score Expansion (Millea & Seljak 2021).

The reference only bridges to MuseInference.jl
(ext/CMBLensingMuseInferenceExt.jl); here the algorithm is implemented
natively on DataSets, with the simulation ensemble as a vmapped +
mesh-sharded batch axis (the "MUSE/mass-sim pipeline sharded over ICI"
north star).

MUSE estimates theta from the score of the *joint* posterior evaluated
at the per-dataset latent MAP:

    s_i(theta, d) = d/dtheta_i logP(d, zhat(theta, d) | theta)

solving  s(theta, data) = E_{d ~ P(d|theta)}[ s(theta, d) ]
by quasi-Newton iteration; the Jacobian H and score covariance J give
the approximate posterior covariance  Sigma = H^-1 J H^-T.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.field import Field, repeat_batch
from ..models.dataset import DataSet
from .maximization import MAP_joint


def _theta_vec(theta_dict, names):
    return jnp.asarray([theta_dict[n] for n in names], dtype=jnp.float32)


def _theta_dict(vec, names):
    return {n: vec[i] for i, n in enumerate(names)}


# --- vector-valued theta support (bandpower MUSE) ---------------------
#
# A theta entry may be a SCALAR (e.g. Aphi=1.0) or a VECTOR of
# bandpower amplitudes (e.g. Aphi_b=np.ones(4) parametrizing a banded
# Cl_to_Cov ParamDependentOp). Internally everything runs on one flat
# parameter vector; the static "spec" records how to unpack it.

def _theta_spec(theta0):
    """Static spec: tuple of (name, size), size=None for scalars,
    preserving dict order. Hashable, so usable as a jit static arg."""
    spec = []
    for k, v in theta0.items():
        a = np.asarray(v)
        if a.ndim > 1:
            raise ValueError(f"theta entry {k!r} must be scalar or 1-D")
        spec.append((k, None if a.ndim == 0 else int(a.shape[0])))
    return tuple(spec)


def _spec_size(spec):
    return sum(1 if s is None else s for _, s in spec)


def _spec_unpack(tvec, spec):
    """Flat (jnp or np) vector -> theta dict (slices keep tracers)."""
    th, i = {}, 0
    for n, s in spec:
        if s is None:
            th[n] = tvec[i]
            i += 1
        else:
            th[n] = tvec[i:i + s]
            i += s
    return th


def _spec_pack(theta, spec):
    """theta dict -> flat float64 numpy vector."""
    parts = []
    for n, s in spec:
        v = np.asarray(theta[n], dtype=np.float64)
        parts.append(v.reshape(1 if s is None else s))
    return np.concatenate(parts)


def _spec_labels(spec):
    out = []
    for n, s in spec:
        out.extend([n] if s is None else [f"{n}[{j}]" for j in range(s)])
    return out


from functools import partial as _partial


@jax.jit
def _jit_simulate_d(ds, key, theta):
    """One simulated dataset at theta, fully in-graph (eager complex
    primitives are unimplemented on remotely-attached TPUs)."""
    return ds.simulate(key, theta=theta)["d"]


@jax.jit
def _jit_simulate_batch(ds, keys, theta):
    """A batch of independent simulated datasets, one per key — the
    simulation ensemble as a vmapped batch axis."""
    return jax.vmap(lambda k: ds.simulate(k, theta=theta, batch_shape=())["d"])(keys)


@_partial(jax.jit, static_argnums=(4,))
def _jit_theta_score_batch(ds, f_hat, phi_hat, tvec, spec):
    """Per-sim scores d/dtheta logpdf_i at fixed batched (f_hat,
    phi_hat): jacfwd of the per-batch logpdf vector, (nsims, nflat).
    spec is a static (name, size) tuple — size=None for scalar theta
    entries, an int for vector (bandpower) entries."""
    def lp_vec(tv):
        return jnp.atleast_1d(ds.logpdf(f=f_hat, phi=phi_hat,
                                        theta=_spec_unpack(tv, spec)))

    return jax.jacfwd(lp_vec)(tvec)


@_partial(jax.jit, static_argnums=(4,))
def _jit_theta_score(ds, f_hat, phi_hat, tvec, spec):
    """d/dtheta logpdf at fixed (f_hat, phi_hat), one XLA program."""
    def lp(tv):
        return jnp.sum(ds.logpdf(f=f_hat, phi=phi_hat,
                                 theta=_spec_unpack(tv, spec)))

    return jax.grad(lp)(tvec)


def score(ds: DataSet, theta, names=None, d=None, phi=None, MAP_kwargs=None):
    """s_i = d/dtheta logpdf(d, f_hat, phi_hat | theta) at the joint MAP
    of (f, phi) given theta (ext/CMBLensingMuseInferenceExt.jl:45-88).
    Returns the flat score vector (scalars contribute one entry, vector
    bandpower entries one per bin, in dict order filtered by names)."""
    MAP_kwargs = dict(MAP_kwargs or {})
    MAP_kwargs.setdefault("nsteps", 10)
    dsd = ds if d is None else ds.replace(d=d)
    res = MAP_joint(dsd, theta=theta, phistart=phi, **MAP_kwargs)
    f_hat, phi_hat = res["f"], res["phi"]
    sub = theta if names is None else {n: theta[n] for n in names}
    spec = _theta_spec(sub)
    g = _jit_theta_score(dsd, f_hat, phi_hat,
                         jnp.asarray(_spec_pack(sub, spec), jnp.float32),
                         spec)
    return g, phi_hat


def muse(ds: DataSet, theta0, nsims=20, nsteps=5, alpha=0.7, key=None,
         MAP_kwargs=None, step_eps=None, progress=False, mesh=None,
         final_H=True):
    """Run the MUSE iteration for the parameters in theta0 (a dict).

    Pass mesh (a jax.sharding.Mesh) to shard the simulation ensemble
    across devices.

    During the Newton iterations H is estimated once by cheap one-sided
    forward differences (its only job there is step direction); before
    forming Sigma = H^-1 J H^-T it is recomputed at the *converged*
    theta with seed-matched two-sided central differences, matching the
    reference MuseInference semantics
    (ext/CMBLensingMuseInferenceExt.jl:45-88). Disable with
    final_H=False to save 2*ntheta+1 batched MAPs.

    Theta entries may be scalars (Aphi=1.0) or 1-D vectors of bandpower
    amplitudes (e.g. Aphi_b=np.ones(4) driving a banded Cl_to_Cov
    ParamDependentOp) — MUSE's native use case (Millea & Seljak 2021
    infer phi bandpowers). Vectors are flattened into the parameter
    vector, so H/J/Sigma are (nflat, nflat) with rows/cols labeled by
    dict(labels=...) in the result.

    Returns dict(theta, history, H, J, Sigma, labels)."""
    spec = _theta_spec(theta0)
    nflat = _spec_size(spec)
    tflat = _spec_pack(theta0, spec)
    key = key if key is not None else jax.random.PRNGKey(0)
    if step_eps is None:
        eps_flat = 0.1 * np.maximum(np.abs(tflat), 0.1)
    else:
        eps_flat = _spec_pack(
            {n: np.broadcast_to(np.asarray(step_eps[n], np.float64),
                                () if s is None else (s,))
             for n, s in spec}, spec)

    def as_dict(vec):
        th = _spec_unpack(np.asarray(vec, np.float64), spec)
        return {n: (float(th[n]) if s is None else np.asarray(th[n]))
                for n, s in spec}

    theta = as_dict(tflat)

    history = []
    phi_data = None
    sims_phi = [None]   # warm start: one *batched* phi across all sims

    MAP_kw = dict(MAP_kwargs or {})
    MAP_kw.setdefault("nsteps", 10)

    def mean_sim_score(theta_sim, theta_eval, key, phis):
        """Scores s(theta_eval, d_i) over sims d_i ~ P(d | theta_sim),
        computed as ONE batched MAP_joint over the whole simulation
        ensemble (the sims axis is the batch axis, sharded on a mesh if
        the data is) — the TPU replacement for the reference's
        pmap-of-MAPs. MUSE's Jacobian perturbs theta_sim ONLY, keeping
        the evaluation point fixed, so the deterministic score slope
        cancels (Millea & Seljak 2021, eq. for H)."""
        ks = jax.random.split(key, nsims)
        d_b = _jit_simulate_batch(ds, ks, theta_sim)
        if mesh is not None:
            from ..parallel.mesh import shard_batch
            d_b = shard_batch(d_b, mesh)
        dsd = ds.replace(d=d_b)
        res = MAP_joint(dsd, theta=theta_eval, phistart=phis[0], **MAP_kw)
        phis[0] = res["phi"]
        s = _jit_theta_score_batch(
            dsd, res["f"], res["phi"],
            jnp.asarray(_spec_pack(theta_eval, spec), jnp.float32), spec)
        return np.asarray(s).reshape(nsims, nflat)

    H = None
    for step in range(1, nsteps + 1):
        key, ksim = jax.random.split(key)
        s_data, phi_data = score(ds, theta, phi=phi_data, MAP_kwargs=MAP_kwargs)
        s_data = np.asarray(s_data)
        s_sims = mean_sim_score(theta, theta, ksim, sims_phi)
        sbar = s_sims.mean(axis=0)
        J = np.atleast_2d(np.cov(s_sims.T)) if nsims > 1 else np.eye(nflat)

        # H_ij = d/dtheta_sim_j E[s_i(theta_eval fixed)] via forward
        # diffs with matched seeds, one column per FLAT entry (each
        # bandpower bin is its own column)
        if H is None:
            H = np.zeros((nflat, nflat))
            tcur = _spec_pack(theta, spec)
            for j in range(nflat):
                tp = tcur.copy()
                tp[j] += eps_flat[j]
                s_p = mean_sim_score(as_dict(tp), theta, ksim,
                                     [None]).mean(axis=0)
                H[:, j] = (s_p - sbar) / eps_flat[j]

        # Newton step for F(theta) = s_data - sbar(theta): dF/dtheta = -H
        # (sbar rises with theta_sim while the fixed-eval s_data term is
        # theta-independent), so theta <- theta + H^-1 F
        dtheta = np.linalg.solve(H, (s_data - sbar))
        tcur = _spec_pack(theta, spec)
        step_v = alpha * dtheta
        cap = 0.5 * np.maximum(np.abs(tcur), 0.1)
        theta = as_dict(tcur + np.clip(step_v, -cap, cap))
        history.append(dict(step=step, theta=dict(theta),
                            s_data=s_data, sbar=sbar))
        if progress:
            print(f"muse step {step}: theta={theta}")

    if final_H:
        # recompute H and J at the converged theta: seed-matched
        # (same kH keys on both sides) two-sided central differences,
        # so the O(eps) bias and the MC noise of the one-sided
        # iteration-H drop out of Sigma
        key, kH = jax.random.split(key)
        s_sims_f = mean_sim_score(theta, theta, kH, [sims_phi[0]])
        J = (np.atleast_2d(np.cov(s_sims_f.T)) if nsims > 1
             else np.eye(nflat))
        Hf = np.zeros((nflat, nflat))
        tcur = _spec_pack(theta, spec)
        for j in range(nflat):
            tp = tcur.copy()
            tp[j] += eps_flat[j]
            tm = tcur.copy()
            tm[j] -= eps_flat[j]
            s_p = mean_sim_score(as_dict(tp), theta, kH, [None]).mean(axis=0)
            s_m = mean_sim_score(as_dict(tm), theta, kH, [None]).mean(axis=0)
            Hf[:, j] = (s_p - s_m) / (2 * eps_flat[j])
        H = Hf

    Sigma = np.linalg.solve(H, J) @ np.linalg.inv(H).T
    return dict(theta=theta, history=history, H=H, J=J, Sigma=Sigma,
                labels=_spec_labels(spec))


class MuseProblem:
    """API-compatible analog of the reference's CMBLensingMuseProblem
    (ext/CMBLensingMuseInferenceExt.jl:21-92): wraps a DataSet as a
    generic MUSE problem exposing logLike / grad_theta_logLike /
    sample_x_z / zhat_at_theta, so user code written against the
    MuseInference interface ports directly. The native `muse()` driver
    above uses the same primitives internally (batched over the
    simulation ensemble instead of per-sim calls)."""

    def __init__(self, ds: DataSet, params=("Aphi",), MAP_joint_kwargs=None):
        self.ds = ds
        self.params = list(params)
        self.MAP_joint_kwargs = dict(MAP_joint_kwargs or {})
        self.MAP_joint_kwargs.setdefault("nsteps", 10)

    def _theta(self, theta):
        if isinstance(theta, dict):
            return theta
        return _theta_dict(jnp.atleast_1d(jnp.asarray(theta)), self.params)

    def logLike(self, d, z, theta):
        """z = dict(f=..., phi=...) (ext/...MuseInferenceExt.jl:45-47)."""
        dsd = self.ds.replace(d=d)
        return jnp.sum(dsd.logpdf(theta=self._theta(theta), **z))

    def grad_theta_logLike(self, d, z, theta):
        th = self._theta(theta)
        sub = {n: th[n] for n in self.params}
        spec = _theta_spec(sub)
        dsd = self.ds.replace(d=d)
        return _jit_theta_score(
            dsd, z["f"], z["phi"],
            jnp.asarray(_spec_pack(sub, spec), jnp.float32), spec)

    def sample_x_z(self, key, theta):
        """Simulate (x=d, z=(f, phi)) at theta
        (ext/...MuseInferenceExt.jl:57-66)."""
        sim = self.ds.simulate(key, theta=self._theta(theta))
        return dict(x=sim["d"], z=dict(f=sim["f"], phi=sim["phi"]))

    def zhat_at_theta(self, d, theta, zguess=None):
        """Joint MAP of the latents at fixed theta
        (ext/...MuseInferenceExt.jl:68-73)."""
        dsd = self.ds.replace(d=d)
        kw = dict(self.MAP_joint_kwargs)
        if zguess is not None:
            kw.setdefault("fstart", zguess.get("f"))
            kw.setdefault("phistart", zguess.get("phi"))
        res = MAP_joint(dsd, theta=self._theta(theta), **kw)
        return dict(f=res["f"], phi=res["phi"]), res["history"]

    def solve(self, theta0=None, **kwargs):
        """Run the native batched-ensemble MUSE driver on this problem
        (reference muse!, ext/...MuseInferenceExt.jl:90-92). A
        MAP_kwargs keyword overrides the problem's MAP_joint_kwargs."""
        theta0 = theta0 or {n: 1.0 for n in self.params}
        map_kw = kwargs.pop("MAP_kwargs", self.MAP_joint_kwargs)
        return muse(self.ds, theta0, MAP_kwargs=map_kw, **kwargs)
