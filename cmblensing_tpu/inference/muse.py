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
def _jit_theta_score_batch(ds, f_hat, phi_hat, tvec, names):
    """Per-sim scores d/dtheta logpdf_i at fixed batched (f_hat,
    phi_hat): jacfwd of the per-batch logpdf vector, (nsims, ntheta)."""
    def lp_vec(tv):
        th = {n: tv[i] for i, n in enumerate(names)}
        return jnp.atleast_1d(ds.logpdf(f=f_hat, phi=phi_hat, theta=th))

    return jax.jacfwd(lp_vec)(tvec)


@_partial(jax.jit, static_argnums=(4,))
def _jit_theta_score(ds, f_hat, phi_hat, tvec, names):
    """d/dtheta logpdf at fixed (f_hat, phi_hat), one XLA program."""
    def lp(tv):
        th = {n: tv[i] for i, n in enumerate(names)}
        return jnp.sum(ds.logpdf(f=f_hat, phi=phi_hat, theta=th))

    return jax.grad(lp)(tvec)


def score(ds: DataSet, theta, names, d=None, phi=None, MAP_kwargs=None):
    """s_i = d/dtheta logpdf(d, f_hat, phi_hat | theta) at the joint MAP
    of (f, phi) given theta (ext/CMBLensingMuseInferenceExt.jl:45-88)."""
    MAP_kwargs = dict(MAP_kwargs or {})
    MAP_kwargs.setdefault("nsteps", 10)
    dsd = ds if d is None else ds.replace(d=d)
    res = MAP_joint(dsd, theta=theta, phistart=phi, **MAP_kwargs)
    f_hat, phi_hat = res["f"], res["phi"]
    g = _jit_theta_score(dsd, f_hat, phi_hat, _theta_vec(theta, names),
                         tuple(names))
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

    Returns dict(theta, history, H, J, Sigma)."""
    names = list(theta0.keys())
    theta = {k: float(v) for k, v in theta0.items()}
    key = key if key is not None else jax.random.PRNGKey(0)
    if step_eps is None:
        step_eps = {n: 0.1 * max(abs(float(theta0[n])), 0.1) for n in names}

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
        s = _jit_theta_score_batch(dsd, res["f"], res["phi"],
                                   _theta_vec(theta_eval, names),
                                   tuple(names))
        return np.asarray(s).reshape(nsims, len(names))

    H = None
    for step in range(1, nsteps + 1):
        key, ksim = jax.random.split(key)
        s_data, phi_data = score(ds, theta, names, phi=phi_data, MAP_kwargs=MAP_kwargs)
        s_data = np.asarray(s_data)
        s_sims = mean_sim_score(theta, theta, ksim, sims_phi)
        sbar = s_sims.mean(axis=0)
        J = np.atleast_2d(np.cov(s_sims.T)) if nsims > 1 else np.eye(len(names))

        # H_ij = d/dtheta_sim_j E[s_i(theta_eval fixed)] via forward
        # diffs with matched seeds
        if H is None:
            H = np.zeros((len(names), len(names)))
            for j, n in enumerate(names):
                tp = dict(theta)
                tp[n] = theta[n] + step_eps[n]
                s_p = mean_sim_score(tp, theta, ksim, [None]).mean(axis=0)
                H[:, j] = (s_p - sbar) / step_eps[n]

        # Newton step for F(theta) = s_data - sbar(theta): dF/dtheta = -H
        # (sbar rises with theta_sim while the fixed-eval s_data term is
        # theta-independent), so theta <- theta + H^-1 F
        dtheta = np.linalg.solve(H, (s_data - sbar))
        for i, n in enumerate(names):
            step_i = alpha * dtheta[i]
            cap = 0.5 * max(abs(theta[n]), 0.1)
            step_i = float(np.clip(step_i, -cap, cap))
            theta[n] = float(theta[n] + step_i)
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
             else np.eye(len(names)))
        Hf = np.zeros((len(names), len(names)))
        for j, n in enumerate(names):
            tp = dict(theta)
            tp[n] = theta[n] + step_eps[n]
            tm = dict(theta)
            tm[n] = theta[n] - step_eps[n]
            s_p = mean_sim_score(tp, theta, kH, [None]).mean(axis=0)
            s_m = mean_sim_score(tm, theta, kH, [None]).mean(axis=0)
            Hf[:, j] = (s_p - s_m) / (2 * step_eps[n])
        H = Hf

    Sigma = np.linalg.solve(H, J) @ np.linalg.inv(H).T
    return dict(theta=theta, history=history, H=H, J=J, Sigma=Sigma)


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
        tvec = _theta_vec(self._theta(theta), self.params)
        dsd = self.ds.replace(d=d)
        return _jit_theta_score(dsd, z["f"], z["phi"], tvec,
                                tuple(self.params))

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
