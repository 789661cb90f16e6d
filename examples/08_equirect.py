"""Curved-sky (EquiRect) fields and block-diagonal covariances.

Mirrors the reference's ProjEquiRect surface (src/proj_equirect.jl):
build an equirectangular band, construct exact isotropic covariances
(block-diagonal in azimuthal m, via Wigner-d recurrences), simulate,
and verify the two-point function round-trips.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
FAST = bool(int(os.environ.get("CMBL_EXAMPLE_FAST", "0")))  # CI smoke lane


import numpy as np
import jax

# pin the CPU platform unless the user asks for an accelerator: the
# tunneled-TPU plugin's backend init blocks indefinitely when its
# tunnel is down, which would hang any jax.devices() call below
if os.environ.get("CMBL_EXAMPLE_DEVICE", "cpu") == "cpu":
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import jax.numpy as jnp

_dev = os.environ.get("CMBL_EXAMPLE_DEVICE", "cpu")
jax.config.update("jax_default_device", jax.devices(_dev)[0])

from cmblensing_tpu.core.proj_equirect import (
    ProjEquiRect, EquiRectField, Cl_to_Cov_EquiRect, er_dot)
from cmblensing_tpu.models.distributions import MvNormal
from cmblensing_tpu.utils.cls import Cls

# a band between colatitudes 1.2 and 1.8 rad, full circle in phi
proj = ProjEquiRect(Ny=8 if FAST else 32, Nx=16 if FAST else 64, theta_span=(1.2, 1.8),
                    phi_span=(0, 2 * np.pi))

# toy isotropic spectra
lmax = 40 if FAST else 100
ell = np.arange(lmax + 1)
CTT = Cls(ell, np.where(ell >= 2, 1.0 / (ell + 1.0) ** 2, 0.0))
CEE = Cls(ell, np.where(ell >= 2, 0.5 / (ell + 1.0) ** 2, 0.0))
CBB = Cls(ell, np.where(ell >= 2, 0.05 / (ell + 1.0) ** 2, 0.0))

# spin-0 and spin-2 covariances (dense n_theta blocks per m)
CT = Cl_to_Cov_EquiRect("I", proj, CTT, lmax=lmax)
CP = Cl_to_Cov_EquiRect("P", proj, CEE, CBB, lmax=lmax)

# simulate a batch of 8 temperature maps and check the quadratic form
key = jax.random.PRNGKey(0)
fb = CT.simulate(key, batch_shape=(8,))
print("batched sims:", fb.arr.shape, fb.basis)

# <f' Cpinv f> ~ effective rank per sim. Use the rtol-regularized pinv:
# steep spectra make the high-m blocks ill-conditioned in float32, and
# an exact solve would amplify simulation rounding in the near-null
# directions (the reference's per-block SVD pinv guards the same way,
# src/proj_equirect.jl:324-334)
Ct_pinv = CT.pinv(rtol=1e-4)
quad = np.mean([float(er_dot(EquiRectField(fb.arr[i], fb.basis, proj),
                             Ct_pinv @ EquiRectField(fb.arr[i], fb.basis, proj)))
                for i in range(8)])
print(f"mean f' C^+ f = {quad:.1f} (~effective rank; npix = {proj.Ny * proj.Nx})")

# MvNormal logpdf over the band
lp = float(MvNormal(0, CT).logpdf(EquiRectField(fb.arr[0], fb.basis, proj)))
print("logpdf:", lp)

# spin-2: simulate and verify EB decomposition is sane
fq = CP.simulate(jax.random.fold_in(key, 1))
print("spin-2 sim:", fq.arr.shape, fq.basis)
qu = fq.to("qu_map")
print("Q rms:", float(jnp.std(qu.arr[0])), " U rms:", float(jnp.std(qu.arr[1])))
