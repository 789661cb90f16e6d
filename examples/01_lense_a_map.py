"""Lense a map (mirrors docs/src/01_lense_a_map.md of the reference).

Simulate an unlensed CMB field and a lensing potential from their
theory spectra, lense with LenseFlow, and compare power spectra.
"""
import numpy as np
import jax
import os

# pin the CPU platform unless the user asks for an accelerator: the
# tunneled-TPU plugin's backend init blocks indefinitely when its
# tunnel is down, which would hang any jax.devices() call below
if os.environ.get("CMBL_EXAMPLE_DEVICE", "cpu") == "cpu":
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
FAST = bool(int(os.environ.get("CMBL_EXAMPLE_FAST", "0")))  # CI smoke lane


# default to CPU for eager pedagogy (remote-tunneled TPU attachments
# can't run eager complex ops); set CMBL_EXAMPLE_DEVICE=tpu on a
# directly-attached chip to run the example there
_dev = os.environ.get("CMBL_EXAMPLE_DEVICE", "cpu")
jax.config.update("jax_default_device", jax.devices(_dev)[0])

from cmblensing_tpu import (
    ProjLambert, Cl_to_Cov, camb, LenseFlow, get_Cl,
)
from cmblensing_tpu.core.ops import simulate_op
from cmblensing_tpu.core.basis import MAP

N = 64 if FAST else 256
proj = ProjLambert(N, N, thetapix=3, T=np.float32)
Cl = camb()

Cf = Cl_to_Cov("P", proj, Cl["unlensed_scalar"]["EE"], Cl["unlensed_scalar"]["BB"])
Cphi = Cl_to_Cov("I", proj, Cl["total"]["pp"])

key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
f = simulate_op(k1, Cf)
phi = simulate_op(k2, Cphi).to(MAP)

L = LenseFlow(phi, nsteps=7)
f_lensed = L @ f

clBB_unlensed = get_Cl(f["B"], ledges=np.arange(100, 3000, 100))
clBB_lensed = get_Cl(f_lensed["B"], ledges=np.arange(100, 3000, 100))
print("lensing-induced BB power (should be > unlensed):")
print("  unlensed BB mean:", np.mean(clBB_unlensed.Cl))
print("  lensed BB mean:  ", np.mean(clBB_lensed.Cl))
print("  theory lensed BB:", np.mean(Cl["lensed_scalar"]["BB"](clBB_lensed.ell)))

try:
    from cmblensing_tpu.utils.plotting import plot_maps
    fig = plot_maps([f["Q"], f_lensed["Q"], phi],
                    titles=["Q unlensed", "Q lensed", "phi"])
    fig.savefig("/tmp/lense_a_map.png", dpi=80)
    print("wrote /tmp/lense_a_map.png")
except Exception as e:
    print("plotting skipped:", e)
