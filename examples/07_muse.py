"""MUSE: estimate theta (here the phi-spectrum amplitude Aphi) with the
Marginal Unbiased Score Expansion (Millea & Seljak 2021).

The reference exposes MUSE through the MuseInference.jl bridge
(ext/CMBLensingMuseInferenceExt.jl); here it's implemented natively on
DataSets (cmblensing_tpu/inference/muse.py) with the simulation
ensemble as a batch axis.

Run on CPU (a few minutes):  python examples/07_muse.py
"""
import sys
import os
sys.path.insert(0, ".")
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


with jax.default_device(jax.devices("cpu")[0]):
    from cmblensing_tpu.models.dataset import load_sim
    from cmblensing_tpu.inference.muse import muse

    # simulate data at the fiducial Aphi = 1
    out = load_sim(thetapix=3, Nside=32, pol="I", T=np.float32, seed=5)
    ds = out["ds"]

    # start deliberately wrong, let MUSE find its way back
    res = muse(
        ds, dict(Aphi=2.0),
        nsims=4 if FAST else 12, nsteps=2 if FAST else 4,
        MAP_kwargs=dict(nsteps=2 if FAST else 4,
                        conjgrad_kwargs=dict(tol=1e-2, nsteps=15 if FAST else 40)),
        progress=True,
    )

    Aphi = float(np.asarray(res["theta"]["Aphi"]))
    sigma = float(np.sqrt(np.asarray(res["Sigma"]).ravel()[0]))
    print(f"\nMUSE: Aphi = {Aphi:.3f} +/- {sigma:.3f}  (truth: 1.0)")
    print("history:", [round(float(np.asarray(h["theta"]["Aphi"])), 3)
                       for h in res["history"]])
