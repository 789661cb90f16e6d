"""Joint MAP estimation (mirrors docs/src/03_joint_MAP_example.md).

Simulate a masked, beamed, noisy polarization dataset and jointly
maximize the lensing posterior over (f, phi).
"""
import numpy as np
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
FAST = bool(int(os.environ.get("CMBL_EXAMPLE_FAST", "0")))  # CI smoke lane


import jax

# pin the CPU platform unless the user asks for an accelerator: the
# tunneled-TPU plugin's backend init blocks indefinitely when its
# tunnel is down, which would hang any jax.devices() call below
if os.environ.get("CMBL_EXAMPLE_DEVICE", "cpu") == "cpu":
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

# default to CPU (remote-tunneled TPU attachments can't run the eager
# tail ops); set CMBL_EXAMPLE_DEVICE=tpu on a directly-attached chip,
# or use scripts/map_1024.py for the fully on-chip workflow
_dev = os.environ.get("CMBL_EXAMPLE_DEVICE", "cpu")
jax.config.update("jax_default_device", jax.devices(_dev)[0])

from cmblensing_tpu import load_sim, MAP_joint
from cmblensing_tpu.core import field as F

# the mask must scale with the footprint: a 1 deg edge pad on the FAST
# lane's 1.6 deg map would mask every pixel (flat posterior, nan corr)
out = load_sim(
    thetapix=3, Nside=32 if FAST else 128, pol="P", T=np.float32,
    muKarcminT=1, beamFWHM=2,
    pixel_mask_kwargs=(dict(edge_padding_deg=0.2, apodization_deg=0.1)
                       if FAST else
                       dict(edge_padding_deg=1, apodization_deg=0.5)),
    seed=0,
)
ds, f, phi = out["ds"], out["f"], out["phi"]

res = MAP_joint(ds, nsteps=3 if FAST else 10, progress=True,
                conjgrad_kwargs=dict(tol=1e-1, nsteps=200))

corr = float(F.dot(res["phi"].to(phi.basis), phi)
             / (F.norm(phi) * F.norm(res["phi"])))
print(f"corr(phi_MAP, phi_true) = {corr:.3f}")
assert np.isfinite(corr) and corr > 0.2, f"MAP did not move phi (corr={corr})"
