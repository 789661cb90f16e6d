"""The lensing posterior (mirrors docs/src/02_posterior.md).

Walks the three parametrizations of P(f, phi | d):
unlensed (f, phi), lensed (f_tilde, phi), mixed (f_mix, phi_mix),
evaluates and differentiates each.
"""
import sys, os
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

cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    from cmblensing_tpu import load_sim, Mixed, mix, unmix, fgrad
    from cmblensing_tpu.core import field as F

    out = load_sim(thetapix=2, Nside=32 if FAST else 128, pol="I", T=np.float32, seed=0)
    ds, f, phi = out["ds"], out["f"], out["phi"]

    # unlensed parametrization
    lp = float(ds.logpdf(f=f, phi=phi))
    print(f"logpdf(f, phi)             = {lp:.2f}")

    # lensed parametrization: f_tilde = L(phi) f
    ft = ds.L(phi) @ f
    f_back = ds.L(phi).solve(ft)
    print(f"inverse-lense residual     = {float(F.norm(f_back - f)/F.norm(f)):.2e}")

    # mixed parametrization
    m = mix(ds, f=f, phi=phi)
    lp_mix = float(Mixed(ds).logpdf(f_mix=m["f_mix"], phi_mix=m["phi_mix"]))
    print(f"mixed logpdf               = {lp_mix:.2f}  (rel diff {abs(lp-lp_mix)/abs(lp):.1e})")

    # gradients wrt both fields
    gf = ds.gradientf_logpdf(f, phi=phi)
    gphi = fgrad(lambda p: jnp.sum(ds.logpdf(f=f, phi=p)))(phi)
    print(f"|grad_f logpdf|            = {float(F.norm(gf)):.3g}")
    print(f"|grad_phi logpdf|          = {float(F.norm(gphi)):.3g}")

    # theta-dependence (r and Aphi scale the covariances)
    for th in [dict(), dict(r=0.1), dict(Aphi=1.5)]:
        print(f"logpdf at theta={th}: {float(ds.logpdf(f=f, phi=phi, theta=th)):.2f}")
