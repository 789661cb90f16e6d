"""A/B probe: the same MAP phi-step on CPU vs TPU must agree.

Regression guard for the TPU default-matmul-precision pitfall: without
explicit Precision.HIGHEST, TPU truncates f32 matmul inputs to bf16,
corrupting the circulant-derivative/DFT matmuls and hence every
lensing gradient (symptom: grid linesearch picks alpha=0 forever)."""
import sys
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp


def probe(dev, ds, phi0):
    from cmblensing_tpu.utils.transfer import device_put_safe
    from cmblensing_tpu.inference import maximization as M
    from cmblensing_tpu.core.ops import Id
    from cmblensing_tpu.core.field import dot as fdot

    theta = {}
    dstheta = ds.at(theta).replace(G=Id)
    dstheta, phi = device_put_safe((dstheta, phi0), dev)
    f, _ = M._jit_argmaxf(dstheta, theta, phi, dstheta.d, None,
                          30, 0.0, True, None)
    f_mix, phi_mix, g = M._jit_phi_grad_and_fmix(dstheta, theta, f, phi)
    Hpre_inv = M.hessian_phimix_preconditioner(dstheta).pinv()
    dphi = Hpre_inv @ g
    gdp = float(jax.jit(fdot)(g, dphi))
    alpha, dlp = M._jit_grid_linesearch(dstheta, theta, f_mix, phi_mix,
                                        dphi, jnp.float32(2.0), 16)
    return float(alpha), float(dlp), gdp


def main():
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from cmblensing_tpu.models.dataset import load_sim
        out = load_sim(thetapix=3, Nside=64, pol="P", T=np.float32, seed=0)
    from cmblensing_tpu.inference.maximization import _zero_map_like, _fid
    ds = out["ds"]
    phi0 = _zero_map_like(_fid(ds.Cphi))
    a, dlp, gdp = probe(cpu, ds, phi0)
    print(f"CPU: alpha={a:.4f} dlp={dlp:.4f} <g,dphi>={gdp:.4f}", flush=True)
    try:
        dev = jax.devices("tpu")[0]
    except RuntimeError:
        print("no TPU; skipping")
        return
    a2, dlp2, gdp2 = probe(dev, ds, phi0)
    print(f"TPU: alpha={a2:.4f} dlp={dlp2:.4f} <g,dphi>={gdp2:.4f}", flush=True)
    ok = (abs(a - a2) < 1e-6
          and abs(gdp - gdp2) / max(abs(gdp), 1e-9) < 1e-3
          and abs(dlp - dlp2) / max(abs(dlp), 1e-9) < 1e-2)
    print("AGREE" if ok else "MISMATCH", flush=True)


if __name__ == "__main__":
    main()
