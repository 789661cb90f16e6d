"""cmblensing_tpu — a TPU-native (JAX/XLA/Pallas) framework for Bayesian
analysis of the gravitationally lensed CMB.

Re-designed from scratch for TPU hardware with the capabilities of
CMBLensing.jl (the Julia reference): flat-sky fields over batched jnp
arrays, Fourier-diagonal covariances, LenseFlow ODE lensing with a
continuous-adjoint custom VJP, Wiener filtering / MAP / HMC+Gibbs
sampling / quadratic estimation of the lensing posterior

    d = M(theta) B(theta) L(phi) f + n

(see reference src/dataset.jl:59-66), with the simulation batch axis
vmapped and sharded over a TPU device mesh.
"""

__version__ = "0.1.0"

from .core.proj import ProjLambert, rfft_degeneracy_fac
from .core.basis import (
    Basis, MAP, FOURIER, QU_MAP, QU_FOURIER, EB_MAP, EB_FOURIER,
    IQU_MAP, IQU_FOURIER, IEB_MAP, IEB_FOURIER,
    lense_basis, deriv_basis, harmonic_basis,
)
from .core.field import (
    Field, from_maps, zeros_like_field, dot, norm,
    batch, unbatch, batch_index, batch_length, batch_map, batch_vmap,
    repeat_batch,
)
from .core.ops import (
    Diag, Identity, Id, LazyOp, FuncOp, ParamDependentOp, BlockDiagIEB,
    BandPass, HighPass, LowPass, MidPass, MidPasses,
    gradient_ops, gradhess, logdet, logdet_rel, simulate_op, laplacian,
)
from .core.cov import Cl_to_Cov, cov_to_Cl
from .utils.cls import (
    Cls, camb, load_camb_cls, noise_cls, beam_cls, extrapolate_cls, pixwin,
)
from .utils.masking import make_mask
from .utils.spectra import get_Cl, get_Dl
from .utils.ud_grade import ud_grade
from .ops.solvers import rk4_integrate, conjugate_gradient, gmres
from .models.lenseflow import (LenseFlow, lense, get_max_lensing_step,
                               set_lenseflow_backend, get_lenseflow_backend,
                               lenseflow_backend_ctx)
from .models.powerlens import PowerLens, antilensing
from .models.taylens import Taylens
from .models.bilinearlens import BilinearLens
from .models.dataset import (
    DataSet, NoLensingDataSet, BaseDataSet, Mixed,
    mix, unmix, load_sim, load_nolensing_sim, simulate, logpdf,
    gradientf_logpdf, Hessian_logpdf_preconditioner,
)
from .models.distributions import MvNormal
from .models.quadratic_estimate import quadratic_estimate
from .models import fwdmodel
from .inference.maximization import argmaxf_logpdf, sample_f, MAP_joint, MAP_marg
from .inference.sampling import (
    symplectic_integrate, hmc_step, grid_and_sample, sample_joint, mass_matrix_phi,
)
from .inference.chains import (
    Chain, Chains, load_chains, mean_std_and_errors, effective_sample_size, kde,
)
from .inference.muse import muse, MuseProblem
from .parallel.mesh import (
    make_mesh, shard_batch, replicate, local_mesh, distributed_initialize, proc_info,
)
from .parallel.spatial import (
    ShardedLenseFlow, lense_sharded, spatial_mesh, shard_spatial,
)
from .parallel.sharded_fft import (
    rfft2_sharded, irfft2_sharded, pad_multiplier, fourier_diag_apply_sharded,
    get_Cl_sharded,
)
from .parallel.sharded_wf import (
    sharded_wiener_filter, sharded_lensing_logpdf, sharded_MAP_joint,
    sharded_sample_f, sharded_hmc_phi_step, sharded_gibbs_pass,
    sharded_sample_joint,
)
from .core.field import fgrad, fvalue_and_grad
from .core.field_tuple import FieldTuple
from .core.field_tuple import DiagFieldTuple
from .core.field_vectors import (FieldVector, FieldMatrix, gradient_vector,
                                 hessian_matrix, magnification_matrix)
from .core.proj_equirect import (
    ProjEquiRect, EquiRectField, BlockDiagEquiRect, Cl_to_Cov_EquiRect,
    Cl_to_Beam_EquiRect, mapblocks,
)
from .core.proj_healpix import ProjHealpix, HealpixField, project
from .utils.cls import (smooth, get_rho_l, shift_l, get_l4Cl, ell2, ell4,
                        toCl, toDl)
from .utils.timing import timed, timer_report, reset_timers
from .utils.transfer import device_put_safe, device_get_safe
from .ops.deriv import set_deriv_mode, get_deriv_mode, set_matmul_precision
from .ops.fft import (
    set_fft_mode, get_fft_mode, unfold, fftsyms, rfft2vec, vec2rfft,
)
from .utils.summation import set_sum_mode, get_sum_mode

# export-list parity with the reference (src/CMBLensing.jl:94-117)
from .core.ops import nan2zero, SymmetricFuncOp, gradient, tr
from .utils.plotting import animate
from .utils.summation import asum as _asum  # noqa: F401 (sum modes exported above)
from .utils.transfer import device_put_safe, cpu, tpu
from .inference.sampling import (
    gibbs_sample_f, gibbs_sample_phi, gibbs_sample_slice_theta,
    gibbs_mix, gibbs_unmix, gibbs_postprocess, once_every, start_after_burnin,
)


def expnorm(x):
    """exp(x - max(x)) (reference src/util.jl:325)."""
    import jax.numpy as _jnp
    return _jnp.exp(x - _jnp.max(x))


def diag(op):
    """Diagonal field of a diagonal-like operator (reference `diag`)."""
    d = op.diag
    return d() if callable(d) else d


def fieldinfo(f):
    """One-line description of a field (reference `fieldinfo`)."""
    return (f"{type(f).__name__}(basis={f.basis}, shape={tuple(f.arr.shape)}, "
            f"dtype={f.arr.dtype}, proj={f.proj})")


def firsthalf(x):
    """First half of a sequence/array (reference src/util.jl:285)."""
    return x[: len(x) // 2]


def lasthalf(x):
    """Last half of a sequence/array (reference src/util.jl:286)."""
    return x[len(x) // 2:]
