"""Schedule parity: pfd_tpu tables vs the reference's own schedule code."""

import numpy as np

from pfd_tpu.diffusion import schedules
from tests import ref_utils


def test_beta_schedules_match_reference():
    ref_utils.load_reference()
    from lib.model_zoo import diffusion_utils as ref

    for kind in ["linear", "cosine", "sqrt_linear", "sqrt"]:
        ours = schedules.make_beta_schedule(kind, 1000, 0.00085, 0.012)
        theirs = ref.make_beta_schedule(kind, 1000, 0.00085, 0.012)
        np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-12)


def test_ddim_tables_match_reference():
    ref_utils.load_reference()
    from lib.model_zoo import diffusion_utils as ref

    sched = schedules.make_diffusion_schedule(
        "linear", 1000, linear_start=0.00085, linear_end=0.012)
    for steps in [50, 20, 10]:
        for eta in [0.0, 1.0]:
            ts_ref = ref.make_ddim_timesteps("uniform", steps, 1000, verbose=False)
            tables = schedules.make_ddim_tables(sched, steps, eta=eta)
            np.testing.assert_array_equal(tables.timesteps, ts_ref)

            import torch
            sig, al, al_prev = ref.make_ddim_sampling_parameters(
                alphacums=torch.tensor(sched.alphas_cumprod), ddim_timesteps=ts_ref,
                eta=eta, verbose=False)
            np.testing.assert_allclose(tables.alphas, al, rtol=1e-10)
            np.testing.assert_allclose(tables.alphas_prev, al_prev, rtol=1e-10)
            np.testing.assert_allclose(tables.sigmas, sig, rtol=1e-10, atol=1e-12)


def test_ddpm_buffers_match_reference_model():
    """Full DDPM buffer parity vs the reference pfd register_schedule
    (pfd.py:110-168) using a tiny stub model carrying only schedule state."""
    ref_utils.load_reference()
    import torch
    from lib.model_zoo.pfd import PromptFreeDiffusion as RefPFD

    # Build the schedule the way pfd does without building the full net:
    # call register_schedule on an empty shell.
    shell = RefPFD.__new__(RefPFD)
    torch.nn.Module.__init__(shell)
    shell.v_posterior = 0.0
    shell.parameterization = "eps"
    shell.register_schedule(beta_schedule="linear", timesteps=1000,
                            linear_start=0.00085, linear_end=0.012)

    ours = schedules.make_diffusion_schedule(
        "linear", 1000, linear_start=0.00085, linear_end=0.012)

    for name in ["betas", "alphas_cumprod", "alphas_cumprod_prev",
                 "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
                 "log_one_minus_alphas_cumprod", "sqrt_recip_alphas_cumprod",
                 "sqrt_recipm1_alphas_cumprod", "posterior_variance",
                 "posterior_log_variance_clipped", "posterior_mean_coef1",
                 "posterior_mean_coef2", "lvlb_weights"]:
        theirs = getattr(shell, name).numpy()
        np.testing.assert_allclose(
            getattr(ours, name).astype(np.float32), theirs, rtol=2e-5, atol=1e-7,
            err_msg=name)
