"""Diffusion noise schedules and DDIM sub-sequence tables.

Numerically matches the reference's LDM-lineage schedule math
(model/networks/diffusion_networks/ldm_diffusion_util.py:43-117 and
model/sdfusion_txt2shape_model.py:184-237): linear betas in sqrt-space,
cumulative alphas, posterior coefficients, eps-parameterization VLB weights,
and uniform-stride DDIM timesteps offset by +1.

All tables are computed once in float64 numpy at model build time and baked
as device constants — nothing here is traced.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def make_beta_schedule(schedule: str, n_timestep: int, linear_start: float = 1e-4,
                       linear_end: float = 2e-2, cosine_s: float = 8e-3) -> np.ndarray:
    if schedule == "linear":
        betas = np.linspace(linear_start ** 0.5, linear_end ** 0.5, n_timestep,
                            dtype=np.float64) ** 2
    elif schedule == "cosine":
        t = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(t / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"unknown beta schedule {schedule!r}")
    return betas


@dataclass(frozen=True)
class NoiseSchedule:
    """Precomputed DDPM tables, all shape [T] float32 numpy arrays."""

    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray
    lvlb_weights: np.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def make_noise_schedule(timesteps: int = 1000, beta_schedule: str = "linear",
                        linear_start: float = 0.00085, linear_end: float = 0.012,
                        cosine_s: float = 8e-3, v_posterior: float = 0.0,
                        parameterization: str = "eps") -> NoiseSchedule:
    betas = make_beta_schedule(beta_schedule, timesteps, linear_start, linear_end,
                               cosine_s)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

    posterior_variance = (
        (1 - v_posterior) * betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        + v_posterior * betas
    )
    if parameterization == "eps":
        # posterior_variance[0] == 0 → inf at index 0, overwritten below
        # (reference sdfusion_txt2shape_model.py:234)
        with np.errstate(divide="ignore"):
            lvlb_weights = betas ** 2 / (
                2 * posterior_variance * alphas * (1 - alphas_cumprod))
    elif parameterization == "x0":
        lvlb_weights = 0.5 * np.sqrt(alphas_cumprod) / (2.0 * 1 - alphas_cumprod)
    else:
        raise NotImplementedError(parameterization)
    lvlb_weights = lvlb_weights.copy()
    lvlb_weights[0] = lvlb_weights[1]   # reference sdfusion_txt2shape_model.py:234

    f32 = lambda x: np.asarray(x, dtype=np.float32)
    return NoiseSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(np.log(np.maximum(posterior_variance, 1e-20))),
        posterior_mean_coef1=f32(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
        posterior_mean_coef2=f32((1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)),
        lvlb_weights=f32(lvlb_weights),
    )


def make_ddim_timesteps(num_ddim_steps: int, num_ddpm_steps: int,
                        method: str = "uniform") -> np.ndarray:
    """DDIM sub-sequence (reference ldm_diffusion_util.py:68-83; note +1).

    Reference LDM quirk, kept for parity: 'uniform' uses the FLOOR stride,
    so when num_ddim_steps doesn't divide num_ddpm_steps the chain runs
    MORE steps than asked (e.g. 64 of 1000 → 67 actual). The actual count
    is len(tables.timesteps); we log the overshoot instead of hiding it."""
    if method == "uniform":
        if num_ddim_steps > num_ddpm_steps:
            raise ValueError(
                f"ddim_steps ({num_ddim_steps}) > ddpm timesteps "
                f"({num_ddpm_steps})")
        c = num_ddpm_steps // num_ddim_steps
        steps = np.asarray(list(range(0, num_ddpm_steps, c)))
        if len(steps) != num_ddim_steps:
            import sys
            print(f"[!] ddim uniform grid: {num_ddim_steps} requested → "
                  f"{len(steps)} actual steps (reference floor-stride "
                  f"quirk)", file=sys.stderr)
    elif method == "quad":
        steps = (np.linspace(0, np.sqrt(num_ddpm_steps * 0.8), num_ddim_steps) ** 2).astype(int)
    else:
        raise NotImplementedError(method)
    return steps + 1


@dataclass(frozen=True)
class DDIMTables:
    """Per-DDIM-step tables in ascending timestep order, shape [S] float32."""

    timesteps: np.ndarray     # int32, the t fed to the denoiser
    alphas: np.ndarray
    alphas_prev: np.ndarray
    sqrt_one_minus_alphas: np.ndarray
    sigmas: np.ndarray


def make_ddim_tables(sched: NoiseSchedule, num_ddim_steps: int, eta: float = 0.0,
                     method: str = "uniform") -> DDIMTables:
    ts = make_ddim_timesteps(num_ddim_steps, sched.num_timesteps, method)
    # clip the +1 overshoot at the final table entry (the reference indexes
    # alphas_cumprod with t∈[1, T]; t==T would go out of bounds only when
    # num_ddim_steps divides T exactly and stride*last+1 == T, which the
    # uniform grid avoids by construction — but guard anyway).
    ts = np.minimum(ts, sched.num_timesteps - 1)
    alphas = sched.alphas_cumprod[ts].astype(np.float64)
    alphas_prev = np.asarray(
        [sched.alphas_cumprod[0]] + sched.alphas_cumprod[ts[:-1]].tolist(),
        dtype=np.float64)
    sigmas = eta * np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    return DDIMTables(
        timesteps=ts.astype(np.int32),
        alphas=alphas.astype(np.float32),
        alphas_prev=alphas_prev.astype(np.float32),
        sqrt_one_minus_alphas=np.sqrt(1.0 - alphas).astype(np.float32),
        sigmas=sigmas.astype(np.float32),
    )
