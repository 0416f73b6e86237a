"""Diffusion noise schedules as precomputed pytree tables.

TPU-first redesign of the schedule machinery in the reference
(``scripts/diffusion/gaussian_diffusion.py:26-70`` for the beta schedules,
``:168-204`` for the derived buffers, and ``scripts/diffusion/respace.py:9-88``
for timestep respacing).  Instead of a stateful ``GaussianDiffusion`` class the
whole schedule is a single immutable :class:`DiffusionSchedule` pytree of
``jnp`` arrays that can be closed over by jitted functions, threaded through
``lax.scan`` and sharded/replicated by pjit like any other constant.

All tables are computed in float64 NumPy for accuracy (matching the reference,
``gaussian_diffusion.py:168``) and materialised at float32 for the device.
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

import numpy as np
import jax.numpy as jnp
from flax import struct

__all__ = [
    "get_named_beta_schedule",
    "betas_for_alpha_bar",
    "space_timesteps",
    "DiffusionSchedule",
]


def get_named_beta_schedule(
    schedule_name: str, num_diffusion_timesteps: int, scale_betas: float = 1.0
) -> np.ndarray:
    """Named beta schedule (reference: gaussian_diffusion.py:26-50).

    ``linear``: Ho et al. schedule rescaled so it stays comparable for any
    step count.  ``cosine``: Nichol & Dhariwal's squared-cosine alpha-bar.
    """
    if schedule_name == "linear":
        scale = scale_betas * 1000 / num_diffusion_timesteps
        return np.linspace(
            scale * 0.0001, scale * 0.02, num_diffusion_timesteps, dtype=np.float64
        )
    if schedule_name == "cosine":
        return betas_for_alpha_bar(
            num_diffusion_timesteps,
            lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2,
        )
    raise NotImplementedError(f"unknown beta schedule: {schedule_name}")


def betas_for_alpha_bar(
    num_diffusion_timesteps: int, alpha_bar, max_beta: float = 0.999
) -> np.ndarray:
    """Discretise a continuous alpha-bar function into betas
    (reference: gaussian_diffusion.py:53-70)."""
    t = np.arange(num_diffusion_timesteps, dtype=np.float64)
    t1 = t / num_diffusion_timesteps
    t2 = (t + 1) / num_diffusion_timesteps
    ab1 = np.array([alpha_bar(float(x)) for x in t1], dtype=np.float64)
    ab2 = np.array([alpha_bar(float(x)) for x in t2], dtype=np.float64)
    return np.minimum(1.0 - ab2 / ab1, max_beta)


def space_timesteps(num_timesteps: int, section_counts) -> set:
    """Pick which original timesteps a respaced (step-skipping) process keeps.

    Same contract as the reference (respace.py:9-62): ``section_counts`` is a
    list of per-section step counts, a comma string, or ``"ddimN"`` for the
    fixed DDIM striding.
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired_count = int(section_counts[len("ddim"):])
            for stride in range(1, num_timesteps):
                if len(range(0, num_timesteps, stride)) == desired_count:
                    return set(range(0, num_timesteps, stride))
            raise ValueError(
                f"cannot create exactly {desired_count} steps with an integer stride"
            )
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(
                f"cannot divide section of {size} steps into {section_count}"
            )
        frac_stride = 1 if section_count <= 1 else (size - 1) / (section_count - 1)
        cur_idx = 0.0
        taken = []
        for _ in range(section_count):
            taken.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        all_steps += taken
        start_idx += size
    return set(all_steps)


@struct.dataclass
class DiffusionSchedule:
    """All per-timestep constants of a (possibly respaced) Gaussian diffusion.

    Mirrors the numpy buffers of ``GaussianDiffusion.__init__``
    (gaussian_diffusion.py:168-204) plus the respacing ``timestep_map``
    (respace.py:76-87), as one jittable pytree.
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    log_betas: jnp.ndarray
    # Maps a spaced timestep index to the timestep the model was trained on.
    # Identity for an un-respaced schedule.
    timestep_map: jnp.ndarray
    num_timesteps: int = struct.field(pytree_node=False)
    original_num_steps: int = struct.field(pytree_node=False)

    @classmethod
    def from_betas(
        cls,
        betas: np.ndarray,
        use_timesteps: Iterable[int] | None = None,
        dtype=jnp.float32,
    ) -> "DiffusionSchedule":
        betas = np.asarray(betas, dtype=np.float64)
        assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
        original_num_steps = len(betas)

        if use_timesteps is not None:
            use_timesteps = sorted(set(int(t) for t in use_timesteps))
            base_acp = np.cumprod(1.0 - betas)
            last = 1.0
            new_betas, tmap = [], []
            for i in use_timesteps:
                new_betas.append(1.0 - base_acp[i] / last)
                last = base_acp[i]
                tmap.append(i)
            betas = np.array(new_betas, dtype=np.float64)
            timestep_map = np.array(tmap, dtype=np.int32)
        else:
            timestep_map = np.arange(original_num_steps, dtype=np.int32)

        n = len(betas)
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        acp_next = np.append(acp[1:], 0.0)

        posterior_variance = betas * (1.0 - acp_prev) / (1.0 - acp)
        # t=0's posterior variance is 0; clip with the t=1 value like the
        # reference (gaussian_diffusion.py:185). A length-1 (fully respaced)
        # chain has no t=1 — fall back to a tiny floor instead of crashing
        # (the reference IndexErrors on this degenerate but legal spec).
        if n > 1:
            posterior_log_variance_clipped = np.log(
                np.append(posterior_variance[1], posterior_variance[1:])
            )
        else:
            posterior_log_variance_clipped = np.log(np.array([1e-20]))

        as_dev = lambda a: jnp.asarray(a, dtype=dtype)
        return cls(
            betas=as_dev(betas),
            alphas_cumprod=as_dev(acp),
            alphas_cumprod_prev=as_dev(acp_prev),
            alphas_cumprod_next=as_dev(acp_next),
            sqrt_alphas_cumprod=as_dev(np.sqrt(acp)),
            sqrt_one_minus_alphas_cumprod=as_dev(np.sqrt(1.0 - acp)),
            log_one_minus_alphas_cumprod=as_dev(np.log(1.0 - acp)),
            sqrt_recip_alphas_cumprod=as_dev(np.sqrt(1.0 / acp)),
            sqrt_recipm1_alphas_cumprod=as_dev(np.sqrt(1.0 / acp - 1.0)),
            posterior_variance=as_dev(posterior_variance),
            posterior_log_variance_clipped=as_dev(posterior_log_variance_clipped),
            posterior_mean_coef1=as_dev(
                betas * np.sqrt(acp_prev) / (1.0 - acp)
            ),
            posterior_mean_coef2=as_dev(
                (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)
            ),
            log_betas=as_dev(np.log(betas)),
            timestep_map=jnp.asarray(timestep_map),
            num_timesteps=n,
            original_num_steps=original_num_steps,
        )

    @classmethod
    def create(
        cls,
        *,
        steps: int = 1000,
        schedule: str = "cosine",
        timestep_respacing: str | Sequence[int] | None = None,
        scale_betas: float = 1.0,
        dtype=jnp.float32,
    ) -> "DiffusionSchedule":
        """Build a schedule the way the reference model factory does
        (mdm_utils/model_util.py:40-74): named betas + optional respacing."""
        betas = get_named_beta_schedule(schedule, steps, scale_betas)
        use = None
        if timestep_respacing:
            use = space_timesteps(steps, timestep_respacing)
        return cls.from_betas(betas, use_timesteps=use, dtype=dtype)

    def map_timesteps(self, t: jnp.ndarray) -> jnp.ndarray:
        """Spaced index -> original training timestep (respace.py:125-130)."""
        return self.timestep_map[t]
