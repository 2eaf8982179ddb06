"""Gaussian diffusion (IDDPM/DiT lineage) in JAX with scan-based sampling.

Parity: /root/reference/src/model/diffusion/gaussian_diffusion.py:144-877,
respace.py:12-129 and __init__.py:11-47 (`create_diffusion`). The reference
vendors the OpenAI implementation verbatim (torch + host loops); this rebuild
keeps the identical math — cosine/linear beta schedules, epsilon prediction,
LEARNED_RANGE variance with the VLB term, timestep respacing — but:

  * all schedule tables are precomputed in numpy at construction (they are
    compile-time constants under jit);
  * `p_sample_loop` is a `jax.lax.scan` over the respaced steps — one
    compiled graph instead of a Python loop with host syncs
    (gaussian_diffusion.py:470-517 iterates in Python with tqdm);
  * randomness is explicit (PRNG keys), so training steps are reproducible.

Only the configurations reachable from the reference's `create_diffusion`
calls (diffloss.py:23-24: cosine schedule, learn_sigma=True, MSE loss,
epsilon prediction, optional respacing) are implemented; KL-only loss types
and PREVIOUS_X prediction are intentionally out of scope.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Dict, Optional, Sequence, Set, Union

import numpy as np
import jax
import jax.numpy as jnp

ModelFn = Callable[..., jnp.ndarray]  # (x_t, t, cond) -> model output


def betas_for_alpha_bar(num_steps: int, alpha_bar, max_beta=0.999) -> np.ndarray:
    """gaussian_diffusion.py:125-141."""
    betas = []
    for i in range(num_steps):
        t1 = i / num_steps
        t2 = (i + 1) / num_steps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


def get_named_beta_schedule(name: str, num_steps: int) -> np.ndarray:
    """gaussian_diffusion.py:98-122."""
    if name == "linear":
        scale = 1000 / num_steps
        return np.linspace(scale * 0.0001, scale * 0.02, num_steps,
                           dtype=np.float64)
    if name in ("cosine", "squaredcos_cap_v2"):
        return betas_for_alpha_bar(
            num_steps,
            lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2)
    raise NotImplementedError(f"unknown beta schedule: {name}")


def space_timesteps(num_timesteps: int,
                    section_counts: Union[str, Sequence[int]]) -> Set[int]:
    """respace.py:12-62 — choose a subset of the original timesteps."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return set(range(0, num_timesteps, i))
            raise ValueError(
                f"cannot create exactly {desired} steps with an integer stride")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx, all_steps = 0, []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        frac_stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        for _ in range(count):
            all_steps.append(start_idx + round(cur))
            cur += frac_stride
        start_idx += size
    return set(all_steps)


def _mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def _normal_kl(mean1, logvar1, mean2, logvar2):
    """diffusion_utils.py:10-27."""
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))


def _approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))


def _discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """diffusion_utils.py:43-71 — log-likelihood of images scaled to [-1,1]."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_plus = _approx_standard_normal_cdf(plus_in)
    cdf_min = _approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999, log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min,
                  jnp.log(jnp.clip(cdf_delta, min=1e-12))))


@dataclass
class GaussianDiffusion:
    """Epsilon-prediction diffusion with learned-range variance.

    `timestep_map` is set when respaced: model timesteps are mapped back to
    the original scale (respace.py:96-129 _WrappedModel).
    """

    betas: np.ndarray
    learn_sigma: bool = True
    timestep_map: Optional[np.ndarray] = None

    def __post_init__(self):
        betas = np.asarray(self.betas, dtype=np.float64)
        assert (betas > 0).all() and (betas <= 1).all()
        self.num_timesteps = len(betas)

        alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(alphas)
        self.alphas_cumprod_prev = np.append(1.0, self.alphas_cumprod[:-1])
        self.sqrt_alphas_cumprod = np.sqrt(self.alphas_cumprod)
        self.sqrt_one_minus_alphas_cumprod = np.sqrt(1.0 - self.alphas_cumprod)
        self.sqrt_recip_alphas_cumprod = np.sqrt(1.0 / self.alphas_cumprod)
        self.sqrt_recipm1_alphas_cumprod = np.sqrt(1.0 / self.alphas_cumprod - 1)
        self.posterior_variance = (betas * (1.0 - self.alphas_cumprod_prev)
                                   / (1.0 - self.alphas_cumprod))
        self.posterior_log_variance_clipped = np.log(
            np.append(self.posterior_variance[1], self.posterior_variance[1:]))
        self.posterior_mean_coef1 = (betas * np.sqrt(self.alphas_cumprod_prev)
                                     / (1.0 - self.alphas_cumprod))
        self.posterior_mean_coef2 = ((1.0 - self.alphas_cumprod_prev)
                                     * np.sqrt(alphas)
                                     / (1.0 - self.alphas_cumprod))
        self._betas = betas

    # -- helpers ----------------------------------------------------------
    def _extract(self, arr: np.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
        out = jnp.asarray(arr, dtype=jnp.float32)[t]
        return out.reshape(t.shape[0], *([1] * (ndim - 1)))

    def _model_t(self, t: jnp.ndarray) -> jnp.ndarray:
        if self.timestep_map is None:
            return t
        return jnp.asarray(self.timestep_map, dtype=t.dtype)[t]

    # -- q distributions --------------------------------------------------
    def q_sample(self, x_start, t, noise):
        """gaussian_diffusion.py:215-230."""
        nd = x_start.ndim
        return (self._extract(self.sqrt_alphas_cumprod, t, nd) * x_start
                + self._extract(self.sqrt_one_minus_alphas_cumprod, t, nd)
                * noise)

    def q_posterior_mean_variance(self, x_start, x_t, t):
        nd = x_t.ndim
        mean = (self._extract(self.posterior_mean_coef1, t, nd) * x_start
                + self._extract(self.posterior_mean_coef2, t, nd) * x_t)
        var = self._extract(self.posterior_variance, t, nd)
        log_var = self._extract(self.posterior_log_variance_clipped, t, nd)
        return mean, var, log_var

    def _predict_xstart_from_eps(self, x_t, t, eps):
        nd = x_t.ndim
        return (self._extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
                - self._extract(self.sqrt_recipm1_alphas_cumprod, t, nd) * eps)

    # -- p distribution ---------------------------------------------------
    def p_mean_variance(self, model: ModelFn, x, t, clip_denoised=False,
                        model_kwargs=None) -> Dict[str, jnp.ndarray]:
        """gaussian_diffusion.py:254-332 (epsilon / LEARNED_RANGE subset)."""
        model_kwargs = model_kwargs or {}
        nd = x.ndim
        out = model(x, self._model_t(t), **model_kwargs)

        if self.learn_sigma:
            c = x.shape[1] if x.ndim > 1 else x.shape[-1]
            eps, var_values = jnp.split(out, 2, axis=1)
            min_log = self._extract(self.posterior_log_variance_clipped, t, nd)
            max_log = self._extract(np.log(self._betas), t, nd)
            frac = (var_values + 1) / 2
            model_log_variance = frac * max_log + (1 - frac) * min_log
            model_variance = jnp.exp(model_log_variance)
        else:
            eps = out
            # FIXED_LARGE (gaussian_diffusion.py:285-291)
            model_variance = self._extract(
                np.append(self.posterior_variance[1], self._betas[1:]), t, nd)
            model_log_variance = jnp.log(model_variance)

        pred_xstart = self._predict_xstart_from_eps(x, t, eps)
        if clip_denoised:
            pred_xstart = jnp.clip(pred_xstart, -1.0, 1.0)
        mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)
        return {"mean": mean, "variance": model_variance,
                "log_variance": model_log_variance,
                "pred_xstart": pred_xstart, "eps": eps}

    def p_sample(self, model: ModelFn, x, t, rng, clip_denoised=False,
                 model_kwargs=None, temperature=1.0):
        """gaussian_diffusion.py:376-420 (noise scaled by temperature)."""
        out = self.p_mean_variance(model, x, t, clip_denoised, model_kwargs)
        noise = jax.random.normal(rng, x.shape, x.dtype)
        nonzero = (t != 0).astype(x.dtype).reshape(
            t.shape[0], *([1] * (x.ndim - 1)))
        sample = (out["mean"] + nonzero
                  * jnp.exp(0.5 * out["log_variance"]) * noise * temperature)
        return sample

    def p_sample_loop(self, model: ModelFn, shape, noise, rng,
                      clip_denoised=False, model_kwargs=None,
                      temperature=1.0) -> jnp.ndarray:
        """gaussian_diffusion.py:422-468 as a lax.scan over respaced steps."""
        steps = self.num_timesteps

        def body(x, inp):
            i, key = inp
            t = jnp.full((shape[0],), i, dtype=jnp.int32)
            x = self.p_sample(model, x, t, key, clip_denoised, model_kwargs,
                              temperature)
            return x, None

        ts = jnp.arange(steps - 1, -1, -1, dtype=jnp.int32)
        keys = jax.random.split(rng, steps)
        x, _ = jax.lax.scan(body, noise, (ts, keys))
        return x

    def ddim_sample_loop(self, model: ModelFn, shape, noise, rng,
                         clip_denoised=False, model_kwargs=None,
                         eta=0.0) -> jnp.ndarray:
        """gaussian_diffusion.py:519-684 DDIM subset via lax.scan."""
        steps = self.num_timesteps

        def body(x, inp):
            i, key = inp
            t = jnp.full((shape[0],), i, dtype=jnp.int32)
            out = self.p_mean_variance(model, x, t, clip_denoised,
                                       model_kwargs)
            eps = self._predict_eps_from_xstart(x, t, out["pred_xstart"])
            nd = x.ndim
            alpha_bar = self._extract(self.alphas_cumprod, t, nd)
            alpha_bar_prev = self._extract(self.alphas_cumprod_prev, t, nd)
            sigma = (eta * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
                     * jnp.sqrt(1 - alpha_bar / alpha_bar_prev))
            noise_step = jax.random.normal(key, x.shape, x.dtype)
            mean_pred = (out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
                         + jnp.sqrt(1 - alpha_bar_prev - sigma ** 2) * eps)
            nonzero = (t != 0).astype(x.dtype).reshape(
                t.shape[0], *([1] * (nd - 1)))
            return mean_pred + nonzero * sigma * noise_step, None

        ts = jnp.arange(steps - 1, -1, -1, dtype=jnp.int32)
        keys = jax.random.split(rng, steps)
        x, _ = jax.lax.scan(body, noise, (ts, keys))
        return x

    def _predict_eps_from_xstart(self, x_t, t, pred_xstart):
        nd = x_t.ndim
        return ((self._extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
                 - pred_xstart)
                / self._extract(self.sqrt_recipm1_alphas_cumprod, t, nd))

    # -- training ---------------------------------------------------------
    def _vb_terms_bpd(self, frozen_out, x_start, x_t, t):
        """gaussian_diffusion.py:686-717 with a precomputed model output."""
        true_mean, _, true_log_var = self.q_posterior_mean_variance(
            x_start, x_t, t)
        out = self.p_mean_variance(lambda *a, **k: frozen_out, x_t, t,
                                   clip_denoised=False)
        kl = _mean_flat(_normal_kl(true_mean, true_log_var, out["mean"],
                                   out["log_variance"])) / np.log(2.0)
        decoder_nll = _mean_flat(-_discretized_gaussian_log_likelihood(
            x_start, means=out["mean"],
            log_scales=0.5 * out["log_variance"])) / np.log(2.0)
        return jnp.where(t == 0, decoder_nll, kl)

    def training_losses(self, model: ModelFn, x_start, t, rng,
                        model_kwargs=None) -> Dict[str, jnp.ndarray]:
        """gaussian_diffusion.py:719-791 (MSE + VLB for learned sigma).

        Returns per-sample loss terms of shape (N,).
        """
        model_kwargs = model_kwargs or {}
        noise = jax.random.normal(rng, x_start.shape, x_start.dtype)
        x_t = self.q_sample(x_start, t, noise)
        out = model(x_t, self._model_t(t), **model_kwargs)

        terms: Dict[str, jnp.ndarray] = {}
        if self.learn_sigma:
            eps, var_values = jnp.split(out, 2, axis=1)
            frozen = jnp.concatenate(
                [jax.lax.stop_gradient(eps), var_values], axis=1)
            terms["vb"] = self._vb_terms_bpd(frozen, x_start, x_t, t)
        else:
            eps = out
        terms["mse"] = _mean_flat((noise - eps) ** 2)
        terms["loss"] = terms["mse"] + terms.get("vb", 0.0)
        return terms


def create_diffusion(timestep_respacing: Union[str, Sequence[int], None],
                     noise_schedule: str = "linear",
                     learn_sigma: bool = True,
                     diffusion_steps: int = 1000) -> GaussianDiffusion:
    """Parity: diffusion/__init__.py:11-47 (the configurations the reference
    actually uses: MSE loss, epsilon prediction, optional respacing)."""
    betas = get_named_beta_schedule(noise_schedule, diffusion_steps)
    if timestep_respacing is None or timestep_respacing == "":
        return GaussianDiffusion(betas=betas, learn_sigma=learn_sigma)

    use_timesteps = sorted(space_timesteps(diffusion_steps, timestep_respacing))
    # respace.py:65-94: recompute betas over the kept steps
    last_alpha_cumprod = 1.0
    alphas_cumprod = np.cumprod(1.0 - betas)
    new_betas = []
    for i in use_timesteps:
        new_betas.append(1 - alphas_cumprod[i] / last_alpha_cumprod)
        last_alpha_cumprod = alphas_cumprod[i]
    return GaussianDiffusion(betas=np.array(new_betas),
                             learn_sigma=learn_sigma,
                             timestep_map=np.array(use_timesteps))
