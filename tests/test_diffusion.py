"""Diffusion parity tests against the reference torch implementation.

The reference's diffusion package (/root/reference/src/model/diffusion) is
pure torch+numpy, so we import it as a numerical oracle (never copying it)
and check schedules, q/p distributions, and training losses line up.
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from setok_tpu.diffusion import (GaussianDiffusion, create_diffusion,
                                 get_named_beta_schedule, space_timesteps)

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference/src/model")
ref_diffusion = pytest.importorskip("diffusion")


pytestmark = pytest.mark.full


@pytest.mark.parametrize("schedule", ["linear", "cosine"])
def test_beta_schedules_match(schedule):
    ours = get_named_beta_schedule(schedule, 1000)
    theirs = ref_diffusion.gd.get_named_beta_schedule(schedule, 1000)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)


def test_space_timesteps_match():
    for spec in ["100", "50", "ddim25", "10,20,30"]:
        assert space_timesteps(1000, spec) == \
            ref_diffusion.space_timesteps(1000, spec)


@pytest.fixture(scope="module")
def pair():
    ours = create_diffusion(timestep_respacing="", noise_schedule="cosine")
    theirs = ref_diffusion.create_diffusion(timestep_respacing="",
                                            noise_schedule="cosine")
    return ours, theirs


def test_q_sample_matches(pair):
    ours, theirs = pair
    rs = np.random.RandomState(0)
    x0 = rs.randn(4, 16).astype(np.float32)
    noise = rs.randn(4, 16).astype(np.float32)
    t = np.array([0, 10, 500, 999])
    got = np.asarray(ours.q_sample(jnp.asarray(x0), jnp.asarray(t),
                                   jnp.asarray(noise)))
    want = theirs.q_sample(torch.tensor(x0), torch.tensor(t),
                           torch.tensor(noise)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _dummy_model_np(x, t):
    """Deterministic 'model': eps = 0.1*x, var raw values = tanh(x)."""
    return np.concatenate([0.1 * x, np.tanh(x)], axis=1)


def test_p_mean_variance_matches(pair):
    ours, theirs = pair
    rs = np.random.RandomState(1)
    x = rs.randn(4, 8).astype(np.float32)
    t = np.array([1, 100, 500, 998])

    got = ours.p_mean_variance(
        lambda xt, tt: jnp.asarray(_dummy_model_np(np.asarray(xt),
                                                   np.asarray(tt))),
        jnp.asarray(x), jnp.asarray(t))
    want = theirs.p_mean_variance(
        lambda xt, tt: torch.tensor(_dummy_model_np(xt.numpy(), tt.numpy())),
        torch.tensor(x), torch.tensor(t), clip_denoised=False)
    np.testing.assert_allclose(np.asarray(got["mean"]),
                               want["mean"].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["log_variance"]),
                               want["log_variance"].numpy(), rtol=1e-4,
                               atol=1e-5)


def test_training_losses_match(pair):
    ours, theirs = pair
    rs = np.random.RandomState(2)
    x0 = rs.randn(6, 8).astype(np.float32)
    noise = rs.randn(6, 8).astype(np.float32)
    t = np.array([0, 1, 50, 400, 800, 999])

    # jax path with injected noise: re-derive via q_sample + manual terms
    xt = np.asarray(ours.q_sample(jnp.asarray(x0), jnp.asarray(t),
                                  jnp.asarray(noise)))
    model_out = _dummy_model_np(xt, t)
    eps, var_values = np.split(model_out, 2, axis=1)
    frozen = np.concatenate([eps, var_values], axis=1)
    vb = np.asarray(ours._vb_terms_bpd(jnp.asarray(frozen), jnp.asarray(x0),
                                       jnp.asarray(xt), jnp.asarray(t)))
    mse = ((noise - eps) ** 2).mean(axis=1)

    want = theirs.training_losses(
        lambda xx, tt: torch.tensor(_dummy_model_np(xx.numpy(), tt.numpy())),
        torch.tensor(x0), torch.tensor(t), noise=torch.tensor(noise))
    np.testing.assert_allclose(mse, want["mse"].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(vb, want["vb"].numpy(), rtol=1e-3, atol=1e-4)


def test_respaced_diffusion_matches():
    ours = create_diffusion(timestep_respacing="25", noise_schedule="cosine")
    theirs = ref_diffusion.create_diffusion(timestep_respacing="25",
                                            noise_schedule="cosine")
    np.testing.assert_allclose(ours.betas, theirs.betas, rtol=1e-10)
    assert ours.num_timesteps == theirs.num_timesteps == 25
    np.testing.assert_array_equal(ours.timestep_map,
                                  np.array(theirs.timestep_map))


def test_p_sample_loop_matches_reference_sampler():
    """Full sampling-chain parity: our lax.scan loop == the reference torch
    p_sample_loop, same model, same start noise, temperature=0 (no RNG)."""
    torch.Tensor.cuda = lambda self, *a, **k: self  # ref hard-codes .cuda()
    ours = create_diffusion(timestep_respacing="10", noise_schedule="cosine")
    theirs = ref_diffusion.create_diffusion(timestep_respacing="10",
                                            noise_schedule="cosine")

    def model_np(x, t):
        return np.concatenate([0.2 * x - 0.1, np.tanh(0.5 * x)], axis=1)

    def model_jnp(x, t):   # same math, traceable inside lax.scan
        return jnp.concatenate([0.2 * x - 0.1, jnp.tanh(0.5 * x)], axis=1)

    noise = np.random.RandomState(0).randn(4, 8).astype(np.float32)
    got = ours.p_sample_loop(model_jnp, noise.shape, jnp.asarray(noise),
                             jax.random.PRNGKey(0), temperature=0.0)
    with torch.no_grad():
        want = theirs.p_sample_loop(
            lambda x, t: torch.tensor(model_np(x.numpy(), t.numpy())),
            noise.shape, torch.tensor(noise), clip_denoised=False,
            model_kwargs={}, progress=False, temperature=0.0)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-3,
                               atol=1e-4)


def test_ddim_sample_loop_matches_reference():
    """DDIM chain parity (eta=0 deterministic) vs reference torch DDIM."""
    torch.Tensor.cuda = lambda self, *a, **k: self
    ours = create_diffusion(timestep_respacing="ddim10",
                            noise_schedule="cosine")
    theirs = ref_diffusion.create_diffusion(timestep_respacing="ddim10",
                                            noise_schedule="cosine")

    def model_np(x, t):
        return np.concatenate([0.1 * x + 0.05, np.zeros_like(x)], axis=1)

    def model_jnp(x, t):
        return jnp.concatenate([0.1 * x + 0.05, jnp.zeros_like(x)], axis=1)

    noise = np.random.RandomState(3).randn(4, 8).astype(np.float32)
    got = ours.ddim_sample_loop(model_jnp, noise.shape, jnp.asarray(noise),
                                jax.random.PRNGKey(0), eta=0.0)
    with torch.no_grad():
        want = theirs.ddim_sample_loop(
            lambda x, t: torch.tensor(model_np(x.numpy(), t.numpy())),
            noise.shape, torch.tensor(noise), clip_denoised=False,
            model_kwargs={}, progress=False, eta=0.0)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-3,
                               atol=1e-4)


def test_p_sample_loop_runs_and_is_deterministic():
    diff = create_diffusion(timestep_respacing="10", noise_schedule="cosine")
    model = lambda x, t: jnp.concatenate([0.1 * x, jnp.zeros_like(x)], axis=1)
    noise = jax.random.normal(jax.random.PRNGKey(0), (3, 8))
    s1 = diff.p_sample_loop(model, noise.shape, noise, jax.random.PRNGKey(1))
    s2 = diff.p_sample_loop(model, noise.shape, noise, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    assert np.isfinite(np.asarray(s1)).all()
    # temperature=0 removes all sampling noise → deterministic mean path
    s3 = diff.p_sample_loop(model, noise.shape, noise, jax.random.PRNGKey(2),
                            temperature=0.0)
    s4 = diff.p_sample_loop(model, noise.shape, noise, jax.random.PRNGKey(3),
                            temperature=0.0)
    np.testing.assert_allclose(np.asarray(s3), np.asarray(s4), atol=1e-6)
