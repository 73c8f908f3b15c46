"""Mathematical property tests for the VITS building blocks.

These validate the math independently of any reference implementation:
splines must invert exactly, flows must be bijections, log-determinants
must match autodiff jacobians, masking must make padding irrelevant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimic3_tpu.config import ModelConfig
from mimic3_tpu.models.vits import VitsModel, init_vits_params
from mimic3_tpu.models.vits import duration as dur
from mimic3_tpu.models.vits import flow as flw
from mimic3_tpu.models.vits.layers import sequence_mask
from mimic3_tpu.models.vits.model import expand_by_durations
from mimic3_tpu.models.vits.transforms import (
    unconstrained_rational_quadratic_spline,
)


@pytest.fixture(scope="module")
def tiny_cfg():
    return ModelConfig(
        num_symbols=40,
        n_speakers=1,
        n_layers=2,
        hidden_channels=64,
        inter_channels=64,
        filter_channels=128,
        upsample_initial_channel=128,
    )


@pytest.fixture(scope="module")
def tiny_params(tiny_cfg):
    return init_vits_params(jax.random.PRNGKey(0), tiny_cfg)


# ---------------------------------------------------------------------------
# Rational-quadratic spline
# ---------------------------------------------------------------------------


def _random_spline_params(key, shape, num_bins=10):
    k1, k2, k3 = jax.random.split(key, 3)
    w = jax.random.normal(k1, (*shape, num_bins))
    h = jax.random.normal(k2, (*shape, num_bins))
    d = jax.random.normal(k3, (*shape, num_bins - 1))
    return w, h, d


def test_spline_roundtrip():
    key = jax.random.PRNGKey(1)
    x = jnp.linspace(-8.0, 8.0, 101)  # includes out-of-tail values
    w, h, d = _random_spline_params(key, x.shape)
    y, logdet_f = unconstrained_rational_quadratic_spline(
        x, w, h, d, inverse=False, tail_bound=5.0
    )
    x_back, logdet_i = unconstrained_rational_quadratic_spline(
        y, w, h, d, inverse=True, tail_bound=5.0
    )
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(logdet_f + logdet_i), 0.0, atol=5e-4
    )


def test_spline_monotonic():
    key = jax.random.PRNGKey(2)
    x = jnp.linspace(-4.9, 4.9, 500)
    w, h, d = _random_spline_params(key, ())
    wb = jnp.broadcast_to(w, (500, 10))
    hb = jnp.broadcast_to(h, (500, 10))
    db = jnp.broadcast_to(d, (500, 9))
    y, _ = unconstrained_rational_quadratic_spline(
        x, wb, hb, db, inverse=False, tail_bound=5.0
    )
    assert bool(jnp.all(jnp.diff(y) > 0))


def test_spline_logdet_matches_grad():
    key = jax.random.PRNGKey(3)
    w, h, d = _random_spline_params(key, ())

    def f(xs):
        y, _ = unconstrained_rational_quadratic_spline(
            xs, w, h, d, inverse=False, tail_bound=5.0
        )
        return y

    xs = jnp.array(1.7)
    grad = jax.grad(f)(xs)
    _, logdet = unconstrained_rational_quadratic_spline(
        xs, w, h, d, inverse=False, tail_bound=5.0
    )
    np.testing.assert_allclose(
        float(jnp.log(grad)), float(logdet), atol=1e-5
    )


def test_spline_identity_outside_tails():
    key = jax.random.PRNGKey(4)
    x = jnp.array([-7.0, 6.0, 100.0])
    w, h, d = _random_spline_params(key, x.shape)
    y, logdet = unconstrained_rational_quadratic_spline(
        x, w, h, d, inverse=False, tail_bound=5.0
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))
    np.testing.assert_allclose(np.asarray(logdet), 0.0)


# ---------------------------------------------------------------------------
# Flows
# ---------------------------------------------------------------------------


def test_residual_coupling_invertible(tiny_cfg, tiny_params):
    key = jax.random.PRNGKey(5)
    b, t, c = 2, 12, tiny_cfg.inter_channels
    x = jax.random.normal(key, (b, t, c))
    lengths = jnp.array([12, 7])
    mask = sequence_mask(lengths, t)
    x = x * mask

    fp = tiny_params["flow"]
    z = flw.residual_coupling_block(fp, x, mask, reverse=False)
    x_back = flw.residual_coupling_block(fp, z, mask, reverse=True)
    np.testing.assert_allclose(
        np.asarray(x_back), np.asarray(x), atol=1e-5
    )


def test_conv_flow_invertible(tiny_params):
    key = jax.random.PRNGKey(6)
    b, t = 2, 9
    x = jax.random.normal(key, (b, t, 2))
    mask = sequence_mask(jnp.array([9, 5]), t)
    x = x * mask
    g = jax.random.normal(jax.random.fold_in(key, 1), (b, t, 192))

    p = tiny_params["dp"]["flows"]["1"]
    y, logdet = dur.conv_flow(p, x, mask, g=g, reverse=False)
    x_back, _ = dur.conv_flow(p, y, mask, g=g, reverse=True)
    np.testing.assert_allclose(
        np.asarray(x_back), np.asarray(x), atol=1e-4
    )
    assert bool(jnp.all(jnp.isfinite(logdet)))


def test_elementwise_affine_invertible():
    p = {"m": jnp.array([0.3, -0.2]), "logs": jnp.array([0.1, -0.4])}
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 5, 2))
    mask = jnp.ones((2, 5, 1))
    y, logdet = dur.elementwise_affine(p, x, mask, reverse=False)
    x_back, _ = dur.elementwise_affine(p, y, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-6)
    # logdet = sum(logs) * T per example
    np.testing.assert_allclose(
        np.asarray(logdet), 5 * (0.1 - 0.4), atol=1e-5
    )


def test_sdp_nll_finite(tiny_cfg, tiny_params):
    b, t = 2, 9
    key = jax.random.PRNGKey(8)
    x = jax.random.normal(key, (b, t, tiny_cfg.hidden_channels))
    mask = sequence_mask(jnp.array([9, 6]), t)
    w = jnp.abs(jax.random.normal(jax.random.fold_in(key, 1), (b, t, 1))) + 1
    w = w * mask
    nll = dur.stochastic_duration_predictor_nll(
        tiny_params["dp"], x * mask, mask, w, jax.random.fold_in(key, 2)
    )
    assert nll.shape == (b,)
    assert bool(jnp.all(jnp.isfinite(nll)))


# ---------------------------------------------------------------------------
# Expansion / masking
# ---------------------------------------------------------------------------


def test_expand_by_durations():
    values = jnp.array([[[1.0], [2.0], [3.0]]])  # [1, 3, 1]
    durations = jnp.array([[2, 1, 3]], dtype=jnp.int32)
    out = expand_by_durations(values, durations, 8)
    np.testing.assert_allclose(
        np.asarray(out[0, :, 0]),
        [1, 1, 2, 3, 3, 3, 3, 3],  # past-end frames clamp to last phoneme
    )


def test_padding_invariance(tiny_cfg, tiny_params):
    """Synthesis output for a sequence must not depend on padding length."""
    model = VitsModel(tiny_cfg, decoder_dtype=jnp.float32)
    rng = jax.random.PRNGKey(9)
    ids6 = jnp.array([[1, 5, 9, 3, 7, 2]], dtype=jnp.int32)
    ids10 = jnp.pad(ids6, ((0, 0), (0, 4)))
    lengths = jnp.array([6])

    d6, t6 = model.infer_durations(
        tiny_params, ids6, lengths, rng, jnp.float32(1.0), jnp.float32(0.0)
    )
    d10, t10 = model.infer_durations(
        tiny_params, ids10, lengths, rng, jnp.float32(1.0), jnp.float32(0.0)
    )
    np.testing.assert_array_equal(np.asarray(d6), np.asarray(d10)[:, :6])
    assert np.asarray(d10)[:, 6:].sum() == 0
    assert int(t6[0]) == int(t10[0])

    a6, l6 = model.decode_frames(
        tiny_params, ids6, lengths, d6, 32, rng, jnp.float32(0.0)
    )
    a10, l10 = model.decode_frames(
        tiny_params, ids10, lengths, d10, 32, rng, jnp.float32(0.0)
    )
    n = int(l6[0])
    assert int(l10[0]) == n
    np.testing.assert_allclose(
        np.asarray(a6)[0, :n], np.asarray(a10)[0, :n], atol=2e-5
    )


def test_full_infer_deterministic(tiny_cfg, tiny_params):
    model = VitsModel(tiny_cfg, decoder_dtype=jnp.float32)
    ids = jnp.array([[1, 5, 9, 3, 7, 2, 0, 0]], dtype=jnp.int32)
    lengths = jnp.array([6])
    rng = jax.random.PRNGKey(0)
    infer = jax.jit(model.infer, static_argnames=("max_frames",))
    a1, l1 = infer(
        tiny_params, ids, lengths, rng,
        jnp.float32(0.0), jnp.float32(1.0), jnp.float32(0.0), max_frames=64,
    )
    a2, _ = infer(
        tiny_params, ids, lengths, rng,
        jnp.float32(0.0), jnp.float32(1.0), jnp.float32(0.0), max_frames=64,
    )
    assert bool(jnp.all(a1 == a2))
    assert bool(jnp.all(jnp.isfinite(a1)))
    assert a1.shape == (1, 64 * 256)
