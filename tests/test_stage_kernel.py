"""Fused folded HiFi-GAN stage kernel vs the plain XLA resblock path.

Interpret-mode Pallas on CPU; parity must hold for the small-channel
stages the kernel targets (C=32 fold 4, C=64 fold 2).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mimic3_tpu.models.vits.hifigan import resblock1
from mimic3_tpu.ops.stage import hifigan_stage_fused

KERNELS = (3, 7, 11)
DILATIONS = ((1, 3, 5), (1, 3, 5), (1, 3, 5))


def _make_params(rng: np.random.RandomState, c: int):
    out = []
    for k in KERNELS:
        rp = {"convs1": {}, "convs2": {}}
        for j in range(3):
            for key in ("convs1", "convs2"):
                rp[key][str(j)] = {
                    "weight": jnp.asarray(
                        rng.randn(k, c, c).astype(np.float32) * 0.1
                    ),
                    "bias": jnp.asarray(
                        rng.randn(c).astype(np.float32) * 0.1
                    ),
                }
        out.append(rp)
    return out


def _reference(params, x):
    xs = None
    for r, (k, d) in enumerate(zip(KERNELS, DILATIONS)):
        out = resblock1(params[r], x, k, d)
        xs = out if xs is None else xs + out
    return xs / len(KERNELS)


@pytest.mark.parametrize("c,t", [(32, 512), (64, 512)])
def test_stage_fused_matches_xla(c, t):
    rng = np.random.RandomState(c)
    params = _make_params(rng, c)
    x = jnp.asarray(rng.randn(2, t, c).astype(np.float32))

    ref = np.asarray(_reference(params, x))
    got = np.asarray(
        hifigan_stage_fused(
            params, x, KERNELS, DILATIONS, interpret=True
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_stage_fused_multi_tile(  # boundary masking across tiles
):
    c, t = 32, 1024
    rng = np.random.RandomState(7)
    params = _make_params(rng, c)
    x = jnp.asarray(rng.randn(1, t, c).astype(np.float32))
    ref = np.asarray(_reference(params, x))
    got = np.asarray(
        hifigan_stage_fused(
            params, x, KERNELS, DILATIONS, max_tile=64,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("c", [32, 64])
def test_stage_fused_bf16_packed_rolls(c):
    """bf16 inputs take the packed-roll fast path; parity within bf16
    rounding of the XLA bf16 resblock path."""
    t = 512
    rng = np.random.RandomState(c + 1)
    params = _make_params(rng, c)
    x = jnp.asarray(
        rng.randn(2, t, c).astype(np.float32)
    ).astype(jnp.bfloat16)

    ref = np.asarray(_reference(params, x), np.float32)
    got = np.asarray(
        hifigan_stage_fused(
            params, x, KERNELS, DILATIONS, interpret=True
        ),
        np.float32,
    )
    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=0.05 * scale, rtol=0)
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999, corr


def test_stage_fused_with_upsampler():
    """Fused lrelu + ConvTranspose1d(k4 s2) + stage == the XLA chain."""
    import jax.numpy as jnp

    from mimic3_tpu.models.vits.layers import (
        LRELU_SLOPE,
        conv_transpose1d,
        leaky_relu,
    )

    c_in, c_out, t = 64, 32, 256
    rng = np.random.RandomState(17)
    params = _make_params(rng, c_out)
    ups = {
        "weight": jnp.asarray(
            rng.randn(4, c_in, c_out).astype(np.float32) * 0.1
        ),
        "bias": jnp.asarray(
            rng.randn(c_out).astype(np.float32) * 0.1
        ),
    }
    h = jnp.asarray(rng.randn(2, t, c_in).astype(np.float32))

    x = leaky_relu(h, LRELU_SLOPE)
    x = conv_transpose1d(x, ups, stride=2, padding=1)
    assert x.shape == (2, 2 * t, c_out)
    ref = np.asarray(_reference(params, x))

    got = np.asarray(
        hifigan_stage_fused(
            params, h, KERNELS, DILATIONS,
            ups_params=ups, ups_stride=2, ups_padding=1,
            interpret=True,
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_stage_fused_with_post_head():
    """Fused tanh(conv_post(lrelu(stage))) emits the waveform."""
    import jax.numpy as jnp

    from mimic3_tpu.models.vits.layers import (
        LRELU_SLOPE,
        conv1d,
        leaky_relu,
    )

    c, t = 32, 512
    rng = np.random.RandomState(23)
    params = _make_params(rng, c)
    post = {
        "weight": jnp.asarray(
            rng.randn(7, c, 1).astype(np.float32) * 0.1
        )
    }
    x = jnp.asarray(rng.randn(2, t, c).astype(np.float32))

    y = _reference(params, x)
    y = leaky_relu(y.astype(jnp.float32), LRELU_SLOPE)
    ref = np.asarray(
        jnp.tanh(conv1d(y, post, padding=3))[..., 0]
    )

    got = np.asarray(
        hifigan_stage_fused(
            params, x, KERNELS, DILATIONS,
            post_params=post, interpret=True,
        )
    )
    assert got.shape == ref.shape == (2, t)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_stage_fused_ups_and_post_together():
    """Full last-stage fusion: ups + resblocks + post in one kernel."""
    import jax.numpy as jnp

    from mimic3_tpu.models.vits.layers import (
        LRELU_SLOPE,
        conv1d,
        conv_transpose1d,
        leaky_relu,
    )

    c_in, c_out, t = 64, 32, 256
    rng = np.random.RandomState(29)
    params = _make_params(rng, c_out)
    ups = {
        "weight": jnp.asarray(
            rng.randn(4, c_in, c_out).astype(np.float32) * 0.1
        ),
        "bias": jnp.asarray(
            rng.randn(c_out).astype(np.float32) * 0.1
        ),
    }
    post = {
        "weight": jnp.asarray(
            rng.randn(7, c_out, 1).astype(np.float32) * 0.1
        )
    }
    h = jnp.asarray(rng.randn(2, t, c_in).astype(np.float32))

    x = leaky_relu(h, LRELU_SLOPE)
    x = conv_transpose1d(x, ups, stride=2, padding=1)
    y = _reference(params, x)
    y = leaky_relu(y.astype(jnp.float32), LRELU_SLOPE)
    ref = np.asarray(jnp.tanh(conv1d(y, post, padding=3))[..., 0])

    got = np.asarray(
        hifigan_stage_fused(
            params, h, KERNELS, DILATIONS,
            ups_params=ups, ups_stride=2, ups_padding=1,
            post_params=post, interpret=True,
        )
    )
    assert got.shape == ref.shape == (2, 2 * t)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_stage_fused_rejects_bad_channels():
    rng = np.random.RandomState(0)
    params = _make_params(rng, 48)
    x = jnp.zeros((1, 64, 48), jnp.float32)
    with pytest.raises(ValueError):
        hifigan_stage_fused(params, x, KERNELS, DILATIONS)


def test_generator_dispatch_fused_matches_xla():
    """hifigan_generator's fused-stage dispatch (pallas_stage_max_channels)
    produces the same waveform as the plain XLA path — covers the
    gate/fallback logic itself, not just the kernel."""
    from mimic3_tpu.config import ModelConfig
    from mimic3_tpu.models.vits import init_vits_params
    from mimic3_tpu.models.vits.hifigan import hifigan_generator

    config = ModelConfig(
        num_symbols=40,
        hidden_channels=32,
        inter_channels=32,
        filter_channels=64,
        upsample_initial_channel=64,  # stages 32/16/8/4 channels
    )
    params = init_vits_params(jax.random.PRNGKey(0), config)["dec"]
    rng = np.random.RandomState(0)
    # batch >= 4 engages the kernel; T=64 frames keeps every folded
    # stage's row count tile-alignable
    z = jnp.asarray(rng.randn(4, 64, 32).astype(np.float32) * 0.3)

    kwargs = dict(
        resblock_type="1",
        resblock_kernel_sizes=KERNELS,
        resblock_dilation_sizes=DILATIONS,
        upsample_rates=(8, 8, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4),
        compute_dtype=jnp.float32,
    )
    ref = np.asarray(
        hifigan_generator(
            params, z, pallas_stage_max_channels=0, **kwargs
        )
    )
    got = np.asarray(
        hifigan_generator(
            params, z, pallas_stage_max_channels=32, **kwargs
        )
    )
    assert ref.shape == got.shape == (4, 64 * 256)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)

    # batch below the gate stays on the XLA path (bitwise identical)
    small = np.asarray(
        hifigan_generator(
            params, z[:1], pallas_stage_max_channels=32, **kwargs
        )
    )
    small_ref = np.asarray(
        hifigan_generator(
            params, z[:1], pallas_stage_max_channels=0, **kwargs
        )
    )
    assert np.array_equal(small, small_ref)
