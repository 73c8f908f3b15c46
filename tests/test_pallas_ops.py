"""Pallas kernel tests (interpreter mode on CPU; compiled path is
exercised on TPU by bench.py and the decode integration)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimic3_tpu.models.vits.hifigan import hifigan_generator, resblock1
from mimic3_tpu.models.vits.layers import init_conv1d
from mimic3_tpu.ops.resblock import fused_resblock_subblock


@pytest.mark.parametrize(
    "c,t,b,k,d,tile",
    [
        (8, 64, 1, 3, 1, 64),
        (16, 256, 2, 3, 5, 128),
        (32, 256, 1, 11, 5, 128),
        (16, 128, 2, 7, 3, 64),
    ],
)
def test_fused_subblock_matches_reference(c, t, b, k, d, tile):
    key = jax.random.PRNGKey(c + t + k)
    x = jax.random.normal(key, (b, t, c), jnp.float32)
    p1 = init_conv1d(jax.random.fold_in(key, 1), c, c, k)
    p2 = init_conv1d(jax.random.fold_in(key, 2), c, c, k)

    out = fused_resblock_subblock(
        x,
        p1["weight"],
        p1["bias"],
        p2["weight"],
        p2["bias"],
        kernel_size=k,
        dilation=d,
        tile=tile,
        interpret=True,
    )
    ref = resblock1(
        {"convs1": {"0": p1}, "convs2": {"0": p2}}, x, k, [d]
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5
    )


def test_fused_subblock_rejects_uneven_tiles():
    x = jnp.zeros((1, 100, 8))
    p = init_conv1d(jax.random.PRNGKey(0), 8, 8, 3)
    with pytest.raises(ValueError):
        fused_resblock_subblock(
            x, p["weight"], p["bias"], p["weight"], p["bias"],
            kernel_size=3, dilation=1, tile=64, interpret=True,
        )


def test_full_decode_pallas_matches_xla(monkeypatch):
    """decode_frames with use_pallas (fused attention + resblocks, both
    interpreted) must match the plain XLA decode."""
    import jax as _jax

    import mimic3_tpu.ops.attention as att
    import mimic3_tpu.ops.resblock as rb
    from mimic3_tpu.config import ModelConfig
    from mimic3_tpu.models.vits import VitsModel, init_vits_params
    from mimic3_tpu.models.vits.layers import fold_weight_norm

    orig_att = att.fused_relative_attention
    monkeypatch.setattr(
        att,
        "fused_relative_attention",
        lambda *a, **k: orig_att(*a, **{**k, "interpret": True}),
    )
    orig_rb = rb.fused_resblock_subblock
    monkeypatch.setattr(
        rb,
        "fused_resblock_subblock",
        lambda *a, **k: orig_rb(*a, **{**k, "interpret": True}),
    )

    cfg = ModelConfig(
        num_symbols=40,
        n_layers=1,
        hidden_channels=32,
        inter_channels=32,
        filter_channels=64,
        upsample_initial_channel=64,
        upsample_rates=(4, 4),
        upsample_kernel_sizes=(8, 8),
    )
    params = init_vits_params(_jax.random.PRNGKey(0), cfg)

    def fold_tree(p):
        if isinstance(p, dict):
            if "weight_v" in p:
                return fold_weight_norm(p)
            return {k: fold_tree(v) for k, v in p.items()}
        return p

    params = fold_tree(params)

    ids = jnp.array([[1, 5, 9, 3, 7, 2, 4, 8]], jnp.int32)
    lengths = jnp.array([8])
    durations = jnp.full((1, 8), 4, jnp.int32)
    rng = _jax.random.PRNGKey(1)

    m_ref = VitsModel(cfg, decoder_dtype=jnp.float32)
    m_pl = VitsModel(cfg, decoder_dtype=jnp.float32, use_pallas=True)
    a_ref, l_ref = m_ref.decode_frames(
        params, ids, lengths, durations, 32, rng, jnp.float32(0.0)
    )
    a_pl, l_pl = m_pl.decode_frames(
        params, ids, lengths, durations, 32, rng, jnp.float32(0.0)
    )
    assert int(l_ref[0]) == int(l_pl[0])
    np.testing.assert_allclose(
        np.asarray(a_pl), np.asarray(a_ref), atol=5e-5
    )


def test_hifigan_pallas_path_matches_xla():
    """Full generator with use_pallas=True (interpreted) == plain XLA."""
    from mimic3_tpu.config import ModelConfig
    from mimic3_tpu.models.vits.model import _init_hifigan, VitsHyperparams
    from mimic3_tpu.runtime.convert import flatten_pytree
    import mimic3_tpu.ops.resblock as rb

    cfg = ModelConfig(
        num_symbols=10,
        inter_channels=16,
        upsample_initial_channel=32,
        upsample_rates=(4, 4),
        upsample_kernel_sizes=(8, 8),
    )
    hp = VitsHyperparams.from_config(cfg)
    params = _init_hifigan(jax.random.PRNGKey(0), hp)
    # fold weight norm (the pallas path is inference-only)
    flat = flatten_pytree(params)
    from mimic3_tpu.models.vits.layers import fold_weight_norm

    def fold_tree(p):
        if isinstance(p, dict):
            if "weight_v" in p:
                return fold_weight_norm(p)
            return {k: fold_tree(v) for k, v in p.items()}
        return p

    params = fold_tree(params)
    del flat, state_dict_to_pytree

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 16))
    common = dict(
        resblock_kernel_sizes=hp.resblock_kernel_sizes,
        resblock_dilation_sizes=hp.resblock_dilation_sizes,
        upsample_rates=hp.upsample_rates,
        upsample_kernel_sizes=hp.upsample_kernel_sizes,
        compute_dtype=jnp.float32,
    )
    ref = hifigan_generator(params, x, **common)

    # monkeypatch interpret mode for CPU execution
    orig = rb.fused_resblock_subblock

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    rb_fused = rb.resblock1_fused

    def patched_res(p, xx, k, dil, interpret=False):
        return rb_fused(p, xx, k, dil, interpret=True)

    old = rb.resblock1_fused
    rb.resblock1_fused = patched_res
    try:
        out = hifigan_generator(params, x, use_pallas=True, **common)
    finally:
        rb.resblock1_fused = old
    del interp
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-5
    )
