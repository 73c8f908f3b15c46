"""Fused relative-attention Pallas kernel vs the XLA reference math."""

import jax
import jax.numpy as jnp
import numpy as np

from mimic3_tpu.models.vits.encoder import (
    _absolute_to_relative,
    _get_relative_embeddings,
    _relative_to_absolute,
)
from mimic3_tpu.ops.attention import fused_relative_attention


def _reference(q, k, v, rel_k, rel_v, mask):
    """XLA reference using the encoder's pad-reshape skew helpers."""
    d = q.shape[-1]
    qs = q / np.sqrt(d)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qs, k)
    rel_logits = jnp.einsum("bhqd,rd->bhqr", qs, rel_k)
    scores = scores + _relative_to_absolute(rel_logits)
    scores = jnp.where(mask[:, None, None, :] > 0, scores, -1e4)
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
    rel_w = _absolute_to_relative(weights)
    out = out + jnp.einsum("bhqr,rd->bhqd", rel_w, rel_v)
    return out


def test_fused_rel_attention_matches_reference():
    b, h, t, d = 2, 2, 24, 16
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (b, h, t, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, t, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, t, d), jnp.float32)
    window_table = jax.random.normal(ks[3], (1, 9, d), jnp.float32)
    rel_k = _get_relative_embeddings(window_table, t, 4)[0]  # [2T-1, D]
    rel_v = _get_relative_embeddings(
        jax.random.normal(ks[4], (1, 9, d), jnp.float32), t, 4
    )[0]
    mask = jnp.ones((b, t)).at[1, 17:].set(0.0)

    ref = _reference(q, k, v, rel_k, rel_v, mask)
    out = fused_relative_attention(
        q, k, v, rel_k, rel_v, mask, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5
    )


def test_fused_rel_attention_band_semantics():
    """With identity value rows, output i must equal
    sum_j w[i,j] * rel_v[j-i+T-1]; check the diagonal band mapping by
    making rel_v a position encoder."""
    b, h, t, d = 1, 1, 8, 8
    q = jnp.zeros((b, h, t, d))
    k = jnp.zeros((b, h, t, d))
    v = jnp.zeros((b, h, t, d))
    # uniform attention (all scores 0) over t keys
    rel_k = jnp.zeros((2 * t - 1, d))
    rel_v = jax.nn.one_hot(jnp.arange(2 * t - 1) % d, d)
    mask = jnp.ones((b, t))
    out = fused_relative_attention(
        q, k, v, rel_k, rel_v, mask, interpret=True
    )
    # expected: mean over j of one_hot((j - i + t - 1) % d)
    expected = np.zeros((t, d))
    for i in range(t):
        for j in range(t):
            expected[i, (j - i + t - 1) % d] += 1 / t
    np.testing.assert_allclose(
        np.asarray(out[0, 0]), expected, atol=1e-6
    )
