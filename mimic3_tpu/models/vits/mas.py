"""Monotonic alignment search (MAS), XLA-native.

VITS training aligns text to spectrogram frames by finding the monotonic
path through the prior log-likelihood matrix that maximizes total
likelihood.  The reference ecosystem implements this in Cython on CPU;
here it is a ``lax.scan`` dynamic program over spectrogram frames with a
reversed scan for backtracking, so the whole thing stays on device and
vmaps over the batch.

neg_x_ent: [B, T_text, T_spec] log-likelihood of frame t under text j.
Returns a hard path [B, T_text, T_spec] in {0, 1}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e9


def _search_single(
    ll: jnp.ndarray, t_text: jnp.ndarray, t_spec: jnp.ndarray
) -> jnp.ndarray:
    """MAS for one example. ll: [T_text, T_spec]."""
    n_text, n_spec = ll.shape
    text_idx = jnp.arange(n_text)

    # forward DP over frames: value[j] = best path score ending at text j
    init = jnp.where(text_idx == 0, ll[:, 0], _NEG_INF)

    def forward(carry, t):
        prev = carry  # [T_text]
        shifted = jnp.concatenate([jnp.full((1,), _NEG_INF), prev[:-1]])
        stay = prev
        take_diag = shifted >= stay  # prefer advancing on ties
        best = jnp.maximum(shifted, stay)
        value = best + ll[:, t]
        # frames past the valid length keep the carry unchanged
        valid = t < t_spec
        value = jnp.where(valid, value, prev)
        take_diag = jnp.where(valid, take_diag, False)
        return value, take_diag

    final, diag_choices = jax.lax.scan(
        forward, init, jnp.arange(1, n_spec)
    )
    # diag_choices: [n_spec-1, T_text] — True where path stepped j-1 -> j

    # backtrack from (t_text-1, t_spec-1); carry = text index at frame t+1,
    # iterating t = n_spec-2 .. 0; the final carry is frame 0's index.
    def backward(carry, t):
        j = carry
        active = (t + 1) < t_spec  # frame t+1 is on the real path
        took = diag_choices[t, j]
        j_prev = jnp.where(active & took, j - 1, j)
        return j_prev, j

    j_last = (t_text - 1).astype(jnp.int32)
    j0, path_idx_rev = jax.lax.scan(
        backward, j_last, jnp.arange(n_spec - 2, -1, -1)
    )
    path_idx = jnp.concatenate(
        [j0[None], path_idx_rev[::-1].astype(jnp.int32)]
    )

    frame_valid = jnp.arange(n_spec) < t_spec
    path = jax.nn.one_hot(path_idx, n_text, dtype=jnp.float32)
    path = path * frame_valid[:, None]
    return path.T  # [T_text, T_spec]


def monotonic_alignment_search(
    neg_x_ent: jnp.ndarray,
    text_lengths: jnp.ndarray,
    spec_lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Batched MAS.

    neg_x_ent: [B, T_text, T_spec]; returns hard alignment [B, T_text,
    T_spec] (1 where frame t is assigned to text j).
    """
    n_text = neg_x_ent.shape[1]
    text_mask = (
        jnp.arange(n_text)[None, :] < text_lengths[:, None]
    )
    # invalid text rows must never be chosen
    ll = jnp.where(text_mask[:, :, None], neg_x_ent, _NEG_INF)
    return jax.vmap(_search_single)(
        ll, text_lengths.astype(jnp.int32), spec_lengths.astype(jnp.int32)
    )
