"""Time-folded conv correctness (ops utility; measured on-chip as a
negative result for the decode path — see docs/STATUS.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimic3_tpu.models.vits.hifigan import resblock1
from mimic3_tpu.models.vits.layers import conv1d, init_conv1d
from mimic3_tpu.ops.folding import (
    fold_gain,
    folded_conv1d,
    pick_fold,
    resblock1_folded,
)


@pytest.mark.parametrize(
    "c,k,d,r",
    [(32, 3, 1, 4), (32, 3, 5, 4), (32, 7, 3, 4), (64, 11, 5, 2),
     (16, 3, 1, 4)],
)
def test_folded_conv_matches_plain(c, k, d, r):
    rng = np.random.RandomState(c + k + d)
    t = 64
    x = jnp.asarray(rng.randn(2, t, c).astype(np.float32))
    p = init_conv1d(jax.random.PRNGKey(c + k), c, c, k)
    ref = conv1d(x, p, padding=d * (k - 1) // 2, dilation=d)
    out = folded_conv1d(
        x.reshape(2, t // r, r * c),
        p["weight"],
        p["bias"],
        kernel_size=k,
        dilation=d,
        fold=r,
    ).reshape(2, t, c)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-6
    )


def test_folded_resblock_matches_plain():
    rng = np.random.RandomState(0)
    c, t = 32, 128
    x = jnp.asarray(rng.randn(1, t, c).astype(np.float32))
    params = {
        "convs1": {
            str(j): init_conv1d(jax.random.PRNGKey(j), c, c, 3)
            for j in range(3)
        },
        "convs2": {
            str(j): init_conv1d(jax.random.PRNGKey(10 + j), c, c, 3)
            for j in range(3)
        },
    }
    ref = resblock1(params, x, 3, (1, 3, 5))
    out = resblock1_folded(params, x, 3, (1, 3, 5), fold=4)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-6
    )


def test_fold_gain_and_pick():
    assert fold_gain(3, 1, 4) == 4.0
    assert fold_gain(3, 5, 4) > 6.0
    assert pick_fold(32, 262144) == 4
    assert pick_fold(64, 131072) == 2
    assert pick_fold(128, 65536) == 1
    assert pick_fold(32, 30) == 2  # length not divisible by 4
