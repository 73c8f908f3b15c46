"""Pallas kernel tests (interpreter mode on CPU; compiled path is
exercised on TPU by bench.py and the decode integration)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimic3_tpu.models.vits.hifigan import resblock1
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
