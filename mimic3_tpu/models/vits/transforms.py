"""Piecewise rational-quadratic spline transforms (neural spline flows).

Used by the stochastic duration predictor's ConvFlow layers.  Math from
Durkan et al., "Neural Spline Flows" (arXiv 1906.04032), with linear tails
outside ``[-tail_bound, tail_bound]`` — the variant VITS uses.

Fully vectorized: the bin search is a one-hot sum rather than a gather so
it lowers to dense TPU-friendly ops with static shapes.
"""

from __future__ import annotations

import math
import typing

import jax
import jax.numpy as jnp

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def _searchsorted_onehot(
    bin_locations: jax.Array, inputs: jax.Array
) -> jax.Array:
    """Index of the bin containing each input.

    bin_locations: [..., n_bins+1] ascending edges; inputs: [...].
    Returns int32 [...] in [0, n_bins-1].
    """
    # count of edges <= input, minus one (the left edge)
    inside = (inputs[..., None] >= bin_locations[..., :-1]).astype(jnp.int32)
    idx = jnp.sum(inside, axis=-1) - 1
    n_bins = bin_locations.shape[-1] - 1
    return jnp.clip(idx, 0, n_bins - 1)


def rational_quadratic_spline(
    inputs: jax.Array,
    unnormalized_widths: jax.Array,
    unnormalized_heights: jax.Array,
    unnormalized_derivatives: jax.Array,
    inverse: bool = False,
    left: float = 0.0,
    right: float = 1.0,
    bottom: float = 0.0,
    top: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> typing.Tuple[jax.Array, jax.Array]:
    """Monotonic rational-quadratic spline on ``[left,right]->[bottom,top]``.

    inputs: [...]; unnormalized_*: [..., n_bins] (derivatives: n_bins+1).
    Returns (outputs, logabsdet), both shaped like ``inputs``.
    """
    num_bins = unnormalized_widths.shape[-1]

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(
        cumwidths,
        [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)],
    )
    cumwidths = (right - left) * cumwidths + left
    # pin the edges exactly
    cumwidths = cumwidths.at[..., 0].set(left)
    cumwidths = cumwidths.at[..., -1].set(right)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(
        cumheights,
        [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)],
    )
    cumheights = (top - bottom) * cumheights + bottom
    cumheights = cumheights.at[..., 0].set(bottom)
    cumheights = cumheights.at[..., -1].set(top)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    if inverse:
        bin_idx = _searchsorted_onehot(cumheights, inputs)
    else:
        bin_idx = _searchsorted_onehot(cumwidths, inputs)

    def gather(arr: jax.Array, idx: jax.Array) -> jax.Array:
        return jnp.take_along_axis(arr, idx[..., None], axis=-1)[..., 0]

    input_cumwidths = gather(cumwidths, bin_idx)
    input_bin_widths = gather(widths, bin_idx)
    input_cumheights = gather(cumheights, bin_idx)
    input_heights = gather(heights, bin_idx)
    delta = heights / widths
    input_delta = gather(delta, bin_idx)
    input_derivatives = gather(derivatives, bin_idx)
    input_derivatives_plus_one = gather(derivatives[..., 1:], bin_idx)

    if inverse:
        a = (inputs - input_cumheights) * (
            input_derivatives
            + input_derivatives_plus_one
            - 2 * input_delta
        ) + input_heights * (input_delta - input_derivatives)
        b = input_heights * input_derivatives - (
            inputs - input_cumheights
        ) * (
            input_derivatives
            + input_derivatives_plus_one
            - 2 * input_delta
        )
        c = -input_delta * (inputs - input_cumheights)

        discriminant = jnp.square(b) - 4 * a * c
        discriminant = jnp.maximum(discriminant, 0.0)

        root = (2 * c) / (-b - jnp.sqrt(discriminant))
        outputs = root * input_bin_widths + input_cumwidths

        theta_one_minus_theta = root * (1 - root)
        denominator = input_delta + (
            (
                input_derivatives
                + input_derivatives_plus_one
                - 2 * input_delta
            )
            * theta_one_minus_theta
        )
        derivative_numerator = jnp.square(input_delta) * (
            input_derivatives_plus_one * jnp.square(root)
            + 2 * input_delta * theta_one_minus_theta
            + input_derivatives * jnp.square(1 - root)
        )
        logabsdet = -(
            jnp.log(derivative_numerator) - 2 * jnp.log(denominator)
        )
        return outputs, logabsdet

    theta = (inputs - input_cumwidths) / input_bin_widths
    theta_one_minus_theta = theta * (1 - theta)

    numerator = input_heights * (
        input_delta * jnp.square(theta)
        + input_derivatives * theta_one_minus_theta
    )
    denominator = input_delta + (
        (input_derivatives + input_derivatives_plus_one - 2 * input_delta)
        * theta_one_minus_theta
    )
    outputs = input_cumheights + numerator / denominator

    derivative_numerator = jnp.square(input_delta) * (
        input_derivatives_plus_one * jnp.square(theta)
        + 2 * input_delta * theta_one_minus_theta
        + input_derivatives * jnp.square(1 - theta)
    )
    logabsdet = jnp.log(derivative_numerator) - 2 * jnp.log(denominator)
    return outputs, logabsdet


def unconstrained_rational_quadratic_spline(
    inputs: jax.Array,
    unnormalized_widths: jax.Array,
    unnormalized_heights: jax.Array,
    unnormalized_derivatives: jax.Array,
    inverse: bool = False,
    tail_bound: float = 5.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> typing.Tuple[jax.Array, jax.Array]:
    """Spline inside ``[-tail_bound, tail_bound]``, identity (linear tails)
    outside.  The boundary derivatives are pinned so the transform is C1."""
    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)

    # pad derivatives so boundary slope == 1 (identity tails)
    constant = math.log(math.expm1(1 - min_derivative))
    unnormalized_derivatives = jnp.pad(
        unnormalized_derivatives,
        [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)],
        constant_values=constant,
    )

    # clamp inputs fed to the spline to the valid interval; outside values
    # pass through unchanged via the `inside` select below
    clamped = jnp.clip(inputs, -tail_bound, tail_bound)

    spline_out, spline_logdet = rational_quadratic_spline(
        clamped,
        unnormalized_widths,
        unnormalized_heights,
        unnormalized_derivatives,
        inverse=inverse,
        left=-tail_bound,
        right=tail_bound,
        bottom=-tail_bound,
        top=tail_bound,
        min_bin_width=min_bin_width,
        min_bin_height=min_bin_height,
        min_derivative=min_derivative,
    )

    outputs = jnp.where(inside, spline_out, inputs)
    logabsdet = jnp.where(inside, spline_logdet, 0.0)
    return outputs, logabsdet


def piecewise_rational_quadratic_transform(
    inputs: jax.Array,
    unnormalized_widths: jax.Array,
    unnormalized_heights: jax.Array,
    unnormalized_derivatives: jax.Array,
    inverse: bool = False,
    tails: typing.Optional[str] = None,
    tail_bound: float = 1.0,
) -> typing.Tuple[jax.Array, jax.Array]:
    """Dispatcher matching the VITS call signature."""
    if tails is None:
        return rational_quadratic_spline(
            inputs,
            unnormalized_widths,
            unnormalized_heights,
            unnormalized_derivatives,
            inverse=inverse,
        )
    if tails != "linear":
        raise ValueError(f"Unsupported tails: {tails}")
    return unconstrained_rational_quadratic_spline(
        inputs,
        unnormalized_widths,
        unnormalized_heights,
        unnormalized_derivatives,
        inverse=inverse,
        tail_bound=tail_bound,
    )
