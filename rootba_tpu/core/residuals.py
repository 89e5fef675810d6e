"""Robust-weighting and whole-problem cost accounting.

Mirrors reference semantics:
  * compute_error_weight -- rootba bal_bundle_adjustment_helper.cpp:45-65:
    Huber first-order weighting, cost = 0.5*(2-w)*w*r^2 with
    w = thresh/|r| beyond the threshold (w=1 inside).
  * ResidualInfo 'all' vs 'valid' split -- rootba residual_info.cpp:97-124.

Accumulations are performed in float64 on CPU / float32-with-f64-promote
where supported, batched over the obs-count buckets.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


ROBUST_NORM_NONE = 0
ROBUST_NORM_HUBER = 1


def compute_error_weight(
    res_squared: jnp.ndarray, robust_norm: int, huber_parameter: float
):
    """Returns (weighted_error, weight), elementwise.

    HUBER: weight = 1 if r^2 < c^2 else c/|r|;  error = 0.5(2-w)w r^2.
    NONE:  weight = 1; error = 0.5 r^2.
    """
    if robust_norm == ROBUST_NORM_NONE:
        return 0.5 * res_squared, jnp.ones_like(res_squared)
    thresh = jnp.asarray(huber_parameter, res_squared.dtype)
    r = jnp.sqrt(jnp.maximum(res_squared, jnp.finfo(res_squared.dtype).tiny))
    weight = jnp.where(res_squared < thresh * thresh, 1.0, thresh / r)
    error = 0.5 * (2.0 - weight) * weight * res_squared
    return error, weight


class ResidualItem(NamedTuple):
    num_obs: jnp.ndarray  # int
    error: jnp.ndarray  # sum of robustified 0.5 r^2
    residual_sum: jnp.ndarray  # sum of ||r||

    def error_avg(self):
        return jnp.where(self.num_obs > 0, self.error / self.num_obs, 0.0)

    def residual_mean(self):
        return jnp.where(
            self.num_obs > 0, self.residual_sum / self.num_obs, 0.0
        )


class ResidualInfo(NamedTuple):
    """Cost split into all vs valid (positive-z) residual sets."""

    all: ResidualItem
    valid: ResidualItem
    is_numerically_valid: jnp.ndarray  # bool


def default_acc_dtype():
    """float64 accumulation when x64 is on, else float32 (TPU default;
    the reference accumulates cost in the solver Scalar too)."""
    import jax

    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def accumulate_residual_info(
    res: jnp.ndarray,  # [..., 2]
    proj_valid: jnp.ndarray,  # [...] bool
    obs_mask: jnp.ndarray,  # [...] bool; False = padded slot
    robust_norm: int,
    huber_parameter: float,
    acc_dtype=None,
) -> ResidualInfo:
    """Accumulate a batch of residuals into a ResidualInfo.

    Mirrors ResidualInfoAccu::add over every real (non-padded) observation.
    """
    if acc_dtype is None:
        acc_dtype = default_acc_dtype()
    res_squared = jnp.sum(res * res, axis=-1)
    weighted_error, _ = compute_error_weight(
        res_squared, robust_norm, huber_parameter
    )
    res_norm = jnp.sqrt(res_squared)

    numerically_valid = jnp.all(
        jnp.where(obs_mask[..., None], jnp.isfinite(res), True)
    )

    maskf = obs_mask.astype(acc_dtype)
    vmaskf = (obs_mask & proj_valid).astype(acc_dtype)

    def item(m):
        return ResidualItem(
            num_obs=jnp.sum(m).astype(jnp.int32),
            error=jnp.sum(weighted_error.astype(acc_dtype) * m),
            residual_sum=jnp.sum(res_norm.astype(acc_dtype) * m),
        )

    return ResidualInfo(
        all=item(maskf),
        valid=item(vmaskf),
        is_numerically_valid=numerically_valid,
    )


def join_residual_info(a: ResidualInfo, b: ResidualInfo) -> ResidualInfo:
    def join_item(x: ResidualItem, y: ResidualItem):
        return ResidualItem(
            num_obs=x.num_obs + y.num_obs,
            error=x.error + y.error,
            residual_sum=x.residual_sum + y.residual_sum,
        )

    return ResidualInfo(
        all=join_item(a.all, b.all),
        valid=join_item(a.valid, b.valid),
        is_numerically_valid=a.is_numerically_valid & b.is_numerically_valid,
    )


def empty_residual_info(acc_dtype=None) -> ResidualInfo:
    if acc_dtype is None:
        acc_dtype = default_acc_dtype()
    zero = jnp.zeros((), acc_dtype)
    izero = jnp.zeros((), jnp.int32)
    item = ResidualItem(num_obs=izero, error=zero, residual_sum=zero)
    return ResidualInfo(all=item, valid=item, is_numerically_valid=jnp.asarray(True))
