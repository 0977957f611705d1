"""Numerical-safety instrumentation — the JAX answer to the reference's
torch.autograd.set_detect_anomaly(True) (camera_pose_optimizer.py:56;
SURVEY.md §5 'race detection / sanitizers').

  * anomaly_detection(): context manager enabling jax_debug_nans +
    jax_debug_infs — any NaN/Inf produced inside jit re-runs the op
    un-jitted and raises at the offending primitive.
  * checked(fn): checkify wrapper that turns NaN checks into explicit,
    jit-compatible error values (usable inside scan where debug_nans isn't).
"""

from __future__ import annotations

import contextlib
from typing import Callable

import jax
from jax.experimental import checkify


@contextlib.contextmanager
def anomaly_detection(nans: bool = True, infs: bool = True):
    old_nans = jax.config.jax_debug_nans
    old_infs = jax.config.jax_debug_infs
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
        jax.config.update("jax_debug_infs", old_infs)


def checked_budgets(fn: Callable, *, jit: bool = True) -> Callable:
    """Functionalize the binned paths' budget guards (check_budgets=
    'checkify' on RasterizationSettings / PointsRasterizationSettings /
    the soft-silhouette entry points): returns fn' that raises
    checkify.JaxRuntimeError on the host whenever a silent-drop budget
    (face/point bins, active tiles, group lanes, occupancy-split tail)
    overflowed during the call. With check_budgets='warn' no wrapper is
    needed (the guard is a host warning via jax.debug.callback)."""
    cfn = checkify.checkify(fn, errors=checkify.user_checks)
    if jit:
        cfn = jax.jit(cfn)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def checked(fn: Callable, *, jit: bool = True) -> Callable:
    """Wrap fn with checkify float checks; returns fn' that raises on the
    host if any check fired. Works under jit/scan (errors are values)."""
    cfn = checkify.checkify(fn, errors=checkify.float_checks)
    if jit:
        cfn = jax.jit(cfn)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper
