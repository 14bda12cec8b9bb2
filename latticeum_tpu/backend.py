"""Switchable array backend: numpy (host, fast eager) or jax.numpy (device).

All field/ring kernels are written against `B.xp` (this module's `xp`
attribute).  The math is identical under both; numpy is the default for
protocol-glue and tests (eager JAX dispatch on thousands of tiny uint32 ops
is ~100x slower than numpy), while TPU entry points switch to jax.numpy and
jit whole blocks.

Usage:
    from latticeum_tpu import backend as B
    B.xp.where(...)                 # current backend
    with B.jax_mode(): ...          # force jax.numpy inside the block
"""

from __future__ import annotations

import contextlib

import numpy as _np

xp = _np
_IS_JAX = False

# uint32 wrap-around is intentional throughout the limb arithmetic
_np.seterr(over="ignore")


def use_numpy():
    global xp, _IS_JAX
    xp = _np
    _IS_JAX = False


def use_jax():
    global xp, _IS_JAX
    import jax.numpy as jnp
    xp = jnp
    _IS_JAX = True


def is_jax() -> bool:
    return _IS_JAX


@contextlib.contextmanager
def jax_mode():
    import jax.numpy  # noqa: F401
    global xp, _IS_JAX
    old, old_flag = xp, _IS_JAX
    use_jax()
    try:
        yield
    finally:
        xp, _IS_JAX = old, old_flag


@contextlib.contextmanager
def numpy_mode():
    global xp, _IS_JAX
    old, old_flag = xp, _IS_JAX
    use_numpy()
    try:
        yield
    finally:
        xp, _IS_JAX = old, old_flag


def barrier(x):
    """XLA optimization barrier (identity under numpy).

    XLA's fusion happily *duplicates* cheap elementwise producers into every
    consumer; with deep uint32 limb-arithmetic chains (ring mul -> ring mul)
    that duplication compounds exponentially (observed ~30x compile/run
    growth per chained ring mul on the CPU backend).  A barrier after each
    ring-level multiply bounds the fused region.
    """
    if _IS_JAX:
        import jax
        return jax.lax.optimization_barrier(x)
    return x


def at_set(arr, idx, value):
    """arr[idx] = value, functional under jax, in-place copy under numpy."""
    if _IS_JAX:
        return arr.at[idx].set(value)
    out = arr.copy()
    out[idx] = value
    return out


def segment_sum(data, segment_ids, num_segments):
    """Sum rows of `data` into `num_segments` buckets (uint32 wrap-add)."""
    if _IS_JAX:
        import jax
        return jax.ops.segment_sum(data, segment_ids, num_segments)
    out = _np.zeros((num_segments,) + data.shape[1:], dtype=data.dtype)
    _np.add.at(out, segment_ids, data)
    return out
