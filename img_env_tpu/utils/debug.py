"""Numeric debugging helpers (SURVEY.md §5: the reference has no sanitizers;
pure-functional state makes races moot, so the useful mode here is NaN/Inf
trapping plus x64 parity runs — tests/conftest.py enables the latter).
"""

from __future__ import annotations

from contextlib import contextmanager

import jax


@contextmanager
def nan_debug(enable: bool = True):
    """Trap NaNs/Infs produced by any jitted computation in the block.

    Re-runs offending primitives un-jitted and raises with the culprit —
    expensive, for debugging only:

        with nan_debug():
            state, obs, *_ = env.step(state, actions)
    """
    old_nans = jax.config.jax_debug_nans
    old_infs = jax.config.jax_debug_infs
    jax.config.update("jax_debug_nans", enable)
    jax.config.update("jax_debug_infs", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
        jax.config.update("jax_debug_infs", old_infs)
