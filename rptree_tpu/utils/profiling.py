"""Device-side timing utilities.

The reference measures CPU time around pure computations
(``bench/time/Main.hs:175-230``).  On an asynchronously-dispatched
accelerator -- especially through tunneled backends where
``block_until_ready`` may return before device completion and a host fetch
costs a ~25ms round trip -- wall-clocking single calls is meaningless.
:func:`device_time` runs the operation ``n`` times inside one jitted
``lax.fori_loop`` with a forced data dependency between iterations, fetches
one scalar, and reports the marginal per-iteration time: pure device time,
independent of dispatch/fetch overhead.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["device_time"]


def device_time(step: Callable, *args, reps: int = 20) -> float:
    """Marginal device seconds per call of ``step(*args)``.

    Iterations are chained through a data dependency on the FIRST
    FLOATING-POINT argument (an ``acc * 1e-9`` perturbation -- adding it
    to an integer argument would silently promote it to f32 and break
    integer consumers like gathers/scatters downstream); at least one
    argument must be floating.  ``step`` returns an array or tuple of
    arrays.  Args are passed through as jit arguments (never closed
    over -- large closures can exceed remote compile request limits).
    """
    def _is_float_array(a):
        try:  # pytree args (e.g. TreeArrays) are fine, just not targets
            return jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
        except (TypeError, ValueError):
            return False

    fi = next((i for i, a in enumerate(args) if _is_float_array(a)), None)
    if fi is None:
        raise ValueError("device_time needs at least one floating-point "
                         "array argument to chain iterations through")

    def loop(n: int) -> float:
        @jax.jit
        def g(argt):
            def body(_, acc):
                a = list(argt)
                a[fi] = a[fi] + acc * 1e-9
                out = step(*a)
                if isinstance(out, tuple):
                    out = out[0]
                return jnp.sum(
                    jnp.asarray(out).astype(jnp.float32).ravel()[:1]
                ) * 1e-20 + acc

            return lax.fori_loop(0, n, body, 0.0)

        float(g(args))  # compile + warm
        t0 = time.perf_counter()
        float(g(args))
        return time.perf_counter() - t0

    t1, tn = loop(1), loop(reps)
    return max(0.0, (tn - t1) / (reps - 1))
