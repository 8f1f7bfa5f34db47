#!/usr/bin/env python3
"""Slope timing for device kernels through unreliable links.

Through this environment's tunneled PJRT backend, `block_until_ready`
returns at DISPATCH, and repeated identical executions can be served
without re-running — naive warm loops read as low as 0.1 ms for a
200 MB-output kernel (BASELINE.md round 5, timing methodology note).
The trustworthy measurement chains sequentially-DEPENDENT iterations
(each output perturbs the next input, so nothing can dedupe or
overlap) and takes the slope between two chain lengths, which cancels
RTT, queueing, and the one-time sync:

    per_iter = (t(chain(K2)) - t(chain(K1))) / (K2 - K1)

Usage:

    from tools.slope_timer import slope_time
    ms = slope_time(lambda x: my_kernel(x), first_input,
                    perturb=lambda x, o: x ^ (o & 1))

`perturb(prev_input, prev_output) -> next_input` must make the next
call's input depend on the previous output.  A tiny np.asarray of the
final output forces full completion.
"""

from __future__ import annotations

import time

import numpy as np


def slope_time(fn, x0, perturb, k1: int = 2, k2: int = 5):
    """Seconds per iteration of fn by chained-slope timing."""
    import jax.numpy as jnp

    def chain(k):
        x = x0
        o = None
        for _ in range(k):
            o = fn(x)
            x = perturb(x, o)
        np.asarray(jnp.ravel(o)[:4])

    chain(1)                       # warm / compile
    t0 = time.time()
    chain(k1)
    ta = time.time() - t0
    t0 = time.time()
    chain(k2)
    tb = time.time() - t0
    return max((tb - ta) / (k2 - k1), 1e-9)


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((1024, 1024), jnp.float32)
    f = jax.jit(lambda a: a * 1.000001 + 1.0)
    dt = slope_time(f, x, lambda a, o: o)
    print(f"demo elementwise kernel: {dt * 1e3:.3f} ms/iter "
          f"on {jax.default_backend()}")
