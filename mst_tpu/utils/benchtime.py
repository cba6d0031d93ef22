"""Shared kernel-timing helper for bench.py and the tools/ microbenches.

Two measured pitfalls are baked in (keep them in ONE place — three hand
copies drifted in round 3/4):

- `block_until_ready` can return early through the axon relay (one draft
  timed a kernel at an impossible 30 PFLOP/s) — force a device->host
  VALUE read (`float(jnp.sum(out))`) inside the timed region instead;
- a single relay hiccup at few-iteration passes showed up as a 2%
  static<dynamic int8 inversion in BENCH_r03 (VERDICT r3 #4) — report
  the min over `passes` independent passes.
"""

from __future__ import annotations

import time

import jax.numpy as jnp


def timed_min(fn, *args, iters: int = 25, passes: int = 2) -> float:
    """Mean seconds/call of `fn(*args)`, min over `passes` timed passes,
    after one untimed warm-up call (compile + transfer)."""
    out = fn(*args)
    float(jnp.sum(out).astype(jnp.float32))
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out).astype(jnp.float32))  # forced host value read
        best = min(best, (time.perf_counter() - t0) / iters)
    return best
