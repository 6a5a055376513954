"""Shared TPU micro-benchmark harness for the tools/profile_* family.

One copy of the three things every profiling tool needs, so a sync-method
fix lands once (CLAUDE.md: `jax.block_until_ready` is a NO-OP through the
axon tunnel — timing must queue executions and fetch a scalar from the LAST
output):

  setup_cache()          — persistent XLA compilation cache under
                           /root/.cache/jax_comp_tpu (reruns skip the
                           minutes-long tunnel compiles).
  cost(compiled)         — (flops, bytes accessed) from cost_analysis(),
                           zeros when the backend provides none.
  bench(name, fn, args)  — compile, queue `n` executions, scalar-fetch sync,
                           print ONE json line {name, ms, flops_T/GB, rates}
                           and return the mean seconds. `sync` maps the
                           output to the array whose scalar sum is fetched
                           (defaults to the first tree leaf).
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp


def setup_cache() -> None:
    os.makedirs("/root/.cache/jax_comp_tpu", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def cost(compiled):
    try:
        c = compiled.cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0)), float(c.get("bytes accessed", 0))
    except Exception:
        return 0.0, 0.0


def _first_leaf(out):
    return jax.tree_util.tree_leaves(out)[0]


def bench(name: str, fn, args, n: int = 20, sync=_first_leaf,
          jit: bool = True):
    """Time `fn(*args)` on device; print one JSON line; return (dt_s, out)."""
    jitted = jax.jit(fn) if jit else fn
    compiled = jitted.lower(*args).compile()
    fl, by = cost(compiled)
    out = compiled(*args)
    float(jnp.sum(sync(out)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = compiled(*args)
    float(jnp.sum(sync(out)))
    dt = (time.perf_counter() - t0) / n
    print(json.dumps(dict(
        name=name, ms=round(dt * 1e3, 3),
        flops_T=round(fl / 1e12, 3), bytes_GB=round(by / 1e9, 3),
        tflops_per_s=round(fl / dt / 1e12, 1) if fl else None,
        gb_per_s=round(by / dt / 1e9, 1) if by else None)), flush=True)
    return dt, out
