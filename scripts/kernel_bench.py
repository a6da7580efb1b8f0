#!/usr/bin/env python
"""Ad-hoc true-barrier kernel comparison on the attached chip (single-tenant).

Times, at config1 bench geometry (batch 128, 64px):
  - generator forward, xla vs pallas
  - generator forward+backward (value_and_grad of an L2 head), xla vs pallas
Each timed window ends in float(jax.device_get(scalar)) per CLAUDE.md rule 1.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from action_conditioned_gans_tpu.config import get_preset
from action_conditioned_gans_tpu.models import Generator
import dataclasses

BATCH = 128
REPS = 20


def _barrier(out):
    scalar = jax.tree_util.tree_leaves(out)[0].ravel()[0]
    float(jax.device_get(scalar))  # true completion barrier (CLAUDE.md rule 1)


def timeit(fn, *args):
    for _ in range(3):  # compile + warm; barrier so nothing leaks into timing
        _barrier(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(REPS):
            out = fn(*args)
        _barrier(out)
        best = min(best, (time.perf_counter() - t0) / REPS * 1e3)
    return best  # ms


def main():
    for backend in ("xla", "pallas"):
        cfg = get_preset("config1")
        mcfg = dataclasses.replace(cfg.model, backend=backend)
        gen = Generator(mcfg)
        frame = jnp.zeros((BATCH, 64, 64, 3), jnp.float32)
        action = jnp.zeros((BATCH, 4), jnp.float32)
        params = gen.init(jax.random.PRNGKey(0), frame, action)["params"]
        params = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), params)

        fwd = jax.jit(lambda p, f, a: gen.apply({"params": p}, f, a))
        t_fwd = timeit(fwd, params, frame, action)

        def loss(p, f, a):
            return jnp.mean(gen.apply({"params": p}, f, a) ** 2)

        vg = jax.jit(jax.value_and_grad(loss))
        t_bwd = timeit(vg, params, frame, action)
        print(f"{backend:7s} G fwd {t_fwd:7.3f} ms | G fwd+bwd {t_bwd:7.3f} ms")


if __name__ == "__main__":
    main()
