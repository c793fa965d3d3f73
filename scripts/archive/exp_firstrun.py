"""Characterize the slow first execution on the axon TPU platform.

Questions: is it per-program or per-shape? Does batch size matter?
Does a trivial while_loop program show it too?
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def t(label, fn):
    t0 = time.monotonic()
    out = fn()
    dt = time.monotonic() - t0
    print(f"{label}: {dt:.2f}s", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # 1. trivial program
    @jax.jit
    def triv(x):
        return x * 2 + 1

    x = jax.device_put(np.ones((1024, 1024), np.float32), dev)
    t("trivial first", lambda: np.asarray(triv(x)))
    t("trivial second", lambda: np.asarray(triv(x)))

    # 2. simple while_loop, many iterations
    @jax.jit
    def wl(x):
        def body(c):
            i, v = c
            return i + 1, v * 1.000001 + 0.001
        def cond(c):
            return c[0] < 50
        return jax.lax.while_loop(cond, body, (jnp.int32(0), x))[1]

    t("whileloop first", lambda: np.asarray(wl(x)))
    t("whileloop second", lambda: np.asarray(wl(x)))

    # 3. while_loop with a gather-heavy body (like the engine)
    tbl = jax.device_put(
        np.random.randint(0, 1 << 30, (1 << 20, 16), np.int32), dev
    )
    idx = jax.device_put(
        np.random.randint(0, 1 << 20, (32768,), np.int32), dev
    )

    @jax.jit
    def gl(idx):
        def body(c):
            i, ix2 = c
            rows = tbl[ix2]
            nxt = (rows[:, 0] ^ rows[:, 1]) & ((1 << 20) - 1)
            return i + 1, nxt
        def cond(c):
            return c[0] < 20
        return jax.lax.while_loop(cond, body, (jnp.int32(0), idx))[1]

    t("gatherloop first", lambda: np.asarray(gl(idx)))
    t("gatherloop second", lambda: np.asarray(gl(idx)))


if __name__ == "__main__":
    main()
