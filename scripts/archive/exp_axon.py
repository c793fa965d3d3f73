"""Decompose axon first-execution cost: session setup vs per-program
remote compile vs embedded-constant size vs argument-passed tables."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def t(label, fn):
    t0 = time.monotonic()
    fn()
    print(f"{label}: {time.monotonic() - t0:.2f}s", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]

    x = jax.device_put(np.ones((8, 128), np.float32), dev)
    t("devput tiny + sync", lambda: np.asarray(x))

    @jax.jit
    def triv(x):
        return x * 2 + 1

    t("trivial first (setup+compile)", lambda: np.asarray(triv(x)))

    @jax.jit
    def triv2(x):
        return x * 3 - 1

    t("trivial2 first (marginal tiny program)", lambda: np.asarray(triv2(x)))

    # gather loop, table passed as ARGUMENT (no embedded constant)
    tbl = jax.device_put(
        np.random.RandomState(0).randint(0, 1 << 30, (1 << 20, 16)).astype(np.int32), dev
    )
    idx = jax.device_put(
        np.random.RandomState(1).randint(0, 1 << 20, (32768,)).astype(np.int32), dev
    )
    np.asarray(tbl[0])  # force H2D now

    @jax.jit
    def gl_arg(tbl, idx):
        def body(c):
            i, ix2 = c
            rows = tbl[ix2]
            nxt = (rows[:, 0] ^ rows[:, 1]) & ((1 << 20) - 1)
            return i + 1, nxt
        def cond(c):
            return c[0] < 20
        return jax.lax.while_loop(cond, body, (jnp.int32(0), idx))[1]

    t("gatherloop (table as arg) first", lambda: np.asarray(gl_arg(tbl, idx)))
    t("gatherloop (table as arg) second", lambda: np.asarray(gl_arg(tbl, idx)))

    # same body, no loop (single step): is the loop the cost?
    @jax.jit
    def g1(tbl, idx):
        rows = tbl[idx]
        return (rows[:, 0] ^ rows[:, 1]) & ((1 << 20) - 1)

    t("single gather step first", lambda: np.asarray(g1(tbl, idx)))


if __name__ == "__main__":
    main()
