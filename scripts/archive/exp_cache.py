"""Does the JAX persistent compilation cache absorb axon's slow
first execution across processes?  Run twice; compare."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dbgtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    dev = jax.devices()[0]
    tbl = jax.device_put(
        np.random.RandomState(0).randint(0, 1 << 30, (1 << 20, 16)).astype(np.int32), dev
    )
    idx = jax.device_put(
        np.random.RandomState(1).randint(0, 1 << 20, (32768,)).astype(np.int32), dev
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

    t0 = time.monotonic()
    np.asarray(gl(idx))
    print(f"gatherloop first: {time.monotonic() - t0:.2f}s", flush=True)
    t0 = time.monotonic()
    np.asarray(gl(idx))
    print(f"gatherloop second: {time.monotonic() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
