"""Split axon first-call latency: backend init vs H2D vs lower vs
compile vs first execute, with persistent-cache logging."""
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dbgtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    t0 = time.monotonic()
    dev = jax.devices()[0]
    print(f"backend init: {time.monotonic() - t0:.2f}s", flush=True)

    t0 = time.monotonic()
    tbl = jax.device_put(
        np.random.RandomState(0).randint(0, 1 << 30, (1 << 20, 16)).astype(np.int32), dev
    )
    idx = jax.device_put(
        np.random.RandomState(1).randint(0, 1 << 20, (32768,)).astype(np.int32), dev
    )
    jax.block_until_ready((tbl, idx))
    print(f"device_put+block: {time.monotonic() - t0:.2f}s", flush=True)

    def gl(idx):
        def body(c):
            i, ix2 = c
            rows = tbl[ix2]
            nxt = (rows[:, 0] ^ rows[:, 1]) & ((1 << 20) - 1)
            return i + 1, nxt
        def cond(c):
            return c[0] < 20
        return jax.lax.while_loop(cond, body, (jnp.int32(0), idx))[1]

    jf = jax.jit(gl)
    t0 = time.monotonic()
    lowered = jf.lower(idx)
    print(f"lower: {time.monotonic() - t0:.2f}s", flush=True)
    t0 = time.monotonic()
    compiled = lowered.compile()
    print(f"compile: {time.monotonic() - t0:.2f}s", flush=True)
    t0 = time.monotonic()
    np.asarray(compiled(idx))
    print(f"exec1: {time.monotonic() - t0:.2f}s", flush=True)
    t0 = time.monotonic()
    np.asarray(compiled(idx))
    print(f"exec2: {time.monotonic() - t0:.2f}s", flush=True)


def second_lower_probe():
    """Is the lower() cost once-per-process or per-function?"""
    import jax
    import jax.numpy as jnp

    def g2(x):
        return jnp.cumsum(x * 3 + 1) @ jnp.arange(x.shape[0], dtype=x.dtype)

    x = np.arange(4096, dtype=np.int32)
    t0 = time.monotonic()
    lowered = jax.jit(g2).lower(x)
    print(f"second-fn lower: {time.monotonic() - t0:.2f}s", flush=True)
    t0 = time.monotonic()
    lowered.compile()
    print(f"second-fn compile: {time.monotonic() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
    second_lower_probe()
