"""r7n: tunnel round-trip latency probe (tiny buffers, ~zero churn).
Healthy: ~33 ms/step on a dependent chain (CLAUDE.md RTT note); the
r3.7 degraded episode measured ~1.8 s/step with full compute throughput.
"""

import sys
import time


def main():
    from syzgydb_tpu.utils.platform import (normalize_jax_platforms,
                                            require_accelerator)
    normalize_jax_platforms()
    import jax
    import jax.numpy as jnp
    require_accelerator()
    x = jnp.ones((256, 256))
    f = jax.jit(lambda a: a @ a + 1.0)
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    y = x
    n = 10
    for _ in range(n):
        y = f(y)
    float(y[0, 0])
    dt = (time.perf_counter() - t0) / n
    print(f"dependent-chain RTT: {dt*1000:.1f} ms/step", flush=True)


if __name__ == "__main__":
    sys.exit(main())
