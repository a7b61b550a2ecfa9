"""r11: dispatch-chain cost model probe.

Hypothesis (from r7n's 33 ms/step dependent chain + CLAUDE.md RTT notes):
on the tunneled backend every program dispatch whose inputs are still
in-flight pays a full round trip, so a query path chaining K dependent
programs costs ~K RTTs — the config5 10M single-query median (463 ms at
the 92 ms/RTT tunnel mode) is dispatch-chain overhead, not compute.

Measures, at trivial compute size:
  A. one program + fetch                      (expect ~1-2 RTT)
  B. two chained programs + fetch             (expect +1 RTT over A)
  C. four chained programs + fetch            (expect +3 RTT over A)
  D. one program + EAGER bitcast/concat pack + fetch  (the _fetch_results
     shape; expect +2-3 RTT over A if eager ops dispatch like programs)
"""

import time


def bench(fn, reps=12):
    fn()  # warm/compile
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1000)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    from syzgydb_tpu.utils.platform import (normalize_jax_platforms,
                                            require_accelerator)
    normalize_jax_platforms()
    import jax
    import jax.numpy as jnp
    import numpy as np
    require_accelerator()

    x = jnp.ones((256, 256))

    f1 = jax.jit(lambda a: a @ a)
    f2 = jax.jit(lambda a: a + 1.0)
    f12 = jax.jit(lambda a: (a @ a) + 1.0)
    f4 = [jax.jit(lambda a, i=i: a + float(i)) for i in range(3)]

    def one():
        np.asarray(f12(x))

    def two():
        np.asarray(f2(f1(x)))

    def four():
        y = f1(x)
        for f in f4:
            y = f(y)
        np.asarray(y)

    def eager_pack():
        y = f1(x)
        p = jnp.concatenate(
            [jax.lax.bitcast_convert_type(y.astype(jnp.float32), jnp.int32),
             jnp.ones((256, 256), jnp.int32)], axis=1)
        np.asarray(p)

    print(f"A one-program+fetch    : {bench(one):8.1f} ms")
    print(f"B two-chained+fetch    : {bench(two):8.1f} ms")
    print(f"C four-chained+fetch   : {bench(four):8.1f} ms")
    print(f"D one+eager-pack+fetch : {bench(eager_pack):8.1f} ms")


if __name__ == "__main__":
    main()
