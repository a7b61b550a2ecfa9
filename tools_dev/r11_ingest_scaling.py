"""r11b: find the O(N) term in add_documents (host-only, no device).

The 10M decomposition probe measured add_documents(500) at 645 ms
(12 ms at 20k rows) — linear in collection size.  Build a collection at
increasing N, time a 500-doc insert at each size, then cProfile one
insert at the largest size to name the hot line.
"""

import cProfile
import io
import os
import pstats
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_platforms", "cpu")

from syzgydb_tpu import Collection, CollectionOptions, COSINE  # noqa: E402


def main():
    d = 384
    rng = np.random.default_rng(5)
    with tempfile.TemporaryDirectory() as tmp:
        c = Collection(CollectionOptions(
            name=os.path.join(tmp, "c.dat"), distance_method=COSINE,
            dimension_count=d, quantization=8, create_and_overwrite=True,
            index_seed=5))
        nid = [0]

        def add(n):
            vecs = np.float64(rng.standard_normal((n, d), dtype=np.float32))
            c.add_documents(list(range(nid[0], nid[0] + n)), vecs,
                            [b"{}"] * n)
            nid[0] += n

        for target in (100_000, 500_000, 1_000_000, 2_000_000, 4_000_000):
            while nid[0] < target:
                add(50_000)
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                add(500)
                ts.append((time.perf_counter() - t0) * 1000)
            print(f"N={target:>9,}: add_documents(500) p50 "
                  f"{sorted(ts)[2]:7.1f} ms", flush=True)

        pr = cProfile.Profile()
        pr.enable()
        for _ in range(3):
            add(500)
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
        print(s.getvalue())
        c.close()


if __name__ == "__main__":
    main()
