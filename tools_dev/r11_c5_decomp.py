"""r11: config5 10M single-query decomposition (one long-lived process).

The r5 hardware capture measured config5 streaming at 1.77 QPS / 463 ms
median query at 10M lean placement — far under the 8-10 QPS target and
under r3's 3.17.  This probe loads 10M once, then times every stage of
the query and mutation paths separately so the optimization targets the
measured term, not a guess.

Env: SYZGY_N rows (default 10_000_000).
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def med(ts):
    ts = sorted(ts)
    return ts[len(ts) // 2]


def timeit(label, fn, reps=10, warm=2):
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1000)
    print(f"{label:48s} p50 {med(ts):8.1f} ms   "
          f"min {min(ts):8.1f}  max {max(ts):8.1f}", flush=True)
    return med(ts)


def main():
    from syzgydb_tpu.utils.platform import (normalize_jax_platforms,
                                            require_accelerator)
    normalize_jax_platforms()
    import jax
    import jax.numpy as jnp
    from syzgydb_tpu import Collection, CollectionOptions, SearchArgs, COSINE
    from syzgydb_tpu.index import hamming
    require_accelerator()

    n0 = int(os.environ.get("SYZGY_N", "10000000"))
    d, k = 384, 10
    rng = np.random.default_rng(5)

    with tempfile.TemporaryDirectory() as tmp:
        c = Collection(CollectionOptions(
            name=os.path.join(tmp, "c5.dat"), distance_method=COSINE,
            dimension_count=d, quantization=8, create_and_overwrite=True,
            index_seed=5))
        t0 = time.perf_counter()
        batch = 50_000
        for s in range(0, n0, batch):
            m = min(batch, n0 - s)
            vecs = np.float64(rng.standard_normal((m, d), dtype=np.float32))
            c.add_documents(list(range(s, s + m)), vecs, [b"{}"] * m)
        print(f"load {n0} in {time.perf_counter()-t0:.1f}s", flush=True)

        qv = np.float64(rng.standard_normal((64, d), dtype=np.float32))
        t0 = time.perf_counter()
        c.search(SearchArgs(vector=qv[0], k=k))
        print(f"first search (placement+compile) {time.perf_counter()-t0:.1f}s",
              flush=True)
        dev = c._device_state()
        print(f"lean={'codes' not in dev} keys={sorted(dev)}", flush=True)

        # -- steady-state single-query end-to-end per precision ------------
        for prec in ("medium", "high", "exact"):
            timeit(f"search end-to-end  prec={prec}",
                   lambda p=prec: c.search(
                       SearchArgs(vector=qv[0], k=k, precision=p)), reps=8)

        # -- dispatch vs fetch split (medium) -------------------------------
        def split(prec):
            t0 = time.perf_counter()
            with c._lock:
                fin = c._search_locked(
                    SearchArgs(vector=qv[0], k=k, precision=prec))
            t1 = time.perf_counter()
            res = fin() if callable(fin) else fin
            t2 = time.perf_counter()
            return (t1 - t0) * 1000, (t2 - t1) * 1000

        for prec in ("medium", "high"):
            for _ in range(2):
                split(prec)
            ds, fs = [], []
            for _ in range(8):
                a, b = split(prec)
                ds.append(a)
                fs.append(b)
            print(f"{'split '+prec:48s} dispatch {med(ds):8.1f} ms   "
                  f"fetch+assemble {med(fs):8.1f} ms", flush=True)

        # -- device-stage isolation (medium internals) ----------------------
        queries = jnp.asarray(np.float32(qv[:1]))
        qcode = jnp.asarray(c.index.encode_np(np.float32(qv[:1])))
        budget = 2048
        valid = dev["valid"]

        def ham():
            _, cand = hamming.hamming_candidates(
                qcode, dev["hashes"], valid, budget, c.index.words)
            jax.block_until_ready(cand)
            return cand

        timeit("hamming_candidates (dispatch+block) Q=1", ham, reps=8)
        cand = ham()

        def rerank():
            out = c._ann_rerank(queries, dev, valid, cand, k)
            jax.block_until_ready(out[0])

        timeit("ann rerank (dispatch+block) Q=1", rerank, reps=8)

        def fused(ex):
            out = c._exact_topk_device(queries, dev, valid, k, ex)
            jax.block_until_ready(out[0])

        timeit("fused high kernel (dispatch+block) Q=1",
               lambda: fused(False), reps=8)

        # -- batched amortization -------------------------------------------
        for nq in (8, 64):
            for prec in ("medium", "high"):
                args = [SearchArgs(vector=qv[i], k=k, precision=prec)
                        for i in range(nq)]
                t = timeit(f"search_many Q={nq} prec={prec}",
                           lambda a=args: c.search_many(a), reps=5)
                print(f"{'':48s} -> {t/nq:8.2f} ms/query", flush=True)

        # -- mutation path ---------------------------------------------------
        mut_rng = np.random.default_rng(50)
        next_id = [n0]

        def mut_batch():
            nid = next_id[0]
            c.add_documents(list(range(nid, nid + 500)),
                            np.float64(mut_rng.standard_normal(
                                (500, d), dtype=np.float32)), [b"{}"] * 500)
            next_id[0] += 500

        timeit("add_documents(500) host side", mut_batch, reps=5, warm=1)

        def mut_then_query():
            mut_batch()
            t0 = time.perf_counter()
            c.search(SearchArgs(vector=qv[0], k=k))
            return (time.perf_counter() - t0) * 1000

        ts = [mut_then_query() for _ in range(5)]
        print(f"{'first query after mutation (scatter sync)':48s} "
              f"p50 {med(ts):8.1f} ms", flush=True)
        print(f"sync_stats {c.sync_stats}", flush=True)

        # -- churn reproduction (15 s, mimics config5) -----------------------
        import threading
        stop = threading.Event()
        counts = {"q": 0, "m": 0}
        lat = []

        def mutator():
            while not stop.is_set():
                mut_batch()
                counts["m"] += 570  # proxy for config5's 500+50+20

        def reader():
            while not stop.is_set():
                t0 = time.perf_counter()
                c.search(SearchArgs(vector=qv[counts["q"] % 64], k=k))
                lat.append((time.perf_counter() - t0) * 1000)
                counts["q"] += 1

        th = [threading.Thread(target=mutator), threading.Thread(target=reader)]
        for x in th:
            x.start()
        time.sleep(15)
        stop.set()
        for x in th:
            x.join()
        print(f"churn 15s: {counts['q']/15:.2f} QPS, "
              f"median query {med(lat):.1f} ms, "
              f"{counts['m']/15:.0f} mut/s, sync_stats {c.sync_stats}",
              flush=True)
        c.close()


if __name__ == "__main__":
    main()
