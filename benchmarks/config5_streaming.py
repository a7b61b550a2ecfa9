"""BASELINE config 5: streaming workload — concurrent insert/update/delete +
queries (10M x 384-d full scale; sharded across a slice via use_mesh when
multiple devices are present)."""

import os
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from benchmarks.common import Timer, emit, log, make_vectors, scale  # noqa: E402


def main():
    import jax
    from syzgydb_tpu import (Collection, CollectionOptions, SearchArgs,
                             COSINE)

    n0 = max(10_000, int(10_000_000 * scale()))
    d, k = 384, 10
    duration_s = float(os.environ.get("SYZGY_BENCH_SECONDS", "30"))
    rng = np.random.default_rng(5)

    with tempfile.TemporaryDirectory() as tmp:
        c = Collection(CollectionOptions(
            name=os.path.join(tmp, "c5.dat"), distance_method=COSINE,
            dimension_count=d, quantization=8, create_and_overwrite=True,
            index_seed=5))
        if len(jax.devices()) > 1:
            from syzgydb_tpu.parallel.mesh import MeshConfig, make_mesh
            c.use_mesh(make_mesh(MeshConfig()))
            log(f"sharded over {len(jax.devices())} devices")

        t = Timer()
        batch = 50_000
        for s in range(0, n0, batch):
            m = min(batch, n0 - s)
            c.add_documents(list(range(s, s + m)),
                            make_vectors(rng, m, d), [b"{}"] * m)
        log(f"initial load {n0} docs in {t.lap():.1f}s")

        queries = make_vectors(rng, 8, d)
        c.search(SearchArgs(vector=queries[0], k=k))  # warm

        # churn-rate sweep: one window per target mutation rate (ops/s of
        # insert+delete+update; 0 = free-running).  The mutator became so
        # fast after the r5 O(1)-compaction fix that a free-running window
        # measures mutation THROUGHPUT (2.5k ops/s at 10M, saturating the
        # single host core) rather than query capability under realistic
        # churn — the r3/r4 comparison point was ~19 mutations/s.
        rates = [float(r) for r in
                 os.environ.get("SYZGY_MUT_RATES", "0").split(",")]
        ops_per_iter = 570  # 500 insert + 50 delete + 20 update
        sweep = []
        next_id = [n0]

        for rate in rates:
            stop = threading.Event()
            counts = {"insert": 0, "delete": 0, "update": 0, "query": 0}
            errors = []
            lat = []

            def mutator(rate=rate, counts=counts, errors=errors,
                        stop=stop):
                m_rng = np.random.default_rng(50 + int(rate))
                t_start = time.perf_counter()
                iters = 0
                try:
                    while not stop.is_set():
                        if rate > 0:
                            due = t_start + iters * ops_per_iter / rate
                            while not stop.is_set() and \
                                    time.perf_counter() < due:
                                time.sleep(0.005)
                            if stop.is_set():
                                break
                        nid = next_id[0]
                        c.add_documents(
                            list(range(nid, nid + 500)),
                            make_vectors(m_rng, 500, d), [b"{}"] * 500)
                        counts["insert"] += 500
                        for doc_id in m_rng.integers(0, n0, 50):
                            try:
                                c.remove_document(int(doc_id))
                                counts["delete"] += 1
                            except KeyError:
                                pass
                        for doc_id in m_rng.integers(n0 // 2, n0, 20):
                            try:
                                c.update_document(int(doc_id), b'{"u": 1}')
                                counts["update"] += 1
                            except KeyError:
                                pass
                        next_id[0] += 500
                        iters += 1
                except Exception as exc:  # pragma: no cover
                    errors.append(exc)

            def reader(counts=counts, errors=errors, lat=lat, stop=stop):
                r_rng = np.random.default_rng(51)
                try:
                    while not stop.is_set():
                        q = queries[r_rng.integers(0, len(queries))]
                        res = c.search(SearchArgs(vector=q, k=k))
                        lat.append(res.search_time_ms)
                        counts["query"] += 1
                except Exception as exc:  # pragma: no cover
                    errors.append(exc)

            threads = [threading.Thread(target=mutator),
                       threading.Thread(target=reader)]
            for th in threads:
                th.start()
            time.sleep(duration_s)
            stop.set()
            for th in threads:
                th.join()
            assert not errors, errors
            sweep.append({
                "target_mut_per_s": rate,
                "qps": round(counts["query"] / duration_s, 2),
                "median_query_ms": round(float(np.median(lat)), 1)
                if lat else None,
                "p90_query_ms": round(float(np.percentile(lat, 90)), 1)
                if lat else None,
                "mutations_per_s": round(
                    (counts["insert"] + counts["delete"] + counts["update"])
                    / duration_s, 1),
                "counts": counts,
            })
            log(f"rate={rate}: {sweep[-1]['qps']} QPS, "
                f"median {sweep[-1]['median_query_ms']} ms, "
                f"{sweep[-1]['mutations_per_s']} mut/s")
        c.close()

    # headline value: the window nearest the r3/r4 comparison point
    # (~19 mutations/s) when swept; otherwise the single window's QPS
    pick = min(sweep, key=lambda s: abs((s["target_mut_per_s"] or
                                         s["mutations_per_s"]) - 19.0)) \
        if len(sweep) > 1 else sweep[0]
    emit({
        "metric": "config5_streaming_concurrent_qps",
        "value": pick["qps"],
        "unit": "queries/s",
        "n_initial": n0,
        "median_query_ms": pick["median_query_ms"],
        "mutations_per_s": pick["mutations_per_s"],
        "counts": pick["counts"],
        "sweep": sweep,
    })


if __name__ == "__main__":
    main()
