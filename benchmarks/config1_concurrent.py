"""BASELINE config 1 (serving variant): concurrent single-query REST load.

32 client threads fire individual searches at the live HTTP server; the
SearchBatcher coalesces them into shared device dispatches (server/batcher.py)
— the measurement VERDICT r1 item 3 asked for."""

import json
import os
import sys
import tempfile
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from benchmarks.common import Timer, emit, log, make_vectors, scale  # noqa: E402


def main():
    from syzgydb_tpu import Collection, CollectionOptions, COSINE
    from syzgydb_tpu.server.rest import Server, make_http_server

    n = max(5000, int(100_000 * scale()))
    d, k = 128, 10
    clients, per_client = 32, 8
    rng = np.random.default_rng(11)
    vecs = make_vectors(rng, n, d)

    with tempfile.TemporaryDirectory() as tmp:
        srv = Server(data_folder=tmp)
        srv.batcher.window_s = float(
            os.environ.get("SYZGY_BATCH_MS", "4")) / 1000.0
        c = Collection(CollectionOptions(
            name=os.path.join(tmp, "c1.dat"), distance_method=COSINE,
            dimension_count=d, quantization=64, create_and_overwrite=True,
            index_seed=1))
        t = Timer()
        c.add_documents(list(range(n)), vecs, [b"{}"] * n)
        srv.collections["c1"] = c
        log(f"ingested {n} in {t.lap():.1f}s")

        httpd = make_http_server(srv)
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{port}/api/v1/collections/c1/search"

        queries = make_vectors(rng, clients, d)
        # pre-encode request bodies: the clients share the server's single
        # core, so client-side json work must stay out of the measurement
        bodies = [json.dumps({"vector": q.tolist(), "k": k,
                              "precision": "high"}).encode()
                  for q in queries]

        def one(i):
            req = urllib.request.Request(
                base, data=bodies[i],
                headers={"Content-Type": "application/json"})
            t0 = time.perf_counter()
            with urllib.request.urlopen(req) as resp:
                out = json.loads(resp.read())
            assert len(out["results"]) == k
            return (time.perf_counter() - t0) * 1000.0

        # warm every batch-bucket shape (compile + placement): one
        # concurrent burst populates the {8,16,32}-query jit cache
        for _ in range(2):
            burst = [threading.Thread(target=one, args=(i,))
                     for i in range(clients)]
            for th in burst:
                th.start()
            for th in burst:
                th.join()

        srv.batcher.dispatches = srv.batcher.queries = 0  # exclude warmup

        lats = []
        lock = threading.Lock()

        def client(i):
            mine = []
            for _ in range(per_client):
                mine.append(one(i))
            with lock:
                lats.extend(mine)

        t0 = time.perf_counter()
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(clients)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        wall = time.perf_counter() - t0
        httpd.shutdown()

        total = clients * per_client
        qps = total / wall
        p50 = float(np.percentile(lats, 50))
        p95 = float(np.percentile(lats, 95))
        log(f"{total} requests in {wall:.2f}s: {qps:.0f} QPS "
            f"p50 {p50:.0f}ms p95 {p95:.0f}ms; "
            f"batched {srv.batcher.queries} queries into "
            f"{srv.batcher.dispatches} dispatches")
        c.close()

    emit({
        "metric": "config1_concurrent32_rest_qps",
        "value": round(qps, 1),
        "unit": "queries/s",
        "n": n,
        "clients": clients,
        "p50_ms": round(p50, 1),
        "p95_ms": round(p95, 1),
        "dispatches": srv.batcher.dispatches,
        "queries_batched": srv.batcher.queries,
    })


if __name__ == "__main__":
    main()
