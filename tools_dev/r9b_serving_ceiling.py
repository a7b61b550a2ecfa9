"""r9b: the serving knee decomposed — what does the HOST serving stack cap
at if the device were infinitely fast? (VERDICT r4 weak #3)

Mocks Collection._exact_topk_device to return canned device arrays
(per-shape cache, zero compute), so the 32-client closed-loop measurement
isolates: http plumbing + handler parse + batcher coalescing + collection
bucket/dispatch bookkeeping + result assembly + response encode + the
benchmark clients' own cost on the shared core.  Compare the resulting QPS
to the real knee (~516-528 r4): if this ceiling is far above it, the knee
is device/tunnel cost, not the serving stack.

Usage: PYTHONPATH=... python tools_dev/r9b_serving_ceiling.py [profile]
"""

import cProfile
import io
import json
import pstats
import sys
import tempfile
import threading
import time


def main():
    do_profile = len(sys.argv) > 1 and sys.argv[1] == "profile"
    canned = "canned" in sys.argv[1:]  # skip search logic entirely:
    # measures routing + http plumbing + the co-located clients alone
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from syzgydb_tpu import Collection, CollectionOptions, COSINE
    from syzgydb_tpu.server.rest import Server, make_http_server

    rng = np.random.default_rng(7)
    n, d, k = 100_000, 128, 10
    vecs = rng.standard_normal((n, d), dtype=np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    cache = {}

    def fake_topk(self, queries, dev, valid, kk, exact, tie_margin=None):
        key = (queries.shape[0], kk)
        hit = cache.get(key)
        if hit is None:
            dist = jnp.tile(jnp.linspace(0.1, 0.2, kk,
                                         dtype=jnp.float32)[None, :],
                            (queries.shape[0], 1))
            rows = jnp.tile(jnp.arange(kk, dtype=jnp.int32)[None, :],
                            (queries.shape[0], 1))
            cache[key] = hit = (jax.block_until_ready(dist),
                                jax.block_until_ready(rows))
        return hit[0], hit[1], None, 0, 0

    Collection._exact_topk_device = fake_topk
    if canned:
        from syzgydb_tpu.server import rest as rest_mod
        payload = {"results": [{"id": i, "metadata": {"cat": 3},
                                "distance": 0.1} for i in range(10)],
                   "percent_searched": 100.0, "search_time": 0,
                   "queue_wait_time": 0, "embedding_time": 0}

        def canned_search(self, parts):
            self._body()
            self._respond(200, payload)
        rest_mod._Handler._handle_search = canned_search

    with tempfile.TemporaryDirectory() as tmp:
        srv = Server(data_folder=tmp)
        srv.batcher.window_s = 0.016
        c = Collection(CollectionOptions(
            name=f"{tmp}/p.dat", distance_method=COSINE,
            dimension_count=d, quantization=8, create_and_overwrite=True,
            index_seed=1))
        c.add_documents(list(range(n)), vecs, [b"{\"cat\": 3}"] * n)
        srv.collections["p"] = c
        httpd = make_http_server(srv)
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()

        import http.client
        local = threading.local()
        clients, per_client = 32, 40
        bodies = [json.dumps({"vector": vecs[i].tolist(), "k": k,
                              "precision": "high"}).encode()
                  for i in range(clients)]
        hdrs = {"Content-Type": "application/json"}

        def one(i):
            conn = getattr(local, "conn", None)
            if conn is None:
                conn = local.conn = http.client.HTTPConnection(
                    "127.0.0.1", port)
            conn.request("POST", "/api/v1/collections/p/search",
                         body=bodies[i], headers=hdrs)
            out = json.loads(conn.getresponse().read())
            assert len(out["results"]) == k, out

        def client(i):
            for _ in range(per_client):
                one(i)

        for _ in range(2):  # warm shapes + connections
            burst = [threading.Thread(target=client, args=(i,))
                     for i in range(clients)]
            for t in burst:
                t.start()
            for t in burst:
                t.join()

        prof = cProfile.Profile()
        if do_profile:
            prof.enable()
        t0 = time.perf_counter()
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        if do_profile:
            prof.disable()
        total = clients * per_client
        print(f"mock-device ceiling: {total} requests in {wall:.2f}s = "
              f"{total / wall:.0f} QPS "
              f"({srv.batcher.queries} queries in "
              f"{srv.batcher.dispatches} dispatches)")
        if do_profile:
            s = io.StringIO()
            pstats.Stats(prof, stream=s).sort_stats(
                "tottime").print_stats(40)
            print(s.getvalue())
        httpd.shutdown()
        c.close()


if __name__ == "__main__":
    main()
