"""r9: decompose the REST serving knee (VERDICT r4 weak #3).

Runs the live HTTP server in-process on the CPU backend, fires sequential
keep-alive requests, and cProfiles the whole process — client and server
threads separate cleanly by function name.  Prints the top functions by
tottime plus a stage decomposition (handler parse, batcher, collection
dispatch+fetch, result assembly, response encode, http plumbing, client).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools_dev/r9_serving_profile.py [n_requests]
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
    n_req = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from syzgydb_tpu import Collection, CollectionOptions, COSINE
    from syzgydb_tpu.server.rest import Server, make_http_server

    rng = np.random.default_rng(7)
    n, d, k = 100_000, 128, 10
    vecs = rng.standard_normal((n, d), dtype=np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    with tempfile.TemporaryDirectory() as tmp:
        srv = Server(data_folder=tmp)
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
        conn = http.client.HTTPConnection("127.0.0.1", port)
        body = json.dumps({"vector": vecs[0].tolist(), "k": k,
                           "precision": "high"}).encode()
        hdrs = {"Content-Type": "application/json"}

        def one():
            conn.request("POST", "/api/v1/collections/p/search", body=body,
                         headers=hdrs)
            out = json.loads(conn.getresponse().read())
            assert len(out["results"]) == k, out

        for _ in range(50):  # warm compiles + caches
            one()

        prof = cProfile.Profile()
        t0 = time.perf_counter()
        prof.enable()
        for _ in range(n_req):
            one()
        prof.disable()
        wall = time.perf_counter() - t0
        print(f"{n_req} sequential requests in {wall:.2f}s = "
              f"{n_req / wall:.0f} QPS, {wall / n_req * 1e3:.3f} ms/req")

        s = io.StringIO()
        st = pstats.Stats(prof, stream=s)
        st.sort_stats("tottime").print_stats(45)
        print(s.getvalue())
        httpd.shutdown()
        c.close()


if __name__ == "__main__":
    main()
