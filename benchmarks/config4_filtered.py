"""BASELINE config 4: 1M x 768-d with query-language metadata predicates —
filtered top-k via masked scans."""

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from benchmarks.common import Timer, emit, log, make_vectors, scale  # noqa: E402


def main():
    from syzgydb_tpu import (Collection, CollectionOptions, SearchArgs,
                             COSINE)

    n = max(5000, int(1_000_000 * scale()))
    d, k, n_queries = 768, 10, 8
    rng = np.random.default_rng(4)
    vecs = make_vectors(rng, n, d)
    queries = make_vectors(rng, n_queries, d)
    cats = rng.integers(0, 10, n)
    scores = rng.uniform(0, 100, n)

    with tempfile.TemporaryDirectory() as tmp:
        t = Timer()
        c = Collection(CollectionOptions(
            name=os.path.join(tmp, "c4.dat"), distance_method=COSINE,
            dimension_count=d, quantization=8, create_and_overwrite=True,
            index_seed=4))
        metas = [json.dumps({"cat": int(cats[i]),
                             "score": round(float(scores[i]), 2),
                             "name": f"doc_{i}"}).encode()
                 for i in range(n)]
        c.add_documents(list(range(n)), vecs, metas)
        log(f"ingested {n} docs in {t.lap():.1f}s")

        # Steady-state warmup: iid high-D corpora trip the provable-
        # selection escalation on MOST queries (CLAUDE.md perf facts), so
        # a few fresh warm queries force the margin ladder (and its
        # one-time per-shape compiles) BEFORE any timed window; the
        # collection's margin hint then keeps every timed query on the
        # proven rung.  Warm queries are drawn fresh — never the timed set.
        warm = make_vectors(rng, 8, d)
        for wq in warm:
            c.search(SearchArgs(vector=wq, k=k, precision="high"))
        log(f"escalation warmup done in {t.lap():.1f}s "
            f"(margin hint {c._seg_margin_hint})")

        results = {}
        for label, query_str, selectivity in [
            ("cat_eq", "cat == 3", 0.1),
            ("range", "score > 25 AND score < 75", 0.5),
            ("string", "name STARTS_WITH 'doc_1'", None),
        ]:
            c.search(SearchArgs(vector=queries[0], k=k,
                                filter_query=query_str,
                                precision="high"))  # warm + mask build
            t.lap()
            for q in queries:
                res = c.search(SearchArgs(vector=q, k=k,
                                          filter_query=query_str,
                                          precision="high"))
            dt = t.lap()
            ok = all(json_matches(r.metadata, label) for r in res.results)
            results[label] = {"qps": round(n_queries / dt, 2),
                              "constraint_ok": ok,
                              "pct_searched": round(res.percent_searched, 1)}
            log(f"{label}: {results[label]}")

        # DISTINCT filters: every query carries a filter never seen before,
        # so the boolean mask is built fresh each time — this is what the
        # vectorized columnar engine (query/columnar.py) accelerates; the
        # per-row fallback pays a full-corpus json+eval pass per query.
        t.lap()
        for i, q in enumerate(queries):
            lo = 10 * (i % 8)
            res = c.search(SearchArgs(
                vector=q, k=k, precision="high",
                filter_query=f"cat == {i % 10} AND score > {lo}"))
        dt = t.lap()
        results["distinct_filters"] = {"qps": round(n_queries / dt, 2),
                                       "constraint_ok": bool(res.results)}
        log(f"distinct_filters: {results['distinct_filters']}")
        c.close()

    emit({
        "metric": "config4_filtered_topk_768d",
        "value": results["cat_eq"]["qps"],
        "unit": "queries/s",
        "n": n,
        "per_filter": results,
    })


def json_matches(md: bytes, label: str) -> bool:
    doc = json.loads(md)
    if label == "cat_eq":
        return doc["cat"] == 3
    if label == "range":
        return 25 < doc["score"] < 75
    return doc["name"].startswith("doc_1")


if __name__ == "__main__":
    main()
