"""Bulk-ingestion demo — the analog of the reference's Sentiment140 tweet
loader (/root/reference/syzgydb_client.py:49-103): streams a CSV of texts
into a collection in batches of 100 with server-side embedding, then runs a
few sample searches.

Usage:
    python examples/load_demo.py --csv tweets.csv --column 5 --limit 10000
    python examples/load_demo.py --synthetic 10000   # no CSV needed

Expects a running server (python -m syzgydb_tpu.tools.cli --serve).
"""

from __future__ import annotations

import argparse
import csv
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "clients",
                                "python"))
from syzgy_tpu_client import Document, SyzgyClient, SyzgyException  # noqa: E402

BATCH = 100


def batches(iterable, size):
    it = iter(iterable)
    while chunk := list(itertools.islice(it, size)):
        yield chunk


def synthetic_texts(n):
    words = ("tpu vector database search embedding quantized hamming "
             "sketch index shard mesh collective matmul").split()
    for i in range(n):
        yield f"doc {i}: " + " ".join(words[(i + j) % len(words)]
                                      for j in range(8))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--server", default="http://localhost:8080")
    ap.add_argument("--collection", default="demo")
    ap.add_argument("--csv", help="CSV file of texts")
    ap.add_argument("--column", type=int, default=0,
                    help="CSV column holding the text")
    ap.add_argument("--limit", type=int, default=10000)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic docs instead of reading a CSV")
    ap.add_argument("--vector-size", type=int, default=384)
    args = ap.parse_args()

    client = SyzgyClient(args.server)
    try:
        coll = client.get_collection(args.collection)
        print(f"using existing collection {args.collection} "
              f"({coll.info.document_count} docs)")
    except SyzgyException:
        coll = client.create_collection(args.collection, args.vector_size,
                                        quantization=8,
                                        distance_function="cosine")
        print(f"created collection {args.collection}")

    if args.synthetic:
        texts = itertools.islice(synthetic_texts(args.synthetic),
                                 args.limit)
    elif args.csv:
        def read_csv():
            with open(args.csv, newline="", encoding="utf-8",
                      errors="replace") as f:
                for row in csv.reader(f):
                    if len(row) > args.column:
                        yield row[args.column]
        texts = itertools.islice(read_csv(), args.limit)
    else:
        ap.error("provide --csv or --synthetic")

    next_id = (max(coll.get_document_ids(), default=0) + 1)
    total, t0 = 0, time.time()
    for chunk in batches(texts, BATCH):
        docs = [Document(id=next_id + i, text=t,
                         metadata={"text": t[:140]})
                for i, t in enumerate(chunk)]
        coll.insert_documents(docs)
        next_id += len(chunk)
        total += len(chunk)
        if total % 1000 == 0:
            rate = total / (time.time() - t0)
            print(f"  {total} docs ({rate:.0f} docs/s)")
    print(f"inserted {total} docs in {time.time() - t0:.1f}s")

    for query in ("vector search on tpu", "sharded matmul"):
        res = coll.search(text=query, k=5)
        print(f"\nquery: {query!r}  "
              f"({res.search_time}ms search, {res.embedding_time}ms embed, "
              f"{res.percent_searched:.1f}% searched)")
        for r in res.results:
            print(f"  {r.id:>8}  {r.distance:.4f}  "
                  f"{r.metadata.get('text', '')[:60]}")


if __name__ == "__main__":
    main()
