"""Dump / Export / Import tools (reference: /root/reference/dump.go).

* dump_index(path): walks the raw span-log bytes and pretty-prints every
  record's fields — the storage debugging tool (dump.go:220-318 analog, for
  our log format).
* export_json(collection, writer): streams
  {"collection": <options>, "records": [{id, vector, metadata}]}
  (dump.go:48-136).
* import_json(collection_name, reader): recreates the collection from an
  export stream (dump.go:138-217).
"""

from __future__ import annotations

import json
import struct
import sys
import zlib
from typing import IO

from ..core import storage
from ..core.collection import Collection, CollectionOptions


def dump_index(path: str, out: IO[str] | None = None) -> None:
    out = out if out is not None else sys.stdout
    with open(path, "rb") as f:
        data = f.read()
    out.write(f"File: {path} ({len(data)} bytes)\n")
    if data[:4] != storage.FILE_MAGIC:
        out.write("  !! bad file magic\n")
        return
    (version,) = struct.unpack_from("<I", data, 4)
    out.write(f"  magic=SYZL version={version}\n")
    pos = storage._HDR.size
    i = 0
    while pos + storage._REC_HDR.size <= len(data):
        magic, body_len = storage._REC_HDR.unpack_from(data, pos)
        end = pos + storage._REC_HDR.size + body_len + 4
        if magic != storage.REC_MAGIC or end > len(data):
            nxt = data.find(storage.REC_MAGIC, pos + 1)
            out.write(f"  [{i}] offset={pos} CORRUPT (resync to "
                      f"{nxt if nxt != -1 else 'EOF'})\n")
            if nxt == -1:
                break
            pos = nxt
            continue
        body = data[pos + storage._REC_HDR.size:end - 4]
        (crc,) = struct.unpack_from("<I", data, end - 4)
        crc_ok = zlib.crc32(body) == crc
        seq, flags, rec_id, streams = storage._decode_body(body)
        kind = "TOMBSTONE" if flags & 1 else "RECORD"
        out.write(f"  [{i}] offset={pos} len={end - pos} {kind} seq={seq} "
                  f"id={rec_id!r} streams={[len(s) for s in streams]} "
                  f"crc={'ok' if crc_ok else 'BAD'}\n")
        pos = end
        i += 1


def export_json(collection: Collection, out: IO[str]) -> None:
    opts = collection.options
    out.write("{\n  \"collection\": ")
    json.dump(json.loads(opts.to_json()), out, indent=2)
    out.write(",\n  \"records\": [")
    first = True
    for doc_id in collection.get_all_ids():
        doc = collection.get_document(doc_id)
        out.write("," if not first else "")
        first = False
        out.write("\n    {\"id\": %d, \"vector\": %s, \"metadata\": %s}" % (
            doc.id,
            json.dumps([float(v) for v in doc.vector]),
            doc.metadata.decode() if doc.metadata else "null"))
    out.write("\n  ]\n}\n")


def import_json(collection_name: str, reader: IO[str]) -> Collection:
    data = json.load(reader)
    if "collection" not in data:
        raise ValueError("export stream missing 'collection' options")
    copts = data["collection"]
    options = CollectionOptions(
        name=collection_name,
        distance_method=int(copts.get("distance_method", 0)),
        dimension_count=int(copts.get("dimension_count", 0)),
        quantization=int(copts.get("quantization", 64)),
        create_and_overwrite=True,
    )
    for extra in ("index_tables", "index_bits_per_table", "search_budget",
                  "index_seed"):
        if extra in copts:
            setattr(options, extra, copts[extra])
    collection = Collection(options)
    records = data.get("records", [])
    if records:
        collection.add_documents(
            [int(r["id"]) for r in records],
            [r["vector"] for r in records],
            [json.dumps(r.get("metadata")).encode() for r in records])
    return collection
