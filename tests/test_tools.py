"""Export/Import round-trip and dump tests (dump_test.go:11-297 analog)."""

import io
import json

import numpy as np
import pytest

from syzgydb_tpu import Collection, CollectionOptions, COSINE
from syzgydb_tpu.tools.dump import dump_index, export_json, import_json


@pytest.mark.parametrize("quant", [64, 32, 8, 4])
def test_export_import_roundtrip(tmp_path, rng, quant):
    src = str(tmp_path / "src.dat")
    dst = str(tmp_path / "dst.dat")
    c = Collection(CollectionOptions(
        name=src, distance_method=COSINE, dimension_count=6,
        quantization=quant, create_and_overwrite=True, index_seed=5))
    vecs = rng.uniform(-1, 1, size=(25, 6))
    c.add_documents(list(range(25)), vecs,
                    [json.dumps({"i": i, "tag": ["a", "b"]}).encode()
                     for i in range(25)])

    buf = io.StringIO()
    export_json(c, buf)
    exported = json.loads(buf.getvalue())
    assert exported["collection"]["quantization"] == quant
    assert len(exported["records"]) == 25

    c2 = import_json(dst, io.StringIO(buf.getvalue()))
    assert c2.quantization == quant
    assert c2.metric == "cosine"
    assert c2.get_document_count() == 25
    for i in range(25):
        d1, d2 = c.get_document(i), c2.get_document(i)
        # vectors go through a float JSON round-trip; quantized values match
        np.testing.assert_allclose(d2.vector, d1.vector, atol=1e-12)
        assert json.loads(d2.metadata) == json.loads(d1.metadata)

    # reopen the imported collection from disk
    c2.close()
    c3 = Collection(CollectionOptions(name=dst, dimension_count=6))
    assert c3.get_document_count() == 25
    c3.close()
    c.close()


@pytest.mark.parametrize("quant", [64, 32, 16, 8, 4])
def test_compact_export_import_bit_identical(tmp_path, rng, quant):
    """Compact (packed+b64) exports restore BIT-IDENTICAL storage at every
    width: same span-log stream bytes, same host codes, same search
    results (VERDICT r4 weak #6 — fast restore for our own exports)."""
    src = str(tmp_path / "src.dat")
    dst = str(tmp_path / "dst.dat")
    dims = 7  # odd: exercises the 4-bit pad nibble
    c = Collection(CollectionOptions(
        name=src, distance_method=COSINE, dimension_count=dims,
        quantization=quant, create_and_overwrite=True, index_seed=5))
    vecs = rng.uniform(-1, 1, size=(40, dims))
    c.add_documents(list(range(40)), vecs,
                    [json.dumps({"i": i}).encode() for i in range(40)])

    buf = io.StringIO()
    export_json(c, buf, compact=True)
    exported = json.loads(buf.getvalue())
    assert exported["collection"]["vector_encoding"] == "packed+b64"
    assert all(isinstance(r["vector"], str) for r in exported["records"])

    c2 = import_json(dst, io.StringIO(buf.getvalue()))
    assert c2.get_document_count() == 40
    # the marker must not leak into the restored collection's options
    assert "vector_encoding" not in c2.options.to_json().decode()
    for i in range(40):
        s1, s2 = c.spanlog.read(str(i)), c2.spanlog.read(str(i))
        assert bytes(s1[1]) == bytes(s2[1]), f"stream bytes differ, id {i}"
        assert bytes(s1[0]) == bytes(s2[0])
    np.testing.assert_array_equal(
        c.columns.codes[:40], c2.columns.codes[:40])
    from syzgydb_tpu import SearchArgs
    q = rng.uniform(-1, 1, size=dims)
    r1 = c.search(SearchArgs(vector=q, k=5, precision="exact"))
    r2 = c2.search(SearchArgs(vector=q, k=5, precision="exact"))
    assert [x.id for x in r1.results] == [x.id for x in r2.results]
    assert [x.distance for x in r1.results] == \
        [x.distance for x in r2.results]
    c2.close()
    # reopen from disk
    c3 = Collection(CollectionOptions(name=dst, dimension_count=dims))
    assert c3.get_document_count() == 40
    c3.close()
    c.close()


def test_compact_import_rejects_wrong_payload(tmp_path, rng):
    c = Collection(CollectionOptions(
        name=str(tmp_path / "w.dat"), dimension_count=4, quantization=8,
        create_and_overwrite=True))
    c.add_documents([1], np.zeros((1, 4)), [b"{}"])
    buf = io.StringIO()
    export_json(c, buf, compact=True)
    c.close()
    bad = buf.getvalue().replace('"vector": "', '"vector": "AAAA')
    with pytest.raises(ValueError):
        import_json(str(tmp_path / "w2.dat"), io.StringIO(bad))
    unknown = buf.getvalue().replace("packed+b64", "mystery")
    with pytest.raises(ValueError, match="vector_encoding"):
        import_json(str(tmp_path / "w3.dat"), io.StringIO(unknown))


def test_export_empty_collection(tmp_path):
    c = Collection(CollectionOptions(
        name=str(tmp_path / "e.dat"), dimension_count=3,
        create_and_overwrite=True))
    buf = io.StringIO()
    export_json(c, buf)
    data = json.loads(buf.getvalue())
    assert data["records"] == []
    c.close()


def test_dump_index_output(tmp_path, rng):
    p = str(tmp_path / "d.dat")
    c = Collection(CollectionOptions(name=p, dimension_count=3,
                                     create_and_overwrite=True))
    c.add_document(1, [0.1, 0.2, 0.3], b'{"x": 1}')
    c.add_document(2, [0.4, 0.5, 0.6], b'{}')
    c.remove_document(2)
    c.close()
    buf = io.StringIO()
    dump_index(p, buf)
    out = buf.getvalue()
    assert "magic=SYZL" in out
    assert "id=''" in out          # options record
    assert "id='1'" in out
    assert "TOMBSTONE" in out      # deletion marker for id 2
    assert "BAD" not in out        # all CRCs valid


def test_cli_dump_export_import(tmp_path, rng, capsys):
    from syzgydb_tpu.tools.cli import main
    src = str(tmp_path / "src.dat")
    c = Collection(CollectionOptions(name=src, dimension_count=3,
                                     create_and_overwrite=True))
    c.add_document(1, [0.1, 0.2, 0.3], b'{"x": 1}')
    c.close()

    assert main(["--dump", src, "--data-folder", str(tmp_path)]) == 0
    assert "RECORD" in capsys.readouterr().out

    assert main(["--export", src, "--data-folder", str(tmp_path)]) == 0
    exported = capsys.readouterr().out
    assert json.loads(exported)["records"][0]["id"] == 1

    exp_file = tmp_path / "exp.json"
    exp_file.write_text(exported)
    dst = str(tmp_path / "dst.dat")
    assert main(["--import", str(exp_file), "--output", dst,
                 "--data-folder", str(tmp_path)]) == 0
    c2 = Collection(CollectionOptions(name=dst, dimension_count=3))
    assert c2.get_document_count() == 1
    c2.close()


@pytest.mark.parametrize("quant", [4, 8, 16])
def test_export_code_table_text_identical(tmp_path, rng, quant):
    """The code-table fast serializer must emit byte-identical JSON to the
    per-value json.dumps path (same dequant values, same list format)."""
    import numpy as np
    from syzgydb_tpu import Collection, CollectionOptions
    d = 7  # odd: exercises the 4-bit pad-nibble drop
    c = Collection(CollectionOptions(
        name=str(tmp_path / f"ct{quant}.dat"), dimension_count=d,
        quantization=quant, create_and_overwrite=True, index_seed=2))
    vecs = rng.uniform(-1.2, 1.2, size=(40, d))
    c.add_documents(list(range(40)), vecs,
                    [b'{"k": 1}'] * 39 + [b""])
    fast = io.StringIO()
    export_json(c, fast)
    # oracle: the original per-record loop
    slow = io.StringIO()
    opts = c.options
    slow.write("{\n  \"collection\": ")
    json.dump(json.loads(opts.to_json()), slow, indent=2)
    slow.write(",\n  \"records\": [")
    first = True
    for doc_id in c.get_all_ids():
        doc = c.get_document(doc_id)
        slow.write("," if not first else "")
        first = False
        slow.write("\n    {\"id\": %d, \"vector\": %s, \"metadata\": %s}" % (
            doc.id, json.dumps([float(v) for v in doc.vector]),
            doc.metadata.decode() if doc.metadata else "null"))
    slow.write("\n  ]\n}\n")
    assert fast.getvalue() == slow.getvalue()
    c.close()


def test_export_uint64_ids(tmp_path, rng):
    """Doc ids above 2**63 must export (review finding: the bulk path's
    int64 id array overflowed where the old per-record loop worked)."""
    from syzgydb_tpu import Collection, CollectionOptions
    c = Collection(CollectionOptions(
        name=str(tmp_path / "big.dat"), dimension_count=4, quantization=8,
        create_and_overwrite=True, index_seed=1))
    big = 2**63 + 5
    c.add_documents([1, big], rng.uniform(-1, 1, (2, 4)), [b"{}"] * 2)
    buf = io.StringIO()
    export_json(c, buf)
    recs = json.loads(buf.getvalue())["records"]
    assert {r["id"] for r in recs} == {1, big}
    c.close()


def test_export_during_concurrent_mutations(tmp_path, rng):
    """export_json's bulk snapshot (spanlog image + index under the lock)
    must produce a parseable, internally consistent export while writer
    threads churn the collection."""
    import threading
    from syzgydb_tpu import Collection, CollectionOptions
    c = Collection(CollectionOptions(
        name=str(tmp_path / "concur.dat"), dimension_count=8,
        quantization=8, create_and_overwrite=True, index_seed=4))
    c.add_documents(list(range(200)), rng.uniform(-1, 1, (200, 8)),
                    [b'{"v": 0}'] * 200)
    stop = threading.Event()

    def mutator():
        i = 200
        r = np.random.default_rng(1)
        while not stop.is_set():
            c.add_documents([i], r.uniform(-1, 1, (1, 8)), [b'{"v": 1}'])
            c.remove_document(i - 200)
            i += 1

    th = threading.Thread(target=mutator)
    th.start()
    try:
        for _ in range(5):
            buf = io.StringIO()
            export_json(c, buf)
            data = json.loads(buf.getvalue())  # parseable
            recs = data["records"]
            assert len(recs) >= 190  # ~200 live at any snapshot
            ids = [r["id"] for r in recs]
            assert ids == sorted(ids) and len(set(ids)) == len(ids)
            for r in recs[:5]:
                assert len(r["vector"]) == 8
    finally:
        stop.set()
        th.join()
    c.close()
