"""Streaming JSON import + reference .dat migration tests (round 4).

Covers VERDICT r3 items 4 (streaming import at bounded RSS — the
reference streams via json.Decoder tokens, dump.go:138-217) and 5
(read-only importer for the reference span-file grammar,
spanfile.go:1-22, 679-817)."""

import io
import json
import resource
import struct
import zlib

import numpy as np
import pytest

from syzgydb_tpu import Collection, CollectionOptions, COSINE, EUCLIDEAN
from syzgydb_tpu.ops import quantize as qz
from syzgydb_tpu.tools import refimport
from syzgydb_tpu.tools.dump import import_json


class _LazyExportReader(io.TextIOBase):
    """Synthesizes a big export stream record-by-record so the TEST never
    materializes it either — import reads it like a file."""

    def __init__(self, n_records: int, dims: int, quant: int):
        self._gen = self._chunks(n_records, dims, quant)
        self._buf = ""

    @staticmethod
    def _chunks(n, dims, quant):
        yield ('{\n  "collection": ' + json.dumps(
            {"name": "big", "distance_method": 1, "dimension_count": dims,
             "quantization": quant, "index_seed": 3}) + ',\n  "records": [')
        for i in range(n):
            vec = [((i * 31 + j * 7) % 200 - 100) / 100.0
                   for j in range(dims)]
            yield ("," if i else "") + json.dumps(
                {"id": i, "vector": vec, "metadata": {"i": i}})
        yield "]\n}\n"

    def read(self, size=-1):
        while (size < 0 or len(self._buf) < size):
            nxt = next(self._gen, None)
            if nxt is None:
                break
            self._buf += nxt
        if size < 0:
            out, self._buf = self._buf, ""
        else:
            out, self._buf = self._buf[:size], self._buf[size:]
        return out


def test_streaming_import_bounded_rss(tmp_path):
    """100k-row import runs at bounded peak RSS (VERDICT item 4 'done'
    criterion): the whole-document json.load this replaces held ~60
    bytes/float -> ~500MB for this stream; the streaming reader holds one
    10k-row chunk."""
    n, dims, quant = 100_000, 8, 8
    dst = str(tmp_path / "big.dat")
    rss_before_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    coll = import_json(dst, _LazyExportReader(n, dims, quant))
    rss_after_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    try:
        assert coll.get_document_count() == n
        # spot-check round-trip correctness at both ends
        for i in (0, 1, n // 2, n - 1):
            doc = coll.get_document(i)
            vec = np.array([((i * 31 + j * 7) % 200 - 100) / 100.0
                            for j in range(dims)])
            np.testing.assert_allclose(
                doc.vector, qz.quantization_roundtrip(vec[None], quant)[0],
                atol=1e-12)
            assert json.loads(doc.metadata) == {"i": i}
        # peak-RSS growth during import stays far under the ~500MB a
        # whole-document parse would need (ru_maxrss is monotone; earlier
        # tests in the same process can only make this check stricter)
        assert rss_after_kb - rss_before_kb < 200_000, (
            rss_before_kb, rss_after_kb)
    finally:
        coll.close()


def test_streaming_import_chunked_adds(tmp_path):
    """Records are fed to add_documents in bounded chunks."""
    calls = []
    orig = Collection.add_documents

    def spy(self, ids, vecs, metas):
        calls.append(len(ids))
        return orig(self, ids, vecs, metas)

    Collection.add_documents = spy
    try:
        coll = import_json(str(tmp_path / "c.dat"),
                           _LazyExportReader(2_500, 4, 64), batch_rows=1000)
        coll.close()
    finally:
        Collection.add_documents = orig
    assert calls == [1000, 1000, 500]


def test_streaming_import_malformed(tmp_path):
    with pytest.raises(ValueError, match="collection"):
        import_json(str(tmp_path / "x.dat"),
                    io.StringIO('{"records": []}'))
    with pytest.raises(json.JSONDecodeError):
        import_json(str(tmp_path / "y.dat"),
                    io.StringIO('{"collection": {"dimension_count": 2}, '
                                '"records": [{"id": 0, "vector": [0, 1'))


def test_streaming_import_empty_records(tmp_path):
    coll = import_json(str(tmp_path / "e.dat"), io.StringIO(
        '{"collection": {"dimension_count": 3, "quantization": 8},'
        ' "records": []}'))
    try:
        assert coll.get_document_count() == 0
        assert coll.quantization == 8
    finally:
        coll.close()


# ---------------------------------------------------------------------------
# Reference .dat importer
# ---------------------------------------------------------------------------


def _ref_options(dims, quant, metric=EUCLIDEAN):
    # shape of the reference's stored options JSON (collection.go:258-272)
    return {"name": "ref.dat", "distance_method": int(metric),
            "dimension_count": dims, "quantization": quant}


@pytest.mark.parametrize("quant", [64, 8])
def test_import_ref_roundtrip(tmp_path, rng, quant):
    """Golden test against a fixture .dat built by the byte-level writer
    replicating serializeSpan (VERDICT item 5 'done' criterion)."""
    dims = 6
    records = [(i, rng.uniform(-1, 1, size=dims),
                json.dumps({"i": i}).encode()) for i in range(20)]
    blob = refimport.build_ref_file(_ref_options(dims, quant), records,
                                    quant, free_gaps=True)
    dat = tmp_path / "ref.dat"
    dat.write_bytes(blob)

    coll = refimport.import_ref_file(str(dat), str(tmp_path / "native.dat"))
    try:
        assert coll.get_document_count() == 20
        assert coll.quantization == quant
        assert coll.metric == "euclidean"
        for i, vec, meta in records:
            doc = coll.get_document(i)
            np.testing.assert_allclose(
                doc.vector, qz.quantization_roundtrip(
                    np.asarray(vec)[None], quant)[0], atol=0)
            assert doc.metadata == meta
        # imported data is searchable
        from syzgydb_tpu import SearchArgs
        res = coll.search(SearchArgs(vector=records[3][1], k=1,
                                     precision="exact"))
        assert res.results[0].id == 3
    finally:
        coll.close()


def test_import_ref_superseding_and_corruption(tmp_path):
    """Highest-seq wins per ID; CRC-corrupt spans are skipped by length;
    a zero-magic tail ends the scan (scanFile semantics)."""
    dims, quant = 4, 8
    v_old = np.array([0.1, 0.2, 0.3, 0.4])
    v_new = np.array([-0.5, 0.5, -0.5, 0.5])
    out = bytearray()
    out += refimport.build_ref_span(
        0, "", [(0, json.dumps(_ref_options(dims, quant)).encode())])
    out += refimport.build_ref_span(
        1, "7", [(0, b'{"v": "old"}'), (1, qz.pack_vector(v_old, quant))])
    # corrupt span: valid length, bad CRC — must be skipped, not resynced
    bad = bytearray(refimport.build_ref_span(
        2, "8", [(0, b"{}"), (1, qz.pack_vector(v_old, quant))]))
    bad[-1] ^= 0xFF
    out += bad
    # superseding version of record 7 (higher seq)
    out += refimport.build_ref_span(
        5, "7", [(0, b'{"v": "new"}'), (1, qz.pack_vector(v_new, quant))])
    # zero-magic tail = free space to EOF
    out += b"\0" * 64
    dat = tmp_path / "ref2.dat"
    dat.write_bytes(bytes(out))

    coll = refimport.import_ref_file(str(dat), str(tmp_path / "n2.dat"))
    try:
        assert sorted(coll.get_all_ids()) == [7]
        doc = coll.get_document(7)
        assert doc.metadata == b'{"v": "new"}'
        np.testing.assert_allclose(
            doc.vector, qz.quantization_roundtrip(v_new[None], quant)[0],
            atol=0)
    finally:
        coll.close()


def test_import_ref_no_options_span(tmp_path):
    """Missing options record: dimension inferred from the first vector."""
    dims, quant = 5, 64
    v = np.array([0.1, -0.2, 0.3, -0.4, 0.5])
    out = refimport.build_ref_span(
        1, "1", [(0, b"null"), (1, qz.pack_vector(v, quant))])
    dat = tmp_path / "ref3.dat"
    dat.write_bytes(out)
    coll = refimport.import_ref_file(str(dat), str(tmp_path / "n3.dat"))
    try:
        assert coll.dimension_count == dims
        np.testing.assert_allclose(coll.get_document(1).vector, v, atol=0)
    finally:
        coll.close()


def test_import_ref_bad_magic(tmp_path):
    dat = tmp_path / "junk.dat"
    dat.write_bytes(b"JUNKJUNKJUNKJUNK")
    with pytest.raises(ValueError, match="bad magic"):
        refimport.import_ref_file(str(dat), str(tmp_path / "n4.dat"))


def test_cli_import_ref(tmp_path, rng, capsys):
    from syzgydb_tpu.tools.cli import main
    dims, quant = 3, 8
    records = [(1, np.array([0.1, 0.2, 0.3]), b'{"x": 1}')]
    dat = tmp_path / "r.dat"
    dat.write_bytes(refimport.build_ref_file(
        _ref_options(dims, quant, COSINE), records, quant))
    dst = str(tmp_path / "out.dat")
    assert main(["--import-ref", str(dat), "--output", dst,
                 "--data-folder", str(tmp_path)]) == 0
    assert "Imported 1 records" in capsys.readouterr().out
    coll = Collection(CollectionOptions(name=dst, dimension_count=dims))
    try:
        assert coll.get_document_count() == 1
        assert coll.metric == "cosine"
    finally:
        coll.close()
