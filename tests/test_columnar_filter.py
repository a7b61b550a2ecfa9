"""Vectorized columnar filters must agree row-for-row with the per-row
compiled-closure engine (build_filter), including its error-rejects-row
semantics (query/compiler.py parity notes)."""

import json

import numpy as np
import pytest

from syzgydb_tpu import build_filter
from syzgydb_tpu.query import columnar
from syzgydb_tpu.query.parser import parse_query


class FakeColumns:
    """Duck-typed stand-in for ColumnStore: metadata + valid + version."""

    def __init__(self, metas):
        self.size = len(metas)
        self.version = 1
        self.metadata = metas
        self.valid = np.ones(self.size, dtype=bool)


DOCS = [
    {"age": 30, "name": "alice", "tags": "red,blue", "score": 1.5,
     "active": True},
    {"age": 17.5, "name": "bob", "active": False, "nil": None},
    {"age": "thirty", "name": 42},             # wrong-typed fields
    {"name": "carol", "score": -2},            # missing age
    {"age": 31, "name": "dave", "score": 0},
    {},                                        # empty doc
    {"age": 30, "name": "eve", "score": 99.5},
]
METAS = [json.dumps(d).encode() for d in DOCS] + [b"not json"]

QUERIES = [
    "age == 30",
    "age != 30",
    "age > 18",
    "age >= 17.5",
    "age < 31",
    "18 < age",
    "name == 'alice'",
    "name != 'alice'",
    "name > 'b'",
    "active == true",
    "active != false",
    "nil == null",
    "missing == null",
    "score >= 0 AND age > 20",
    "age > 18 AND name < 'd'",
    "age > 100 OR name == 'carol'",
    "name == 'bob' OR age == 30",
    "age > 18 OR score > 50",        # right-side error on some rows
    "NOT (age > 18)",
    "name STARTS_WITH 'a'",
    "name ENDS_WITH 'e'",
    "name CONTAINS 'o'",
    "name MATCHES '^[ab]'",
    "age IN [30, 31]",
    "age NOT IN [30]",
    "name IN ['alice', 'dave']",
    "age EXISTS",
    "age DOES NOT EXIST",
    "score EXISTS AND score < 2",
]


@pytest.mark.parametrize("query", QUERIES)
def test_vectorized_matches_per_row_oracle(query):
    cols = FakeColumns(METAS)
    engine = columnar.ColumnarFilterEngine()
    got = engine.evaluate(query, cols)
    assert got is not None, f"expected {query!r} to vectorize"
    flt = build_filter(query)
    want = np.array([flt(i, m) for i, m in enumerate(METAS)])
    np.testing.assert_array_equal(got, want, err_msg=query)


@pytest.mark.parametrize("query", [
    "user.name == 'x'",          # nested path
    "tags[0] == 'red'",          # array index
    "ANY(items, x == 1)",        # quantifier
    "LENGTH(name) == 3",         # function
    "name == :param",            # parameter
])
def test_unsupported_shapes_fall_back(query):
    engine = columnar.ColumnarFilterEngine()
    assert engine.evaluate(query, FakeColumns(METAS)) is None


def test_non_dict_metadata_falls_back():
    metas = METAS + [b"[1, 2, 3]"]
    engine = columnar.ColumnarFilterEngine()
    assert engine.evaluate("age == 30", FakeColumns(metas)) is None


def test_array_valued_field_falls_back():
    metas = [json.dumps({"age": [1, 2]}).encode()] + METAS
    engine = columnar.ColumnarFilterEngine()
    assert engine.evaluate("age == 30", FakeColumns(metas)) is None


def test_projection_cached_across_queries():
    cols = FakeColumns(METAS)
    engine = columnar.ColumnarFilterEngine()
    engine.evaluate("age == 30", cols)
    parsed = dict(engine._cols)
    engine.evaluate("age > 18", cols)  # same field: no re-projection
    assert engine._cols["age"] is parsed["age"]
    cols.version += 1  # mutation invalidates
    engine.evaluate("age == 30", cols)
    assert engine._cols["age"] is not parsed["age"]


def test_collection_filtered_search_uses_vectorized_path(tmp_path, rng):
    from syzgydb_tpu import Collection, CollectionOptions, SearchArgs
    c = Collection(CollectionOptions(
        name=str(tmp_path / "cf.dat"), dimension_count=4, quantization=8,
        create_and_overwrite=True, index_seed=9))
    n = 400
    vecs = rng.uniform(-1, 1, size=(n, 4))
    metas = [json.dumps({"cat": i % 5, "name": f"doc{i}"}).encode()
             for i in range(n)]
    c.add_documents(list(range(n)), vecs, metas)
    q = rng.uniform(-1, 1, size=4)
    res = c.search(SearchArgs(vector=q, k=5, precision="exact",
                              filter_query="cat == 2 AND name ENDS_WITH '7'"))
    assert res.results
    for r in res.results:
        md = json.loads(r.metadata)
        assert md["cat"] == 2 and md["name"].endswith("7")
    # oracle comparison against the per-row engine
    flt = build_filter("cat == 2 AND name ENDS_WITH '7'")
    want_ids = {i for i in range(n) if flt(i, metas[i])}
    assert {r.id for r in res.results} <= want_ids
    c.close()
