"""Provably-exact segment selection for precision="high" (VERDICT r2 weak
#1): the bf16 segment-min surface rounds minima to 8 mantissa bits, so on
adversarially clustered data hundreds of segments can collide at the k-th
minimum — more than any fixed selection margin.  fused_scan_topk now emits
a per-query provably-complete flag (the (S+1)-th smallest segmin must
exceed a provable threshold — see its EXACTNESS docstring) and the
Collection escalates the margin geometrically until every flag is 1, then
reranks the gathered rows at HIGHEST precision.

These corpora place ~300 segments whose true minima differ at the 1e-6
level (f32-distinct) but collapse to one bf16 value, with the TRUE winners
at high segment indices — a fixed-margin top-k (ties broken by low index)
provably drops them, which the first test demonstrates."""

import numpy as np
import pytest

import jax.numpy as jnp

from syzgydb_tpu.ops import distance as dist_ops
from syzgydb_tpu.ops import pallas_scan

SEG = pallas_scan.DEFAULT_SEG  # 64


def _tie_corpus(n, d, n_ties, tie_lo_seg, metric="cosine"):
    """One 'special' row per tied segment; true rank improves with the
    segment index, so low-index tie-breaking loses the winners."""
    rng = np.random.default_rng(9)
    db = np.zeros((n, d), dtype=np.float32)
    # background rows: cosine ~uniform well below the tie cluster
    bg = rng.standard_normal((n, d)).astype(np.float32)
    bg /= np.linalg.norm(bg, axis=1, keepdims=True)
    db[:] = bg
    db[:, 0] = np.abs(db[:, 0]) * 0.2  # keep cos(q, bg) < ~0.2
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    for i in range(n_ties):
        seg_j = tie_lo_seg + i
        row = seg_j * SEG
        cos = 0.7 + i * 1e-6  # larger index => closer to the query
        v = np.zeros(d, dtype=np.float32)
        v[0] = cos
        v[1] = np.sqrt(1.0 - cos * cos)
        db[row] = v
    q = np.zeros(d, dtype=np.float32)
    q[0] = 1.0
    return db, q


def test_fixed_margin_flags_incomplete_and_escalation_fixes(tmp_path):
    """The pre-fix failure mode: a fixed margin picks the LOWEST-index
    segments among the bf16-tied cluster, misses the true winners, and the
    provable flag says so; a margin covering the cluster restores
    exactness with the flag raised."""
    n, d, k = 65536, 16, 10
    n_ties = 300
    db, q = _tie_corpus(n, d, n_ties, tie_lo_seg=600)
    norms = dist_ops.db_row_stats(db, 32)
    valid = np.ones(n, dtype=bool)
    args = (jnp.asarray(q[None, :]), jnp.asarray(db), jnp.asarray(norms),
            jnp.asarray(valid))

    dist, rows, ok = pallas_scan.fused_scan_topk(
        *args, bits=32, metric="cosine", k=k, with_ties=True)
    # the flag reports the selection can NOT be proven complete...
    assert int(np.asarray(ok)[0]) == 0
    # ...and indeed the fixed margin lost the winners (true best rows are
    # the HIGHEST-index tied segments)
    want = {(600 + n_ties - 1 - i) * SEG for i in range(k)}
    got = set(int(r) for r in np.asarray(rows)[0])
    assert got != want, "corpus failed to defeat the fixed margin"

    # a margin covering the tie cluster restores provable exactness
    dist2, rows2, ok2 = pallas_scan.fused_scan_topk(
        *args, bits=32, metric="cosine", k=k,
        tie_margin=n_ties + 32, with_ties=True)
    assert int(np.asarray(ok2)[0]) == 1
    got2 = [int(r) for r in np.asarray(rows2)[0]]
    assert got2 == sorted(want, reverse=True), got2  # descending seg index
    d2 = np.asarray(dist2)[0]
    assert list(d2) == sorted(d2)


def test_collection_high_precision_escalates_to_exact(tmp_path, monkeypatch):
    """End-to-end: precision="high" through the Collection returns the
    exact f32 top-k on the adversarial corpus via automatic escalation."""
    from syzgydb_tpu import Collection, CollectionOptions, SearchArgs, COSINE

    n, d, k = 65536, 64, 10
    n_ties = 300
    db, q = _tie_corpus(n, d, n_ties, tie_lo_seg=600)
    assert n * d > 1 << 21  # stays off the host fast path

    monkeypatch.setattr(pallas_scan, "supported", lambda: True)
    calls = []
    orig = pallas_scan.fused_scan_topk

    def counting(*a, **kw):
        calls.append(kw.get("tie_margin"))
        return orig(*a, **kw)
    monkeypatch.setattr(pallas_scan, "fused_scan_topk", counting)

    c = Collection(CollectionOptions(
        name=str(tmp_path / "h.dat"), distance_method=COSINE,
        dimension_count=d, quantization=32, create_and_overwrite=True,
        index_seed=4))
    c.add_documents(list(range(n)), db.astype(np.float64), [b"{}"] * n)
    res = c.search(SearchArgs(vector=q, k=k, precision="high"))

    # escalation happened: first dispatch at the default margin, then
    # geometric re-dispatches until the flag proves completeness
    assert len(calls) >= 2, calls

    want_rows = [(600 + n_ties - 1 - i) * SEG for i in range(k)]
    assert [r.id for r in res.results] == want_rows
    dd = [r.distance for r in res.results]
    assert dd == sorted(dd)
    assert res.percent_searched == pytest.approx(100.0)
    c.close()


def test_margin_hint_skips_reescalation(tmp_path, monkeypatch):
    """Corpora that defeat the default margin on EVERY query (concentrated
    distances, e.g. iid high-D — the config-4 regression) must pay the
    escalation ladder once per collection, not once per search: the second
    search starts at the remembered margin and dispatches exactly once."""
    from syzgydb_tpu import Collection, CollectionOptions, SearchArgs, COSINE

    n, d, k = 65536, 64, 10
    n_ties = 300
    db, q = _tie_corpus(n, d, n_ties, tie_lo_seg=600)

    monkeypatch.setattr(pallas_scan, "supported", lambda: True)
    calls = []
    orig = pallas_scan.fused_scan_topk

    def counting(*a, **kw):
        calls.append(kw.get("tie_margin"))
        return orig(*a, **kw)
    monkeypatch.setattr(pallas_scan, "fused_scan_topk", counting)

    c = Collection(CollectionOptions(
        name=str(tmp_path / "hint.dat"), distance_method=COSINE,
        dimension_count=d, quantization=32, create_and_overwrite=True,
        index_seed=4))
    c.add_documents(list(range(n)), db.astype(np.float64), [b"{}"] * n)

    res1 = c.search(SearchArgs(vector=q, k=k, precision="high"))
    assert len(calls) >= 2, calls  # first search climbs the ladder
    final_margin = calls[-1]
    assert final_margin is not None and c._seg_margin_hint == final_margin

    calls.clear()
    res2 = c.search(SearchArgs(vector=q, k=k, precision="high"))
    assert calls == [final_margin]  # one dispatch, straight at the hint
    assert [r.id for r in res2.results] == [r.id for r in res1.results]

    # a fresh query on the same corpus also rides the hint
    calls.clear()
    q2 = np.roll(q, 1)
    c.search(SearchArgs(vector=q2, k=k, precision="high"))
    assert all(m == final_margin for m in calls), calls
    c.close()


def test_euclidean_tie_flagging():
    """The euclidean surrogate (squared distance) scales its provable
    threshold by the data magnitude; a collapsed cluster must trip the
    flag, and a covering margin must restore the exact ranking."""
    n, d, k = 16384, 16, 5
    n_ties = 100
    rng = np.random.default_rng(2)
    db = rng.uniform(2.0, 4.0, size=(n, d)).astype(np.float32)
    for i in range(n_ties):
        row = (50 + i) * SEG
        v = np.zeros(d, dtype=np.float32)
        v[0] = 1.0 + i * 1e-6  # squared-dist ties at ~1.0
        db[row] = v
    q = np.zeros(d, dtype=np.float32)
    norms = dist_ops.db_row_stats(db, 32)
    valid = np.ones(n, dtype=bool)
    dist, rows, ok = pallas_scan.fused_scan_topk(
        jnp.asarray(q[None, :]), jnp.asarray(db), jnp.asarray(norms),
        jnp.asarray(valid), bits=32, metric="euclidean", k=k,
        tie_margin=8, with_ties=True)
    assert int(np.asarray(ok)[0]) == 0
    dist2, rows2, ok2 = pallas_scan.fused_scan_topk(
        jnp.asarray(q[None, :]), jnp.asarray(db), jnp.asarray(norms),
        jnp.asarray(valid), bits=32, metric="euclidean", k=k,
        tie_margin=n_ties + 16, with_ties=True)
    assert int(np.asarray(ok2)[0]) == 1
    want = [(50 + i) * SEG for i in range(k)]  # ascending distance
    assert [int(r) for r in np.asarray(rows2)[0]] == want


def test_normal_data_no_escalation(tmp_path, monkeypatch):
    """On ordinary data the provable flag holds at the default margin —
    escalation must NOT fire (it would double every dispatch)."""
    n, d, k = 65536, 16, 10
    rng = np.random.default_rng(1)
    db = rng.standard_normal((n, d)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = db[17] + 0.05 * rng.standard_normal(d).astype(np.float32)
    norms = dist_ops.db_row_stats(db, 32)
    valid = np.ones(n, dtype=bool)
    dist, rows, ok = pallas_scan.fused_scan_topk(
        jnp.asarray(q[None, :]), jnp.asarray(db), jnp.asarray(norms),
        jnp.asarray(valid), bits=32, metric="cosine", k=k, with_ties=True)
    assert int(np.asarray(ok)[0]) == 1
    # and the selection matches the brute-force f32 oracle
    d_all = dist_ops.distance_np(np.float64(q)[None, :], np.float64(db),
                                 "cosine")
    want = set(np.argsort(d_all)[:k].tolist())
    assert set(int(r) for r in np.asarray(rows)[0]) == want
