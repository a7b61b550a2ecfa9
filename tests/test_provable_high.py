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

SEG = pallas_scan.DEFAULT_SEG


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
    # keep the CPU run off the real ilv kernel (interpret-only here)
    monkeypatch.setattr(pallas_scan, "ilv_supported",
                        lambda *a, **k: False)
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
    # keep the CPU run off the real ilv kernel (interpret-only here)
    monkeypatch.setattr(pallas_scan, "ilv_supported",
                        lambda *a, **k: False)
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
    assert final_margin is not None
    # single-query batches can't distinguish an outlier from a structural
    # corpus by fraction: the streak gate withholds the hint until
    # _HINT_STREAK consecutive searches needed escalation (r4/ADVICE r3)
    assert c._seg_margin_hint is None
    for _ in range(Collection._HINT_STREAK - 1):
        c.search(SearchArgs(vector=q, k=k, precision="high"))
    assert c._seg_margin_hint == final_margin

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


def test_outlier_query_does_not_poison_margin_hint(tmp_path, monkeypatch):
    """One adversarial query inside a large batch escalates ITS dispatch,
    but must not raise the collection's persistent margin hint — otherwise
    a single unlucky query taxes every future search with the escalated
    rerank width forever (Collection._HINT_FAIL_FRAC gate).  Structural
    failures (the whole batch trips the flag — the config-4 iid pattern)
    still record the hint: test_margin_hint_skips_reescalation."""
    from syzgydb_tpu import Collection, CollectionOptions, SearchArgs, COSINE

    n, d, k = 65536, 64, 10
    n_ties = 300
    db, q_adv = _tie_corpus(n, d, n_ties, tie_lo_seg=600)

    # overwrite the (iid, hence distance-concentrated) background with a
    # CLUSTERED one: iid high-D backgrounds trip the flag structurally
    # for ordinary queries too (the config-4 pattern), which is exactly
    # what this test must exclude.  Rows spread over 128 well-separated
    # centers with per-row noise magnitudes in [0.1, 0.5], so every
    # query's rank-10 boundary gap (~1e-3 surrogate) dwarfs the surface
    # error bound; tie segments 600..909 are left in place.
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((128, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, 128, size=n)
    noise = rng.standard_normal((n, d)).astype(np.float32)
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    scale = rng.uniform(0.1, 0.5, size=(n, 1)).astype(np.float32)
    bg = centers[assign] + scale * noise
    bg /= np.linalg.norm(bg, axis=1, keepdims=True)
    tie_rows = np.arange(600 * SEG, (600 + n_ties) * SEG, SEG)
    saved = db[tie_rows].copy()
    db = bg
    db[tie_rows] = saved

    monkeypatch.setattr(pallas_scan, "supported", lambda: True)
    # keep the CPU run off the real ilv kernel (interpret-only here)
    monkeypatch.setattr(pallas_scan, "ilv_supported",
                        lambda *a, **k: False)

    c = Collection(CollectionOptions(
        name=str(tmp_path / "poison.dat"), distance_method=COSINE,
        dimension_count=d, quantization=32, create_and_overwrite=True,
        index_seed=4))
    c.add_documents(list(range(n)), db.astype(np.float64), [b"{}"] * n)

    # batch of 128 ordinary queries (bf16-exact so the per-query surface
    # error bound is ~0) + ONE adversarial: fail fraction 1/129 << 1%
    import jax.numpy as jnp_
    normal = np.asarray(jnp_.asarray(centers).astype(jnp_.bfloat16),
                        dtype=np.float32)
    batch = [SearchArgs(vector=v, k=k, precision="high") for v in normal]
    batch.append(SearchArgs(vector=q_adv, k=k, precision="high"))
    out = c.search_many(batch)

    # the adversarial member still got the exact answer via escalation...
    want = [(600 + n_ties - 1 - i) * SEG for i in range(k)]
    assert [r.id for r in out[-1].results] == want
    # ...but the one-off failure did not poison the persistent hint
    assert c._seg_margin_hint is None
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


def test_note_margin_ignores_large_k(tmp_path):
    """Large-k (radius-escalation) dispatches must never write the
    serving-class margin hint: their tie density is a property of k, not
    the corpus (r3.7 review)."""
    from syzgydb_tpu import Collection, CollectionOptions, COSINE
    c = Collection(CollectionOptions(
        name=str(tmp_path / "nm.dat"), distance_method=COSINE,
        dimension_count=8, quantization=8, create_and_overwrite=True,
        index_seed=1))
    assert c._seg_margin_hint is None
    c._note_margin(64, 1.0, kk=pallas_scan.MAX_FUSED_K + 1)
    assert c._seg_margin_hint is None        # large-k: ignored
    c._note_margin(64, 1e-4, kk=10)
    assert c._seg_margin_hint is None        # outlier fraction: ignored
    c._note_margin(64, 1.0, kk=10)
    assert c._seg_margin_hint == 64          # structural serving-class
    c._note_margin(8, 1.0, kk=10)
    assert c._seg_margin_hint == 64          # monotone max
    c.close()


def test_note_margin_small_batch_streak(tmp_path):
    """Small real-query batches need _HINT_STREAK consecutive structural
    failures before the hint is trusted: a lone REST query that trips the
    flag (fail_frac 1.0 over 1 real query) must not poison the hint, while
    a config-4-style corpus that fails every single-query search earns it
    after the streak (r4/ADVICE r3 — pads no longer inflate the fraction,
    and fraction alone is meaningless at batch 1)."""
    from syzgydb_tpu import Collection, CollectionOptions, COSINE
    c = Collection(CollectionOptions(
        name=str(tmp_path / "st.dat"), distance_method=COSINE,
        dimension_count=8, quantization=8, create_and_overwrite=True,
        index_seed=1))
    # one lone-query failure: streak 1 < 3 — no hint
    c._note_margin(64, 1.0, kk=10, n_real=1)
    assert c._seg_margin_hint is None
    # a clean search in between resets the streak
    c._note_margin(None, 0.0, kk=10, n_real=1)
    c._note_margin(64, 1.0, kk=10, n_real=1)
    c._note_margin(64, 1.0, kk=10, n_real=1)
    assert c._seg_margin_hint is None        # streak 2 after reset
    c._note_margin(64, 1.0, kk=10, n_real=1)
    assert c._seg_margin_hint == 64          # streak 3: structural
    # large real batches set the hint immediately (fraction is meaningful)
    c._seg_margin_hint = None
    c._hint_fail_streak = 0
    c._note_margin(512, 1.0, kk=10, n_real=Collection._HINT_MIN_BATCH)
    assert c._seg_margin_hint == 512
    c.close()


def test_will_use_ilv_predicate():
    """The shared predicate's contract: batch cap, exact-off-kernel,
    interpret override."""
    f = pallas_scan.will_use_ilv
    assert f(True, 1024, False)
    assert not f(False, 1024, False)
    assert not f(True, pallas_scan._ILV_MAX_Q + 1, False)
    assert not f(True, 8, True)              # exact stays on XLA...
    assert f(True, 8, True, interpret=True)  # ...except under interpret
    assert pallas_scan.fused_k_ok(10, 4096)
    assert pallas_scan.fused_k_ok(1024, 8)
    assert not pallas_scan.fused_k_ok(1024, 1024)
    assert not pallas_scan.fused_k_ok(2000, 1)


def test_ilv_f32_bridge_fails_closed_on_ties():
    """The ilv surface's tightened bridge (surf_f32: no bf16 half-ulp
    factors) must still FAIL CLOSED on tie-heavy data — a small margin
    trips the flag, a covering margin restores the exact ranking.  Pins
    the soundness of the margin-8 default against over-tightening."""
    n, d, k = 16384, 128, 5
    n_ties = 100
    rng = np.random.default_rng(2)
    db = rng.uniform(2.0, 4.0, size=(n, d)).astype(np.float32)
    for i in range(n_ties):
        row = (50 + i) * SEG
        v = np.zeros(d, dtype=np.float32)
        v[0] = 1.0 + i * 1e-6
        db[row] = v
    q = np.zeros(d, dtype=np.float32)
    norms = dist_ops.db_row_stats(db, 32)
    valid = np.ones(n, dtype=bool)
    ilv = jnp.asarray(pallas_scan.make_ilv_codes(db))
    dist, rows, ok = pallas_scan.fused_scan_topk(
        jnp.asarray(q[None, :]), jnp.asarray(db), jnp.asarray(norms),
        jnp.asarray(valid), None, ilv, bits=32, metric="euclidean", k=k,
        tie_margin=8, with_ties=True, interpret=True)
    assert int(np.asarray(ok)[0]) == 0
    dist2, rows2, ok2 = pallas_scan.fused_scan_topk(
        jnp.asarray(q[None, :]), jnp.asarray(db), jnp.asarray(norms),
        jnp.asarray(valid), None, ilv, bits=32, metric="euclidean", k=k,
        tie_margin=n_ties + 16, with_ties=True, interpret=True)
    assert int(np.asarray(ok2)[0]) == 1
    want = [(50 + i) * SEG for i in range(k)]
    assert [int(r) for r in np.asarray(rows2)[0]] == want


def test_zero_cosine_query_flag_trivially_complete():
    """A zero cosine query scores every row at exactly 1.0 (reference
    zero-vector semantics) — any k rows are the true top-k, so the
    provable flag must hold rather than escalate to a full gather.  This
    was a latent bug: search_many's shape-bucketing used to pad batches
    with ZERO queries whose degenerate error bound failed the flag on
    every dispatch (now it pads with copies of a real query, and the
    zero-query gate here covers genuine zero-vector searches)."""
    n, d, k = 16384, 16, 5
    rng = np.random.default_rng(3)
    db = rng.standard_normal((n, d)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    norms = dist_ops.db_row_stats(db, 32)
    valid = np.ones(n, dtype=bool)
    q = np.zeros((8, d), dtype=np.float32)
    q[0] = db[7]  # one real query among zero pads, like a bucketed batch
    dist, rows, ok = pallas_scan.fused_scan_topk(
        jnp.asarray(q), jnp.asarray(db), jnp.asarray(norms),
        jnp.asarray(valid), bits=32, metric="cosine", k=k, with_ties=True)
    assert np.asarray(ok).tolist() == [1] * 8
    # zero queries: all distances exactly the zero-vector distance 1.0
    assert np.allclose(np.asarray(dist)[1:], 1.0)
    # euclidean zero queries rank by ||v|| — flag evaluated normally and
    # the ranking is genuine
    dist_e, rows_e, ok_e = pallas_scan.fused_scan_topk(
        jnp.asarray(np.zeros((1, d), np.float32)), jnp.asarray(db),
        jnp.asarray(norms), jnp.asarray(valid), bits=32,
        metric="euclidean", k=k, with_ties=True)
    want = np.argsort(np.sum(db.astype(np.float64) ** 2, axis=1),
                      kind="stable")[:k]
    if int(np.asarray(ok_e)[0]) == 1:
        assert set(int(r) for r in np.asarray(rows_e)[0]) == set(
            want.tolist())


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
