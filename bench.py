"""Headline benchmark (BASELINE.json north-star config 2):

    1M x 384-d, cosine, 8-bit quantization, top-10 — QPS/chip + recall@10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Paths measured (all through the same kernels Collection dispatches to):
  * precision "high": exhaustive segment-min scan (bf16 MXU pass + exact
    f32 rerank of winning segments) at batch 1024 — exact results,
    headline throughput (ops/pallas_scan.fused_scan_topk).
  * precision "medium": sketch-prefiltered ANN at batch 64 with a candidate
    budget sweep (index/hamming.py).
  * recall ground truth: full-f32 (HIGHEST) exhaustive pipeline.

vs_baseline: the reference (smhanov/syzgydb) publishes no numbers and no Go
toolchain exists in this image (BASELINE.md), so the baseline is a measured
host-side float32 NumPy/BLAS exhaustive scan of the same workload on this
machine — a *stronger* baseline than the reference's per-record
decode+distance Go loop, so the reported ratio is conservative.
"""

import json
import sys
import time

import numpy as np


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    from syzgydb_tpu.utils.hostmem import tune_host_allocator
    from syzgydb_tpu.utils.platform import (normalize_jax_platforms,
                                            require_accelerator)
    tune_host_allocator()
    normalize_jax_platforms()
    import jax
    import jax.numpy as jnp
    require_accelerator()

    # persistent XLA compile cache: repeat runs skip compilation
    from syzgydb_tpu.utils import xla_cache
    xla_cache.enable()

    # tunnel-mode fingerprint for the output JSON: dependent-chain RTT on a
    # tiny program (~33 ms/step healthy, 90-100 ms in the common degraded
    # mode, seconds in the bad episodes — CLAUDE.md platform notes).  A
    # depressed headline is then attributable from the artifact alone.
    _rx = jnp.ones((256, 256))
    _rf = jax.jit(lambda a: a @ a + 1.0)
    jax.block_until_ready(_rf(_rx))

    def probe_rtt() -> float:
        t0 = time.perf_counter()
        ry = _rx
        for _ in range(10):
            ry = _rf(ry)
        float(ry[0, 0])
        return (time.perf_counter() - t0) * 100.0

    tunnel_rtt_ms = probe_rtt()
    _log(f"bench: tunnel RTT {tunnel_rtt_ms:.1f} ms/step")

    # Catastrophic episodes (tens of seconds/step were measured on
    # Aug 19) make the full measurement plan run for hours — the capture
    # process would be killed before emitting its JSON line.  Wait a
    # bounded window for the mode to lift, then fall back to a REDUCED
    # but honest capture (fewer reps/blocks, rtt recorded) so one line
    # is always produced.
    import os
    _CATASTROPHIC_MS = 1000.0
    wait_budget = float(os.environ.get("SYZGY_BENCH_WAIT_S", "600"))
    _tw = time.perf_counter()
    while tunnel_rtt_ms > _CATASTROPHIC_MS and \
            time.perf_counter() - _tw < wait_budget:
        _log(f"bench: tunnel catastrophically degraded "
             f"({tunnel_rtt_ms:.0f} ms/step) — waiting 180s for the mode "
             "to lift")
        time.sleep(180)
        tunnel_rtt_ms = probe_rtt()
        _log(f"bench: tunnel RTT {tunnel_rtt_ms:.1f} ms/step")
    catastrophic = tunnel_rtt_ms > _CATASTROPHIC_MS
    if catastrophic:
        _log("bench: proceeding with the REDUCED capture plan "
             "(degraded_capture=true in the output)")

    from syzgydb_tpu.index.hamming import SignHashIndex
    from syzgydb_tpu.ops import distance as dist_ops
    from syzgydb_tpu.ops import pallas_scan
    from syzgydb_tpu.ops import quantize as qz
    from syzgydb_tpu.utils.rng import MyRandom

    n, d, bits, metric, k = 1_000_000, 384, 8, "cosine", 10
    q_big, q_ann = 1024, 64
    rng = np.random.default_rng(12345)

    import os
    cache = f"/tmp/syzgydb_bench_{n}x{d}_{bits}b.npz"
    if os.path.exists(cache):
        _log("bench: loading cached dataset")
        blob = np.load(cache)
        db = blob["db"]
        codes_np, norms_np = blob["codes"], blob["norms"]
    else:
        _log("bench: generating data")
        # clustered unit vectors (mixture of Gaussians on the sphere) — the
        # structure of real text-embedding corpora like the reference's
        # all-minilm workload; on iid-random data recall@10 is meaningless
        # because ranks 2..10 sit in an eps-thin shell with millions of ties
        n_clusters = 4096
        centers = rng.standard_normal((n_clusters, d), dtype=np.float32)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        assign = rng.integers(0, n_clusters, size=n)
        spread = rng.standard_normal((n, d), dtype=np.float32)
        spread /= np.linalg.norm(spread, axis=1, keepdims=True)
        db = centers[assign] + 0.35 * spread
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        _log("bench: quantizing")
        codes_np = qz.codes_to_device_repr(db, bits)
        norms_np = dist_ops.db_row_stats(codes_np, bits)
        try:
            np.savez(cache, db=db, queries=db[:64], codes=codes_np,
                     norms=norms_np)
        except OSError:
            pass  # disk-constrained host: just regenerate next time

    qrng = np.random.default_rng(777)
    noise = qrng.standard_normal((q_big, d)).astype(np.float32)
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    queries = db[qrng.integers(0, n, size=q_big)] + 0.2 * noise
    queries = np.float32(queries / np.linalg.norm(queries, axis=1,
                                                  keepdims=True))

    # pad rows to an 8192 multiple (valid=False) — the interleaved fused
    # surface needs 128-segment blocks of 64 rows, and a real Collection's
    # capacity is 8192-aligned (core/columns._GROWTH_ALIGN)
    npad = (-n) % 8192
    ntot = n + npad
    valid_np = np.zeros(ntot, dtype=bool)
    valid_np[:n] = True

    _log("bench: uploading")
    codes = jnp.asarray(np.concatenate(
        [codes_np, np.zeros((npad, d), codes_np.dtype)]))
    norms = jnp.asarray(np.concatenate(
        [norms_np, np.zeros(npad, norms_np.dtype)]))
    valid = jnp.asarray(valid_np)
    qdev = jnp.asarray(queries)           # (1024, D)
    qann = qdev[:q_ann]

    index = SignHashIndex(d, metric, MyRandom(7))
    _log("bench: encoding sketches on device")
    hashes = index.encode_codes_device(codes, bits)
    jax.block_until_ready(hashes)
    qcodes = jnp.asarray(index.encode_np(queries[:q_ann]))

    from syzgydb_tpu.index.hamming import hamming_candidates, rerank_topk

    # NOTE: deliberately NOT wrapped in an outer jit — the inner functions
    # are jitted already, and re-jitting the fused program triggers a
    # pathologically slow local XLA compile on this single-core host.
    def ann_step(qd, qc, budget):
        _, cand = hamming_candidates(qc, hashes, valid, budget, index.words)
        return rerank_topk(qd, codes, norms, valid, cand, bits, metric, k)

    # tile-aligned lane slab + interleaved-transposed matmul operand: the
    # production Collection derives both as device state
    # (core/collection._device_state); the rerank's segment gathers run
    # ~2.7x faster on the slab (pallas_scan.make_lane_slab) and the fused
    # matmul+min kernel runs the surface without the (Q, N) transient
    # (pallas_scan.make_ilv_codes, r3.7: 18.3 -> 10.4 ms surface)
    slab = pallas_scan.make_lane_slab(codes)
    ilv = pallas_scan.make_ilv_codes(codes)
    jax.block_until_ready((slab, ilv))

    def high_step(qd):
        # precision="high": exhaustive segment-min scan, provably exact
        # (with_ties=True is the production configuration — the tie counts
        # ride the same dispatch, see pallas_scan.fused_scan_topk)
        return pallas_scan.fused_scan_topk(qd, codes, norms, valid, slab,
                                           ilv, bits=bits, metric=metric,
                                           k=k, with_ties=True)

    def timeit(fn, reps=10):
        # time a whole block of reps; end with a tiny value fetch —
        # block_until_ready under-reports on tunneled PJRT backends, a
        # materialized value cannot lie (adds ~30ms fixed, amortized)
        np.asarray(fn()[0][:1, :1])
        t0 = time.perf_counter()
        out = [fn() for _ in range(reps)]
        np.asarray(out[-1][0][:1, :1])
        return (time.perf_counter() - t0) / reps

    def timeit_blocks(fn, reps=10, blocks=5):
        # per-block seconds/rep distribution: the headline reports median
        # AND best so a tunnel-depressed capture is self-describing
        # (BASELINE.md documents a 57-66k run-to-run band; a single
        # depressed block should read as variance, not regression)
        np.asarray(fn()[0][:1, :1])
        out = []
        for _ in range(blocks):
            t0 = time.perf_counter()
            res = [fn() for _ in range(reps)]
            np.asarray(res[-1][0][:1, :1])
            out.append((time.perf_counter() - t0) / reps)
        return out

    # ground truth: full-f32 HIGHEST exhaustive top-k
    _log("bench: computing f32-exact ground truth")
    truth = np.zeros((q_big, k), dtype=np.int64)
    for s in range(0, q_big, 256):
        dd = dist_ops.score_block(qdev[s:s + 256], codes, norms, valid,
                                  bits, metric, exact=True)
        _, ti = dist_ops.top_k_smallest(dd, k)
        truth[s:s + 256] = np.asarray(ti)

    def recall_of(aidx, nq):
        return float(np.mean([
            len(set(truth[i].tolist()) & set(aidx[i].tolist())) / k
            for i in range(nq)]))

    # reduced plan under a catastrophic tunnel: every stage still runs
    # (schema unchanged) but with the minimum reps that produce a timing
    _REPS = 2 if catastrophic else 10
    _BLOCKS = 2 if catastrophic else 5
    _REPS_SMALL = 1 if catastrophic else 5

    _log("bench: timing high-precision scan (batch 1024)")
    t_blocks = timeit_blocks(lambda: high_step(qdev), reps=_REPS,
                             blocks=_BLOCKS)
    t_high = min(t_blocks)
    # The single-tenant tunnel reclaims dead clients' HBM slowly: after
    # process churn the device can sit in a ~10-100x degraded mode for
    # an hour (CLAUDE.md, r3.7 measurements: the 15.5 ms headline batch
    # measuring 0.9-12 s).  Retry with spacing and keep the best block —
    # the same best-of methodology the host baseline uses, for the same
    # reason (a contended measurement is not the system's speed).
    _HEALTHY_HIGH_S = 0.025
    for _attempt in range(0 if catastrophic else 4):
        if t_high <= _HEALTHY_HIGH_S:
            break
        _log(f"bench: degraded platform ({t_high*1000:.0f} ms/batch vs "
             "~15.5 healthy) — waiting 90s for the tunnel to recover, "
             "then re-measuring")
        time.sleep(90)
        if probe_rtt() > _CATASTROPHIC_MS:
            # the mode got WORSE mid-capture: a reps=50 block would run
            # for the better part of an hour — keep what we have
            _log("bench: tunnel now catastrophic — stopping retries")
            break
        # longer blocks amortize a degraded per-dispatch RTT (measured
        # r3.7: RTT can sit at ~1.8s while compute throughput stays
        # healthy — 36.5 TFLOP/s on a raw matmul during the same episode)
        t_blocks += timeit_blocks(lambda: high_step(qdev), blocks=1)
        t_blocks += timeit_blocks(lambda: high_step(qdev), reps=50,
                                  blocks=1)
        t_high = min(t_blocks)
    qps_blocks = sorted(round(q_big / t, 2) for t in t_blocks)
    qps_median = float(np.median([q_big / t for t in t_blocks]))
    _, hidx, ok = high_step(qdev)
    ok_rate = float(np.asarray(ok).mean())
    recall_high = recall_of(np.asarray(hidx), q_big)
    qps_high = q_big / t_high
    _log(f"bench: high {t_high*1000:.1f}ms/1024q = {qps_high:.0f} QPS "
         f"recall {recall_high:.4f}")

    _log("bench: timing bf16 exhaustive pipeline (batch 1024)")
    t_exact = timeit(lambda: (
        dist_ops.top_k_smallest(dist_ops.score_block(
            qdev, codes, norms, valid, bits, metric, exact=False), k)),
        _REPS_SMALL)
    qps_exact = q_big / t_exact

    # ANN budget sweep at batch 64 (the single-RPC serving shape)
    sweep = []
    for budget in (512, 1024, 2048, 8192):
        _log(f"bench: timing ann budget={budget}")
        t = timeit(lambda: ann_step(qann, qcodes, budget), reps=_REPS)
        _, aidx = ann_step(qann, qcodes, budget)
        sweep.append({"budget": budget, "qps": q_ann / t,
                      "recall": recall_of(np.asarray(aidx), q_ann)})
    good = [s for s in sweep if s["recall"] >= 0.90]
    chosen = max(good, key=lambda s: s["qps"]) if good else \
        max(sweep, key=lambda s: s["recall"])
    qps_ann, recall_ann = chosen["qps"], chosen["recall"]

    # index-vs-scan crossover (r3): ANN at larger batches, budget 512 —
    # medium routes to the exhaustive scan above Q*budget*2 >= N
    # (core/collection.ANN_BATCH_CROSSOVER); these rows document why
    crossover = []
    qc_all = jnp.asarray(index.encode_np(queries))
    for q_n in (256, 1024):
        _log(f"bench: timing ann batch={q_n} budget=512")
        qd, qc = qdev[:q_n], qc_all[:q_n]
        t = timeit(lambda: ann_step(qd, qc, 512), reps=_REPS_SMALL)
        crossover.append({"batch": q_n, "budget": 512, "qps": q_n / t})
    # ...and the exhaustive side of the same crossover (r3.7: the router's
    # predicted flip sits between batch 64 and 256 — these rows pin it)
    high_small = []
    for q_n in (64, 256):
        _log(f"bench: timing high batch={q_n}")
        qd = qdev[:q_n]
        t = timeit(lambda: high_step(qd), reps=_REPS_SMALL)
        high_small.append({"batch": q_n, "qps": q_n / t})

    # host NumPy/BLAS baseline on a 100k subsample, scaled to 1M
    # (best of 3: the single shared CPU core makes one-shot timing noisy,
    # and a contended baseline would unfairly inflate vs_baseline)
    _log("bench: host baseline")
    sub = 100_000
    host_db = db[:sub]
    hq = queries[:64]
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sims = hq @ host_db.T
        sims /= np.linalg.norm(hq, axis=1, keepdims=True)
        np.argpartition(sims, -k, axis=1)[:, -k:]
        best = min(best, time.perf_counter() - t0)
    t_host = best * (n / sub)
    qps_host = 64 / t_host

    # headline: the fastest path whose recall@10 >= 0.99 vs f32-exact truth
    if recall_high >= 0.99:
        value, recall, path = qps_high, recall_high, "high(batch1024)"
    else:
        value, recall, path = qps_ann, recall_ann, \
            f"medium(budget{chosen['budget']})"

    print(json.dumps({
        "metric": "qps_per_chip_1Mx384d_cosine_8bit_top10",
        "value": round(value, 2),
        "unit": "queries/s",
        "vs_baseline": round(value / qps_host, 2),
        "recall_at_10": round(recall, 4),
        "path": path,
        "qps_high_precision": round(qps_high, 2),
        "qps_median": round(qps_median, 2),
        "qps_blocks": qps_blocks,
        "tunnel_rtt_ms": round(tunnel_rtt_ms, 1),
        "degraded_capture": catastrophic,
        "recall_high_precision": round(recall_high, 4),
        "provably_exact_rate": round(ok_rate, 4),
        "qps_exact_scan": round(qps_exact, 2),
        "qps_ann_batch64": round(qps_ann, 2),
        "recall_ann": round(recall_ann, 4),
        "percent_searched_ann": round(chosen["budget"] / n * 100, 2),
        "baseline_host_numpy_qps": round(qps_host, 2),
        "budget_sweep": [{k2: round(v, 4) for k2, v in s.items()}
                         for s in sweep],
        "ann_large_batch": [{k2: round(v, 2) for k2, v in s.items()}
                            for s in crossover],
        "high_small_batch": [{k2: round(v, 2) for k2, v in s.items()}
                             for s in high_small],
    }))


if __name__ == "__main__":
    main()
