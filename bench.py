"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "num_cpus": N, ...}

Headline = flagship pyramid build (docs replicated REPLICATE-fold ->
spans derivation -> assign z12 -> spatially-routed single-exchange
pyramid z12..0) plus the spatial-join stages (PIP + kNN). `--scaling`
runs the identical job in fresh processes at GRAFT_SCALING_LO vs
GRAFT_SCALING_HI CPUs (default 4 vs 16: N vs 4N where each execution
slot keeps per-slot memory bandwidth, matching multi-node topology;
8 vs 32 saturates this box's single shared memory bus — both pairs
recorded in BASELINE.md) and reports
throughput at both plus scaling efficiency — the sandbox evidence for
the north rule's N vs 4N cluster criterion (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("GRAFT_REPLICATE", "2000"))  # sf0.1: 5k docs -> 10M
# --scaling uses a larger input so compute dominates the fixed
# coordination floor (the whole point of measuring scaling)
SCALING_REPLICATE = int(os.environ.get("GRAFT_SCALING_REPLICATE", "16000"))
Z_BASE = int(os.environ.get("GRAFT_Z_BASE", "12"))
SHARDS_PER_TASK = int(os.environ.get("GRAFT_SHARDS_PER_TASK", "64"))


def _cpu_stat():
    """(busy_all, steal) jiffies from /proc/stat — whole-VM view."""
    try:
        with open("/proc/stat") as f:
            v = list(map(int, f.readline().split()[1:]))
        return sum(v) - v[3] - v[4], v[7]  # busy = total - idle - iowait
    except Exception:
        return 0, 0


def _mem_bandwidth_gbps() -> float:
    """Single-thread memcpy bandwidth probe (512 MB, best of 3).

    Co-tenant MEMORY-BUS pressure on this shared host is invisible to
    /proc/stat steal but devastates the bandwidth-bound derive stages;
    this probe turns it into a recorded number. Quiet machine baseline
    ~= the hardware's single-core copy rate — compare runs at similar
    values.
    """
    import numpy as np

    a = np.ones(512 * 1024 * 1024 // 8, dtype=np.float64)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        b = a.copy()
        dt = time.perf_counter() - t0
        del b
        best = min(best, dt)
    return round(2 * a.nbytes / best / 1e9, 2)  # read + write


def run_bench():
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from versatiles_rs_ray.core.bbox import TileBBoxPyramid
    from versatiles_rs_ray.sources import docs as D
    from versatiles_rs_ray.stages import assign, join
    from versatiles_rs_ray.stages.pyramid import aggregate_pyramid_spatial_fused

    timings = {}
    counts = {}

    replicate = SCALING_REPLICATE if "--scaling-child" in sys.argv else REPLICATE

    # The bench reads FULL-fidelity interleaved docs (spans included):
    # the job simulates streaming the real table. Column pruning
    # (read_docs(columns=...)) raises pyramid throughput to ~6.9M
    # docs/sec but the lighter job amortizes fixed costs worse
    # (efficiency 0.51 vs 0.68) — the pruned path is a library feature
    # (prune at the read), not the headline configuration.
    PYR_COLS = None
    JOIN_COLS = None

    def docs_ds(columns=None):
        return D.read_docs(
            SF_DIR, replicate=replicate, shards_per_task=SHARDS_PER_TASK, columns=columns
        )

    p = TileBBoxPyramid.from_geo_bbox(0.0, 0.0, 40.0, 20.0, min_level=5, max_level=5)
    bb = p.get(5)
    xs, ys = bb.coords()
    pip_tiles = list(zip(xs.tolist(), ys.tolist()))
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    base_ids = np.asarray(t["doc_id"], dtype=np.int64)
    q_ids = np.sort(base_ids)[:128]
    q_lon, q_lat = D.derive_lonlat(q_ids)

    # Warm-up (untimed): page cache, the lazily-spawned Ray worker pool
    # (at 32 cpus the first heavy stage would otherwise pay ~7s of
    # worker startup), and every stage's code path at small replicate.
    warm_r = max(8, 2 * NUM_CPUS)

    def warm_docs(columns=None):
        return D.read_docs(SF_DIR, replicate=warm_r, shards_per_task=2, columns=columns)

    aggregate_pyramid_spatial_fused(
        D.shard_specs(SF_DIR, warm_r, shards_per_task=2, columns=PYR_COLS),
        D.load_shard_spec, Z_BASE, 0,
    ).count()
    warm_docs(JOIN_COLS).map_batches(
        join.TileSetPIPJoin(5, pip_tiles), batch_format="pyarrow"
    ).count()
    join.knn_join(warm_docs(JOIN_COLS), q_ids, q_lon, q_lat, 5)

    def stage_pyramid():
        # map-side shuffle: load->assign->partial->split fused per task
        specs = D.shard_specs(SF_DIR, replicate, shards_per_task=SHARDS_PER_TASK,
                              columns=PYR_COLS)
        tiles = aggregate_pyramid_spatial_fused(specs, D.load_shard_spec, Z_BASE, 0)
        counts["pyramid_tiles"] = tiles.count()

    def stage_pip():
        pip = docs_ds(JOIN_COLS).map_batches(
            join.TileSetPIPJoin(5, pip_tiles), batch_format="pyarrow"
        )
        counts["pip_rows"] = pip.count()

    def stage_knn():
        knn = join.knn_join(docs_ds(JOIN_COLS), q_ids, q_lon, q_lat, 5)
        counts["knn_rows"] = len(knn)  # knn_join returns a pandas DataFrame

    # --scaling-child: best-of-2 per stage (object-store GC between
    # executions makes single-shot timings noisy at high concurrency);
    # single-shot for very large inputs where the job is long enough to
    # amortize the noise and best-of-2 would blow the time budget
    repeats = 2 if ("--scaling-child" in sys.argv and replicate <= 16000) else 1
    membw = _mem_bandwidth_gbps()
    busy0, steal0 = _cpu_stat()
    for name, fn in [
        ("pyramid", stage_pyramid),  # derive -> assign z12 -> all levels, one exchange
        ("pip_join", stage_pip),  # PIP vs the z5 cover of the reference golden bbox
        ("knn_join", stage_knn),  # 128 broadcast queries vs all docs
    ]:
        best = None
        for _ in range(repeats):
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = best

    busy1, steal1 = _cpu_stat()
    d_busy, d_steal = busy1 - busy0, steal1 - steal0
    # co-tenant steal as a fraction of this VM's non-idle time during
    # the timed section (busy from _cpu_stat already includes steal):
    # nonzero values mean the wall times below are inflated by the
    # shared host, not by the engine (see BASELINE.md)
    steal_pct = round(100.0 * d_steal / max(d_busy, 1), 2)
    headline = sum(timings.values())
    n_docs = len(base_ids) * replicate
    tiles_per_sec = counts["pyramid_tiles"] / timings["pyramid"]
    docs_per_sec = n_docs / timings["pyramid"]
    ray.shutdown()
    return {
        "metric": "sec (pyramid z0..12 + PIP + kNN over replicated interleaved docs)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_docs": n_docs,
        "replicate": replicate,
        "z_base": Z_BASE,
        "pyramid_tiles": counts["pyramid_tiles"],
        "tiles_per_sec": round(tiles_per_sec, 1),
        "docs_per_sec": round(docs_per_sec, 1),
        "steal_pct": steal_pct,
        "membw_gbps": membw,
        "counts": counts,
    }


CURATE_DOCS = int(os.environ.get("GRAFT_CURATE_DOCS", "10000000"))


def run_curate() -> dict:
    """LLM-curation flagship (pipelines/curate.curate_corpus) over the
    zipf(1.3)-skewed synthetic corpus (sources/docs.read_zipf_docs):
    gate -> exact dedup -> ngram near-dup removal -> temperature mix
    over the zipf-hot source column -> deterministic shuffle -> pack.
    Per-stage wall times via the pipeline's stage_cb hook (each stage
    materializes its output, so a stage's time is its own work, not a
    re-execution of the prefix). The stage set and order is the
    round-4 verdict's named certification target."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from versatiles_rs_ray.pipelines.curate import curate_corpus
    from versatiles_rs_ray.sources import docs as D

    kwargs = dict(
        id_col="doc_id", text_col="text", lang_col="source",
        min_quality=1, drop_repetitive=True,
        near_dup_threshold=0.8, ngram_k=5,
        near_dup_method="minhash",  # the LSH scale path (hot-bucket
        # caps + co-partitioned exact verify); 'ngram' is the
        # oracle-exact small-corpus path
        # temperature rebalance of the zipf head: hot sources cut
        lang_fracs={"src0": 0.3, "src1": 0.5, "src2": 0.7},
        default_frac=1.0, pack_budget=2048,
    )

    # Warm-up (untimed): worker pool + every stage's code path
    warm = D.read_zipf_docs(SF_DIR, 20_000, docs_per_task=2_000)
    curate_corpus(warm, **kwargs).count()

    timings, counts = {}, {}
    t_last = [0.0]

    def cb(name, d):
        # stage time = everything since the previous boundary: lazy
        # construction is free, but the near-dup stage runs its label
        # propagation loop EAGERLY at build time — measuring only the
        # materialize() would silently drop that cost from its stage
        m = d.materialize()
        now = time.monotonic()
        timings[name] = round(now - t_last[0], 3)
        t_last[0] = now
        counts[name] = m.count()
        return m

    membw = _mem_bandwidth_gbps()
    busy0, steal0 = _cpu_stat()
    t0 = time.monotonic()
    t_last[0] = t0
    src = D.read_zipf_docs(SF_DIR, CURATE_DOCS, docs_per_task=50_000)
    out = curate_corpus(src, stage_cb=cb, **kwargs)
    n_out = out.count()
    total = time.monotonic() - t0
    busy1, steal1 = _cpu_stat()
    ray.shutdown()
    return {
        "metric": "sec (curate: gate+dedup+near-dup+mix+shuffle+pack, "
                  "zipf(1.3) corpus)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_docs": CURATE_DOCS,
        "docs_per_sec": round(CURATE_DOCS / total, 1),
        "stage_rows": counts,
        "rows_out": n_out,
        "steal_pct": round(100.0 * (steal1 - steal0)
                           / max(busy1 - busy0, 1), 2),
        "membw_gbps": membw,
    }


def run_curate_at(ncpu: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--curate"],
        env=env, capture_output=True, text=True, check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def run_at(ncpu: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--scaling-child"],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def run_pyramid_only(replicate: int, z_base: int, num_buckets: int = 64) -> dict:
    """Fused pyramid alone at a chosen scale/depth (see --deep/--stress)."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from versatiles_rs_ray.sources import docs as D
    from versatiles_rs_ray.stages.pyramid import aggregate_pyramid_spatial_fused

    aggregate_pyramid_spatial_fused(
        D.shard_specs(SF_DIR, max(8, 2 * NUM_CPUS), shards_per_task=2),
        D.load_shard_spec, z_base, 0,
    ).count()
    membw = _mem_bandwidth_gbps()
    busy0, steal0 = _cpu_stat()
    t0 = time.monotonic()
    specs = D.shard_specs(SF_DIR, replicate, shards_per_task=SHARDS_PER_TASK)
    n = aggregate_pyramid_spatial_fused(
        specs, D.load_shard_spec, z_base, 0, num_buckets=num_buckets
    ).count()
    dt = time.monotonic() - t0
    busy1, steal1 = _cpu_stat()
    n_docs = replicate * 5000 if "sf0.1" in SF_DIR else None
    out = {
        "metric": f"sec (fused pyramid z{z_base}..0 only)",
        "value": round(dt, 3),
        "unit": "sec",
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "replicate": replicate,
        "z_base": z_base,
        "tiles": n,
        "tiles_per_sec": round(n / dt, 1),
        "steal_pct": round(100.0 * (steal1 - steal0) / max(busy1 - busy0, 1), 2),
        "membw_gbps": membw,
    }
    ray.shutdown()
    return out


def main():
    if "--deep" in sys.argv:
        # deep base zoom: every doc its own base tile (worst combine ratio)
        print(json.dumps(run_pyramid_only(
            int(os.environ.get("GRAFT_DEEP_REPLICATE", "8000")),
            int(os.environ.get("GRAFT_DEEP_Z", "14")))))
        return
    if "--stress" in sys.argv:
        # 400M docs: object-store high-water / no-spill check
        print(json.dumps(run_pyramid_only(
            int(os.environ.get("GRAFT_STRESS_REPLICATE", "80000")),
            Z_BASE)))
        return
    if "--curate" in sys.argv:
        print(json.dumps(run_curate()))
        return
    if "--curate-scaling" in sys.argv:
        # the curation DAG under the same quiet-window protocol as the
        # headline --scaling: fresh subprocesses at lo/hi cpus,
        # min-over-pairs per side (steal only ever slows a run), every
        # sample + its steal/membw probe reported; per-STAGE
        # efficiencies from each side's min run
        lo = int(os.environ.get("GRAFT_CURATE_SCALING_LO", "4"))
        hi = int(os.environ.get("GRAFT_CURATE_SCALING_HI", "16"))
        pairs = int(os.environ.get("GRAFT_SCALING_PAIRS", "2"))
        runs_hi, runs_lo = [], []
        for i in range(pairs):
            if i:
                time.sleep(10)
            runs_hi.append(run_curate_at(hi))
            time.sleep(10)
            runs_lo.append(run_curate_at(lo))
        r_hi = min(runs_hi, key=lambda r: r["value"])
        r_lo = min(runs_lo, key=lambda r: r["value"])
        t_lo, t_hi = r_lo["value"], r_hi["value"]
        stage_eff = {
            k: round((r_lo["queries"][k] / r_hi["queries"][k]) / (hi / lo), 3)
            for k in r_hi["queries"]
        }
        print(json.dumps({
            "metric": f"curate scaling efficiency ({lo} vs {hi} cpus)",
            "value": round((t_lo / t_hi) / (hi / lo), 3),
            "unit": "efficiency",
            "stage_efficiency": stage_eff,
            f"sec_{lo}": t_lo,
            f"sec_{hi}": t_hi,
            f"all_sec_{lo}": [r["value"] for r in runs_lo],
            f"all_sec_{hi}": [r["value"] for r in runs_hi],
            f"steal_pct_{lo}": [r.get("steal_pct") for r in runs_lo],
            f"steal_pct_{hi}": [r.get("steal_pct") for r in runs_hi],
            f"membw_gbps_{lo}": [r.get("membw_gbps") for r in runs_lo],
            f"membw_gbps_{hi}": [r.get("membw_gbps") for r in runs_hi],
            f"queries_{lo}": r_lo["queries"],
            f"queries_{hi}": r_hi["queries"],
            "stage_rows": r_hi.get("stage_rows"),
            "n_docs": r_hi.get("n_docs"),
            "sf": SF_DIR,
        }))
        return
    if "--scaling" in sys.argv:
        lo = int(os.environ.get("GRAFT_SCALING_LO", "4"))
        hi = int(os.environ.get("GRAFT_SCALING_HI", "16"))
        # this box is a shared VM with bursty co-tenant CPU steal
        # (/proc/stat steal accumulates in spikes); steal only ever
        # SLOWS a run, so run the (hi, lo) pair GRAFT_SCALING_PAIRS
        # times and take min per side — every sample is reported
        pairs = int(os.environ.get("GRAFT_SCALING_PAIRS", "2"))
        runs_hi, runs_lo = [], []
        for i in range(pairs):
            if i:
                time.sleep(10)
            runs_hi.append(run_at(hi))
            time.sleep(10)  # let object-store teardown settle
            runs_lo.append(run_at(lo))
        r_hi = min(runs_hi, key=lambda r: r["value"])
        r_lo = min(runs_lo, key=lambda r: r["value"])
        t_lo, t_hi = r_lo["value"], r_hi["value"]
        eff = (t_lo / t_hi) / (hi / lo)
        print(
            json.dumps(
                {
                    "metric": f"scaling efficiency ({lo} vs {hi} cpus, identical job)",
                    "value": round(eff, 3),
                    "unit": "efficiency",
                    f"sec_{lo}": t_lo,
                    f"sec_{hi}": t_hi,
                    f"all_sec_{lo}": [r["value"] for r in runs_lo],
                    f"all_sec_{hi}": [r["value"] for r in runs_hi],
                    f"steal_pct_{lo}": [r.get("steal_pct") for r in runs_lo],
                    f"steal_pct_{hi}": [r.get("steal_pct") for r in runs_hi],
                    f"membw_gbps_{lo}": [r.get("membw_gbps") for r in runs_lo],
                    f"membw_gbps_{hi}": [r.get("membw_gbps") for r in runs_hi],
                    f"throughput_docs_per_sec_{lo}": r_lo["docs_per_sec"],
                    f"throughput_docs_per_sec_{hi}": r_hi["docs_per_sec"],
                    f"queries_{lo}": r_lo["queries"],
                    f"queries_{hi}": r_hi["queries"],
                    "n_docs": r_hi.get("n_docs"),
                    "sf": SF_DIR,
                }
            )
        )
        return
    if "--once" in sys.argv or "--scaling-child" in sys.argv:
        # --scaling-child MUST run in-process: falling through to the
        # best-of-N subprocess path would re-spawn --once children
        # whose run_bench() sees no --scaling-child in argv and times
        # the small headline replicate instead of SCALING_REPLICATE
        # (observed: a "scaling" run at 10M docs instead of 80M)
        print(json.dumps(run_bench()))
        return
    # Default (the driver's entry): best-of-N attempts in fresh
    # subprocesses, each carrying its own steal/membw probes. The
    # round-3 driver bench landed in a 13%-steal co-tenant window and
    # read 1.7x the clean baseline; steal only ever SLOWS a run, so
    # min-over-attempts reflects the code and the attempt list shows
    # the weather (memory: min-over-pairs, never trust one run).
    n_attempts = int(os.environ.get("GRAFT_BENCH_ATTEMPTS", "2"))
    # storm rule: when every base attempt ran under heavy co-tenant
    # steal (observed 20-33% windows turning 2.8s into 28s on
    # unchanged code), take up to GRAFT_BENCH_EXTRA bonus attempts
    # after a settle pause — bounded (+~2 min worst case), and the
    # attempt list still records every sample, storms included
    extra_budget = int(os.environ.get("GRAFT_BENCH_EXTRA", "2"))
    storm_steal = float(os.environ.get("GRAFT_BENCH_STORM_STEAL", "8"))
    attempts = []
    i = 0
    while True:
        if i:
            time.sleep(5)  # let object-store teardown settle
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--once"],
                env=dict(os.environ), capture_output=True, text=True,
                check=True,
            ).stdout
            attempts.append(json.loads(out.strip().splitlines()[-1]))
        except Exception as exc:  # noqa: BLE001 — keep the bench alive
            print(f"bench attempt {i} failed: {exc!r}", file=sys.stderr)
        i += 1
        if i < n_attempts:
            continue
        clean = [a for a in attempts
                 if (a.get("steal_pct") or 0.0) <= storm_steal]
        if clean or extra_budget <= 0:
            break
        extra_budget -= 1
        time.sleep(20)  # storm so far: pause, then spend a bonus attempt
    if not attempts:  # subprocess path unusable: run in-process
        attempts = [run_bench()]
    best = min(attempts, key=lambda r: r["value"])
    best["attempts"] = [
        {"value": a["value"], "steal_pct": a.get("steal_pct"),
         "membw_gbps": a.get("membw_gbps")} for a in attempts
    ]
    print(json.dumps(best))


if __name__ == "__main__":
    main()
