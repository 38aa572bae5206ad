"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "num_cpus": N, ...}

Headline = flagship pyramid build (docs replicated REPLICATE-fold ->
spans derivation -> assign z12 -> single-shuffle pyramid z12..0) plus
the spatial-join stages (PIP + kNN). `--scaling` runs the identical
job in fresh processes at 8 and 32 CPUs and reports throughput at both
plus scaling efficiency (the sandbox evidence for the north rule's
N vs 4N cluster criterion — see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("GRAFT_REPLICATE", "100"))  # sf0.1: 5k docs -> 500k
Z_BASE = int(os.environ.get("GRAFT_Z_BASE", "12"))


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
    from versatiles_rs_ray.stages.pyramid import aggregate_pyramid_single_shuffle

    timings = {}
    counts = {}

    def docs_ds():
        return D.read_docs(SF_DIR, replicate=REPLICATE)

    # warm the page cache (untimed) so we measure compute, not first read
    docs_ds().count()

    # 1. pyramid build: derive spans -> assign z12 -> all levels, one shuffle
    t0 = time.monotonic()
    docs = assign.assign_tiles(docs_ds(), Z_BASE)
    tiles = aggregate_pyramid_single_shuffle(docs, Z_BASE, 0)
    counts["pyramid_tiles"] = tiles.count()
    timings["pyramid"] = time.monotonic() - t0

    # 2. PIP join against the z5 cover of the reference golden bbox
    p = TileBBoxPyramid.from_geo_bbox(0.0, 0.0, 40.0, 20.0, min_level=5, max_level=5)
    bb = p.get(5)
    xs, ys = bb.coords()
    t0 = time.monotonic()
    pip = docs_ds().map_batches(
        join.TileSetPIPJoin(5, list(zip(xs.tolist(), ys.tolist()))),
        batch_format="pyarrow",
    )
    counts["pip_rows"] = pip.count()
    timings["pip_join"] = time.monotonic() - t0

    # 3. broadcast kNN: 128 query docs against all docs
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    base_ids = np.asarray(t["doc_id"], dtype=np.int64)
    q_ids = np.sort(base_ids)[:128]
    q_lon, q_lat = D.derive_lonlat(q_ids)
    t0 = time.monotonic()
    knn = join.knn_join(docs_ds(), q_ids, q_lon, q_lat, 5)
    counts["knn_rows"] = knn.count()
    timings["knn_join"] = time.monotonic() - t0

    headline = sum(timings.values())
    n_docs = len(base_ids) * REPLICATE
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
        "replicate": REPLICATE,
        "z_base": Z_BASE,
        "pyramid_tiles": counts["pyramid_tiles"],
        "tiles_per_sec": round(tiles_per_sec, 1),
        "docs_per_sec": round(docs_per_sec, 1),
        "counts": counts,
    }


def run_at(ncpu: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main():
    if "--scaling" in sys.argv:
        lo, hi = 8, 32
        r_lo = run_at(lo)
        r_hi = run_at(hi)
        t_lo, t_hi = r_lo["value"], r_hi["value"]
        eff = (t_lo / t_hi) / (hi / lo)
        print(
            json.dumps(
                {
                    "metric": "scaling efficiency (8 vs 32 cpus, identical job)",
                    "value": round(eff, 3),
                    "unit": "efficiency",
                    "sec_8": t_lo,
                    "sec_32": t_hi,
                    "throughput_docs_per_sec_8": r_lo["docs_per_sec"],
                    "throughput_docs_per_sec_32": r_hi["docs_per_sec"],
                    "queries_8": r_lo["queries"],
                    "queries_32": r_hi["queries"],
                    "sf": SF_DIR,
                }
            )
        )
        return
    print(json.dumps(run_bench()))


if __name__ == "__main__":
    main()
