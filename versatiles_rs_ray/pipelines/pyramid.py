"""Flagship pipeline: interleaved docs -> full tile pyramid, resumable.

The Ray-Data restatement of `versatiles convert` (SURVEY.md §3.1) for
the graft's spatial-join + tiling engine:

  read docs (derived spans table)
    -> AssignTiles(z_base)                    [stateless map_batches]
    -> per-tile aggregation                   [combiner + small groupby]
    -> per-level hierarchical rollup to z_min [combiner + small groupby each]
    -> hilbert/pk columns + parquet per level [partitioned, atomic]

Every level is a partition in the checkpoint manifest
(state/manifest.py): a killed run resumes from the last completed
level, and each level's rollup reads the *written* parquet of the
level below (keeps Ray lineage short and makes resume O(remaining)).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from ..core import coords
from ..sources.docs import read_docs
from ..stages.assign import assign_tiles, unpack_tkey
from ..stages.pyramid import (
    aggregate_docs_to_tiles,
    aggregate_pyramid_spatial,
    rollup_level,
)
from ..state.manifest import Manifest, lineage_hash


def finalize_level(batch: pa.Table, block_bits=8) -> pa.Table:
    """Add z/x/y, hilbert and pk columns to combined tile stats."""
    z, x, y = unpack_tkey(np.asarray(batch["tkey"], dtype=np.int64))
    batch = batch.append_column("z", pa.array(z, type=pa.int64()))
    batch = batch.append_column("x", pa.array(x, type=pa.int64()))
    batch = batch.append_column("y", pa.array(y, type=pa.int64()))
    batch = batch.append_column(
        "hilbert", pa.array(coords.hilbert_index(z, x, y), type=pa.int64())
    )
    return batch.append_column(
        "pk", pa.array(coords.pack_pk(z, x, y, block_bits), type=pa.int64())
    )


def build_pyramid(sf_dir: str, z_base: int, z_min: int = 0, replicate: int = 1):
    """Lazy full pyramid (all levels, one shuffle) as a single Dataset."""
    docs = assign_tiles(read_docs(sf_dir, replicate=replicate), z_base)
    tiles = aggregate_pyramid_spatial(docs, z_base, z_min)
    return tiles.map_batches(finalize_level, batch_format="pyarrow")


def build_pyramid_levels(sf_dir: str, z_base: int, z_min: int = 0, replicate: int = 1):
    """Hierarchical per-level pyramid: {z: Dataset} (each level derived
    from the one below — the scale path when z_base is deep and the
    combined tile-stats table would be large)."""
    docs = read_docs(sf_dir, replicate=replicate)
    docs = assign_tiles(docs, z_base)
    levels = {z_base: aggregate_docs_to_tiles(docs)}
    for z in range(z_base, z_min, -1):
        levels[z - 1] = rollup_level(levels[z])
    return {z: ds.map_batches(finalize_level, batch_format="pyarrow") for z, ds in levels.items()}


def build_and_write_pyramid(
    sf_dir: str,
    out_dir: str,
    z_base: int = 10,
    z_min: int = 0,
    replicate: int = 1,
    strategy: str = "single_shuffle",
):
    """Resumable pyramid build; returns the manifest records per level.

    strategy="single_shuffle" (default): all levels from one combiner
    pass + one groupby, then per-level partition writes from the
    materialized (small) tile-stats table. strategy="hierarchical":
    each level from the previously *written* level below — the path
    for very deep pyramids where even the stats table is huge, and the
    finest-grained resume.
    """
    import ray.data as rd

    params = {
        "z_base": z_base,
        "z_min": z_min,
        "replicate": replicate,
        "strategy": strategy,
        "v": 2,
    }
    lineage = lineage_hash([f"{sf_dir}/documents.parquet"], params)
    manifest = Manifest(out_dir, lineage)
    manifest.invalidate_stale()  # input/params changed -> drop old-lineage partitions
    done = manifest.load()
    records = dict(done)
    missing = [z for z in range(z_min, z_base + 1) if f"z={z}" not in done]
    if not missing:
        return records

    def write_level(z: int, level_ds):
        _write_level(manifest, records, z, level_ds)

    if strategy in ("single_shuffle", "fused"):
        if strategy == "fused":
            # map-side shuffle: load->assign->partial->split in one task
            from ..sources.docs import load_shard_spec, shard_specs
            from ..stages.pyramid import aggregate_pyramid_spatial_fused

            specs = shard_specs(sf_dir, replicate)
            tiles = aggregate_pyramid_spatial_fused(specs, load_shard_spec, z_base, z_min)
        else:
            docs = assign_tiles(read_docs(sf_dir, replicate=replicate), z_base)
            tiles = aggregate_pyramid_spatial(docs, z_base, z_min)
        tiles = tiles.map_batches(finalize_level, batch_format="pyarrow").materialize()
        for z in missing:
            write_level(z, tiles.filter(expr=f"z == {z}"))
        return records

    # hierarchical
    if f"z={z_base}" not in done:
        docs = assign_tiles(read_docs(sf_dir, replicate=replicate), z_base)
        write_level(
            z_base,
            aggregate_docs_to_tiles(docs).map_batches(finalize_level, batch_format="pyarrow"),
        )
    for z in range(z_base, z_min, -1):
        if f"z={z - 1}" in done:
            continue
        import os

        part = manifest.partition_dir(f"z={z}")
        below = rd.read_parquet(
            [os.path.join(part, f) for f in sorted(os.listdir(part))],
            columns=["tkey", "n_docs", "n_spans", "min_doc", "max_doc"],
        )
        write_level(
            z - 1, rollup_level(below).map_batches(finalize_level, batch_format="pyarrow")
        )
    return records


def read_pyramid(out_dir: str, z_levels=None):
    """Read the native pyramid layout back as one Dataset.

    Consults `_manifest.jsonl` when present: only partitions whose
    LATEST record carries the same lineage as the most recent record
    (i.e. the current build) are read — an interrupted rebuild after an
    input change can never mix old- and new-lineage levels. Directories
    without a manifest are read as-is (plain parquet layout)."""
    import json
    import os

    import ray.data as rd

    manifest_path = os.path.join(out_dir, "_manifest.jsonl")
    allowed = None
    if os.path.exists(manifest_path):
        latest, current = {}, None
        with open(manifest_path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    latest[rec["partition"]] = rec
                    current = rec.get("lineage")  # lineage of the newest record
        if latest:
            allowed = {p for p, r in latest.items() if r.get("lineage") == current}

    files = []
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("z=") and "tmp" not in name and not name.endswith(".jsonl"):
            if allowed is not None and name not in allowed:
                continue
            z = int(name.split("=")[1])
            if z_levels is None or z in z_levels:
                d = os.path.join(out_dir, name)
                # read_parquet accepts one dir or a list of FILES — expand
                files += [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    return rd.read_parquet(files)


def _write_level(manifest: Manifest, records: dict, z: int, level_ds):
    """Atomic level write: begin -> parquet -> re-read count -> commit
    (shared by build/increment so the resume protocol cannot diverge)."""
    import os

    import ray.data as rd

    t0 = time.monotonic()
    tmp = manifest.begin(f"z={z}")
    level_ds.write_parquet(tmp)
    rows = rd.read_parquet(
        [os.path.join(tmp, f) for f in sorted(os.listdir(tmp))]
    ).count()
    records[f"z={z}"] = manifest.commit(f"z={z}", tmp, rows,
                                        time.monotonic() - t0)


def increment_pyramid(delta_docs_ds, base_dir: str, out_dir: str,
                      z_base: int, z_min: int = 0, *, delta_tag: str,
                      num_buckets: int = 64):
    """Merge a DELTA corpus into an existing written pyramid without
    re-reading the base corpus — the daily-increment path at 100 TB.

    Possible because every per-tile stat is a decomposable aggregate
    (sum/min/max): the delta runs the normal one-exchange spatial
    aggregation, the BASE levels are read back from their parquet
    partitions (tile stats, ~10^6x smaller than the corpus), and one
    more exchange on tkey merges the two — cost is O(delta + tiles),
    never O(base corpus). ``delta_tag`` is REQUIRED and must uniquely
    name the delta (a date, a batch id): it is the delta's identity in
    the output lineage — reusing a tag against the same base makes the
    run a resume NO-OP, not a second merge. The base's own manifest
    lineage folds into the output lineage, so rebuilding the base with
    different inputs/params invalidates the increment; the requested
    z range must match the base's built levels exactly (a mismatched
    merge would silently drop corpus data). pytest asserts
    bit-equality with a full rebuild of base+delta.
    """
    from ..stages.pyramid import combine_partials

    base_all = Manifest(base_dir, "")._all_records()
    want = {f"z={z}" for z in range(z_min, z_base + 1)}
    if set(base_all) != want:
        raise ValueError(
            f"base pyramid levels {sorted(base_all)} do not match the "
            f"requested range z={z_min}..{z_base}")
    base_lineage = next(iter(base_all.values()), {}).get("lineage", "")

    params = {"z_base": z_base, "z_min": z_min, "base": base_lineage,
              "delta": delta_tag, "v": 2}
    lineage = lineage_hash([base_dir], params)
    manifest = Manifest(out_dir, lineage)
    manifest.invalidate_stale()
    done = manifest.load()
    records = dict(done)
    missing = [z for z in range(z_min, z_base + 1) if f"z={z}" not in done]
    if not missing:  # completed increment: resume costs nothing
        return records

    stats_cols = ["tkey", "n_docs", "n_spans", "min_doc", "max_doc"]
    delta_tiles = aggregate_pyramid_spatial(
        assign_tiles(delta_docs_ds, z_base), z_base, z_min,
        num_buckets=num_buckets,
    ).select_columns(stats_cols)
    base_tiles = read_pyramid(base_dir).select_columns(stats_cols)
    merged = combine_partials(base_tiles.union(delta_tiles),
                              num_buckets=num_buckets)
    tiles = merged.map_batches(finalize_level, batch_format="pyarrow").materialize()
    for z in missing:
        _write_level(manifest, records, z, tiles.filter(expr=f"z == {z}"))
    return records
