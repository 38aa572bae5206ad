"""versatiles_rs_ray — a Ray-Data-native spatial-join + tiling engine.

From-scratch rebuild of the query/data-processing capabilities of
roger120981/versatiles-rs (reference at /root/reference) on Ray
Datasets: zero-copy Arrow map_batches stages, actor pools for stateful
work, combiner-then-groupby for every wide step, per-partition
checkpoint manifests. See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"
