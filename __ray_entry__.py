"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here
(or in versatiles_rs_ray) calls ray.init()/ray.shutdown().

- entry(): flagship pipeline (docs -> spans derivation -> tile
  assignment -> pyramid build z8..0) on /root/testdata/sf0.001.
- queries(): one callable per implemented operator (SURVEY.md §2 +
  graft additions); each takes sf_dir.
- oracle_sql(): DuckDB-equivalent SQL per query where expressible;
  rows-only ops (hilbert sort, S2 cells, MinHash/SimHash, LSH ANN,
  lang-id heuristic, fingerprints, media decode) are covered by pytest
  instead.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from versatiles_rs_ray.queries import ORACLES, QUERIES


def entry() -> Any:
    """Flagship: full pyramid (z8 -> z0, one shuffle) over sf0.001 docs."""
    from versatiles_rs_ray.pipelines.pyramid import build_pyramid

    tiles = build_pyramid("/root/testdata/sf0.001", z_base=8, z_min=0)
    return tiles.select_columns(
        ["z", "x", "y", "n_docs", "n_spans", "min_doc", "max_doc", "hilbert", "pk"]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
