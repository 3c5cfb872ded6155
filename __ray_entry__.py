"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here calls
``ray.init`` / ``ray.shutdown``.  ``queries()`` exposes each implemented
operator/pipeline from SURVEY.md §2; ``oracle_sql()`` gives the DuckDB
re-derivation over the same sf tables (see ``planetiler_ray.oracle``).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on sf0.001: pages -> extract -> geoparse -> PIP +
    kNN joins -> per-tile counts across zooms. Returns a small Dataset."""
    from planetiler_ray.pipelines import webgeo

    return webgeo.q_tile_counts(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    from planetiler_ray.pipelines import webgeo

    return {
        "pages_meta": webgeo.q_pages_meta,
        "geoparse": webgeo.q_geoparse,
        "tile_counts": webgeo.q_tile_counts,
        "pip_join": webgeo.q_pip,
        "knn_join": webgeo.q_knn,
    }


def oracle_sql() -> dict[str, str]:
    from planetiler_ray import oracle

    return {
        "pages_meta": oracle.sql_pages_meta(),
        "geoparse": oracle.sql_mentions(),
        "tile_counts": oracle.sql_tile_counts(),
        "pip_join": oracle.sql_admin_join(),
        "knn_join": oracle.sql_knn(),
    }
