"""Driver contract for the Ray-Data-native KG-construction engine.

``entry()`` runs the flagship pipeline (full star-schema KG extraction +
transcript KG) on sf0.001; ``queries()`` / ``oracle_sql()`` expose every
oracle-checked operator pipeline (see ``knowledgegraphs_ray.pipelines.catalog``).

Ray is initialised by the driver BEFORE this module is imported; nothing here
calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from knowledgegraphs_ray.pipelines import catalog as _catalog


def entry() -> Any:
    """Flagship: star-schema + transcript KG triples on sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    kg = _catalog.q_kg_triples_star(sf_dir)
    transcripts = _catalog.q_kg_transcripts(sf_dir)
    return kg.union(transcripts)


def queries() -> dict[str, Callable[[str], Any]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
