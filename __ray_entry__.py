"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing here
(or in ``odibel_ray``) initialises or shuts down Ray.

- ``entry()`` — flagship pipeline: full CDC replay of the deterministic
  transcript change log sized for sf0.001 (synthesised under /tmp on first
  call), returning the converged transcript table as a ``ray.data.Dataset``.
- ``queries()`` — one named callable per implemented operator/pipeline
  (SURVEY.md §2 inventory + the training-data ops: dedup, ANN, text analysis).
- ``oracle_sql()`` — DuckDB-equivalent SQL for EVERY query (136/136; zero
  rows-only). Transcript-CDC oracles read the same /tmp Parquet change log
  via ``read_parquet`` with full schema-evolution semantics in SQL;
  model-state ops (MinHash/SimHash near-dup, language ID, IVF ANN,
  hyperplane LSH) are pinned via the sidecar pattern — the engine persists
  its deterministic fitted state to /tmp parquet and the SQL replays the
  pipeline from that state.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_DRIVER_SF = "/root/testdata/sf0.01"


def entry() -> Any:
    from odibel_ray.pipelines.queries import q_transcript_replay

    return q_transcript_replay("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from odibel_ray.pipelines.queries import (
        QUERIES,
        _ensure_ivf_centroids,
        _ensure_lang_profiles,
        _ensure_lsh_planes,
        _ensure_media_table,
        _ensure_rdf_corpus,
        _ensure_simhash_masks,
        _ensure_simhash_sigs,
        ensure_transcript_log,
    )

    # the synthetic inputs must exist before the driver runs the matching
    # oracle SQL (which reads them from /tmp); generation is cheap + idempotent.
    ensure_transcript_log(_DRIVER_SF)
    _ensure_rdf_corpus(_DRIVER_SF)
    _ensure_media_table(_DRIVER_SF)
    _ensure_simhash_sigs(_DRIVER_SF)
    _ensure_simhash_masks(_DRIVER_SF)
    _ensure_ivf_centroids(_DRIVER_SF)
    _ensure_lsh_planes(_DRIVER_SF)
    _ensure_lang_profiles(_DRIVER_SF)
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from odibel_ray.pipelines.queries import (
        ORACLES,
        _ensure_ivf_centroids,
        _ensure_lang_profiles,
        _ensure_lsh_planes,
        _ensure_media_table,
        _ensure_rdf_corpus,
        _ensure_simhash_masks,
        _ensure_simhash_sigs,
        ensure_transcript_log,
    )

    ensure_transcript_log(_DRIVER_SF)
    _ensure_rdf_corpus(_DRIVER_SF)
    _ensure_media_table(_DRIVER_SF)
    _ensure_simhash_sigs(_DRIVER_SF)
    _ensure_simhash_masks(_DRIVER_SF)
    _ensure_ivf_centroids(_DRIVER_SF)
    _ensure_lsh_planes(_DRIVER_SF)
    _ensure_lang_profiles(_DRIVER_SF)
    return ORACLES(_DRIVER_SF)
