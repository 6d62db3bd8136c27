"""Named pipelines: the driver-facing ``queries()`` / ``oracle_sql()`` registry
(the reference's function-name-dispatch eval registry, SURVEY.md §2.10)."""

from odibel_ray.pipelines.queries import ORACLES, QUERIES, ensure_transcript_log

__all__ = ["ORACLES", "QUERIES", "ensure_transcript_log"]
