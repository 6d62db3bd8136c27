"""odibel_ray — a from-scratch Ray-Data-native CDC / incremental-ingest engine.

Re-expresses the query and data-processing capabilities of the ScaDS/ODIBEL
reference (temporal change replay + relational operator library, see
/root/repo/SURVEY.md) as idiomatic Ray Data pipelines:

- ``odibel_ray.datagen``   — deterministic synthetic transcript change logs (F1/F2)
- ``odibel_ray.oracle``    — single-threaded dict-based oracle replay (golden output)
- ``odibel_ray.cdc``       — the replay core: schema evolution, LWW apply,
                             write-audit-publish sink, checkpoint/resume
- ``odibel_ray.stages``    — reusable map_batches stages (text analysis, dedup,
                             similarity, multimodal plumbing)
- ``odibel_ray.functions`` — scalar/vector function library (pyarrow.compute)
- ``odibel_ray.pipelines`` — analytics pipelines (SURVEY.md §2.5–2.7)

No module in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the CLI, bench.py and the test fixture.
"""

__version__ = "0.1.0"
