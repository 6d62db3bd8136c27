"""Abstract extension surface (SURVEY.md §2.10) — the reference's
``api/operations.py:16-98`` (Operation / BatchOperation + OperationConfig),
``api/source.py:30-92`` (Source) and ``api/evaluation.py:35-122`` (Evaluator)
contracts, re-expressed Ray-Data-first: an Operation maps Datasets to a
Dataset, a Source yields a Dataset plus its Arrow schema, and third-party
queries register into the driver registry without editing engine code.

Composition example::

    class Lowercase(BatchOperation):
        def transform_batch(self, t):
            import pyarrow.compute as pc
            return t.set_column(t.schema.get_field_index("text"), "text",
                                pc.utf8_lower(t["text"]))

    pipeline = Pipeline([Lowercase(), MyFilterOp()])
    out = pipeline.execute(ParquetSource(path).read())
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Any, Callable, Dict, Optional, Sequence

import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

from odibel_ray.evaluate import EntityEvaluator, EvaluationResult  # noqa: F401 (re-export)


@dataclass
class OperationConfig:
    """(``api/operations.py:16-24``)"""

    operation_type: str = "custom"
    parameters: Dict[str, Any] = field(default_factory=dict)


class Operation(ABC):
    """Dataset → Dataset transform with a validate/execute contract
    (``api/operations.py:27-77``). Implementations must stay lazy — build on
    ``map_batches``/``groupby``/joins, never materialize inside ``execute``."""

    def __init__(self, config: Optional[OperationConfig] = None):
        self.config = config or OperationConfig()

    @abstractmethod
    def execute(self, *inputs: "ray.data.Dataset") -> "ray.data.Dataset":
        ...

    def validate_inputs(self, *inputs: Any) -> bool:
        """Default: at least one Dataset-like input (has ``map_batches``)."""
        return len(inputs) > 0 and all(hasattr(i, "map_batches") for i in inputs)

    def get_config(self) -> OperationConfig:
        return self.config

    def __repr__(self) -> str:
        return f"{type(self).__name__}(type={self.config.operation_type})"


class _ActorAdapter:
    """Callable-class wrapper so a ``BatchOperation`` with ``concurrency`` set
    genuinely runs as an actor pool: the serialized operation lands on each
    actor once, its :meth:`BatchOperation.setup` hook runs there (per-actor
    state: model load, regex compile, index build), and batches flow through
    ``transform_batch``."""

    def __init__(self, op: "BatchOperation"):
        self._op = op
        op.setup()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._op.transform_batch(batch)


class BatchOperation(Operation):
    """Per-batch Operation (``api/operations.py:89-98``): subclass and
    implement :meth:`transform_batch` (Arrow table → Arrow table); ``execute``
    wires it through ``map_batches`` with the configured batch size /
    concurrency. When ``concurrency`` is set the stage is a true actor pool —
    the op ships to each actor once and :meth:`setup` runs there before the
    first batch (per-actor state, the stateful-stage shape); without it the
    stage is stateless tasks and ``setup`` runs lazily in-process."""

    def __init__(
        self,
        config: Optional[OperationConfig] = None,
        *,
        batch_size: int = 65536,
        concurrency: Optional[int] = None,
    ):
        super().__init__(config)
        self.batch_size = batch_size
        self.concurrency = concurrency

    @abstractmethod
    def transform_batch(self, batch: pa.Table) -> pa.Table:
        ...

    def setup(self) -> None:
        """Per-actor setup hook (once per actor when ``concurrency`` is set).
        Default: no-op."""

    def execute(self, ds: "ray.data.Dataset") -> "ray.data.Dataset":
        kwargs: Dict[str, Any] = dict(
            batch_format="pyarrow", batch_size=self.batch_size
        )
        if self.concurrency:
            return ds.map_batches(
                _ActorAdapter,
                fn_constructor_args=(self,),
                concurrency=self.concurrency,
                **kwargs,
            )
        self.setup()
        return ds.map_batches(self.transform_batch, **kwargs)


class FnOperation(BatchOperation):
    """Adapter: a plain ``pa.Table -> pa.Table`` function as an Operation."""

    def __init__(self, fn: Callable[[pa.Table], pa.Table], **kw):
        super().__init__(OperationConfig(operation_type=getattr(fn, "__name__", "fn")), **kw)
        self._fn = fn

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        return self._fn(batch)


class Pipeline(Operation):
    """Sequential composition of Operations — the user-facing analog of the
    reference's chained CLI modes (``cli/rdf_cmd.py:178-267``)."""

    def __init__(self, steps: Sequence[Operation]):
        super().__init__(OperationConfig(operation_type="pipeline"))
        self.steps = list(steps)

    def execute(self, ds: "ray.data.Dataset") -> "ray.data.Dataset":
        for step in self.steps:
            ds = step.execute(ds)
        return ds


class Source(ABC):
    """Dataset factory with schema + validation (``api/source.py:30-92``)."""

    @abstractmethod
    def read(self) -> "ray.data.Dataset":
        ...

    @abstractmethod
    def get_schema(self) -> pa.Schema:
        ...

    def validate(self) -> bool:
        try:
            self.get_schema()
            return True
        except Exception:
            return False


class ParquetSource(Source):
    """Parquet files/directories with column pruning at the read."""

    def __init__(self, path: str, columns: Optional[Sequence[str]] = None):
        self.path = path
        self.columns = list(columns) if columns else None

    def read(self) -> "ray.data.Dataset":
        import ray.data as rd

        return rd.read_parquet(self.path, columns=self.columns)

    def get_schema(self) -> pa.Schema:
        import pyarrow.dataset as pads

        schema = pads.dataset(self.path, format="parquet").schema
        if self.columns:
            schema = pa.schema([schema.field(c) for c in self.columns])
        return schema


class NTriplesSource(Source):
    """N-Triples text → validated rDF table (S9)."""

    def __init__(self, path: str):
        self.path = path

    def read(self) -> "ray.data.Dataset":
        from odibel_ray.rdf import read_ntriples

        return read_ntriples(self.path)

    def get_schema(self) -> pa.Schema:
        from odibel_ray.rdf import RDF_SCHEMA

        return RDF_SCHEMA


def register_query(
    name: str, fn: Callable[[str], Any], oracle_sql: Optional[str] = None
) -> None:
    """Register a third-party pipeline into the driver registry (appears in
    ``queries()`` / ``oracle_sql()`` without editing engine code) — the
    function-name-dispatch registry surface of the reference
    (``eval/InputEval.scala:79-108``)."""
    from odibel_ray.pipelines import queries as q

    q.QUERIES[name] = fn
    if oracle_sql is not None:
        q.EXTRA_ORACLES[name] = oracle_sql
