"""Per-event enrichment via a per-worker client with retries — the shape of
the reference's remote DIEF extraction (``RCDiefServer`` constructed once per
partition/thread, 3 retries with backoff, failed events skipped-never-deleted:
``/root/reference/src/main/scala/ai/scads/odibel/datasets/wikitext/RCDiefServer.scala:31-95``,
``DBpediaTKGExtraction.scala:174-195``).

The remote service is replaced by a deterministic local extractor
(:class:`LocalExtractor`) whose transient/permanent failures are seeded by a
key hash, so retry behavior is testable. The Ray shape is the real thing: a
callable class passed to ``map_batches(Cls, concurrency=N)`` — client built
once per actor, per-batch work vectorized where possible, per-actor
heartbeat-style counters (``HeartbeatMonitor`` analog).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


class ExtractionError(Exception):
    pass


class LocalExtractor:
    """Deterministic stand-in for the remote enrichment service.

    - keys whose hash lands in the *transient* band fail on the first
      ``transient_fails`` attempts, then succeed (retry must recover them);
    - keys in the *permanent* band always fail (caller must skip them);
    - everything else succeeds immediately.
    """

    def __init__(self, transient_frac: float = 0.05, permanent_frac: float = 0.02,
                 transient_fails: int = 2, seed: int = 97):
        self.transient_frac = transient_frac
        self.permanent_frac = permanent_frac
        self.transient_fails = transient_fails
        self.seed = np.uint64(seed)
        self.attempts: dict[str, int] = {}

    def _band(self, key: str) -> str:
        h = pd.util.hash_array(np.array([key], dtype=object))[0]
        u = ((h ^ self.seed) % np.uint64(10_000)) / 10_000.0
        if u < self.permanent_frac:
            return "permanent"
        if u < self.permanent_frac + self.transient_frac:
            return "transient"
        return "ok"

    def extract(self, key: str, text: str) -> dict:
        band = self._band(key)
        if band == "permanent":
            raise ExtractionError(f"permanent failure for {key}")
        if band == "transient":
            n = self.attempts.get(key, 0)
            self.attempts[key] = n + 1
            if n < self.transient_fails:
                raise ExtractionError(f"transient failure #{n + 1} for {key}")
        toks = (text or "").split(" ")
        return {"n_tokens": len(toks), "first_token": toks[0] if toks else ""}


class TurnEnricher:
    """Actor-pool stage: enrich each turn via the client, with
    ``max_retries`` attempts; persistently failing rows are SKIPPED and
    counted — never emitted as deletions (the T3 invariant)."""

    def __init__(self, max_retries: int = 3, backoff_s: float = 0.0, **client_kwargs):
        self.client = LocalExtractor(**client_kwargs)
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.n_ok = 0
        self.n_skipped = 0

    def __call__(self, t: pa.Table) -> pa.Table:
        import time

        t = t.combine_chunks()
        convs = t["conv_id"].to_pylist()
        turns = t["turn_idx"].to_pylist()
        texts = t["text"].to_pylist()
        keep = np.zeros(len(t), dtype=bool)
        n_tokens = np.zeros(len(t), dtype=np.int64)
        first = np.empty(len(t), dtype=object)
        for i, (c, x, s) in enumerate(zip(convs, turns, texts)):
            key = f"{c}:{x}"
            for attempt in range(self.max_retries):
                try:
                    res = self.client.extract(key, s)
                    keep[i] = True
                    n_tokens[i] = res["n_tokens"]
                    first[i] = res["first_token"]
                    self.n_ok += 1
                    break
                except ExtractionError:
                    if self.backoff_s:
                        time.sleep(self.backoff_s)
            else:
                self.n_skipped += 1  # skip, never delete (T3)
        out = t.append_column("n_tokens", pa.array(n_tokens)).append_column(
            "first_token", pa.array(first, pa.string())
        )
        return out.filter(pa.array(keep))


def enrich_turns(ds: "ray.data.Dataset", *, concurrency: int | None = None,
                 batch_size: int = 4096, max_retries: int = 3, **client_kwargs):
    from odibel_ray.tuning import default_pool_size

    return ds.map_batches(
        TurnEnricher,
        fn_constructor_kwargs={"max_retries": max_retries, **client_kwargs},
        concurrency=default_pool_size(concurrency),
        batch_size=batch_size,
        batch_format="pyarrow",
    )
