"""Spark 4 Python DataSource for the paginated extraction (S1–S3).

The reference fetches (relation × year-interval) cells sequentially on
one machine (extractor.py:42-147, 171-183). `sources.paginated` keeps
that shape as a pluggable driver-side loop; THIS module lifts it into
Spark's own source API so each cell is an executor TASK — the fetch
fans out across the cluster, failed cells retry via normal task retry,
and the result is a DataFrame from the first line:

    spark.dataSource.register(PaginatedSparqlDataSource)
    df = (spark.read.format("sparql_paginated")
          .option("fixtures", fixture_dir)
          .option("relations", "spouse,sibling")
          .option("start", 1800).option("end", 1810).option("step", 5)
          .load())
    # rel: string, binding: string (one JSON object per SPARQL binding)

Offline/recorded mode reads per-cell fixture files
``{fixtures}/{rel}_{a}_{b}.json`` (a JSON array of binding dicts) and
still exercises the real LIMIT/OFFSET pagination loop against them; a
production deployment swaps ``_make_fetcher`` for an HTTP client —
partition planning, pagination, and retry semantics are identical.

Rate limiting note: a 1000-executor cluster hitting one SPARQL
endpoint needs admission control the endpoint side of this API;
bound the fan-out with ``spark.conf`` task scheduling (e.g. run this
load on a small dedicated pool), not by reverting to a driver loop.
"""

from __future__ import annotations

import json
import os
import re
from collections.abc import Iterator, Sequence

from social_link_prediction_spark.sources.paginated import (
    RetryPolicy,
    create_intervals,
    run_paginated_query,
)

try:  # pyspark >= 4.0
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    HAVE_DATASOURCE = True
except ImportError:  # pragma: no cover - pyspark 3.x fallback
    HAVE_DATASOURCE = False
    DataSource = object  # type: ignore[assignment,misc]
    DataSourceReader = object  # type: ignore[assignment,misc]
    InputPartition = object  # type: ignore[assignment,misc]

_LIMIT_RE = re.compile(r"LIMIT (\d+) OFFSET (\d+)")


def fixture_fetcher(path: str):
    """A Fetcher over a recorded JSON array: applies the query's
    LIMIT/OFFSET to the recorded rows, so the pagination loop runs
    exactly as it would against the live endpoint."""
    with open(path) as f:
        rows = json.load(f)

    def fetch(query: str) -> list[dict]:
        m = _LIMIT_RE.search(query)
        if not m:
            return rows
        size, offset = int(m.group(1)), int(m.group(2))
        return rows[offset : offset + size]

    return fetch


class _CellPartition(InputPartition):
    """One (relation, year-interval) extraction cell."""

    def __init__(self, rel: str, a: int, b: int):
        self.rel, self.a, self.b = rel, a, b


class _PaginatedReader(DataSourceReader):
    def __init__(self, options: dict):
        self.fixtures = options["fixtures"]
        self.relations = [r for r in options.get("relations", "").split(",") if r]
        self.start = int(options.get("start", 1800))
        self.end = int(options.get("end", 2025))
        self.step = int(options.get("step", 5))
        self.page_size = int(options.get("page_size", 10000))

    def partitions(self) -> Sequence[InputPartition]:
        cells = create_intervals(self.start, self.end, self.step)
        return [
            _CellPartition(rel, a, b) for rel in self.relations for a, b in cells
        ]

    def read(self, partition: _CellPartition) -> Iterator[tuple]:
        path = os.path.join(
            self.fixtures, f"{partition.rel}_{partition.a}_{partition.b}.json"
        )
        if not os.path.exists(path):
            return  # empty cell — the remote returned no rows for it
        fetch = fixture_fetcher(path)
        for page in run_paginated_query(
            f"-- cell {partition.rel} ({partition.a},{partition.b}]",
            fetch,
            page_size=self.page_size,
            retry=RetryPolicy(sleep_base=0.0),
        ):
            for binding in page:
                yield (partition.rel, json.dumps(binding, sort_keys=True))


class PaginatedSparqlDataSource(DataSource):
    """format name: ``sparql_paginated`` (see module docstring)."""

    @classmethod
    def name(cls) -> str:
        return "sparql_paginated"

    def schema(self) -> str:
        return "rel string, binding string"

    def reader(self, schema) -> DataSourceReader:
        return _PaginatedReader(self.options)

    def simpleStreamReader(self, schema):
        return _PaginatedStreamReader(self.options)


try:  # pyspark >= 4.0
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    HAVE_STREAM_READER = True
except ImportError:  # pragma: no cover
    HAVE_STREAM_READER = False
    SimpleDataSourceStreamReader = object  # type: ignore[assignment,misc]


class _PaginatedStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same extraction: the offset is an index
    into the ordered (relation x interval) cell list, and each
    micro-batch consumes up to ``cells_per_batch`` cells — the
    reference's incremental page/interval loop (extractor.py:42-147)
    expressed as a Structured Streaming source, so continuous
    ingestion gets checkpointed offsets, replay between offsets, and
    exactly-once sinks for free. With trigger(availableNow=True) it
    drains the backlog and stops — the scheduled-refresh shape.

    The cell list is fixed per query (relations x intervals); a live
    deployment would extend the list head as new intervals open (e.g.
    current-year cells re-polled), keeping offsets monotone.
    """

    def __init__(self, options: dict):
        self.opts = options
        r = _PaginatedReader(options)
        self.cells = [(p.rel, p.a, p.b) for p in r.partitions()]
        self.cells_per_batch = int(options.get("cells_per_batch", 4))
        self.batch_reader = r

    def initialOffset(self) -> dict:
        return {"cell": 0}

    def read(self, start: dict):
        i = int(start["cell"])
        j = min(i + self.cells_per_batch, len(self.cells))
        return self._rows(i, j), {"cell": j}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["cell"]), int(end["cell"]))

    def _rows(self, i: int, j: int) -> list[tuple]:
        # a LIST, not a generator: the runner's prefetch cache
        # copy.copy()s the returned iterator for offset replay, and a
        # micro-batch is cells_per_batch cells — bounded by design
        out: list[tuple] = []
        for rel, a, b in self.cells[i:j]:
            out.extend(self.batch_reader.read(_CellPartition(rel, a, b)))
        return out
