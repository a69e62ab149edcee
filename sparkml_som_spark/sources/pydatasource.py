"""Custom Python Data Source (Spark 4 DataSource API): a deterministic
synthetic-documents generator.

This is the engine's demonstration of the pluggable-source surface —
the same API a user would implement to read a bespoke corpus format
(tar-of-jsonl shards, a proprietary doc store) straight into the
pipeline.  The generator is a pure function of the row id, so:

- the read parallelizes over ``partitions`` InputPartitions with no
  coordination (each partition derives its own [lo, hi) id range);
- the result is independent of the partition count (tested), which is
  the correctness contract any sharded source must satisfy;
- a DuckDB oracle can recompute the identical rows from ``range(n)``,
  putting a CUSTOM SOURCE under the value-hash gate.

At 100 TB the same shape holds: partitions() returns one entry per
shard/file/split, read() streams a shard; Spark schedules the splits
like any other scan.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class SynthDocsDataSource(DataSource):
    """``spark.read.format("synthdocs").option("n", N).load()``."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "doc_id bigint, source string, n_tokens int"

    def reader(self, schema) -> "SynthDocsReader":
        return SynthDocsReader(self.options)

    def streamReader(self, schema) -> "SynthDocsStreamReader":
        return SynthDocsStreamReader(self.options)


class SynthDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("partitions", 8))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        i = partition.value
        lo = self.n * i // self.parts
        hi = self.n * (i + 1) // self.parts
        for d in range(lo, hi):
            # deterministic formulas; mirrored in the DuckDB oracle
            yield (d, f"src{d % 20}", 20 + (d * 7) % 180)


def ensure_registered(spark) -> None:
    """Register the source on this session.  Registration is itself
    idempotent (re-registering replaces the entry), so no caching — a
    seen-set keyed by id(spark) would go stale when CPython recycles a
    garbage-collected session's address and silently skip the real
    registration."""
    spark.dataSource.register(SynthDocsDataSource)


# ---------------------------------------------------------------------------
# Streaming half of the same source (Spark 4 DataSourceStreamReader):
# the API a user implements to stream a bespoke feed (queue poller,
# object-store listing, change feed) through Structured Streaming.  The
# generator exposes the SAME deterministic rows as the batch reader, as
# one offset range [0, n): micro-batch planning walks the offset log,
# partitions(start, end) fans the range out, and the drained sink is
# byte-identical to the batch read — so a STREAMING custom source sits
# under the full value-hash oracle too.
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import DataSourceStreamReader  # noqa: E402


class SynthDocsStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("partitions", 8))

    def initialOffset(self):
        return {"offset": 0}

    def latestOffset(self):
        # the feed's head: everything is available immediately; a real
        # source would poll its upstream here and advance incrementally
        return {"offset": self.n}

    def partitions(self, start, end):
        lo, hi = start["offset"], end["offset"]
        span = hi - lo
        if span <= 0:
            return [RangePartition(lo, lo)]
        bounds = [lo + span * i // self.parts for i in range(self.parts + 1)]
        return [RangePartition(a, b) for a, b in zip(bounds, bounds[1:]) if b > a]

    def read(self, partition):
        for d in range(partition.lo, partition.hi):
            yield (d, f"src{d % 20}", 20 + (d * 7) % 180)

    def commit(self, end):
        pass  # nothing to ack for a deterministic generator


class RangePartition(InputPartition):
    def __init__(self, lo, hi):
        self.lo, self.hi = lo, hi
