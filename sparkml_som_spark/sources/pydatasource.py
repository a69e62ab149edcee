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
