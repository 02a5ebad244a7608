"""Spark 4 Python Data Source API surface: a custom partitioned
batch source registered with spark.dataSource.register and consumed
through the standard spark.read.format(...) path.

The source generates deterministic rows as a pure function of the row
index (md5 hex-digit arithmetic — the same expression family every
hash-threshold operator in this repo uses), so a DuckDB range() oracle
reproduces it exactly: the API plumbing (partition planning, per-task
iterators, options) is what's under test, with zero RNG.

At scale this is the template for reading a system Spark has no
built-in connector for: partitions() carves the key space so every
executor reads its slice independently — no driver fan-in.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_HEX = "0123456789abcdef"


class SyntheticEventsDataSource(DataSource):
    """format name: synthetic_events; options: n (rows), partitions."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "id BIGINT, bucket INT, weight DOUBLE"

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", "1000"))
        self.n_parts = max(1, int(options.get("partitions", "8")))

    def partitions(self):
        step = -(-self.n // self.n_parts)  # ceil div
        return [
            InputPartition((lo, min(lo + step, self.n)))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: InputPartition):
        import hashlib

        lo, hi = partition.value
        for i in range(lo, hi):
            h = hashlib.md5(str(i).encode()).hexdigest()
            bucket = (
                _HEX.index(h[0]) * 256 + _HEX.index(h[1]) * 16 + _HEX.index(h[2])
            )
            yield (i, bucket, bucket / 4096.0)


def register_synthetic_source(spark) -> None:
    """Idempotent registration (re-register replaces)."""
    spark.dataSource.register(SyntheticEventsDataSource)
