"""Custom Python Data Source (Spark 4 DataSource API).

A deterministic synthetic tick source: ``n`` ticks split across
``partitions`` input partitions, each tick carrying a series id and a
price derived from pure integer arithmetic — so an exact SQL oracle
can regenerate the identical rows. This is the V2-connector surface a
user would implement for a bespoke feed (REST cursor, message queue,
proprietary format): Spark asks the source for its schema and
partition list on the driver, then calls ``read(partition)`` on
executors — the parallelism contract is the partition list, exactly
like a file source's splits.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class TickerDataSource(DataSource):
    """``spark.read.format("bdfr_ticker")`` after registration."""

    @classmethod
    def name(cls) -> str:
        return "bdfr_ticker"

    def schema(self) -> str:
        return "tick_id bigint, series int, px double"

    def reader(self, schema) -> "TickerReader":
        return TickerReader(self.options)


class TickerReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", "1000"))
        self.parts = int(options.get("partitions", "4"))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        per = self.n // self.parts
        start = partition.value * per
        end = self.n if partition.value == self.parts - 1 else start + per
        for t in range(start, end):
            # pure integer arithmetic -> bit-identical double on any engine
            yield (t, t % 8, 50.0 + 10.0 * ((t * 37) % 100) / 100.0)
