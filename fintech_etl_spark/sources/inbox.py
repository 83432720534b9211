"""Custom Python DataSource (the PySpark 4 connector extension API).

The reference's inbox is a GCS bucket paged client-side on the driver
(``/root/reference/main.py:172-192``). This is the same capability as
a FIRST-CLASS pluggable source: ``spark.read.format("invoice_inbox")``
plans one input partition per object (the listing distributes instead
of paging on the driver) and accepts planner-pushed filters — an
``=`` or ``ENDS WITH`` predicate on ``name`` prunes the listing before
any partition is launched, the same contract a JDBC/parquet scan
honors. Swapping ``os`` for a bucket client changes only the two
private helpers; the Spark surface is identical.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
    StringEndsWith,
)


@dataclass
class _FilePartition(InputPartition):
    path: str


class InboxReader(DataSourceReader):
    """One partition per inbox object; filter pushdown prunes the
    listing at planning time (driver-side), so unselected objects are
    never stat'ed or scheduled."""

    def __init__(self, options) -> None:
        root = options.get("path")
        if not root:
            raise ValueError("invoice_inbox requires .option('path', <dir>)")
        self._root = root
        self._name_eq: str | None = None
        self._suffix: str | None = None

    def pushFilters(self, filters):  # noqa: N802 — Spark API name
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("name",):
                self._name_eq = f.value
            elif isinstance(f, StringEndsWith) and f.attribute == ("name",):
                self._suffix = f.value
            else:
                yield f  # unhandled filters stay in the Spark plan

    def _names(self) -> list[str]:
        names = sorted(os.listdir(self._root))
        if self._name_eq is not None:
            names = [n for n in names if n == self._name_eq]
        if self._suffix is not None:
            names = [n for n in names if n.endswith(self._suffix)]
        return names

    def partitions(self):
        return [
            _FilePartition(os.path.join(self._root, n)) for n in self._names()
        ]

    def read(self, partition: _FilePartition):
        st = os.stat(partition.path)
        yield (os.path.basename(partition.path), st.st_size)


class InboxDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "invoice_inbox"

    def schema(self) -> str:
        return "name string, size long"

    def reader(self, schema):
        return InboxReader(self.options)


def register_inbox_source(spark) -> None:
    """Idempotent registration of the ``invoice_inbox`` format.

    Also enables Python-source filter pushdown on the session: a reader
    class that implements ``pushFilters`` hard-fails at plan time when
    ``spark.sql.python.filterPushdown.enabled`` is false (it is a
    runtime-settable SQLConf, so externally built sessions — e.g. the
    round driver's — work too)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(InboxDataSource)
