"""Scrape-source connector (reference S1, aiesec.py:22-67) on the
Spark 4 Python Data Source API.

The reference drives a headless browser ("Load more" pagination, 30 s
sleeps) on the driver; the Spark-native shape is a custom
``DataSource`` whose reader partitions the page list so fetching
parallelizes across executors.  Network fetching is intentionally NOT
implemented (hermetic builds, FIXTURES.md §A2): the reader serves
recorded HTML fixtures; a real deployment would swap ``_fetch`` for an
HTTP call — the partitioning, schema, and registration stay the same.

Usage:
    register_listing_source(spark)
    spark.read.format("listing_scrape").load()   # page_id, html rows
"""

from __future__ import annotations

from pyspark.sql import SparkSession

try:  # Spark >= 4.0
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    _HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover - older Spark
    DataSource = object  # type: ignore[assignment,misc]
    DataSourceReader = object  # type: ignore[assignment,misc]
    InputPartition = object  # type: ignore[assignment,misc]
    _HAS_DATASOURCE_API = False


def _fixture_pages() -> dict[int, list[str]]:
    from .fixtures import FIXTURE_CARDS

    pages: dict[int, list[str]] = {}
    for page_id, html in FIXTURE_CARDS:
        pages.setdefault(page_id, []).append(html)
    return pages


def _fetch(page_id: int) -> list[str]:
    """The fetch seam: page id → HTML fragments for that page.

    Hermetic builds serve recorded fixtures; a real deployment
    replaces THIS ONE FUNCTION with an HTTP fetch (the reference's
    browser pagination, aiesec.py:51-63).  Partitioning, schema, and
    registration are unchanged by the swap — executors call `_fetch`
    per assigned page, so fetching parallelizes across the cluster.
    """
    return _fixture_pages()[page_id]


class ListingScrapeDataSource(DataSource):  # type: ignore[misc]
    """`format("listing_scrape")` — one row per card fragment."""

    @classmethod
    def name(cls) -> str:
        return "listing_scrape"

    def schema(self) -> str:
        return "page_id int, html string"

    def reader(self, schema) -> "ListingScrapeReader":
        return ListingScrapeReader()


class ListingScrapeReader(DataSourceReader):  # type: ignore[misc]
    """One input partition per listing page — the unit the reference
    fetches serially behind its per-page sleep (aiesec.py:51-63);
    here pages fetch in parallel across executors."""

    def partitions(self):
        return [InputPartition(p) for p in sorted(_fixture_pages())]

    def read(self, partition):
        page_id = partition.value
        for html in _fetch(page_id):
            yield (page_id, html)


def register_listing_source(spark: SparkSession) -> bool:
    """Register the connector; returns False when the Python Data
    Source API is unavailable (caller falls back to fixtures)."""
    if not _HAS_DATASOURCE_API:
        return False
    spark.dataSource.register(ListingScrapeDataSource)
    return True
