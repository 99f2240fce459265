"""Pagination planning (reference S6/S7: etl/download_rest.py:325-422).

The reference loops offset pages (or OID batches) sequentially in one
Python process; here the planner emits a *partition plan* — one row per
page/batch — and executors fetch concurrently. This is exactly the
reference's documented-but-unimplemented parallel OID sweep
(docs/oid-batch-parallelism.md; etl/download_rest.py:20-21 constants are
unused in its code): Spark task slots replace `max_workers`, and the plan
caps match the reference's safety limits.
"""

from __future__ import annotations

from dataclasses import dataclass

PAGE_SIZE = 1000          # etl/download_rest.py:332, 399
MAX_OFFSET = 1_000_000    # etl/download_rest.py:368
MAX_OGC_PAGES = 1000      # etl/download_ogc.py:316
MAX_CONCURRENT = 8        # etl/download_rest.py:20 (politeness cap)


@dataclass(frozen=True)
class OffsetPage:
    offset: int
    size: int


@dataclass(frozen=True)
class OidBatch:
    oids: tuple[int, ...]

    def where_fragment(self, oid_field: str) -> str:
        ids = ",".join(str(i) for i in self.oids)
        return f"{oid_field} IN ({ids})"


def plan_offset_pages(total_count: int, page_size: int = PAGE_SIZE) -> list[OffsetPage]:
    """Offset pagination plan; respects the reference's 1M-offset cap."""
    pages = []
    offset = 0
    while offset < total_count and offset <= MAX_OFFSET:
        pages.append(OffsetPage(offset, page_size))
        offset += page_size
    return pages


def plan_oid_batches(oids: list[int], batch_size: int = PAGE_SIZE) -> list[OidBatch]:
    """OID pagination plan (etl/download_rest.py:379-422): sorted OIDs in
    batches of `batch_size`; each batch is an independent fetch task."""
    s = sorted(oids)
    return [OidBatch(tuple(s[i : i + batch_size])) for i in range(0, len(s), batch_size)]


def fetch_parallelism(n_tasks: int, politeness_cap: int = MAX_CONCURRENT) -> int:
    """Partitions for a fetch stage: parallel up to the per-service
    politeness cap (coalesce keeps concurrent requests bounded no matter
    how many executors exist)."""
    return max(1, min(n_tasks, politeness_cap))
