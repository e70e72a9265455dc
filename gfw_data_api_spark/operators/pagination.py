"""Offset pagination with links/meta envelopes.

Reference: app/utils/paginate.py:42-81 — ``LIMIT size OFFSET
(page-1)*size`` plus a count query, default page size 10 (I6).

The count and the page slice are two Spark actions on one plan; for
repeated paging over a big result, callers should persist the source or
page by a sort key (keyset pagination) — noted here because OFFSET deep
into 100 TB is inherently a scan, on Postgres and Spark alike.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PAGE_SIZE = 10


def paginate_df(
    df: DataFrame,
    page: int = 1,
    size: int = DEFAULT_PAGE_SIZE,
    order_by: list[str] | None = None,
    total_col: str = "total_rows",
) -> DataFrame:
    """Page slice as a DataFrame with the total stamped as a literal column.

    The total comes from a separate distributed ``count()`` action —
    never ``count(*) OVER ()``, whose empty partition spec is an
    unpartitioned WindowExec that moves every surviving row through a
    single task before the page is cut."""
    if page < 1 or size < 1:
        raise ValueError("page and size must be >= 1")
    total = df.count()
    ordered = df.orderBy(*order_by) if order_by else df
    return (
        ordered.offset((page - 1) * size)
        .limit(size)
        .withColumn(total_col, F.lit(total).cast("bigint"))
    )


@dataclass
class Page:
    data: list[Any]
    meta: dict[str, int]
    links: dict[str, str | None]


def paginate(
    df: DataFrame,
    page: int = 1,
    size: int = DEFAULT_PAGE_SIZE,
    order_by: list[str] | None = None,
    base_url: str = "",
) -> Page:
    if page < 1 or size < 1:
        raise ValueError("page and size must be >= 1")
    total_items = df.count()
    total_pages = max(math.ceil(total_items / size), 1)
    ordered = df.orderBy(*order_by) if order_by else df
    rows = ordered.offset((page - 1) * size).limit(size).collect()

    def link(p: int | None) -> str | None:
        if p is None or p < 1 or p > total_pages:
            return None
        return f"{base_url}?page[number]={p}&page[size]={size}"

    return Page(
        data=rows,
        meta={"size": size, "page": page, "total_items": total_items, "total_pages": total_pages},
        links={
            "self": link(page),
            "first": link(1),
            "last": link(total_pages),
            "prev": link(page - 1 if page > 1 else None),
            "next": link(page + 1 if page < total_pages else None),
        },
    )
