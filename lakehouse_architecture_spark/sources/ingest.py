"""Paged-API ingest utility — the reference crawler's shape, engine-ized.

Rebuilds the behavior of ``app/bronze.py`` (S13 in SURVEY.md §2.1) without
the hardcoded endpoint: page through a listing API (`fetch_page`), fetch
details with bounded retry + exponential backoff (`fetch_detail`), skip ids
already seen, and emit one JSON-array batch file named
``crawl_<yyyyMMdd_HHmmss>.json`` — exactly the bronze layout the silver
job consumes (``app/bronze.py:107-138``).

Differences from the reference, by design:
* the fetcher is injected (testable without network; any HTTP client works);
* the seen-ID set is supplied/returned instead of a mutable ledger file —
  persist it with operators/upsert.merge_upsert(insert_only=True), the
  scalable WHEN-NOT-MATCHED replacement for list_ids.txt
  (``app/bronze.py:29,50-63``);
* ingest is driver-side by nature (it talks to an external API); everything
  after the drop file is executor-side.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable, Iterable
from dataclasses import dataclass, field
from datetime import datetime, timezone


@dataclass
class CrawlResult:
    batch_path: str | None
    n_fetched: int
    n_skipped: int
    seen_ids: set[str] = field(default_factory=set)


def crawl_batch(
    fetch_page: Callable[[int, int], Iterable[dict]],
    fetch_detail: Callable[[str], dict],
    out_dir: str,
    seen_ids: set[str] | None = None,
    max_pages: int = 200,
    page_size: int = 20,
    max_retries: int = 3,
    page_pause_s: float = 0.0,
    now: datetime | None = None,
    backoff_base_s: float = 1.0,
) -> CrawlResult:
    """Crawl up to max_pages×page_size listings into one bronze batch file.

    Retry policy mirrors the reference: ``max_retries`` attempts with
    ``backoff_base_s * 2^n`` backoff per detail fetch
    (``app/bronze.py:73-98``); a listing that keeps failing is skipped,
    never fatal. Tests pass a millisecond-scale ``backoff_base_s``; the
    production default is real seconds — a baked-in ms sleep would make
    the retry a no-op against any actual outage or 429.
    """
    seen = set(seen_ids or ())
    rows: list[dict] = []
    skipped = 0
    for page in range(max_pages):
        listings = list(fetch_page(page * page_size, page_size))
        if not listings:
            break
        for item in listings:
            # `get("list_id", fallback)` would NOT fall back on an
            # explicit null (the key exists), and str(None) is a truthy
            # id that poisons seen_ids for every later null-id item
            lid = str(item.get("list_id") or item.get("id") or "")
            if not lid or lid in seen:
                skipped += 1
                continue
            detail = _fetch_with_retry(
                fetch_detail, lid, max_retries, backoff_base_s
            )
            if detail is None:
                skipped += 1
                continue
            seen.add(lid)
            rows.append(detail)
        if page_pause_s:
            time.sleep(page_pause_s)
    if not rows:
        return CrawlResult(None, 0, skipped, seen)
    stamp = (now or datetime.now(timezone.utc)).strftime("%Y%m%d_%H%M%S")
    os.makedirs(out_dir, exist_ok=True)
    # second-resolution stamps collide when two batches land in the same
    # wall-clock second (silently replacing the first file); a uuid
    # suffix makes every batch file unique
    import uuid

    path = os.path.join(out_dir, f"crawl_{stamp}_{uuid.uuid4().hex[:8]}.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(rows, f, ensure_ascii=False)
    return CrawlResult(path, len(rows), skipped, seen)


def _fetch_with_retry(
    fetch_detail: Callable[[str], dict],
    lid: str,
    max_retries: int,
    backoff_base_s: float = 1.0,
) -> dict | None:
    for attempt in range(max_retries):
        try:
            return fetch_detail(lid)
        except Exception:  # noqa: BLE001 — any fetch error retries
            if attempt + 1 < max_retries:
                time.sleep(min(2**attempt, 8) * backoff_base_s)
    return None
