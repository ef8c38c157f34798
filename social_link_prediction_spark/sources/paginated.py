"""Paginated / interval-partitioned fetch source (S1–S3, S5).

Reference: extractor.py:42-147 loops LIMIT/OFFSET pages against the
Wikidata SPARQL endpoint, shrinking the page size on error and
retrying with backoff; intervals over birth-year ranges partition the
keyspace; ~25 relation query templates are unioned.

Engine design: the FETCHER is pluggable (tests and offline runs use a
recorded-fixture fetcher; production wires an HTTP client). Each
(relation, interval) cell is one independent fetch task — the Spark
analog of a partitioned read. The driver-side loop stays tiny
(issuing fetches); parsing/flattening happens in Spark from the saved
JSON, so network pacing and cluster compute are decoupled, exactly
like the reference's extract-then-transform split.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable, Iterator, Sequence
from dataclasses import dataclass

# A fetcher returns a list of SPARQL binding dicts for a query string.
Fetcher = Callable[[str], list[dict]]

YEAR_FILTER_HOOK = "##YEAR_FILTER_HOOK##"
FIND_HOOK = "##FIND_HOOK##"


@dataclass
class RetryPolicy:
    """extractor.py:48,88-107 semantics: adaptive page shrink + backoff."""

    max_retries: int = 20
    page_shrink: int = 2000
    min_page_size: int = 1000
    sleep_base: float = 0.0  # seconds; 0 in tests

    def sleep_for(self, attempt: int) -> float:
        base = self.sleep_base * (attempt + 1)
        return base * 2 if (attempt + 1) % 5 == 0 else base


def create_intervals(start: int, end: int, step: int) -> list[tuple[int, int]]:
    """extractor.py:111-120: half-open (a, b] year intervals."""
    return [(a, min(a + step, end)) for a in range(start, end, step)]


def run_paginated_query(
    base_query: str,
    fetcher: Fetcher,
    page_size: int = 10000,
    retry: RetryPolicy | None = None,
) -> Iterator[list[dict]]:
    """S1: LIMIT/OFFSET pagination with adaptive page-size shrink.
    Yields pages until a short page signals the end."""
    retry = retry or RetryPolicy()
    offset = 0
    size = page_size
    attempt = 0
    while True:
        q = f"{base_query}\nLIMIT {size} OFFSET {offset}"
        try:
            page = fetcher(q)
        except Exception:  # noqa: BLE001 — any fetch error triggers degrade+retry
            attempt += 1
            if attempt > retry.max_retries:
                raise
            size = max(retry.min_page_size, size - retry.page_shrink)
            time.sleep(retry.sleep_for(attempt))
            continue
        attempt = 0
        if page:
            yield page
        if len(page) < size:
            return
        offset += size


def run_interval_query(
    base_query: str,
    fetcher: Fetcher,
    start: int,
    end: int,
    step: int = 5,
    page_size: int = 10000,
    year_var: str = "?dob",
) -> Iterator[list[dict]]:
    """S2: predicate-injection partitioned fetch — one paginated scan
    per year interval (partition pruning pushed to the remote source).
    """
    for a, b in create_intervals(start, end, step):
        flt = f"FILTER(YEAR({year_var}) > {a} && YEAR({year_var}) <= {b})"
        q = base_query.replace(YEAR_FILTER_HOOK, flt)
        yield from run_paginated_query(q, fetcher, page_size)


def fetch_all_relationships(
    base_query: str,
    relation_snippets: dict[str, str],
    fetcher: Fetcher,
    out_dir: str,
    start: int = 1800,
    end: int = 2025,
    step: int = 5,
    page_size: int = 10000,
) -> dict[str, int]:
    """S3/S4: per-relation templated extraction -> raw_data_{rel}.json
    files (the reference's head/results envelope), ready for
    sources.json_flatten. Returns row counts per relation."""
    os.makedirs(out_dir, exist_ok=True)
    counts: dict[str, int] = {}
    for rel, snippet in relation_snippets.items():
        q = base_query.replace(FIND_HOOK, snippet)
        bindings: list[dict] = []
        for page in run_interval_query(q, fetcher, start, end, step, page_size):
            bindings.extend(page)
        head_vars = sorted({k for b in bindings for k in b})
        payload = {"head": {"vars": head_vars}, "results": {"bindings": bindings}}
        with open(os.path.join(out_dir, f"raw_data_{rel}.json"), "w") as f:
            json.dump(payload, f, ensure_ascii=False)
        counts[rel] = len(bindings)
    return counts


def batched_values_lookup(
    ids: Sequence[str],
    query_template: str,
    fetcher: Fetcher,
    batch_size: int = 300,
) -> list[dict]:
    """S5/J7: 300-id VALUES-batched lookup (query_by_batch_id.py:26-36)
    — a remote broadcast-semi-join."""
    out: list[dict] = []
    for i in range(0, len(ids), batch_size):
        chunk = ids[i : i + batch_size]
        values = " ".join(f"wd:{x}" for x in chunk)
        out.extend(fetcher(query_template.replace("##VALUES##", values)))
    return out


# ---------------------------------------------------------------------
# S1 production fetcher: HTTP SPARQL client (extractor.py:30-41,52-65
# semantics — JSON results format, mandatory User-Agent, 300 s timeout,
# tolerant utf-8 decode). Pure stdlib (urllib) so it works everywhere;
# the ``transport`` hook injects a fake wire for offline tests, and the
# recorded-fixture fetcher remains the default in the test suite. The
# retry / page-shrink / backoff policy lives in run_paginated_query —
# this function only does one request per call.
# ---------------------------------------------------------------------
def http_fetcher(
    endpoint: str = "https://query.wikidata.org/sparql",
    user_agent: str | None = None,
    timeout: float = 300.0,
    transport: Callable[[str, bytes, dict], bytes] | None = None,
) -> Fetcher:
    """Build a Fetcher that POSTs SPARQL queries and returns the
    ``results.bindings`` list. ``transport(url, body, headers) ->
    bytes`` is injectable; the default uses urllib."""
    if not user_agent:
        # the reference refuses to query Wikidata anonymously
        # (extractor.py:31-32); same contract here
        raise ValueError("user_agent is required for SPARQL endpoints")

    if transport is None:

        def transport(url: str, body: bytes, headers: dict) -> bytes:
            import urllib.request

            req = urllib.request.Request(url, data=body, headers=headers, method="POST")
            with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
                return resp.read()

    def fetch(query: str) -> list[dict]:
        from urllib.parse import urlencode

        body = urlencode({"query": query, "format": "json"}).encode()
        headers = {
            "User-Agent": user_agent,
            "Accept": "application/sparql-results+json",
            "Content-Type": "application/x-www-form-urlencoded",
        }
        raw = transport(endpoint, body, headers)
        results = json.loads(raw.decode("utf-8", errors="ignore"))
        return results["results"]["bindings"]

    return fetch
