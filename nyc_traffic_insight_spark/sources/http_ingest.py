"""Rate-limited, checkpointed HTTP ingest — the reference's API poller
re-expressed as an engine source utility.

Reference behavior (scripts/enrich_weather.py:21-23, 69-121, 173-178):
a cached+retrying HTTP session walks a work list one request at a
time, throttles PROACTIVELY against hourly/daily budgets, sleeps by
rate-limit category when the server pushes back, and checkpoints
partial progress after every successful item so a killed run resumes
where it stopped.

This module keeps that contract but lands each work item as its own
JSONL file in a spool directory — the shape Spark actually wants:
``stream_file_ingest`` (queries/streamingq.py) or a plain
``spark.read.json`` picks the spool up with schema + malformed-row
handling, so ingest (driver-side, I/O-bound, sequential by rate
limit) and processing (cluster-side, parallel) are decoupled exactly
as they must be at scale. Per SURVEY §2 the poller itself is NOT a
query operator — it has no registry entry; tests/test_http_ingest.py
drives it against a real local HTTP server.

Determinism/ops contract:
- the response cache is content-addressed by URL (md5), so reruns and
  overlapping runs never refetch a completed URL (requests_cache
  equivalent);
- the checkpoint is a JSONL append-log of completed item keys; resume
  reads it and skips — partial files are never re-landed, so the
  spool stays exactly-once for downstream readers;
- time and sleep are injected so tests exercise budget exhaustion and
  backoff without real waiting.
"""

from __future__ import annotations

import hashlib
import json
import os
import time as _time
import urllib.error
import urllib.request
from collections.abc import Callable, Iterable
from dataclasses import dataclass, field


@dataclass
class RateBudget:
    """Proactive request budget over a FIXED window (the reference's
    4500/hour and 9500/day counters, enrich_weather.py:76-96): the
    window starts at the first recorded request and resets wholesale
    once ``window_s`` elapses — it is not a rolling per-request
    window. Callers must re-check ``wait_time`` after sleeping (the
    lazy roll happens on the NEXT call once the clock shows a
    completed window), which ``HttpIngest`` does."""

    limit: int
    window_s: float
    count: int = 0
    window_start: float | None = None

    def wait_time(self, now: float) -> float:
        """Pure read + lazy window roll: state only resets once the
        clock actually shows a completed window. Mutating state when
        RETURNING a sleep (the previous design) silently bypassed the
        limit whenever the sleep was interrupted or skipped — the
        budget had already forgiven the window. Callers re-check after
        sleeping (bounded, see HttpIngest._fetch_with_retry) so the
        boundary request lands in the freshly-rolled window, never the
        stale one."""
        if self.window_start is None:
            self.window_start = now
        elapsed = now - self.window_start
        if elapsed >= self.window_s:
            self.count = 0
            self.window_start = now
            return 0.0
        if self.count >= self.limit:
            return self.window_s - elapsed
        return 0.0

    def record(self) -> None:
        self.count += 1


@dataclass
class HttpIngest:
    """Pull a work list of (key, url) items into a JSONL spool.

    ``retries`` failed attempts per item with ``backoff_s * 2**attempt``
    sleeps (the reference's retry_requests wrapper, retries=5,
    backoff_factor=0.2); HTTP 429 sleeps ``rate_limit_sleep_s`` and
    does NOT consume a retry (the reference's categorized rate-limit
    sleeps) but is capped at ``max_rate_limit_sleeps`` per request so a
    persistently-429ing server fails the run instead of looping
    forever; other HTTP/URL errors consume retries and re-raise when
    exhausted.
    """

    spool_dir: str
    cache_dir: str
    checkpoint_path: str
    budgets: list[RateBudget] = field(default_factory=list)
    retries: int = 5
    backoff_s: float = 0.2
    rate_limit_sleep_s: float = 10.0
    max_rate_limit_sleeps: int = 100
    per_request_pause_s: float = 0.0
    clock: Callable[[], float] = _time.monotonic
    sleep: Callable[[float], None] = _time.sleep
    fetch: Callable[[str], bytes] | None = None  # test seam; None = urllib

    def __post_init__(self) -> None:
        os.makedirs(self.spool_dir, exist_ok=True)
        os.makedirs(self.cache_dir, exist_ok=True)
        os.makedirs(os.path.dirname(self.checkpoint_path) or ".", exist_ok=True)

    # ------------------------------------------------------------ state
    def completed(self) -> set[str]:
        done: set[str] = set()
        if os.path.exists(self.checkpoint_path):
            with open(self.checkpoint_path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        done.add(json.loads(line)["key"])
        return done

    def _mark_done(self, key: str) -> None:
        with open(self.checkpoint_path, "a") as f:
            f.write(json.dumps({"key": key}) + "\n")

    # ------------------------------------------------------------ fetch
    def _cached_fetch(
        self, url: str, validate: Callable[[bytes], None] | None = None
    ) -> bytes:
        """Content-addressed cache around the retrying fetch. A fresh
        body is validated BEFORE it is persisted — an invalid response
        must not poison the cache, or every rerun/resume re-raises from
        cache with no recovery path. A cached body that fails
        validation (written by an older version) is evicted and
        refetched once."""
        cache_file = os.path.join(
            self.cache_dir, hashlib.md5(url.encode()).hexdigest() + ".body"
        )
        if os.path.exists(cache_file):
            with open(cache_file, "rb") as f:
                body = f.read()
            if validate is None:
                return body
            try:
                validate(body)
                return body
            except Exception:
                os.remove(cache_file)  # stale bad entry: refetch below
        body = self._fetch_with_retry(url)
        if validate is not None:
            validate(body)  # raises before the cache write
        tmp = cache_file + ".tmp"
        with open(tmp, "wb") as f:
            f.write(body)
        os.replace(tmp, cache_file)
        return body

    def _raw_fetch(self, url: str) -> bytes:
        if self.fetch is not None:
            return self.fetch(url)
        with urllib.request.urlopen(url, timeout=30) as r:  # noqa: S310
            return r.read()

    def _fetch_with_retry(self, url: str) -> bytes:
        attempt = 0
        rl_sleeps = 0
        while True:
            for b in self.budgets:
                # bounded re-check: the first sleep covers the window
                # remainder, the second wait_time call rolls the window
                # (count reset) so record() lands in the FRESH window —
                # without it the boundary request counts into the stale
                # window and the server sees limit+1. Bounded (not
                # while-looped) so an injected no-op sleep/clock in
                # tests cannot spin forever.
                for _ in range(2):
                    wait = b.wait_time(self.clock())
                    if wait <= 0:
                        break
                    self.sleep(wait)
            try:
                body = self._raw_fetch(url)
                for b in self.budgets:
                    b.record()
                if self.per_request_pause_s:
                    self.sleep(self.per_request_pause_s)
                return body
            except urllib.error.HTTPError as e:
                if e.code == 429:
                    # server-side rate limit: sleep its category, don't
                    # burn a retry (enrich_weather.py:103-118) — but cap
                    # the categorized sleeps so a persistently-429ing
                    # server fails the item instead of spinning forever
                    rl_sleeps += 1
                    if rl_sleeps > self.max_rate_limit_sleeps:
                        raise RuntimeError(
                            f"{url}: still rate-limited after "
                            f"{self.max_rate_limit_sleeps} categorized "
                            "sleeps — giving up"
                        ) from e
                    self.sleep(self.rate_limit_sleep_s)
                    continue
                attempt += 1
                if attempt > self.retries:
                    raise
                self.sleep(self.backoff_s * (2 ** (attempt - 1)))
            except urllib.error.URLError:
                attempt += 1
                if attempt > self.retries:
                    raise
                self.sleep(self.backoff_s * (2 ** (attempt - 1)))

    # -------------------------------------------------------------- run
    def run(self, items: Iterable[tuple[str, str]]) -> dict[str, int]:
        """Fetch every (key, url) not already checkpointed; land each
        response as ``<spool>/<key>.jsonl`` (one JSON object per line —
        the body must be a JSON array of row objects). Returns
        {fetched, skipped} counts."""
        def _validate(body: bytes) -> None:
            if not isinstance(json.loads(body.decode()), list):
                raise ValueError("expected a JSON array of rows")

        done = self.completed()
        fetched = skipped = 0
        for key, url in items:
            if key in done:
                skipped += 1
                continue
            try:
                body = self._cached_fetch(url, validate=_validate)
            except ValueError as e:
                raise ValueError(f"{key}: {e}") from e
            rows = json.loads(body.decode())
            out = os.path.join(self.spool_dir, f"{key}.jsonl")
            tmp = out + ".tmp"
            with open(tmp, "w") as f:
                for row in rows:
                    f.write(json.dumps(row) + "\n")
            os.replace(tmp, out)  # atomic: readers never see partials
            self._mark_done(key)
            fetched += 1
        return {"fetched": fetched, "skipped": skipped}
