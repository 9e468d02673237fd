"""Rate-limited HTTP ingest against a REAL local HTTP server.

Covers the reference poller semantics (enrich_weather.py): retry with
backoff on 5xx, categorized sleep on 429 without burning retries,
proactive budget throttling, URL-keyed response cache, per-item
checkpoint + resume, and the Spark handoff (spool dir read back with a
declared schema).
"""

from __future__ import annotations

import http.server
import json
import threading

import pytest

from nyc_traffic_insight_spark.sources.http_ingest import HttpIngest, RateBudget


class _Handler(http.server.BaseHTTPRequestHandler):
    hits: dict[str, int] = {}
    fail_first: dict[str, list[int]] = {}  # path -> list of status codes

    def do_GET(self):  # noqa: N802
        cls = type(self)
        cls.hits[self.path] = cls.hits.get(self.path, 0) + 1
        pending = cls.fail_first.get(self.path)
        if pending:
            code = pending.pop(0)
            self.send_response(code)
            self.end_headers()
            return
        key = self.path.strip("/")
        rows = [{"k": key, "i": i, "v": i * 10.0} for i in range(3)]
        body = json.dumps(rows).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence
        pass


@pytest.fixture()
def server():
    _Handler.hits = {}
    _Handler.fail_first = {}
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _ingest(tmp_path, **kw):
    sleeps: list[float] = []
    ing = HttpIngest(
        spool_dir=str(tmp_path / "spool"),
        cache_dir=str(tmp_path / "cache"),
        checkpoint_path=str(tmp_path / "ckpt/progress.jsonl"),
        sleep=sleeps.append,
        backoff_s=0.2,
        **kw,
    )
    return ing, sleeps


def test_fetch_retry_backoff_and_land(server, tmp_path):
    _Handler.fail_first["/a"] = [500, 503]  # two failures, then success
    ing, sleeps = _ingest(tmp_path)
    out = ing.run([("a", f"{server}/a"), ("b", f"{server}/b")])
    assert out == {"fetched": 2, "skipped": 0}
    # two retries slept with exponential backoff
    assert sleeps[:2] == [0.2, 0.4]
    assert _Handler.hits["/a"] == 3
    lines = (tmp_path / "spool/a.jsonl").read_text().strip().splitlines()
    assert [json.loads(x)["i"] for x in lines] == [0, 1, 2]


def test_429_sleeps_category_without_burning_retries(server, tmp_path):
    _Handler.fail_first["/a"] = [429] * 7  # more 429s than retries
    ing, sleeps = _ingest(tmp_path, retries=2, rate_limit_sleep_s=10.0)
    out = ing.run([("a", f"{server}/a")])
    assert out["fetched"] == 1
    assert sleeps.count(10.0) == 7  # categorized sleeps, not failures


def test_checkpoint_resume_skips_completed(server, tmp_path):
    ing, _ = _ingest(tmp_path)
    ing.run([("a", f"{server}/a"), ("b", f"{server}/b")])
    before = dict(_Handler.hits)
    # fresh instance over the same checkpoint — the killed-run resume
    ing2, _ = _ingest(tmp_path)
    out = ing2.run([("a", f"{server}/a"), ("b", f"{server}/b"), ("c", f"{server}/c")])
    assert out == {"fetched": 1, "skipped": 2}
    assert _Handler.hits["/a"] == before["/a"]  # not refetched


def test_response_cache_prevents_refetch(server, tmp_path):
    ing, _ = _ingest(tmp_path)
    ing.run([("a", f"{server}/a")])
    # new checkpoint (forces re-landing) but same cache dir
    ing2 = HttpIngest(
        spool_dir=str(tmp_path / "spool2"),
        cache_dir=str(tmp_path / "cache"),
        checkpoint_path=str(tmp_path / "ckpt2/progress.jsonl"),
        sleep=lambda s: None,
    )
    ing2.run([("a", f"{server}/a")])
    assert _Handler.hits["/a"] == 1  # served from the URL-keyed cache


def test_proactive_budget_throttles_before_server_pushback(server, tmp_path):
    t = {"now": 0.0}
    ing, sleeps = _ingest(tmp_path, budgets=[RateBudget(limit=2, window_s=3600.0)])
    ing.clock = lambda: t["now"]
    ing.run([(k, f"{server}/{k}") for k in ("a", "b", "c")])
    # third request hit the exhausted budget and slept out the window
    assert any(s > 3000 for s in sleeps)


def test_spool_reads_back_through_spark(server, tmp_path, spark):
    ing, _ = _ingest(tmp_path)
    ing.run([(k, f"{server}/{k}") for k in ("a", "b")])
    df = spark.read.schema("k string, i long, v double").json(
        str(tmp_path / "spool")
    )
    assert df.count() == 6
    assert df.filter("k = 'a'").count() == 3


def test_poll_spool_stream_end_to_end(server, tmp_path, spark):
    """The full reference pipeline path in one test: rate-limited poll
    -> JSONL spool -> checkpointed file STREAM -> parquet sink ->
    batch query (enrich_weather.py feeding the merge pipeline)."""
    ing, _ = _ingest(tmp_path)
    ing.run([(k, f"{server}/{k}") for k in ("a", "b", "c")])

    src = str(tmp_path / "spool")
    chk = str(tmp_path / "stream_chk")
    out = str(tmp_path / "stream_out")
    stream = (
        spark.readStream.schema("k string, i long, v double")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    landed = spark.read.parquet(out)
    assert landed.count() == 9
    # resume: new work item lands, stream drains ONLY the new file
    ing.run([("d", f"{server}/d")])
    q2 = (
        spark.readStream.schema("k string, i long, v double")
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    final = spark.read.parquet(out)
    assert final.count() == 12  # exactly-once: no re-landed duplicates
    assert final.select("k").distinct().count() == 4


def test_persistent_429_gives_up_after_cap(server, tmp_path):
    # ADVICE r6: a server that 429s forever must fail the item, not spin
    _Handler.fail_first["/a"] = [429] * 50
    ing, sleeps = _ingest(tmp_path, max_rate_limit_sleeps=5)
    with pytest.raises(RuntimeError, match="rate-limited after 5"):
        ing.run([("a", f"{server}/a")])
    assert sleeps.count(10.0) == 5  # capped, then gave up


def test_invalid_body_does_not_poison_cache(server, tmp_path):
    # ADVICE r6: a non-array body must NOT be persisted to the cache —
    # otherwise every rerun re-raises from cache with no recovery path
    import os

    class _BadHandler:
        calls = {"n": 0}

    def fake_fetch(url):
        _BadHandler.calls["n"] += 1
        if _BadHandler.calls["n"] == 1:
            return json.dumps({"not": "an array"}).encode()
        return json.dumps([{"k": "a", "i": 0, "v": 0.0}]).encode()

    ing, _ = _ingest(tmp_path)
    ing.fetch = fake_fetch
    with pytest.raises(ValueError, match="expected a JSON array"):
        ing.run([("a", "local://a")])
    assert os.listdir(str(tmp_path / "cache")) == []  # nothing cached
    # rerun recovers: server now healthy, fresh fetch succeeds
    out = ing.run([("a", "local://a")])
    assert out == {"fetched": 1, "skipped": 0}


def test_stale_bad_cache_entry_is_evicted(tmp_path):
    # a bad body already in the cache (older writer) is evicted and
    # refetched instead of re-raising forever
    import hashlib
    import os

    url = "local://a"
    ing, _ = _ingest(tmp_path)
    cache_file = os.path.join(
        str(tmp_path / "cache"), hashlib.md5(url.encode()).hexdigest() + ".body"
    )
    with open(cache_file, "wb") as f:
        f.write(json.dumps({"bad": True}).encode())
    ing.fetch = lambda u: json.dumps([{"k": "a", "i": 0, "v": 0.0}]).encode()
    out = ing.run([("a", url)])
    assert out == {"fetched": 1, "skipped": 0}
