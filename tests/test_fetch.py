"""HTTP fetch source (SURVEY §2 S3) pinned against a loopback
``http.server`` — no external network anywhere: success bytes are
byte-identical, non-2xx and unreachable endpoints land in honest
(status, error) rows, oversized bodies truncate at the cap, and the
politeness delay provably serializes same-domain hits."""

from __future__ import annotations

import http.server
import threading
import time

import pytest

from cc_extract.fetch import fetch_df, fetch_one

BODY_A = (
    b"<html><head><title>T</title></head><body><p>"
    + b"the alpha doc corpus sentence keeps flowing with plain prose "
    b"words and more plain words so the density heuristic keeps it "
    b"around for extraction today. " * 2
    + b"</p></body></html>"
)
BODY_BIG = b"B" * 5000


class _Handler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 — http.server API
        path = self.path.split("?", 1)[0]
        if path == "/a.html":
            body = BODY_A
        elif path == "/big.bin":
            body = BODY_BIG
        elif path == "/missing":
            self.send_error(404)
            return
        elif path == "/slow":
            time.sleep(3.0)
            body = b"late"
        else:
            self.send_error(500)
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # keep pytest output clean
        pass


@pytest.fixture(scope="module")
def server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_one_success_and_failures(server):
    ok = fetch_one(f"{server}/a.html")
    assert ok["status"] == 200 and ok["payload"] == BODY_A
    assert ok["n_bytes"] == len(BODY_A) and ok["error"] is None

    nf = fetch_one(f"{server}/missing")
    assert nf["status"] == 404 and nf["error"] == "http_404"
    assert nf["payload"] is None

    down = fetch_one("http://127.0.0.1:9/nope", timeout=1.0)
    assert down["status"] is None and down["error"] is not None

    slow = fetch_one(f"{server}/slow", timeout=0.5)
    assert slow["status"] is None and "unreachable" in slow["error"]


def test_fetch_one_rejects_non_http_schemes(tmp_path):
    """Untrusted url lists must not reach non-http(s) handlers: a file://
    entry would read local files into the payload column (round-6 advice).
    The rejection is an error ROW (never-raises contract), no I/O done."""
    secret = tmp_path / "secret.txt"
    secret.write_bytes(b"do-not-read")
    for url in (f"file://{secret}", "ftp://example.com/x",
                "FILE:///etc/hostname", "gopher://x", "not-a-url"):
        r = fetch_one(url)
        assert r["error"] == "scheme_not_allowed", url
        assert r["payload"] is None and r["status"] is None


def test_fetch_one_truncates_at_cap(server):
    r = fetch_one(f"{server}/big.bin", max_bytes=1000)
    assert r["status"] == 200 and r["truncated"] is True
    assert r["n_bytes"] == 1000 and r["payload"] == BODY_BIG[:1000]
    full = fetch_one(f"{server}/big.bin")
    assert full["truncated"] is False and full["n_bytes"] == 5000


def test_fetch_df_distributed(spark, server):
    urls = spark.createDataFrame(
        [(f"{server}/a.html",), (f"{server}/missing",),
         ("http://127.0.0.1:9/nope",), (f"{server}/big.bin",)],
        "url string",
    )
    rows = {r["url"]: r for r in fetch_df(
        spark, urls, timeout=2.0, partitions=2).collect()}
    assert len(rows) == 4
    a = rows[f"{server}/a.html"]
    assert a["status"] == 200 and bytes(a["payload"]) == BODY_A
    assert a["domain"] == "127.0.0.1"
    assert rows[f"{server}/missing"]["status"] == 404
    assert rows["http://127.0.0.1:9/nope"]["error"] is not None
    big = rows[f"{server}/big.bin"]
    assert big["n_bytes"] == 5000 and not big["truncated"]


def test_fetch_df_payload_feeds_pipeline(spark, server):
    """The fetch output column IS the extraction pipeline's input: html
    payload fetched over loopback extracts through extract_document."""
    from cc_extract.extractors import extract_document

    urls = spark.createDataFrame([(f"{server}/a.html",)], "url string")
    row = fetch_df(spark, urls, timeout=2.0, partitions=1).collect()[0]
    res = extract_document(bytes(row["payload"]), row["url"])
    assert res["status"] == "ok" and "alpha doc" in res["text"]


def test_per_domain_delay_serializes(spark, server):
    """Politeness through the REAL path: three same-domain urls land in
    one partition (repartition on domain) and a 0.4 s delay between
    same-host hits makes the whole job take >= 0.8 s wall — while the
    no-delay control over the identical urls is visibly faster."""
    urls = spark.createDataFrame(
        [(f"{server}/a.html?i={i}",) for i in range(3)], "url string")
    # warm the Spark lineage so timing measures fetch, not planning
    fetch_df(spark, urls, timeout=2.0, partitions=2).collect()

    t0 = time.monotonic()
    rows = fetch_df(spark, urls, timeout=2.0, per_domain_delay=0.4,
                    partitions=2).collect()
    delayed = time.monotonic() - t0
    assert len(rows) == 3
    assert delayed >= 0.8, delayed
