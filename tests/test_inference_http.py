"""HTTP inference-client tests (round-7 verdict task 6): exercise
``stub_detect``'s batching / retry / dead-letter code against a REAL
localhost socket at least once, with stub parity preserved.

The echo server computes detections with the SAME ``_synth_detections``
the in-process stub uses, so HTTP output must equal stub output
row-for-row.  Three contracts pinned:

1. parity — endpoint mode == stub mode on the same input;
2. batching — every request body carries <= INFER_HTTP_BATCH images;
3. retry — a server that 500s the FIRST attempt of every distinct payload
   still yields the full parity result (one backoff retry heals it);
4. dead-letter — an endpoint that always refuses connections produces one
   error row per image (job survives, images routable downstream).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from sales_telegram_bot_data_pipeline_spark.operators.inference import (
    INFER_HTTP_BATCH,
    _synth_detections,
    stub_detect,
)

N_IMAGES = 150  # > 2 * INFER_HTTP_BATCH so per-partition chunking happens


def _pages_df(spark):
    """Small synthetic page-metadata input (the stub_detect contract)."""
    return spark.range(N_IMAGES).selectExpr(
        "concat('pages/img_', id, '.png') AS image_id",
        "concat('shop_', id % 3) AS shop_name",
        "cast(640 + id % 200 as int) AS width",
        "cast(480 + id % 100 as int) AS height",
    )


class _EchoState:
    """Shared across handler instances (ThreadingHTTPServer makes one
    handler object per request)."""

    def __init__(self, fail_first: bool = False):
        self.fail_first = fail_first
        self.lock = threading.Lock()
        self.batch_sizes: list[int] = []
        self.seen_payloads: set[str] = set()
        self.n_500 = 0


def _make_handler(state: _EchoState):
    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802  (stdlib API name)
            body = self.rfile.read(int(self.headers["Content-Length"]))
            req = json.loads(body)
            key = json.dumps(req, sort_keys=True)
            with state.lock:
                state.batch_sizes.append(len(req["images"]))
                first_time = key not in state.seen_payloads
                state.seen_payloads.add(key)
                if state.fail_first and first_time:
                    state.n_500 += 1
                    self.send_response(500)
                    self.end_headers()
                    self.wfile.write(b"transient")
                    return
            rows = []
            for img in req["images"]:
                rows.extend(
                    _synth_detections(
                        img["image_id"], img["shop_name"], img["width"],
                        img["height"], req["model"], req["include_ocr"],
                    )
                )
            out = json.dumps(rows).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):  # keep pytest output clean
            pass

    return Handler


@pytest.fixture
def echo_server():
    def _start(fail_first: bool = False):
        state = _EchoState(fail_first=fail_first)
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        return httpd, state, f"http://127.0.0.1:{httpd.server_address[1]}/infer"

    servers = []

    def start(fail_first: bool = False):
        s = _start(fail_first)
        servers.append(s[0])
        return s

    yield start
    for httpd in servers:
        httpd.shutdown()
        httpd.server_close()


def _sorted_rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: (str(t[0]), t[4] if t[4] is not None else -1, str(t[5])),
    )


def test_http_parity_and_batching(spark, echo_server):
    _, state, url = echo_server()
    pages = _pages_df(spark)
    via_http = stub_detect(pages, "model2", include_ocr=True, endpoint=url)
    via_stub = stub_detect(pages, "model2", include_ocr=True)
    assert _sorted_rows(via_http) == _sorted_rows(via_stub)
    assert state.batch_sizes, "server never saw a request"
    assert all(1 <= b <= INFER_HTTP_BATCH for b in state.batch_sizes)
    assert sum(state.batch_sizes) == N_IMAGES  # every image shipped once


def test_http_retry_heals_transient_500(spark, echo_server):
    _, state, url = echo_server(fail_first=True)
    pages = _pages_df(spark)
    via_http = stub_detect(pages, "model1", endpoint=url)
    via_stub = stub_detect(pages, "model1")
    assert _sorted_rows(via_http) == _sorted_rows(via_stub)
    assert state.n_500 > 0, "the transient-failure path never executed"


def test_http_dead_letters_on_total_outage(spark, echo_server):
    # bind-then-close to get a port that refuses connections
    httpd, _, url = echo_server()
    httpd.shutdown()
    httpd.server_close()
    pages = _pages_df(spark).limit(10)
    rows = stub_detect(pages, "model1", endpoint=url).collect()
    assert len(rows) == 10  # one dead-letter row per image, job alive
    assert all(r.error is not None and r.class_name is None for r in rows)
    assert {r.image_id for r in rows} == {f"pages/img_{i}.png" for i in range(10)}


def test_inference_http_echo_registry_probe(spark, monkeypatch):
    """The registry-visible probe (VERDICT r8 task 6): stub mode by
    default (2 rows, zero errors, fixed schema), live mode under
    SPARK_GRAFT_HTTP_TEST=1 (retry-healed parity on the main leg, one
    dead-letter per image on the dead leg), schema identical across
    modes so driver artifacts never depend on the env flag."""
    from sales_telegram_bot_data_pipeline_spark.operators.inference import (
        ECHO_DEAD_IMAGES,
        inference_http_echo,
    )

    from conftest import SF_SMOKE

    monkeypatch.delenv("SPARK_GRAFT_HTTP_TEST", raising=False)
    stub = {r["leg"]: r for r in inference_http_echo(spark, SF_SMOKE).collect()}
    assert set(stub) == {"main", "dead_letter"}
    assert all(r["mode"] == "stub" for r in stub.values())
    assert all(r["n_error_rows"] == 0 for r in stub.values())
    assert all(r["n_mismatch_vs_stub"] == 0 for r in stub.values())

    monkeypatch.setenv("SPARK_GRAFT_HTTP_TEST", "1")
    live_df = inference_http_echo(spark, SF_SMOKE)
    live = {r["leg"]: r for r in live_df.collect()}
    assert all(r["mode"] == "http" for r in live.values())
    # main leg: echo server 500s every first attempt — retry must heal to
    # full stub parity (counted Spark-side) with zero error rows
    assert live["main"]["n_error_rows"] == 0
    assert live["main"]["n_mismatch_vs_stub"] == 0
    assert live["main"]["n_rows"] == stub["main"]["n_rows"]
    # dead leg: unroutable endpoint — every image dead-letters, job alive
    assert live["dead_letter"]["n_rows"] == ECHO_DEAD_IMAGES
    assert live["dead_letter"]["n_error_rows"] == ECHO_DEAD_IMAGES
    # the env flag must never change the driver-visible shape
    assert [f.name for f in live_df.schema] == [
        "leg", "mode", "n_images", "n_rows", "n_error_rows",
        "n_mismatch_vs_stub",
    ]
