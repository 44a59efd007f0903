"""Webhook dispatcher: loopback-capture harness (SURVEY.md §4, the
`scripts/simulate-webhook.js` archetype — boot a throwaway in-process HTTP
listener, point the real egress at it, assert on the captured wire
payload)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from sph_pie_tpu.service.metrics import METRIC_COLUMNS
from sph_pie_tpu.service.webhook import WebhookDispatcher, build_csv, csv_escape


class _Capture(BaseHTTPRequestHandler):
    requests: list = []
    handshake_status = 200

    def _h(self):
        type(self).requests.append(
            {
                "method": self.command,
                "path": self.path,
                "headers": dict(self.headers),
                "body": self.rfile.read(
                    int(self.headers.get("Content-Length") or 0)
                ).decode(),
            }
        )
        status = type(self).handshake_status if self.command != "POST" else 200
        self.send_response(status)
        self.end_headers()

    do_HEAD = do_GET = do_OPTIONS = do_POST = _h

    def log_message(self, *a):
        pass


@pytest.fixture
def capture_server():
    _Capture.requests = []
    _Capture.handshake_status = 200
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Capture)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/hook", _Capture
    srv.shutdown()


def _run_fixture():
    return {
        "id": "r1",
        "name": "bench run",
        "scene": "dam_break_2d",
        "runDate": "2026-08-16",
        "steps": [
            {"id": "s1", "step": 0, "kinetic_energy": 2.5, "n_active": 400},
            {"id": "s2", "step": 50, "kinetic_energy": 1.1, "n_active": 400},
        ],
    }


def test_handshake_verifies_with_head(capture_server):
    url, cap = capture_server
    d = WebhookDispatcher({"enabled": True, "url": url, "secret": "tok"})
    st = d.get_status()
    assert st["verified"] and st["method"] == "HEAD"
    assert cap.requests[0]["method"] == "HEAD"
    assert cap.requests[0]["headers"]["Authorization"] == "Bearer tok"


def test_handshake_falls_through_405(capture_server):
    url, cap = capture_server
    cap.handshake_status = 405
    d = WebhookDispatcher({"enabled": True, "url": url})
    st = d.get_status()
    # 405 on HEAD/OPTIONS/GET -> all methods rejected -> unverified
    assert not st["verified"]
    assert [r["method"] for r in cap.requests] == ["HEAD", "OPTIONS", "GET"]


def test_dispatch_payload_shape(capture_server):
    url, cap = capture_server
    d = WebhookDispatcher({"enabled": True, "url": url})
    assert d.dispatch_run_event("run.completed", _run_fixture())
    body = json.loads(cap.requests[-1]["body"])
    assert body["schemaVersion"] == 2
    assert body["table"]["columns"] == list(METRIC_COLUMNS)
    assert len(body["table"]["rows"]) == 2
    # CSV header mirrors the table columns (simulate-webhook.js assertion)
    assert body["csv"].splitlines()[0] == ",".join(METRIC_COLUMNS)
    assert "bench run" in body["message"]
    assert "steps" not in body["run"]


def test_archive_fans_out_per_step(capture_server):
    url, cap = capture_server
    d = WebhookDispatcher({"enabled": True, "url": url})
    cap.requests.clear()
    res = d.dispatch_archive_event(_run_fixture(), {"source": "auto-archive"})
    posts = [r for r in cap.requests if r["method"] == "POST"]
    assert res == {"sent": 2, "failed": 0}
    assert len(posts) == 2
    bodies = [json.loads(p["body"]) for p in posts]
    assert {b["step"]["step"] for b in bodies} == {0, 50}
    assert all(b["meta"]["source"] == "auto-archive" for b in bodies)


def test_failure_counted_not_raised():
    d = WebhookDispatcher(
        {"enabled": True, "url": "http://127.0.0.1:9/nope", "handshakeTimeoutSeconds": 0.2, "timeoutSeconds": 0.2}
    )
    assert not d.get_status()["verified"]
    ok = d.dispatch_run_event("run.completed", _run_fixture())
    assert not ok
    assert d.get_status()["failed"] >= 1


def test_csv_escaping():
    assert csv_escape('a,"b"\nc') == '"a,""b""\nc"'
    csv = build_csv(["a", "b"], [[1, "x,y"]])
    assert csv == 'a,b\n1,"x,y"\n'


def test_disabled_dispatch_is_noop():
    d = WebhookDispatcher({"enabled": False, "url": ""})
    assert d.dispatch_run_event("run.completed", _run_fixture()) is False
    assert d.dispatch_archive_event(_run_fixture()) == {"sent": 0, "failed": 0}
