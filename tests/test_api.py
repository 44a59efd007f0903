"""HTTP API integration: real server on an ephemeral port, real requests.

End-to-end flow mirroring the reference's surface (SURVEY.md §2 REST
table): login -> forced password reset (423 gate) -> run CRUD -> step
metrics with operator-identity forcing -> archive + webhook fan-out ->
export -> config hot swap.
"""

import json
import threading
import urllib.error
import urllib.request

import pytest

from sph_pie_tpu.service.api import App, make_server
from sph_pie_tpu.service.users import DEFAULT_TEMP_PASSWORD

GOOD_PW = "Str0ng-Passw0rd!"


class Client:
    def __init__(self, base):
        self.base = base
        self.cookie = None

    def req(self, method, path, body=None, expect=None):
        req = urllib.request.Request(
            self.base + path,
            method=method,
            data=json.dumps(body).encode() if body is not None else None,
            headers={"Content-Type": "application/json"},
        )
        if self.cookie:
            req.add_header("Cookie", self.cookie)
        try:
            with urllib.request.urlopen(req, timeout=10) as resp:
                status = resp.status
                raw = resp.read()
                set_cookie = resp.headers.get("Set-Cookie")
        except urllib.error.HTTPError as e:
            status = e.code
            raw = e.read()
            set_cookie = e.headers.get("Set-Cookie")
        if set_cookie:
            self.cookie = set_cookie.split(";")[0]
        if expect is not None:
            assert status == expect, f"{method} {path}: {status} != {expect}: {raw[:200]}"
        try:
            return status, json.loads(raw)
        except json.JSONDecodeError:
            return status, raw.decode()


@pytest.fixture
def server(tmp_path):
    app = App(config_path=tmp_path / "cfg.json", data_dir=str(tmp_path), env={})
    srv = make_server(app, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield Client(f"http://127.0.0.1:{srv.server_port}"), app
    srv.shutdown()


def _login_admin(c):
    c.req("POST", "/api/auth/login", {"email": "admin@local", "password": DEFAULT_TEMP_PASSWORD}, 200)
    c.req(
        "POST", "/api/auth/password",
        {"currentPassword": DEFAULT_TEMP_PASSWORD, "password": GOOD_PW}, 200,
    )


def test_health_open(server):
    c, _ = server
    status, body = c.req("GET", "/api/health", expect=200)
    assert body["status"] in ("ok", "degraded")
    assert body["storage"]["provider"] == "sqlite"
    assert body["device"]["deviceCount"] >= 1


def test_login_and_423_gate(server):
    c, _ = server
    c.req("GET", "/api/runs", expect=401)
    status, body = c.req(
        "POST", "/api/auth/login",
        {"email": "admin@local", "password": DEFAULT_TEMP_PASSWORD}, 200,
    )
    assert body["user"]["needsPasswordReset"]
    # gate: everything except the auth allowlist returns 423
    c.req("GET", "/api/runs", expect=423)
    c.req("GET", "/api/auth/session", expect=200)
    # weak password rejected by policy
    c.req(
        "POST", "/api/auth/password",
        {"currentPassword": DEFAULT_TEMP_PASSWORD, "password": "short"}, 400,
    )
    c.req(
        "POST", "/api/auth/password",
        {"currentPassword": DEFAULT_TEMP_PASSWORD, "password": GOOD_PW}, 200,
    )
    status, body = c.req("GET", "/api/auth/session", expect=200)
    assert not body["user"]["needsPasswordReset"]
    c.req("GET", "/api/runs", expect=200)


def test_bad_credentials(server):
    c, _ = server
    c.req("POST", "/api/auth/login", {"email": "admin@local", "password": "nope"}, 401)


def test_run_crud_steps_archive_export(server):
    c, _ = server
    _login_admin(c)
    _, body = c.req(
        "POST", "/api/runs",
        {"name": "r1", "scene": "dam_break_2d", "runDate": "2026-08-16"}, 201,
    )
    rid = body["run"]["id"]
    c.req("POST", f"/api/runs/{rid}/steps", {"step": 0, "kinetic_energy": 2.0}, 201)
    c.req("POST", f"/api/runs/{rid}/steps", {"step": 0}, 409)  # dup index
    _, runs = c.req("GET", "/api/runs", expect=200)
    assert len(runs["runs"]) == 1 and len(runs["runs"][0]["steps"]) == 1
    _, csv = c.req("GET", f"/api/runs/{rid}/export?format=csv", expect=200)
    assert csv.splitlines()[0].startswith("step,time")
    c.req("POST", f"/api/runs/{rid}/archive", None, 200)
    _, arch = c.req("GET", "/api/runs/archive", expect=200)
    assert [r["id"] for r in arch["runs"]] == [rid]
    # archived runs still export
    c.req("GET", f"/api/runs/{rid}/export?format=json", expect=200)
    c.req("GET", f"/api/runs/{rid}", expect=404)


def test_rbac_operator_restrictions(server):
    c, app = server
    _login_admin(c)
    # operator account: set a real password first (admin resets, then login)
    op = app.users.find_by_email("sim.operator@local")
    c2 = Client(c.base)
    c2.req("POST", "/api/auth/login", {"email": op["email"], "password": DEFAULT_TEMP_PASSWORD}, 200)
    c2.req(
        "POST", "/api/auth/password",
        {"currentPassword": DEFAULT_TEMP_PASSWORD, "password": GOOD_PW}, 200,
    )
    # operators cannot create runs (write = lead only)
    c2.req("POST", "/api/runs", {"name": "x", "scene": "s", "runDate": "2026-08-16"}, 403)
    # admin creates; operator records a step -> identity forced
    _, body = c.req(
        "POST", "/api/runs",
        {"name": "r2", "scene": "dam_break_2d", "runDate": "2026-08-16"}, 201,
    )
    rid = body["run"]["id"]
    _, body = c2.req(
        "POST", f"/api/runs/{rid}/steps", {"step": 1, "operator": "Spoofed"}, 201
    )
    assert body["run"]["steps"][0]["operator"] == "Sim Operator"
    # operators cannot administer users
    c2.req("GET", "/api/users", expect=403)


def test_user_admin_flow(server):
    c, _ = server
    _login_admin(c)
    _, body = c.req(
        "POST", "/api/users",
        {"name": "New Lead", "email": "lead2@local", "roles": ["lead"]}, 201,
    )
    # legacy alias 'lead' resolved onto the default domain
    assert body["user"]["roles"] == ["simulation.lead"]
    uid = body["user"]["id"]
    c.req("POST", "/api/users", {"name": "Dup", "email": "lead2@local", "roles": ["lead"]}, 409)
    c.req("PUT", f"/api/users/{uid}", {"name": "Renamed Lead"}, 200)
    _, body = c.req("POST", f"/api/users/{uid}/reset-password", None, 200)
    assert body["user"]["needsPasswordReset"]
    _, staff = c.req("GET", "/api/staff", expect=200)
    assert "Renamed Lead" in staff["directory"]["simulation.lead"]


def test_config_hot_swap_provider(server):
    c, app = server
    _login_admin(c)
    _, body = c.req("GET", "/api/config", expect=200)
    cfg = body["config"]
    assert cfg["storageProvider"] == "sqlite"
    cfg["storageProvider"] = "jsonfile"
    cfg["webhook"] = {"enabled": False, "url": "", "secret": ""}
    _, body = c.req("PUT", "/api/config", cfg, 200)
    assert body["storage"] == "jsonfile"
    # storage switched live; runs list now served by the new engine
    c.req("GET", "/api/runs", expect=200)


def test_scenes_and_domains_catalog(server):
    c, _ = server
    _login_admin(c)
    _, body = c.req("GET", "/api/scenes", expect=200)
    ids = {s["id"] for s in body["scenes"]}
    assert {"dam_break_2d", "dam_break_3d", "emitter_2d"} <= ids
    _, body = c.req("GET", "/api/domains", expect=200)
    assert "simulation.lead" in body["roleKeys"]


def test_webhook_secret_masked_in_config(server):
    c, app = server
    _login_admin(c)
    app.config["webhook"]["secret"] = "super-secret"
    _, body = c.req("GET", "/api/config", expect=200)
    assert body["config"]["webhook"]["secret"] == "***"


def test_staff_put_gone(server):
    """PUT /api/staff is a deliberate 410 tombstone (reference:
    server/index.js:276 — the staff directory derives from users)."""
    c, _ = server
    _login_admin(c)
    c.req("PUT", "/api/staff", {"directory": {}}, 410)


def test_step_update_and_delete(server):
    """Entry edit-modal backend: PUT rewrites a step (operator identity
    still forced for operator-only users), DELETE removes it."""
    c, _ = server
    _login_admin(c)
    _, body = c.req(
        "POST", "/api/runs",
        {"name": "r", "scene": "dam_break_2d", "runDate": "2099-01-01"}, 201,
    )
    rid = body["run"]["id"]
    _, body = c.req(
        "POST", f"/api/runs/{rid}/steps",
        {"step": 3, "operator": "Administrator", "status": "warn",
         "issue": "boundary", "subIssue": "wall penetration"}, 201,
    )
    sid = body["run"]["steps"][0]["id"]
    _, body = c.req(
        "PUT", f"/api/runs/{rid}/steps/{sid}",
        {"step": 3, "operator": "Administrator", "status": "ok",
         "max_speed": 1.25}, 200,
    )
    s = body["run"]["steps"][0]
    assert s["status"] == "ok" and s["max_speed"] == 1.25
    c.req("DELETE", f"/api/runs/{rid}/steps/{sid}", None, 200)
    _, body = c.req("GET", "/api/runs", expect=200)
    assert body["runs"][0]["steps"] == []


def test_spa_shell_serves_step_logging_ui(server):
    """The static shell carries the operator entry-logging workspace (C8),
    the clone-based edit modal (C9), and the per-row run menu."""
    import urllib.request

    c, _ = server
    html = urllib.request.urlopen(c.base + "/").read().decode()
    for needle in ("stepForm", "stepEditModal", "rowMenu", "runDetail",
                   "stepStatus", "stepIssue"):
        assert needle in html, needle
    js = urllib.request.urlopen(c.base + "/app.js").read().decode()
    for needle in ("ISSUE_MAP", "collectStepPayload", "openStepEditModal",
                   "isOperatorOnlyClient", "METRIC_DEFS", "openRowMenu"):
        assert needle in js, needle


def test_access_log_format(server):
    """morgan('dev') analogue (reference server/index.js:70): one line per
    request with method, path, status and duration; off by default for
    embedded use, on when enabled (serve() turns it on)."""
    import re

    c, app = server
    # default off: no logger calls
    lines = []
    app.access_logger = lines.append
    c.req("GET", "/api/health", expect=200)
    assert lines == []

    app.access_log = True
    c.req("GET", "/api/health", expect=200)
    c.req("GET", "/api/nope", expect=404)
    # the line is emitted just after the response is written — poll briefly
    import time

    for _ in range(100):
        if len(lines) >= 2:
            break
        time.sleep(0.01)
    assert len(lines) == 2
    assert re.fullmatch(
        r"\[http\] GET /api/health 200 \d+\.\d ms", lines[0]
    ), lines[0]
    assert re.fullmatch(r"\[http\] GET /api/nope 404 \d+\.\d ms", lines[1])
