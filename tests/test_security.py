"""Regression tests for the round-1 advisor findings (ADVICE.md).

1. Path traversal via client-supplied run ids (jsonfile engine).
2. SSRF via GET /api/calendar?url=.
3. webhook.secret mask ('***') overwriting the real secret on config
   round-trips.
4. Stray checkpoint temp files breaking CheckpointManager rotation.
"""

import numpy as np
import pytest

from sph_pie_tpu.service.storage import base
from sph_pie_tpu.service.storage.jsonfile_provider import JsonFileProvider
from sph_pie_tpu.service.users import DEFAULT_TEMP_PASSWORD
from test_api import GOOD_PW, server, _login_admin  # noqa: F401


EVIL_IDS = [
    "../../../config/app-config",
    "..",
    "a/b",
    "a\\b",
    "x" * 65,
    ".hidden",
    "id with spaces",
]


@pytest.mark.parametrize("evil", EVIL_IDS)
def test_normalize_run_rejects_unsafe_ids(evil):
    with pytest.raises(base.ValidationError):
        base.normalize_run(
            {"id": evil, "name": "n", "scene": "s", "runDate": "2026-08-16"}
        )


def test_jsonfile_provider_never_writes_outside_root(tmp_path):
    p = JsonFileProvider({"directory": str(tmp_path / "runs")}).init()
    with pytest.raises(base.ValidationError):
        p.create_run(
            {
                "id": "../../escape",
                "name": "n",
                "scene": "s",
                "runDate": "2026-08-16",
            }
        )
    # _read/_remove with hostile ids are inert, not explosive
    assert p._read("active", "../../etc/passwd") is None
    p._remove("active", "../../nope")  # no-op, no exception outside root
    outside = list(tmp_path.parent.glob("escape*"))
    assert outside == []


def test_api_create_run_with_traversal_id_is_400(server):  # noqa: F811
    c, app = server
    _login_admin(c)
    status, _ = c.req(
        "PUT",
        "/api/config",
        {**app.config, "storageProvider": "jsonfile"},
        200,
    )
    c.req(
        "POST",
        "/api/runs",
        {
            "id": "../../../cfg-overwrite",
            "name": "evil",
            "scene": "dam_break_2d",
            "runDate": "2026-08-16",
        },
        400,
    )


def test_calendar_url_override_admin_only_and_http_only(server):  # noqa: F811
    c, app = server
    # non-admin operator: override forbidden
    op = type(c)(c.base)
    op.req(
        "POST",
        "/api/auth/login",
        {"email": "sim.operator@local", "password": DEFAULT_TEMP_PASSWORD},
        200,
    )
    op.req(
        "POST", "/api/auth/password",
        {"currentPassword": DEFAULT_TEMP_PASSWORD, "password": GOOD_PW}, 200,
    )
    status, _ = op.req("GET", "/api/calendar?url=http://127.0.0.1:1/x")
    assert status == 403
    # admin: override allowed but scheme-restricted
    _login_admin(c)
    status, _ = c.req("GET", "/api/calendar?url=file:///etc/passwd")
    assert status == 400
    status, _ = c.req("GET", "/api/calendar?url=ftp://example/x")
    assert status == 400
    # http is permitted (unreachable target -> 502 from the fetch, not 400)
    status, _ = c.req("GET", "/api/calendar?url=http://127.0.0.1:1/x")
    assert status == 502


def test_config_roundtrip_preserves_webhook_secret(server):  # noqa: F811
    c, app = server
    _login_admin(c)
    cfg = dict(app.config)
    cfg["webhook"] = {**cfg.get("webhook", {}), "url": "", "secret": "real-secret"}
    c.req("PUT", "/api/config", cfg, 200)
    # read (masked), write back verbatim — the reference UI does exactly this
    _, body = c.req("GET", "/api/config", expect=200)
    assert body["config"]["webhook"]["secret"] == "***"
    c.req("PUT", "/api/config", body["config"], 200)
    assert app.config["webhook"]["secret"] == "real-secret"
    # explicit empty string clears it
    cleared = dict(app.config)
    cleared["webhook"] = {**cleared["webhook"], "secret": ""}
    c.req("PUT", "/api/config", cleared, 200)
    assert app.config["webhook"]["secret"] == ""


def test_checkpoint_manager_survives_stray_tmp(tmp_path):
    from sph_pie_tpu.scenes import dam_break_2d
    from sph_pie_tpu.utils.checkpoint import CheckpointManager

    st = dam_break_2d(n_target=64).state
    mgr = CheckpointManager(tmp_path, keep=2)
    mgr.save(st, step=1)
    # simulate a crash mid-save under the OLD tmp naming AND a random stray
    (tmp_path / "ckpt_5.tmp.npz").write_bytes(b"torn")
    (tmp_path / "ckpt_junk.npz").write_bytes(b"junk")
    mgr.save(st, step=2)  # must not raise
    latest = mgr.latest()
    assert latest is not None and latest.name == "ckpt_2.npz"
    state, params, step, extra = mgr.restore_latest()
    assert step == 2
    np.testing.assert_array_equal(np.asarray(state.pos), np.asarray(st.pos))


def test_password_change_requires_current_and_rotates_sessions(server):  # noqa: F811
    """Reference server/index.js:187-204: POST /api/auth/password must
    (a) 400 unless currentPassword verifies, (b) purge ALL of the user's
    sessions, (c) issue a fresh cookie — so a hijacked token can neither
    rotate the password silently nor survive a legitimate change."""
    c, app = server
    c.req(
        "POST", "/api/auth/login",
        {"email": "admin@local", "password": DEFAULT_TEMP_PASSWORD}, 200,
    )
    # a second live session for the same account (the "hijacked" token)
    other = type(c)(c.base)
    other.req(
        "POST", "/api/auth/login",
        {"email": "admin@local", "password": DEFAULT_TEMP_PASSWORD}, 200,
    )
    # (a) wrong/missing current password -> 400, nothing purged
    c.req("POST", "/api/auth/password", {"password": GOOD_PW}, 400)
    c.req(
        "POST", "/api/auth/password",
        {"currentPassword": "wrong-Wrong-1!", "password": GOOD_PW}, 400,
    )
    other.req("GET", "/api/auth/session", expect=200)  # still alive
    # legitimate change
    _, body = c.req(
        "POST", "/api/auth/password",
        {"currentPassword": DEFAULT_TEMP_PASSWORD, "password": GOOD_PW}, 200,
    )
    assert body["user"]["needsPasswordReset"] is False
    # (b) the other (old) token is dead
    _, sess = other.req("GET", "/api/auth/session", expect=200)
    assert sess == {"authenticated": False}
    # (c) the changing client got a fresh cookie and stays logged in
    _, sess = c.req("GET", "/api/auth/session", expect=200)
    assert sess["authenticated"] is True
    c.req("GET", "/api/runs", expect=200)
