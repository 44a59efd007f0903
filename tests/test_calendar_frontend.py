"""ICS ingest, PNG encoder, static shell + live preview endpoint."""

import json
import struct
import threading
import urllib.request
import zlib

import numpy as np
import pytest

from sph_pie_tpu.render.png import encode_gray_png
from sph_pie_tpu.service import calendar_feed as cal

ICS_FIXTURE = """BEGIN:VCALENDAR
BEGIN:VEVENT
UID:evt-1
SUMMARY:DAM break campaign #12
DTSTART:20991201T180000Z
DTEND:20991201T200000Z
LOCATION:tank-a
END:VEVENT
BEGIN:VEVENT
UID:evt-2
SUMMARY:Faucet demo run
DTSTART;VALUE=DATE:20991202
END:VEVENT
BEGIN:VEVENT
UID:evt-old
SUMMARY:ancient event
DTSTART:19990101T000000Z
DTEND:19990101T010000Z
END:VEVENT
END:VCALENDAR
"""


def test_parse_ics_events():
    events = cal.parse_ics(ICS_FIXTURE)
    assert len(events) == 3
    e = events[0]
    assert e["id"] == "evt-1"
    assert e["eventName"] == "DAM"
    assert e["number"] == 12
    assert e["color"] == cal.COLOR_KEYWORDS["DAM"]
    assert not e["allDay"]
    assert events[1]["allDay"]  # VALUE=DATE
    assert events[1]["color"] == cal.COLOR_KEYWORDS["FAUCET"]


def test_line_unfolding():
    folded = "BEGIN:VEVENT\nSUMMARY:split\n  title here\nDTSTART:20991201T000000Z\nEND:VEVENT\n"
    events = cal.parse_ics(folded)
    assert events[0]["title"] == "split title here"


def test_metadata_number_fallback():
    m = cal.parse_event_metadata("Bench sweep 7 units")
    assert m["number"] == 7
    assert m["eventName"] == "BENCH"


def test_cutoff_filters_old_events():
    class FakeResp:
        status = 200

        def read(self):
            return ICS_FIXTURE.encode()

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    events = cal.fetch_calendar_feed("http://x/feed.ics", opener=lambda req, timeout: FakeResp())
    assert {e["id"] for e in events} == {"evt-1", "evt-2"}  # ancient dropped


def test_png_encoder_valid():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = encode_gray_png(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", data[16:24])
    assert (w, h) == (8, 8)
    # decode IDAT and compare pixels
    idat_start = data.index(b"IDAT") + 4
    idat_len = struct.unpack(">I", data[idat_start - 8 : idat_start - 4])[0]
    raw = zlib.decompress(data[idat_start : idat_start + idat_len])
    rows = [raw[r * 9 + 1 : r * 9 + 9] for r in range(8)]
    assert np.array_equal(
        np.frombuffer(b"".join(rows), np.uint8).reshape(8, 8), img
    )


@pytest.fixture
def server(tmp_path):
    from sph_pie_tpu.service.api import App, make_server
    from tests.test_api import Client, _login_admin

    app = App(config_path=tmp_path / "cfg.json", data_dir=str(tmp_path), env={})
    srv = make_server(app, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    c = Client(f"http://127.0.0.1:{srv.server_port}")
    _login_admin(c)
    yield c, app
    srv.shutdown()


def test_static_shell_served(server):
    c, _ = server
    status, body = c.req("GET", "/", expect=200)
    assert "sph-pie-tpu" in body
    # SPA fallback: unknown non-api path serves the shell
    status, body = c.req("GET", "/some/client/route", expect=200)
    assert "sph-pie-tpu" in body


@pytest.mark.heavy
def test_preview_png_advances(server):
    c, _ = server
    req = urllib.request.Request(c.base + "/api/scenes/dam_break_2d/preview.png?steps=25&res=64")
    req.add_header("Cookie", c.cookie)
    with urllib.request.urlopen(req, timeout=120) as r:
        png = r.read()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    status, _ = c.req("GET", "/api/scenes/not_a_scene/preview.png", expect=404)


def test_calendar_endpoint_unconfigured(server):
    c, _ = server
    status, body = c.req("GET", "/api/calendar", expect=200)
    assert body["events"] == []
