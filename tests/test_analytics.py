"""Archive analytics engine + endpoint + profiling utils."""

import threading

import pytest

from sph_pie_tpu.service import analytics


def _run(name, date, scene="dam_break_2d", ke=(1.0, 3.0), operator="Op A"):
    return {
        "id": name,
        "name": name,
        "scene": scene,
        "runDate": date,
        "steps": [
            {"step": i, "kinetic_energy": v, "operator": operator, "n_active": 100}
            for i, v in enumerate(ke)
        ],
    }


ARCHIVE = [
    _run("a", "2026-08-01", ke=(1.0, 3.0)),
    _run("b", "2026-08-01", ke=(2.0, 4.0), operator="Op B"),
    _run("c", "2026-08-02", scene="emitter_2d", ke=(10.0,)),
]


def test_daily_series_grouping():
    out = analytics.daily_series(ARCHIVE, metrics=["runs", "kinetic_energy_avg"])
    assert out["dates"] == ["2026-08-01", "2026-08-02"]
    assert out["series"]["runs"] == [2, 1]
    # avg within date: run a avg=2.0, run b avg=3.0 -> group avg 2.5
    assert out["series"]["kinetic_energy_avg"][0] == pytest.approx(2.5)
    assert out["totalRuns"] == 3


def test_filters_scene_operator_dates():
    out = analytics.daily_series(ARCHIVE, scenes=["emitter_2d"])
    assert out["dates"] == ["2026-08-02"]
    out = analytics.daily_series(ARCHIVE, operators=["Op B"])
    assert out["totalRuns"] == 1
    out = analytics.daily_series(ARCHIVE, date_from="2026-08-02")
    assert out["dates"] == ["2026-08-02"]


def test_run_stats_shape():
    rs = analytics.run_stats(ARCHIVE[0])
    assert rs["metrics"]["samples"] == 2
    assert rs["metrics"]["kinetic_energy_max"] == 3.0
    assert rs["stats"]["n_active_max"] == 100


def test_analytics_endpoint(tmp_path):
    from sph_pie_tpu.service.api import App, make_server
    from tests.test_api import Client, _login_admin

    app = App(config_path=tmp_path / "cfg.json", data_dir=str(tmp_path), env={})
    srv = make_server(app, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        c = Client(f"http://127.0.0.1:{srv.server_port}")
        _login_admin(c)
        p = app.registry.get_provider()
        r = p.create_run({"name": "x", "scene": "dam_break_2d", "runDate": "2026-08-10"})
        p.add_step(r["id"], {"step": 0, "kinetic_energy": 5.0})
        p.archive_run_now(r["id"])
        _, body = c.req(
            "GET", "/api/runs/archive/analytics?metric=runs,kinetic_energy_avg", expect=200
        )
        assert body["dates"] == ["2026-08-10"]
        assert body["series"]["runs"] == [1]
    finally:
        srv.shutdown()


def test_step_timer():
    from sph_pie_tpu.utils.profiling import StepTimer

    t = StepTimer()
    with t.time("phase") as out:
        out["result"] = 1 + 1
    s = t.stats()
    assert s["phase"]["count"] == 1
    assert s["phase"]["mean_ms"] >= 0
