"""Run executor: records real simulation metrics into run records."""

import threading
import time

from sph_pie_tpu.service.api import App, make_server
from tests.test_api import Client, _login_admin


def _wait_status(client, rid, want, timeout=120):
    t0 = time.time()
    while time.time() - t0 < timeout:
        _, body = client.req("GET", f"/api/runs/{rid}", expect=200)
        if body["run"].get("status") == want:
            return body["run"]
        if body["run"].get("status") == "failed":
            raise AssertionError(f"run failed: {body['run'].get('error')}")
        time.sleep(0.5)
    raise TimeoutError(f"run never reached {want}")


def test_execute_records_metrics(tmp_path):
    app = App(config_path=tmp_path / "cfg.json", data_dir=str(tmp_path), env={})
    srv = make_server(app, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        c = Client(f"http://127.0.0.1:{srv.server_port}")
        _login_admin(c)
        _, body = c.req(
            "POST", "/api/runs",
            {
                "name": "exec1",
                "scene": "dam_break_2d",
                "runDate": "2026-08-16",
                "params": {"n_target": 256},
            },
            201,
        )
        rid = body["run"]["id"]
        _, body = c.req(
            "POST", f"/api/runs/{rid}/execute", {"steps": 100, "recordEvery": 50}, 202
        )
        assert body["run"]["status"] == "queued"
        run = _wait_status(c, rid, "completed")
        steps = run["steps"]
        assert [s["step"] for s in steps] == [50, 100]
        assert steps[0]["n_active"] > 200
        assert steps[-1]["kinetic_energy"] > 0  # the dam actually moved
        assert all(s["overflow"] == 0 for s in steps)
        # executor checkpointed the final state
        ckpts = list((tmp_path / "checkpoints" / rid).glob("ckpt_*.npz"))
        assert len(ckpts) == 1
        # unknown scene rejected
        c.req("POST", f"/api/runs/{rid}/execute", {"scene": "nope"}, 400)
    finally:
        srv.shutdown()


def test_execute_pbf_solver_selection(tmp_path):
    """params.solver="pbf" routes the run through the PBF epoch loop
    (BASELINE config #4 via the service), with pbf kwargs honored; an
    unknown solver fails the run with a clear error."""
    app = App(config_path=tmp_path / "cfg.json", data_dir=str(tmp_path), env={})
    srv = make_server(app, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        c = Client(f"http://127.0.0.1:{srv.server_port}")
        _login_admin(c)
        _, body = c.req(
            "POST", "/api/runs",
            {
                "name": "pbf1",
                "scene": "dam_break_2d",
                "runDate": "2026-08-16",
                "params": {
                    "n_target": 256,
                    "solver": "pbf",
                    "pbf": {"iters": 2, "sor": 0.9},
                },
            },
            201,
        )
        rid = body["run"]["id"]
        c.req("POST", f"/api/runs/{rid}/execute", {"steps": 60, "recordEvery": 30}, 202)
        run = _wait_status(c, rid, "completed")
        steps = run["steps"]
        assert [s["step"] for s in steps] == [30, 60]
        assert steps[-1]["kinetic_energy"] > 0
        assert all(s["overflow"] == 0 for s in steps)

        _, body = c.req(
            "POST", "/api/runs",
            {
                "name": "bad-solver",
                "scene": "dam_break_2d",
                "runDate": "2026-08-16",
                "params": {"n_target": 256, "solver": "nope"},
            },
            201,
        )
        rid2 = body["run"]["id"]
        c.req("POST", f"/api/runs/{rid2}/execute", {"steps": 10}, 202)
        t0 = time.time()
        while time.time() - t0 < 60:
            _, body = c.req("GET", f"/api/runs/{rid2}", expect=200)
            if body["run"].get("status") == "failed":
                break
            time.sleep(0.5)
        assert body["run"]["status"] == "failed"
        assert "unknown solver" in (body["run"].get("error") or "")
    finally:
        srv.shutdown()
