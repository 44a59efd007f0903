"""Config store tiers + metrics/export."""

import json

from sph_pie_tpu.scenes import dam_break_2d
from sph_pie_tpu.service import export, health, metrics
from sph_pie_tpu.service.config_store import ConfigStore


def test_config_auto_creates_with_defaults(tmp_path):
    path = tmp_path / "cfg.json"
    store = ConfigStore(path, env={})
    cfg = store.load()
    assert path.exists()
    assert cfg["storageProvider"] == "sqlite"
    assert cfg["archive"]["autoArchiveHours"] == 12


def test_config_env_overrides_win(tmp_path):
    store = ConfigStore(tmp_path / "c.json", env={"PORT": "9001", "STORAGE_PROVIDER": "jsonfile"})
    cfg = store.load()
    assert cfg["port"] == 9001
    assert cfg["storageProvider"] == "jsonfile"


def test_config_legacy_key_migration(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"provider": "jsonfile", "unit_label": "Droplet"}))
    cfg = ConfigStore(p, env={}).load()
    assert cfg["storageProvider"] == "jsonfile"
    assert cfg["unitLabel"] == "Droplet"


def test_config_corrupt_file_falls_back(tmp_path):
    p = tmp_path / "c.json"
    p.write_text("{not json")
    cfg = ConfigStore(p, env={}).load()
    assert cfg["port"] == 8411


def test_config_save_merges_defaults(tmp_path):
    store = ConfigStore(tmp_path / "c.json", env={})
    saved = store.save({"port": 1234})
    assert saved["port"] == 1234
    assert saved["webhook"]["timeoutSeconds"] == 8


def test_state_metrics_physical_sanity():
    scene = dam_break_2d(n_target=256)
    m = metrics.state_metrics(scene.state, scene.params, step=0)
    assert m["n_active"] == int(scene.state.n_active())
    assert m["max_speed"] == 0.0
    assert m["kinetic_energy"] == 0.0
    assert m["potential_energy"] > 0  # column raised against gravity
    assert 0 < m["com_x"] < 0.4 and 0 < m["com_y"] < 0.6
    row = metrics.metric_row(m)
    assert len(row) == len(metrics.METRIC_COLUMNS)


def test_aggregate_and_export():
    run = {
        "id": "r",
        "name": "n",
        "scene": "s",
        "runDate": "2026-08-16",
        "steps": [
            {"step": 0, "kinetic_energy": 1.0},
            {"step": 1, "kinetic_energy": 3.0},
        ],
    }
    stats = metrics.aggregate_run_stats(run["steps"])
    assert stats["samples"] == 2
    assert stats["kinetic_energy_avg"] == 2.0
    assert stats["kinetic_energy_max"] == 3.0
    csv = export.run_to_csv(run)
    assert csv.splitlines()[0].startswith("step,time,n_active")
    assert len(csv.splitlines()) == 3
    doc = json.loads(export.run_to_json(run))
    assert doc["stats"]["samples"] == 2


def test_health_snapshot():
    snap = health.health_snapshot()
    assert snap["status"] == "ok"
    assert snap["device"]["deviceCount"] >= 1
