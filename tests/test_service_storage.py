"""Storage providers: parity suite + temporal archive logic.

Follows the reference's harness archetypes (SURVEY.md §4): the same
assertions run against BOTH engines (the reference duplicates its provider
contract between sql.js and Postgres), and archive/retention is tested by
seeding back-dated records into a scratch store
(`scripts/simulate-archive.js` pattern — no clock mocking, createdAt is
caller-suppliable).
"""

import pytest

from sph_pie_tpu.service.storage import (
    ConflictError,
    JsonFileProvider,
    ProviderRegistry,
    SqliteProvider,
    ValidationError,
)
from sph_pie_tpu.service.storage.base import now_ms


@pytest.fixture(params=["sqlite", "jsonfile", "piedb"])
def provider(request, tmp_path):
    events = []

    def on_event(event, run, meta=None):
        events.append((event, run["id"], meta))

    if request.param == "sqlite":
        p = SqliteProvider({"filename": str(tmp_path / "t.sqlite")}, on_event)
    elif request.param == "jsonfile":
        p = JsonFileProvider({"directory": str(tmp_path / "runs")}, on_event)
    else:
        from sph_pie_tpu.service.storage.piedb_provider import build_server_binary

        if build_server_binary() is None:
            pytest.skip("no C++ toolchain for the piedb server")
        p = PieDbProviderForTest(
            {"spawn": True, "port": 0, "dataDir": str(tmp_path / "piedb")},
            on_event,
        )
    p.init()
    p.events = events
    yield p
    p.dispose()


def PieDbProviderForTest(opts, on_event):
    from sph_pie_tpu.service.storage.piedb_provider import PieDbProvider

    return PieDbProvider(opts, on_event=on_event)


def _mk(name="run-a", date="2026-08-16", **kw):
    return {"name": name, "scene": "dam_break_2d", "runDate": date, **kw}


def test_crud_roundtrip(provider):
    run = provider.create_run(_mk())
    assert provider.get_run(run["id"])["name"] == "run-a"
    provider.update_run(run["id"], {"name": "renamed"})
    assert provider.get_run(run["id"])["name"] == "renamed"
    runs = provider.list_runs()
    assert len(runs) == 1
    provider.delete_run(run["id"])
    assert provider.get_run(run["id"]) is None
    assert ("run.deleted", run["id"], None) in [
        (e, i, m) for e, i, m in provider.events
    ]


def test_validation_and_limits(provider):
    with pytest.raises(ValidationError):
        provider.create_run({"scene": "x", "runDate": "2026-01-01"})  # no name
    for i in range(5):
        provider.create_run(_mk(name=f"r{i}"))
    with pytest.raises(ConflictError):
        provider.create_run(_mk(name="r5"))  # reference: max 5 per date
    provider.create_run(_mk(name="other-day", date="2026-08-17"))


def test_step_metrics_nested_like_entries(provider):
    run = provider.create_run(_mk())
    provider.add_step(run["id"], {"step": 0, "kinetic_energy": 1.5})
    run2 = provider.add_step(run["id"], {"step": 10, "kinetic_energy": 0.9})
    assert [s["step"] for s in run2["steps"]] == [0, 10]
    with pytest.raises(ConflictError):
        provider.add_step(run["id"], {"step": 10})  # unique per index
    sid = run2["steps"][0]["id"]
    run3 = provider.update_step(run["id"], sid, {"kinetic_energy": 2.0})
    assert run3["steps"][0]["kinetic_energy"] == 2.0
    run4 = provider.delete_step(run["id"], sid)
    assert len(run4["steps"]) == 1


def test_auto_archive_after_window(provider):
    """Back-dated seeding: the whole date group archives once its earliest
    run is >=12h old; fresh groups stay."""
    old = now_ms() - 13 * 3600 * 1000
    provider.create_run(_mk(name="old1", createdAt=old))
    provider.create_run(_mk(name="old2", createdAt=old + 60_000))
    provider.create_run(_mk(name="fresh", date="2026-08-17"))
    active = provider.list_runs()  # triggers maintenance
    assert [r["name"] for r in active] == ["fresh"]
    archived = provider.list_archived_runs()
    assert sorted(r["name"] for r in archived) == ["old1", "old2"]
    auto_events = [m for e, _, m in provider.events if e == "run.archived"]
    assert all(m["source"] == "auto-archive" for m in auto_events)
    assert len(auto_events) == 2


def test_retention_purges_expired(provider):
    ancient = now_ms() - 70 * 24 * 3600 * 1000  # > 2 months
    r = provider.create_run(_mk(name="ancient", createdAt=ancient))
    provider.archive_run_now(r["id"])
    assert provider.list_archived_runs() == []  # purged by maintenance


def test_manual_archive_fires_event(provider):
    r = provider.create_run(_mk())
    provider.archive_run_now(r["id"])
    assert provider.get_run(r["id"]) is None
    assert provider.get_archived_run(r["id"])["name"] == "run-a"
    assert ("run.archived", r["id"], {"source": "manual"}) in provider.events


def test_registry_hot_swap(tmp_path):
    reg = ProviderRegistry()
    cfg = {
        "storageProvider": "sqlite",
        "sqlite": {"filename": str(tmp_path / "a.sqlite")},
        "jsonfile": {"directory": str(tmp_path / "runs")},
    }
    p1 = reg.init_provider(cfg)
    assert reg.get_active_provider_type() == "sqlite"
    p1.create_run(_mk())
    cfg["storageProvider"] = "jsonfile"
    p2 = reg.init_provider(cfg)  # disposes p1
    assert reg.get_active_provider_type() == "jsonfile"
    assert p2.list_runs() == []
    # legacy aliases resolve (reference accepts 'sqljs'/'postgresql')
    cfg["storageProvider"] = "sqljs"
    reg.init_provider(cfg)
    assert reg.get_active_provider_type() == "sqlite"


def test_registry_requires_init():
    with pytest.raises(RuntimeError):
        ProviderRegistry().get_provider()


def test_concurrent_step_writes_do_not_lose_updates(provider):
    """Two writer threads interleaving add_step must not drop rows (the
    read-modify-write is serialised by the provider mutex; the reference's
    sql.js store has the equivalent unguarded race, SURVEY.md section 5)."""
    import threading

    run = provider.create_run(_mk())

    def writer(base_idx):
        for i in range(20):
            provider.add_step(run["id"], {"step": base_idx + i})

    t1 = threading.Thread(target=writer, args=(0,))
    t2 = threading.Thread(target=writer, args=(1000,))
    t1.start(); t2.start(); t1.join(); t2.join()
    got = provider.get_run(run["id"])
    assert len(got["steps"]) == 40


def test_calendar_persistence_upsert_prune(provider):
    """Persisted feed mirror: upsert + prune (sqlProvider.js:940-968)."""
    e1 = {"id": "ev-1", "title": "WOZ #12", "start": 1000, "end": 2000}
    e2 = {"id": "ev-2", "title": "EAGLES #3", "start": 3000, "end": 4000}
    r = provider.sync_calendar_events([e1, e2])
    assert r == {"upserted": 2, "pruned": 0}
    assert [e["id"] for e in provider.list_calendar_events()] == ["ev-1", "ev-2"]
    # update one, drop one -> upsert + prune
    e2b = dict(e2, title="EAGLES #4")
    r = provider.sync_calendar_events([e2b])
    assert r["pruned"] == 1
    evs = provider.list_calendar_events()
    assert len(evs) == 1 and evs[0]["title"] == "EAGLES #4"


def test_calendar_survives_reinit(provider):
    provider.sync_calendar_events([{"id": "x", "title": "t", "start": 1}])
    provider.dispose()
    provider.init()
    assert provider.list_calendar_events()[0]["id"] == "x"
