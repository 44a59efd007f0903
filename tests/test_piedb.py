"""piedb: the networked storage engine (C++ server + pooled client).

Covers the reference PostgresProvider behaviors it stands in for
(sphereisaiahmin-dev/sph-pie server/storage/postgresProvider.js):
auto-CREATE DATABASE on the missing-database error (:964-1033),
transactional delete/archive (:865-888), identifier sanitization
(:1052-1096), pool behavior, durability across a server restart, and the
StubPool-style DI seam (scripts/simulate-storage-connections.js:189).
"""

import json
import threading

import pytest

from sph_pie_tpu.service.storage.piedb_provider import (
    Connection,
    PieDbError,
    PieDbProvider,
    Pool,
    build_server_binary,
    spawn_server,
)

pytestmark = pytest.mark.skipif(
    build_server_binary() is None, reason="no C++ toolchain"
)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    proc, port = spawn_server(0, str(tmp_path_factory.mktemp("piedb")))
    yield port
    proc.terminate()
    proc.wait(timeout=5)


def _provider(port, db="testdb", **kw):
    return PieDbProvider({"host": "127.0.0.1", "port": port, "database": db, **kw}).init()


def test_auto_create_database_on_enodb(server):
    c = Connection("127.0.0.1", server)
    with pytest.raises(PieDbError) as ei:
        c.request("COUNT", "freshdb", "runs")
    assert ei.value.code == "ENODB"  # the 3D000 analogue
    p = _provider(server, db="freshdb")  # init() probes, then CREATEDB
    assert c.request("COUNT", "freshdb", "runs") == b"0"
    assert p.get_storage_metadata()["database"] == "freshdb"


def test_transaction_rollback_and_isolation(server):
    p = _provider(server, db="txndb")
    run = p.create_run({"name": "r", "scene": "s", "runDate": "2026-08-16"})

    c = Connection("127.0.0.1", server)
    c.request("BEGIN", "txndb")
    c.request("DEL", "txndb", "runs", run["id"])
    c.request("PUT", "txndb", "runs", "staged", payload=b"{}")
    # other connections see nothing until COMMIT
    assert p.get_run(run["id"]) is not None
    # read-your-writes inside the transaction
    with pytest.raises(PieDbError):
        c.request("GET", "txndb", "runs", run["id"])
    c.request("ROLLBACK", "txndb")
    assert p.get_run(run["id"]) is not None
    assert int(c.request("COUNT", "txndb", "runs")) == 1


def test_delete_is_transactional_archive(server):
    p = _provider(server, db="deldb")
    run = p.create_run({"name": "r", "scene": "s", "runDate": "2026-08-16"})
    p.delete_run(run["id"])
    assert p.get_run(run["id"]) is None
    archived = p.get_archived_run(run["id"])
    assert archived["deletedAt"] and archived["archivedAt"]


def test_identifier_sanitization(server):
    c = Connection("127.0.0.1", server)
    for evil in ("../../etc", "x" * 65, "drop;table", "a.b"):
        with pytest.raises(PieDbError) as ei:
            c.request("GET", "testdb", "runs", evil)
        assert ei.value.code == "EIDENT", evil


def test_pool_bounded_and_reuses(server):
    pool = Pool("127.0.0.1", server, max_size=2)
    a, b = pool.acquire(), pool.acquire()
    got = []

    def later():
        c = pool.acquire()
        got.append(c)
        pool.release(c)

    t = threading.Thread(target=later)
    t.start()
    pool.release(a)
    t.join(timeout=5)
    assert got and got[0] is a  # blocked acquire got the released conn
    pool.release(b)
    pool.dispose()


def test_durability_across_restart(tmp_path):
    data = str(tmp_path / "d")
    proc, port = spawn_server(0, data)
    try:
        p = _provider(port, db="dur")
        run = p.create_run({"name": "keep", "scene": "s", "runDate": "2026-08-16"})
        p.dispose()
    finally:
        proc.terminate()
        proc.wait(timeout=5)
    proc, port = spawn_server(0, data)
    try:
        p = _provider(port, db="dur")
        assert p.get_run(run["id"])["name"] == "keep"
    finally:
        p.dispose()
        proc.terminate()
        proc.wait(timeout=5)


class StubConnection:
    """Protocol-level fake (the StubPool pattern): emulates the server by
    mutating shared dict state, including the missing-database error."""

    def __init__(self, state):
        self.state = state
        self.stage = None

    def request(self, op, db="-", tbl="-", key="-", payload=b""):
        dbs = self.state["dbs"]
        if op == "CREATEDB":
            dbs.setdefault(db, {})
            self.state["created"].append(db)
            return b"created"
        if op == "BEGIN":
            self.stage = []
            return b"begun"
        if op == "COMMIT":
            for fn in self.stage or []:
                fn()
            self.stage = None
            return b"committed"
        if op == "ROLLBACK":
            self.stage = None
            return b"rolled back"
        if db not in dbs:
            raise PieDbError("ENODB", f'database "{db}" does not exist')
        t = dbs[db].setdefault(tbl, {})
        if op == "COUNT":
            return str(len(t)).encode()
        if op == "SCAN":
            return b"".join(
                f"{len(k)} {len(v)}\n".encode() + k.encode() + v
                for k, v in t.items()
            )
        if op == "GET":
            if key not in t:
                raise PieDbError("ENOKEY", "not found")
            return t[key]
        if op == "PUT":
            if self.stage is not None:
                self.stage.append(lambda: t.__setitem__(key, payload))
            else:
                t[key] = payload
            return b"stored"
        if op == "DEL":
            if self.stage is not None:
                self.stage.append(lambda: t.pop(key, None))
            else:
                t.pop(key, None)
            return b"deleted"
        raise PieDbError("EPROTO", op)

    def close(self):
        pass


class StubPool:
    def __init__(self, state):
        self.state = state

    def acquire(self):
        return StubConnection(self.state)

    def release(self, conn, broken=False):
        pass

    def dispose(self):
        pass


def test_stub_pool_di_seam_missing_db_bootstrap():
    """No real server at all: the injectable _create_pool seam runs the
    auto-create-database path end-to-end against a protocol stub."""
    state = {"dbs": {}, "created": []}
    p = PieDbProvider({"database": "stubbed"})
    p._create_pool = lambda: StubPool(state)
    p.init()
    assert state["created"] == ["stubbed"]  # ENODB -> CREATEDB fired
    run = p.create_run({"name": "s1", "scene": "sc", "runDate": "2026-08-16"})
    assert json.loads(state["dbs"]["stubbed"]["runs"][run["id"]])["name"] == "s1"
    p.delete_run(run["id"])
    assert run["id"] not in state["dbs"]["stubbed"]["runs"]
    assert run["id"] in state["dbs"]["stubbed"]["run_archive"]
