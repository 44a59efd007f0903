"""Users, sessions, RBAC units."""

import time

import pytest

from sph_pie_tpu.service.rbac import RoleConfig, is_operator_only, user_has_role
from sph_pie_tpu.service.sessions import SessionStore
from sph_pie_tpu.service.storage.base import ConflictError, ValidationError
from sph_pie_tpu.service.users import (
    UserStore,
    check_password_policy,
    hash_password,
    verify_password,
)


def test_scrypt_roundtrip_and_salt():
    h1 = hash_password("correct horse")
    h2 = hash_password("correct horse")
    assert h1 != h2  # random salt
    assert verify_password("correct horse", h1)
    assert not verify_password("wrong", h1)
    assert not verify_password("x", "garbage")


def test_password_policy():
    with pytest.raises(ValidationError):
        check_password_policy("short")
    with pytest.raises(ValidationError):
        check_password_policy("alllowercasebutlong")
    check_password_policy("Str0ng-Passw0rd!")


def test_user_store_seed_and_crud(tmp_path):
    store = UserStore(tmp_path / "users.json").init()
    assert store.find_by_email("admin@local")["roles"] == ["admin"]
    u = store.create_user({"name": "A", "email": "a@x", "roles": ["operator"]})
    assert u["roles"] == ["simulation.operator"]  # legacy alias resolved
    assert u["needsPasswordReset"]
    with pytest.raises(ConflictError):
        store.create_user({"name": "B", "email": "a@x", "roles": ["crew"]})
    with pytest.raises(ValidationError):
        store.create_user({"name": "C", "email": "c@x", "roles": ["bogus.role"]})
    store.set_password(u["id"], "Str0ng-Passw0rd!")
    assert store.authenticate("a@x", "Str0ng-Passw0rd!")["id"] == u["id"]
    store.reset_password(u["id"])
    assert store.authenticate("a@x", "Str0ng-Passw0rd!") is None
    # persistence round trip
    store2 = UserStore(tmp_path / "users.json").init()
    assert store2.find_by_email("a@x")["needsPasswordReset"]


def test_user_store_corrupt_file_reseeds(tmp_path):
    p = tmp_path / "users.json"
    p.write_text("{corrupt")
    store = UserStore(p).init()
    assert store.find_by_email("admin@local") is not None


def test_sessions_ttl_and_hashing():
    s = SessionStore(ttl_s=0.2)
    tok = s.create("u1")
    assert tok not in repr(s._sessions)  # only hashes stored
    assert s.get(tok)["userId"] == "u1"
    time.sleep(0.25)
    assert s.get(tok) is None  # lazy expiry
    tok2 = s.create("u2")
    s.delete_for_user("u2")
    assert s.get(tok2) is None


def test_rbac_roles():
    cfg = RoleConfig(None)
    assert cfg.normalize_role("ADMIN") == "admin"
    assert cfg.normalize_role("lead") == "simulation.lead"
    assert cfg.normalize_role("stagecrew") == "simulation.crew"
    assert cfg.normalize_role("rendering.crew") == "rendering.crew"
    assert cfg.normalize_role("nope.nope") is None
    assert cfg.parse_role_key("simulation.lead") == ("simulation", "lead")
    assert cfg.role_matches_level("simulation.lead", "lead")
    assert cfg.display_name("simulation.operator") == "Simulation Operator"
    admin = {"roles": ["admin"]}
    lead = {"roles": ["simulation.lead"]}
    op = {"roles": ["simulation.operator", "rendering.crew"]}
    assert user_has_role(admin, "anything.at.all")
    assert user_has_role(lead, "simulation.lead")
    assert not user_has_role(op, "simulation.lead")
    assert is_operator_only(op, cfg)
    assert not is_operator_only(lead, cfg)
    assert not is_operator_only(admin, cfg)
