"""Notification parity with the reference behavioral corpus
(reference tests/test_notifications.py:1-212, notifications.py:13-263).

Ports the assertion CONTENT — handler registration/validation with
ids, wildcard + 'all' matching, real handler execution (log append,
shell subprocess), event history with filters, and test events —
against the repo's NotificationManager."""

from __future__ import annotations

import os

import pytest

from iceberg_lakehouse_spark.governance.policies import NotificationManager


@pytest.fixture
def nm(tmp_path):
    return NotificationManager(str(tmp_path / "notifications.json"))


# --- register ---


def test_register_webhook(nm):
    result = nm.add_handler("my_table", "write", "webhook",
                            {"url": "http://example.com/hook"})
    assert result["handler_id"]
    assert result["table"] == "default.my_table"
    assert result["event_type"] == "write"
    assert result["handler_type"] == "webhook"


def test_register_shell(nm):
    result = nm.add_handler("my_table", "write", "shell", {"command": "echo hello"})
    assert result["handler_type"] == "shell"


def test_register_log(nm, tmp_path):
    result = nm.add_handler("my_table", "write", "log",
                            {"file": str(tmp_path / "events.log")})
    assert result["handler_type"] == "log"


def test_register_normalizes_table_name(nm, tmp_path):
    result = nm.add_handler("tbl", "write", "log", {"file": str(tmp_path / "l.log")})
    assert result["table"] == "default.tbl"


def test_invalid_event_type(nm, tmp_path):
    with pytest.raises(ValueError, match="Invalid event type"):
        nm.add_handler("tbl", "bad_event", "log", {"file": str(tmp_path / "l.log")})


def test_invalid_handler_type(nm):
    with pytest.raises(ValueError, match="Invalid handler type"):
        nm.add_handler("tbl", "write", "email", {})


def test_webhook_missing_url(nm):
    with pytest.raises(ValueError, match="url"):
        nm.add_handler("tbl", "write", "webhook", {})


def test_shell_missing_command(nm):
    with pytest.raises(ValueError, match="command"):
        nm.add_handler("tbl", "write", "shell", {})


def test_log_missing_file(nm):
    with pytest.raises(ValueError, match="file"):
        nm.add_handler("tbl", "write", "log", {})


def test_empty_table_name(nm, tmp_path):
    with pytest.raises(ValueError, match="empty"):
        nm.add_handler("", "write", "log", {"file": str(tmp_path / "l.log")})


# --- list ---


def test_list_empty(nm):
    assert nm.list_handlers() == []


def test_list_all(nm, tmp_path):
    nm.add_handler("t1", "write", "log", {"file": str(tmp_path / "a.log")})
    nm.add_handler("t2", "write", "log", {"file": str(tmp_path / "b.log")})
    assert len(nm.list_handlers()) == 2


def test_list_filtered_by_table(nm, tmp_path):
    nm.add_handler("t1", "write", "log", {"file": str(tmp_path / "a.log")})
    nm.add_handler("t2", "write", "log", {"file": str(tmp_path / "b.log")})
    result = nm.list_handlers(table="t1")
    assert len(result) == 1
    assert result[0]["table"] == "default.t1"


# --- remove ---


def test_remove_existing(nm, tmp_path):
    reg = nm.add_handler("tbl", "write", "log", {"file": str(tmp_path / "l.log")})
    result = nm.remove_handler(reg["handler_id"])
    assert "Removed" in result["message"]
    assert nm.list_handlers() == []


def test_remove_nonexistent(nm):
    result = nm.remove_handler("nonexistent")
    assert "No handler found" in result["message"]


# --- fire_event ---


def test_fire_matches_handler(nm, tmp_path):
    log_file = str(tmp_path / "events.log")
    nm.add_handler("tbl", "write", "log", {"file": log_file})
    result = nm.fire_event("tbl", "write", {"rows": 10})
    assert result["handlers_triggered"] == 1
    assert result["results"][0]["status"] == "success"
    assert os.path.exists(log_file)


def test_fire_no_match(nm, tmp_path):
    nm.add_handler("tbl", "write", "log", {"file": str(tmp_path / "l.log")})
    result = nm.fire_event("other_table", "write", {})
    assert result["handlers_triggered"] == 0


def test_fire_event_type_all(nm, tmp_path):
    nm.add_handler("tbl", "all", "log", {"file": str(tmp_path / "all.log")})
    result = nm.fire_event("tbl", "schema_change", {"change": "added column"})
    assert result["handlers_triggered"] == 1


def test_fire_wildcard_table(nm, tmp_path):
    nm.add_handler("*", "write", "log", {"file": str(tmp_path / "wild.log")})
    result = nm.fire_event("any_table", "write", {})
    assert result["handlers_triggered"] == 1


def test_fire_shell_handler(nm):
    nm.add_handler("tbl", "write", "shell", {"command": "echo test"})
    result = nm.fire_event("tbl", "write", {"rows": 5})
    assert result["handlers_triggered"] == 1
    assert result["results"][0]["status"] == "success"


def test_fire_shell_handler_sees_event_env(nm):
    nm.add_handler("tbl", "write", "shell",
                   {"command": "test -n \"$LAKEHOUSE_EVENT\""})
    result = nm.fire_event("tbl", "write", {})
    assert result["results"][0]["status"] == "success"


def test_fire_failing_shell_reports_error_not_raise(nm):
    nm.add_handler("tbl", "write", "shell", {"command": "exit 3"})
    result = nm.fire_event("tbl", "write", {})
    assert result["results"][0]["status"] == "error"
    assert result["results"][0]["returncode"] == 3


def test_fire_multiple_handlers(nm, tmp_path):
    nm.add_handler("tbl", "write", "log", {"file": str(tmp_path / "e1.log")})
    nm.add_handler("tbl", "write", "log", {"file": str(tmp_path / "e2.log")})
    result = nm.fire_event("tbl", "write", {})
    assert result["handlers_triggered"] == 2


# --- history ---


def test_history_empty(nm):
    assert nm.history() == []


def test_history_after_fire(nm, tmp_path):
    nm.add_handler("tbl", "write", "log", {"file": str(tmp_path / "h.log")})
    nm.fire_event("tbl", "write", {})
    nm.fire_event("tbl", "write", {})
    assert len(nm.history()) == 2


def test_history_filter_by_table(nm, tmp_path):
    log_file = str(tmp_path / "hf.log")
    nm.add_handler("t1", "write", "log", {"file": log_file})
    nm.add_handler("t2", "write", "log", {"file": log_file})
    nm.fire_event("t1", "write", {})
    nm.fire_event("t2", "write", {})
    history = nm.history(table="t1")
    assert len(history) == 1
    assert history[0]["table"] == "default.t1"


def test_history_filter_by_event_type(nm, tmp_path):
    nm.add_handler("tbl", "all", "log", {"file": str(tmp_path / "he.log")})
    nm.fire_event("tbl", "write", {})
    nm.fire_event("tbl", "schema_change", {})
    assert len(nm.history(event_type="write")) == 1


def test_history_limit(nm, tmp_path):
    nm.add_handler("tbl", "write", "log", {"file": str(tmp_path / "hl.log")})
    for _ in range(10):
        nm.fire_event("tbl", "write", {})
    assert len(nm.history(limit=3)) == 3


# --- send_test_event ---


def test_send_test_event_valid(nm, tmp_path):
    log_file = str(tmp_path / "test.log")
    reg = nm.add_handler("tbl", "write", "log", {"file": log_file})
    result = nm.send_test_event(reg["handler_id"])
    assert result["result"]["status"] == "success"
    assert os.path.exists(log_file)


def test_send_test_event_nonexistent(nm):
    result = nm.send_test_event("nonexistent")
    assert "No handler found" in result["message"]


def test_remove_matching_pair(nm, tmp_path):
    log_file = str(tmp_path / "rm.log")
    nm.add_handler("tbl", "write", "log", {"file": log_file})
    nm.add_handler("tbl", "write", "log", {"file": log_file})
    nm.add_handler("tbl", "all", "log", {"file": log_file})
    assert nm.remove_matching("tbl", "write") == 2
    assert len(nm.list_handlers()) == 1
