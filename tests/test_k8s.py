"""SparkApplication manifest + status-resolution parity (S11/F13/T11).

Golden cases mirror the reference's behavior:
spark_application_template.go (template mutators, status resolve,
sanitizeK8sName) and service_maintenance_executor_spark.go
(application naming, event-driven completion). Pure Python — no Spark
session needed."""

import yaml

from lakehouse_admin_spark import k8s
from lakehouse_admin_spark.tasks import TaskQueue


# ---------------------------------------------------------------- F13 naming

def test_sanitize_name_goldens():
    cases = {
        "MyTable": "mytable",
        "My_Table!Name": "my-table-name",
        "weird__chars//here": "weird-chars-here",
        "--already-dashed--": "already-dashed",
        "___": "spark-application",
        "": "spark-application",
        "ABC123def": "abc123def",
        "über-table": "ber-table",  # non-ascii dropped like any other rune
    }
    for raw, want in cases.items():
        assert k8s.sanitize_name(raw) == want, raw


def test_sanitize_name_length_cap():
    out = k8s.sanitize_name("a" * 100)
    assert out == "a" * 63
    # trailing dash after the cut is re-trimmed
    out = k8s.sanitize_name("a" * 62 + "_" + "b" * 20)
    assert out == "a" * 62
    assert len(k8s.sanitize_name("ab_" * 50)) <= 63


def test_build_application_name():
    assert k8s.build_application_name("rewrite-data-files", "viewevent", 7) == (
        "rewrite-data-files-viewevent-7"
    )
    # overlong table part is truncated so the whole name fits 63
    name = k8s.build_application_name("rewrite-data-files", "x" * 100, 12345)
    assert len(name) <= 63
    assert name.startswith("rewrite-data-files-x")
    assert name.endswith("-12345")
    # unusable table part falls back to prefix-id
    assert k8s.build_application_name("expire-snapshots", "???", 9) == "expire-snapshots-9"
    # prefix+suffix already exhaust the budget
    assert k8s.build_application_name("p" * 70, "table", 1) == "p" * 70 + "-1"


# ------------------------------------------------------- manifest mutators

def test_template_mutators_and_yaml_roundtrip():
    m = k8s.SparkApplicationManifest.template()
    m.set_py_file_name("maintenance.py")
    assert m.obj["spec"]["pyFiles"].endswith("/maintenance.py")

    # replaces only the last path segment
    m.obj["spec"]["pyFiles"] = "https://example.invalid/jobs/old.py"
    m.set_py_file_name("new.py")
    assert m.obj["spec"]["pyFiles"] == "https://example.invalid/jobs/new.py"
    # no slash -> replaced wholesale; empty current -> set
    m.obj["spec"]["pyFiles"] = "old.py"
    m.set_py_file_name("new.py")
    assert m.obj["spec"]["pyFiles"] == "new.py"

    m.set_env_values({"TASK_ID": "42", "EXTRA": "1"})
    env = {e["name"]: e["value"] for e in m.driver_container()["env"]}
    assert env["TASK_ID"] == "42" and env["EXTRA"] == "1"
    # upsert preserves position of existing entries
    names = [e["name"] for e in m.driver_container()["env"]]
    assert names.index("TASK_ID") < names.index("EXTRA")

    m.set_annotation("a/b", "v")
    m.merge_driver_pod_annotations({"pod": "ann"})
    m.merge_driver_node_selector({"pool": "spark"})
    m.append_driver_tolerations([{"key": "dedicated", "value": "spark", "effect": "NoSchedule"}])
    pod = m.obj["spec"]["driverSpec"]["podTemplateSpec"]
    assert pod["metadata"]["annotations"] == {"pod": "ann"}
    assert pod["spec"]["nodeSelector"] == {"pool": "spark"}
    assert pod["spec"]["tolerations"][0]["key"] == "dedicated"

    again = k8s.SparkApplicationManifest.from_yaml(m.to_yaml())
    assert again.obj == m.obj
    assert yaml.safe_load(m.to_yaml())["kind"] == "SparkApplication"


# ------------------------------------------------------- status resolution

def _status(current=None, history=None, error=""):
    out = {}
    if current is not None:
        out["currentState"] = current
    if history is not None:
        out["stateTransitionHistory"] = history
    if error:
        out["errorMessage"] = error
    return out


def test_resolve_wrapper_unwraps_to_failure():
    status = _status(
        current={"state": "ResourceReleased"},
        history={
            "1": {"state": "RUNNING"},
            "2": {"state": "FAILED", "message": "executor OOM"},
            "3": {"state": "ResourceReleased"},
        },
    )
    r = k8s.resolve_status(status)
    assert r.current_state == "ResourceReleased"
    assert r.outcome_state == "FAILED"
    assert r.message == "executor OOM"
    assert r.is_terminal and not r.is_success


def test_resolve_wrapper_prefers_failure_over_success():
    status = _status(
        current={"state": "TerminatedWithoutReleaseResources"},
        history={
            "1": {"state": "COMPLETED", "message": "done"},
            "2": {"state": "FAILED", "message": "late failure"},
        },
    )
    r = k8s.resolve_status(status)
    assert r.outcome_state == "FAILED" and r.message == "late failure"


def test_resolve_empty_current_falls_back_to_history():
    status = _status(history={"1": {"state": "RUNNING"}, "2": {"state": "COMPLETED"}})
    r = k8s.resolve_status(status)
    assert r.state == "COMPLETED" and r.is_terminal and r.is_success


def test_resolve_message_backfill_and_summary_priority():
    # currentStateSummary wins over state; message backfills from matching transition
    status = _status(
        current={"state": "X", "currentStateSummary": "FAILED"},
        history={"1": {"state": "FAILED", "message": "from history"}},
    )
    r = k8s.resolve_status(status)
    assert r.outcome_state == "FAILED" and r.message == "from history"


def test_transitions_sorted_numerically_then_lexicographic():
    status = _status(
        history={
            "10": {"state": "C"},
            "2": {"state": "B"},
            "1": {"state": "A"},
            "zz": {"state": "Z"},
        }
    )
    assert [t["state"] for t in k8s.transition_results(status)] == ["A", "B", "C", "Z"]


def test_should_handle_update():
    running = _status(current={"state": "RUNNING"})
    done = _status(current={"state": "COMPLETED"})
    failed = _status(current={"state": "FAILED"})
    assert not k8s.should_handle_update(running, running)  # new not terminal
    assert k8s.should_handle_update(running, done)  # became terminal
    assert not k8s.should_handle_update(done, done)  # same terminal state
    assert k8s.should_handle_update(done, failed)  # terminal state changed


# ----------------------------------------------- submission + async completion

def test_submit_optimize_and_complete_event(tmp_path):
    queue = TaskQueue(persist_path=str(tmp_path / "tasks.jsonl"))
    task = queue.enqueue(
        "main",
        "viewevent",
        "optimize",
        {"target_file_size_mb": 512, "from": "2024-02-01", "to": "2024-02-29"},
    )
    queue.claim()

    manifest, result = k8s.submit_task(task, partition_column="createdat")
    assert result["status"] == "submitted"
    assert result["application_name"] == f"rewrite-data-files-viewevent-{task.id}"
    assert result["where"] == (
        "date(createdat) >= date '2024-02-01' AND date(createdat) <= date '2024-02-29'"
    )
    env = {e["name"]: e["value"] for e in manifest.driver_container()["env"]}
    assert env["ICEBERG_WHERE_UNTIL"] == "2024-03-01"  # to + 1 day, exclusive
    assert env["TARGET_FILE_SIZE_BYTES"] == str(512 * 1024 * 1024)
    assert env["TASK_PROCEDURE"] == "rewrite_data_files"
    assert env["ICEBERG_DATABASE"] == "main" and env["ICEBERG_TABLE"] == "viewevent"
    assert manifest.annotations[k8s.ANNOTATION_TASK_ID] == str(task.id)
    assert manifest.obj["spec"]["pyFiles"].endswith("/maintenance.py")

    # terminal COMPLETED event completes the task ok
    manifest.obj["status"] = {
        "currentState": {"state": "COMPLETED"},
        "stateTransitionHistory": {
            "1": {"state": "SUBMITTED"},
            "2": {"state": "RUNNING"},
            "3": {"state": "COMPLETED", "message": "all file groups rewritten"},
        },
    }
    assert k8s.complete_task_from_event(queue, manifest)
    done = queue.get(task.id)
    assert done.status == "success"
    assert done.result["spark_state"] == "COMPLETED"
    assert done.result["status"] == "ok"
    assert [t["state"] for t in done.result["spark_state_transitions"]] == [
        "SUBMITTED",
        "RUNNING",
        "COMPLETED",
    ]


def test_submit_expire_and_failure_event(tmp_path):
    import datetime as dt

    queue = TaskQueue(persist_path=str(tmp_path / "tasks.jsonl"))
    task = queue.enqueue("main", "events", "expire_snapshots", {"retention_days": 7})
    queue.claim()

    now = dt.datetime(2026, 8, 13, 12, 0, 0, tzinfo=dt.timezone.utc)
    manifest, result = k8s.submit_task(task, now=now)
    assert result["older_than"] == "2026-08-06T12:00:00Z"
    env = {e["name"]: e["value"] for e in manifest.driver_container()["env"]}
    assert env["RETENTION_DAYS"] == "7" and env["CLEAN_EXPIRED_METADATA"] == "true"
    assert env["TASK_PROCEDURE"] == "expire_snapshots"

    manifest.obj["status"] = {
        "currentState": {"state": "ResourceReleased"},
        "stateTransitionHistory": {"1": {"state": "FAILED", "message": "boom"}},
    }
    assert k8s.complete_task_from_event(queue, manifest)
    done = queue.get(task.id)
    assert done.status == "error"
    assert done.error_message == "boom"
    assert done.result["status"] == "error"
    assert done.result["spark_state"] == "FAILED"


def test_non_terminal_event_is_ignored(tmp_path):
    queue = TaskQueue(persist_path=str(tmp_path / "tasks.jsonl"))
    task = queue.enqueue("main", "events", "remove_orphan_files", {"retention_days": 3})
    queue.claim()
    manifest, result = k8s.submit_task(task)
    assert env_value(manifest, "TASK_PROCEDURE") == "remove_orphan_files"
    assert result["application_name"].startswith("remove-orphan-files-events-")

    manifest.obj["status"] = {"currentState": {"state": "RUNNING"}}
    assert not k8s.complete_task_from_event(queue, manifest)
    assert queue.get(task.id).status == "running"


def test_submit_validations(tmp_path):
    import pytest

    queue = TaskQueue(persist_path=str(tmp_path / "tasks.jsonl"))
    t1 = queue.enqueue("main", "t", "optimize", {"from": "2024-02-02", "to": "2024-02-01"})
    with pytest.raises(ValueError, match="before or equal"):
        k8s.submit_task(t1, partition_column="d")
    t2 = queue.enqueue("main", "t", "optimize", {"from": "2024-02-01", "to": "2024-02-02"})
    with pytest.raises(ValueError, match="day-partition"):
        k8s.submit_task(t2)  # no partition column
    t3 = queue.enqueue("main", "t", "expire_snapshots", {"retention_days": 0})
    with pytest.raises(ValueError, match="retention"):
        k8s.submit_task(t3)


def env_value(manifest, name):
    for e in manifest.driver_container()["env"]:
        if e["name"] == name:
            return e["value"]
    return None
