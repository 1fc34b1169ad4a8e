"""SparkApplication manifest rendering + status resolution (S11/F13/T11).

Reproduces the reference's spark-operator submission surface as pure
data-plane logic, with no kubernetes client:

- manifest template + mutation helpers
  (reference: backend/internal/spark_application_template.go:16-232,
  template asset backend/build/spark/maintenance.yaml)
- k8s name sanitization and application naming
  (spark_application_template.go:424-459,
  service_maintenance_executor_spark.go:516-534)
- status resolution state machine — terminal/success/failure/wrapper
  states, transition-history ordering, outcome extraction
  (spark_application_template.go:267-412,
  service_maintenance_executor_spark.go:550-597)
- async task completion driven by application events
  (service_maintenance_executor_spark.go:403-513)

Manifests are plain nested dicts; `to_yaml`/`from_yaml` round-trip them.
Submission is represented by returning the prepared manifest (the
cluster boundary); a caller with a real spark-operator would POST
`manifest.obj`. Everything up to and after that boundary — template
mutation, naming, env plumbing, event-driven completion — runs for real
and is tested.
"""

from __future__ import annotations

import copy
import datetime as dt
from dataclasses import dataclass

import yaml

DEFAULT_NAME = "spark-application"
NAME_MAX_LENGTH = 63
MAINTENANCE_PY_FILE = "maintenance.py"

ANNOTATION_TASK_ID = "lakehouse-admin-spark/task-id"
ANNOTATION_TASK_KIND = "lakehouse-admin-spark/task-kind"
ANNOTATION_TASK_TABLE = "lakehouse-admin-spark/task-table"

STATUS_SUBMITTED = "submitted"
STATUS_OK = "ok"
STATUS_ERROR = "error"

# Task kind -> maintenance.py procedure (service_maintenance_executor_spark.go:60-71).
TASK_PROCEDURES = {
    "optimize": "rewrite_data_files",
    "expire_snapshots": "expire_snapshots",
    "remove_orphan_files": "remove_orphan_files",
}

# Mirror of the embedded template (backend/build/spark/maintenance.yaml),
# with deployment-specific values (bucket, namespace, image registry)
# replaced by neutral placeholders — they are overridden per submission.
_TEMPLATE = {
    "apiVersion": "spark.apache.org/v1",
    "kind": "SparkApplication",
    "metadata": {"name": "maintenance-task", "namespace": "lakehouse"},
    "spec": {
        "deploymentMode": "ClusterMode",
        "pyFiles": "local:///opt/jobs/maintenance.py",
        "sparkConf": {
            "spark.dynamicAllocation.enabled": "true",
            "spark.dynamicAllocation.shuffleTracking.enabled": "true",
            "spark.dynamicAllocation.initialExecutors": "1",
            "spark.dynamicAllocation.minExecutors": "0",
            "spark.dynamicAllocation.maxExecutors": "5",
            "spark.driver.cores": "1",
            "spark.driver.memory": "1g",
            "spark.driver.memoryOverhead": "512m",
            "spark.executor.cores": "1",
            "spark.executor.memory": "1g",
            "spark.executor.memoryOverhead": "512m",
            "spark.kubernetes.container.image": "apache/spark:4.0.1",
            "spark.kubernetes.container.image.pullPolicy": "IfNotPresent",
            "spark.kubernetes.namespace": "lakehouse",
            "spark.sql.defaultCatalog": "lakehouse",
        },
        "applicationTolerations": {
            "instanceConfig": {
                "initExecutors": 1,
                "minExecutors": 0,
                "maxExecutors": 5,
            },
            "resourceRetainPolicy": "OnFailure",
        },
        "driverSpec": {
            "podTemplateSpec": {
                "spec": {
                    "serviceAccountName": "gateway",
                    "containers": [
                        {
                            "name": "spark-kubernetes-driver",
                            "env": [
                                {"name": "HOME", "value": "/tmp"},
                                {"name": "TASK_ID", "value": "0"},
                                {"name": "TASK_CALLBACK_ENABLED", "value": "false"},
                                {"name": "TASK_CALLBACK_URL", "value": ""},
                            ],
                            "resources": {
                                "requests": {"cpu": "1", "memory": "1536Mi"},
                                "limits": {"cpu": "1200m", "memory": "1536Mi"},
                            },
                        }
                    ],
                }
            }
        },
        "executorSpec": {
            "podTemplateSpec": {
                "spec": {
                    "serviceAccountName": "gateway",
                    "containers": [
                        {
                            "name": "spark-kubernetes-executor",
                            "env": [{"name": "HOME", "value": "/tmp"}],
                            "resources": {
                                "requests": {"cpu": "1", "memory": "1536Mi"},
                                "limits": {"cpu": "1", "memory": "1536Mi"},
                            },
                        }
                    ],
                }
            }
        },
        "runtimeVersions": {"scalaVersion": "2.13", "sparkVersion": "4.0.1"},
    },
    "status": {},
}


def sanitize_name(name: str) -> str:
    """RFC-1123-ish label sanitization (spark_application_template.go:424-459):
    lowercase, non-alphanumeric runs collapse to one dash, trim dashes,
    cap at 63 chars (re-trim), empty -> 'spark-application'."""
    out: list[str] = []
    last_dash = False
    for ch in name.lower():
        if ch.isascii() and (ch.isdigit() or "a" <= ch <= "z"):
            out.append(ch)
            last_dash = False
        elif not last_dash:
            out.append("-")
            last_dash = True
    result = "".join(out).strip("-")
    if not result:
        return DEFAULT_NAME
    if len(result) > NAME_MAX_LENGTH:
        result = result[:NAME_MAX_LENGTH].strip("-")
    return result or DEFAULT_NAME


def build_application_name(prefix: str, table: str, task_id: int) -> str:
    """'<prefix>-<sanitized-table>-<task_id>', table part truncated so the
    whole name fits 63 chars (service_maintenance_executor_spark.go:516-534)."""
    table_part = sanitize_name(table)
    suffix = str(task_id)
    max_table = NAME_MAX_LENGTH - len(prefix) - len(suffix) - 2
    if max_table <= 0:
        return f"{prefix}-{suffix}"
    if len(table_part) > max_table:
        table_part = table_part[:max_table].strip("-")
    if not table_part or table_part == DEFAULT_NAME:
        return f"{prefix}-{suffix}"
    return f"{prefix}-{table_part}-{suffix}"


def normalize_state(state: str) -> str:
    return (state or "").strip().upper()


def is_success_state(state: str) -> bool:
    return normalize_state(state) in ("COMPLETED", "SUCCEEDED")


def is_failure_state(state: str) -> bool:
    return normalize_state(state) in ("FAILED", "SUBMISSIONFAILED", "SUBMISSION_FAILED", "FAILING")


def is_terminal_wrapper_state(state: str) -> bool:
    """States the operator reports after resource teardown that wrap the
    real outcome (service_maintenance_executor_spark.go:586-593)."""
    return normalize_state(state) in ("TERMINATEDWITHOUTRELEASERESOURCES", "RESOURCERELEASED")


def is_terminal_state(state: str) -> bool:
    return is_success_state(state) or is_failure_state(state) or is_terminal_wrapper_state(state)


def _first_non_empty(*values: str) -> str:
    for v in values:
        if v:
            return v
    return ""


def state_summary(state: dict) -> str:
    return _first_non_empty(state.get("currentStateSummary", ""), state.get("state", ""))


def sorted_transitions(status: dict) -> list[dict]:
    """stateTransitionHistory values ordered by key: numeric keys first in
    numeric order, then non-numeric lexicographically
    (spark_application_template.go:345-377)."""
    history = status.get("stateTransitionHistory") or {}

    def keyfn(k: str):
        try:
            return (0, int(k), "")
        except ValueError:
            return (1, 0, k)

    return [history[k] for k in sorted(history, key=keyfn)]


@dataclass
class ResolvedStatus:
    current_state: str
    outcome_state: str
    message: str

    @property
    def state(self) -> str:
        return _first_non_empty(self.outcome_state, self.current_state)

    @property
    def is_terminal(self) -> bool:
        return is_terminal_state(self.current_state) or is_terminal_state(self.outcome_state)

    @property
    def is_success(self) -> bool:
        return is_success_state(self.state)


def resolve_status(status: dict) -> ResolvedStatus:
    """Extract the effective outcome from an application status: unwrap
    terminal wrapper states to the latest real failure/success in the
    transition history, and backfill empty current state/message from the
    history (spark_application_template.go:267-339)."""
    current = status.get("currentState") or {}
    app_state = status.get("applicationState") or {}
    current_state = _first_non_empty(state_summary(current), state_summary(app_state))
    current_message = _first_non_empty(current.get("message", ""), status.get("errorMessage", ""))

    latest_meaningful: dict = {}
    latest_failure: dict = {}
    latest_success: dict = {}
    latest_terminal: dict = {}
    for transition in sorted_transitions(status):
        state = state_summary(transition)
        if not state:
            continue
        latest_meaningful = transition
        if is_failure_state(state):
            latest_failure = transition
        if is_success_state(state):
            latest_success = transition
        if is_terminal_state(state) and not is_terminal_wrapper_state(state):
            latest_terminal = transition

    outcome_state = current_state
    outcome_message = current_message

    if is_terminal_wrapper_state(current_state):
        for candidate in (latest_failure, latest_success, latest_terminal):
            if state_summary(candidate):
                outcome_state = state_summary(candidate)
                outcome_message = _first_non_empty(candidate.get("message", ""), current_message)
                break
    elif not outcome_state:
        candidate = latest_terminal if state_summary(latest_terminal) else latest_meaningful
        if state_summary(candidate):
            outcome_state = state_summary(candidate)
            outcome_message = _first_non_empty(candidate.get("message", ""), current_message)
    elif not outcome_message:
        for candidate in (latest_failure, latest_success, latest_terminal, latest_meaningful):
            if outcome_state == state_summary(candidate):
                outcome_message = candidate.get("message", "")
                break

    return ResolvedStatus(
        current_state=current_state,
        outcome_state=_first_non_empty(outcome_state, current_state),
        message=_first_non_empty(outcome_message, current_message),
    )


def transition_results(status: dict) -> list[dict]:
    """Transition history as (state, message, timestamp) result rows
    (spark_application_template.go:391-412)."""
    results = []
    for transition in sorted_transitions(status):
        state = state_summary(transition)
        if not state:
            continue
        results.append(
            {
                "state": state,
                "message": transition.get("message", ""),
                "timestamp": transition.get("lastTransitionTime", ""),
            }
        )
    return results


def should_handle_update(old_status: dict, new_status: dict) -> bool:
    """Process an update only when the new status is terminal and either the
    old one was not, or the terminal state changed
    (service_maintenance_executor_spark.go:550-562)."""
    new_resolved = resolve_status(new_status)
    if not new_resolved.is_terminal:
        return False
    old_resolved = resolve_status(old_status)
    if not old_resolved.is_terminal:
        return True
    return normalize_state(old_resolved.state) != normalize_state(new_resolved.state)


class SparkApplicationManifest:
    """Thin wrapper over the manifest dict with the reference's mutators
    (spark_application_template.go:151-232)."""

    def __init__(self, obj: dict):
        self.obj = obj

    @classmethod
    def template(cls) -> "SparkApplicationManifest":
        return cls(copy.deepcopy(_TEMPLATE))

    @classmethod
    def from_yaml(cls, text: str) -> "SparkApplicationManifest":
        return cls(yaml.safe_load(text))

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.obj, sort_keys=False)

    @property
    def name(self) -> str:
        return self.obj.get("metadata", {}).get("name", "")

    @property
    def namespace(self) -> str:
        return self.obj.get("metadata", {}).get("namespace", "")

    @property
    def annotations(self) -> dict:
        return self.obj.get("metadata", {}).get("annotations", {}) or {}

    @property
    def status(self) -> dict:
        return self.obj.get("status", {}) or {}

    def set_name(self, name: str) -> None:
        self.obj.setdefault("metadata", {})["name"] = name

    def set_py_file_name(self, name: str) -> None:
        """Replace the final path segment of spec.pyFiles, keeping the base
        URL (spark_application_template.go:151-174)."""
        name = name.strip()
        if not name:
            raise ValueError("spark application pyFiles name is required")
        current = (self.obj["spec"].get("pyFiles") or "").strip()
        idx = current.rfind("/")
        self.obj["spec"]["pyFiles"] = name if idx == -1 else current[: idx + 1] + name

    def driver_container(self) -> dict:
        containers = self.obj["spec"]["driverSpec"]["podTemplateSpec"]["spec"].get("containers") or []
        if not containers:
            raise ValueError("spark application template has no driver containers")
        return containers[0]

    def set_annotation(self, name: str, value: str) -> None:
        meta = self.obj.setdefault("metadata", {})
        meta.setdefault("annotations", {})[name] = value

    def merge_driver_pod_annotations(self, annotations: dict | None) -> None:
        if not annotations:
            return
        pod_meta = self.obj["spec"]["driverSpec"]["podTemplateSpec"].setdefault("metadata", {})
        merged = dict(pod_meta.get("annotations") or {})
        merged.update(annotations)
        pod_meta["annotations"] = merged

    def merge_driver_node_selector(self, node_selector: dict | None) -> None:
        if not node_selector:
            return
        spec = self.obj["spec"]["driverSpec"]["podTemplateSpec"]["spec"]
        merged = dict(spec.get("nodeSelector") or {})
        merged.update(node_selector)
        spec["nodeSelector"] = merged

    def append_driver_tolerations(self, tolerations: list[dict] | None) -> None:
        if not tolerations:
            return
        spec = self.obj["spec"]["driverSpec"]["podTemplateSpec"]["spec"]
        spec["tolerations"] = list(spec.get("tolerations") or []) + list(tolerations)

    def set_env_values(self, values: dict[str, str]) -> None:
        """Upsert env vars on the driver container, preserving declaration
        order for existing names (spark_application_template.go:209-232)."""
        container = self.driver_container()
        env = container.setdefault("env", [])
        for name in sorted(values):
            value = values[name]
            for entry in env:
                if entry["name"] == name:
                    entry["value"] = value
                    break
            else:
                env.append({"name": name, "value": value})


def prepare_spark_application(
    manifest: SparkApplicationManifest,
    kind: str,
    task_id: int,
    database: str,
    table: str,
    application_name: str,
    *,
    catalog: str = "lakehouse",
    callback_enabled: bool = False,
    callback_url: str = "",
    pod_annotations: dict | None = None,
    node_selector: dict | None = None,
    tolerations: list[dict] | None = None,
) -> SparkApplicationManifest:
    """Common submission plumbing: name, task annotations, pod-spec merges,
    pyFiles, identity env (service_maintenance_executor_spark.go:374-401)."""
    procedure = TASK_PROCEDURES.get(kind)
    if procedure is None:
        raise ValueError(f"unknown task kind: {kind}")
    manifest.set_name(application_name)
    manifest.set_annotation(ANNOTATION_TASK_ID, str(task_id))
    manifest.set_annotation(ANNOTATION_TASK_KIND, kind)
    manifest.set_annotation(ANNOTATION_TASK_TABLE, table)
    manifest.merge_driver_pod_annotations(pod_annotations)
    manifest.merge_driver_node_selector(node_selector)
    manifest.append_driver_tolerations(tolerations)
    manifest.set_py_file_name(MAINTENANCE_PY_FILE)
    manifest.set_env_values(
        {
            "ICEBERG_CATALOG": catalog,
            "ICEBERG_DATABASE": database,
            "ICEBERG_TABLE": table,
            "TASK_CALLBACK_ENABLED": str(callback_enabled).lower(),
            "TASK_CALLBACK_URL": callback_url,
            "TASK_PROCEDURE": procedure,
            "TASK_ID": str(task_id),
        }
    )
    return manifest


def submit_task(
    task,
    *,
    now: dt.datetime | None = None,
    target_file_size_mb: int = 512,
    partition_column: str | None = None,
    partial_progress_enabled: bool = True,
    partial_progress_max_commits: int = 10,
    max_concurrent_file_group_rewrites: int = 5,
    **prepare_kwargs,
) -> tuple[SparkApplicationManifest, dict]:
    """Render the manifest + result map for a queued maintenance task, the
    submission half of the reference's spark executor
    (service_maintenance_executor_spark.go:218-372). Returns
    (manifest, result) where result carries status='submitted' and the
    application name as tracking_id; completion arrives later through
    `complete_task_from_event`."""
    now = now or dt.datetime.now(dt.timezone.utc)
    inp = task.input or {}
    manifest = SparkApplicationManifest.template()

    if task.kind == "optimize":
        target_mb = int(inp.get("target_file_size_mb", target_file_size_mb))
        if target_mb < 1:
            raise ValueError("target file size must be at least 1 MB")
        frm, to = str(inp.get("from", "")), str(inp.get("to", ""))
        if frm > to:
            raise ValueError("from date must be before or equal to the to date")
        if not partition_column:
            raise ValueError("no suitable day-partition column found for optimization")
        name = build_application_name("rewrite-data-files", task.table, task.id)
        prepare_spark_application(manifest, task.kind, task.id, task.database, task.table, name, **prepare_kwargs)
        until = (dt.date.fromisoformat(to) + dt.timedelta(days=1)).isoformat()
        manifest.set_env_values(
            {
                "ICEBERG_WHERE_COLUMN": partition_column,
                "ICEBERG_WHERE_FROM": frm,
                "ICEBERG_WHERE_UNTIL": until,
                "TARGET_FILE_SIZE_BYTES": str(target_mb * 1024 * 1024),
                "MIN_INPUT_FILES": "2",
                "PARTIAL_PROGRESS_ENABLED": str(partial_progress_enabled).lower(),
                "PARTIAL_PROGRESS_MAX_COMMITS": str(partial_progress_max_commits),
                "MAX_CONCURRENT_FILE_GROUP_REWRITES": str(max_concurrent_file_group_rewrites),
            }
        )
        where = f"date({partition_column}) >= date '{frm}' AND date({partition_column}) <= date '{to}'"
        result = {
            "database": task.database,
            "table": task.table,
            "target_file_size_mb": target_mb,
            "where": where,
            "application_name": name,
            "tracking_id": name,
            "status": STATUS_SUBMITTED,
        }
        return manifest, result

    if task.kind in ("expire_snapshots", "remove_orphan_files"):
        retention_days = int(inp.get("retention_days", 7))
        if retention_days < 1:
            raise ValueError("retention days must be at least 1")
        prefix = "expire-snapshots" if task.kind == "expire_snapshots" else "remove-orphan-files"
        name = build_application_name(prefix, task.table, task.id)
        prepare_spark_application(manifest, task.kind, task.id, task.database, task.table, name, **prepare_kwargs)
        older_than = now - dt.timedelta(days=retention_days)
        env = {
            "RETENTION_DAYS": str(retention_days),
            "OLDER_THAN": older_than.strftime("%Y-%m-%dT%H:%M:%SZ"),
        }
        result = {
            "database": task.database,
            "table": task.table,
            "retention_days": retention_days,
            "older_than": env["OLDER_THAN"],
            "application_name": name,
            "tracking_id": name,
            "status": STATUS_SUBMITTED,
        }
        if task.kind == "expire_snapshots":
            env["CLEAN_EXPIRED_METADATA"] = "true"
            result["clean_expired_metadata"] = True
        manifest.set_env_values(env)
        return manifest, result

    raise ValueError(f"unknown task kind: {task.kind}")


def complete_task_from_event(queue, manifest: SparkApplicationManifest) -> bool:
    """Terminal-application event -> task completion, the watch-handler half
    of T11 (service_maintenance_executor_spark.go:403-513). Returns True
    when the event completed a task; False for non-terminal or
    non-task applications."""
    resolved = resolve_status(manifest.status)
    if not resolved.is_terminal:
        return False
    task_id_raw = manifest.annotations.get(ANNOTATION_TASK_ID, "")
    if not task_id_raw:
        raise ValueError(
            f"terminal spark application event for {manifest.name} without {ANNOTATION_TASK_ID} annotation"
        )
    task_id = int(task_id_raw)

    result = {
        "tracking_id": manifest.name,
        "application_name": manifest.name,
        "spark_state": resolved.state,
        "spark_current_state": resolved.current_state,
        "status": STATUS_OK,
    }
    transitions = transition_results(manifest.status)
    if transitions:
        result["spark_state_transitions"] = transitions

    error = None
    if not resolved.is_success:
        message = resolved.message or (
            f"spark application {manifest.name} finished with state {resolved.state}"
        )
        result["status"] = STATUS_ERROR
        error = message

    return queue.complete(task_id, result=result, error=error)
