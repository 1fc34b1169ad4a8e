"""Runtime-tunable settings (reference: backend/internal/service_settings.go,
migration 20260208000000_add_settings.sql — a key/value table holding
task_concurrency and the small-file thresholds).

Persisted as a JSON file next to the warehouse; typed accessors return
the reference defaults when unset (service_settings.go:15-23)."""

from __future__ import annotations

import json
import os

from lakehouse_admin_spark.operators.analyze import OptimizeSettings

DEFAULTS = {
    "task_concurrency": "1",
    "small_file_threshold_bytes": str(256 * 1024 * 1024),
    "small_file_min_count": "2",
    "small_file_min_share_percent": "25",
    "needs_optimize_delay_hours": "96",
}


class SettingsStore:
    def __init__(self, path: str):
        self.path = path
        self._data: dict[str, str] = {}
        if os.path.exists(path):
            with open(path) as fh:
                self._data = json.load(fh)

    def get(self, key: str) -> str:
        return self._data.get(key, DEFAULTS.get(key, ""))

    def get_int(self, key: str) -> int:
        return int(self.get(key))

    def set(self, key: str, value: str) -> None:
        self._data[key] = str(value)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self._data, fh, indent=1)
        os.replace(tmp, self.path)

    def all(self) -> dict[str, str]:
        out = dict(DEFAULTS)
        out.update(self._data)
        return out

    def optimize_settings(self) -> OptimizeSettings:
        return OptimizeSettings(
            small_file_threshold_bytes=self.get_int("small_file_threshold_bytes"),
            small_file_min_count=self.get_int("small_file_min_count"),
            small_file_min_share_percent=self.get_int("small_file_min_share_percent"),
            needs_optimize_delay_hours=self.get_int("needs_optimize_delay_hours"),
        )
