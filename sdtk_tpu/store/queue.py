"""Persistent processing queue — the host-side work ledger.

Mirrors reference ``speaker-process`` ``ProcessingQueue`` (:228-341): a
lock-guarded, YAML-persisted queue whose items move
``pending → processing → completed | failed | skipped``; re-adding a failed
item resets it to pending, which is what makes crash recovery free (items
are keyed by recording path and work is idempotent per b3sum).

Serves both the single-host thread-pool driver and the multi-host variant
(each host filters items by ``hash(path) % num_hosts == host_id``).
"""

from __future__ import annotations

import threading
from datetime import datetime, timezone
from pathlib import Path
from typing import Any

from .. import config
from ..utils.ioutil import load_yaml_or, save_yaml

VALID_STATES = ("pending", "processing", "completed", "failed", "skipped")


def _now() -> str:
    return datetime.now(timezone.utc).isoformat()


class ProcessingQueue:
    def __init__(self, path: str | Path | None = None):
        self.path = Path(path) if path else config.queue_path()
        self._lock = threading.Lock()
        self._items: dict[str, dict[str, Any]] = {}
        self._load()

    def _load(self) -> None:
        data = load_yaml_or(self.path, {}) or {}
        for item in data.get("items", []):
            self._items[item["path"]] = item
        # Crash recovery: anything left 'processing' goes back to pending.
        for item in self._items.values():
            if item.get("status") == "processing":
                item["status"] = "pending"

    def _save_locked(self) -> None:
        save_yaml(
            self.path,
            {"updated_at": _now(), "items": list(self._items.values())},
        )

    def add(
        self, path: str | Path, force: bool = False, context: str | None = None
    ) -> dict[str, Any]:
        """Add (or re-arm) a work item.  Failed/skipped items reset to
        pending; completed items only reset with force."""
        key = str(Path(path).resolve())
        with self._lock:
            item = self._items.get(key)
            if item is None:
                item = {
                    "path": key,
                    "status": "pending",
                    "added_at": _now(),
                    "attempts": 0,
                    "error": None,
                }
                if context:
                    item["context"] = context
                self._items[key] = item
            elif item["status"] in ("failed", "skipped") or (
                force and item["status"] == "completed"
            ):
                item["status"] = "pending"
                item["error"] = None
            self._save_locked()
            return dict(item)

    def next_pending(self) -> dict[str, Any] | None:
        """Claim the next pending item (marks it processing)."""
        with self._lock:
            for item in self._items.values():
                if item["status"] == "pending":
                    item["status"] = "processing"
                    item["started_at"] = _now()
                    item["attempts"] = item.get("attempts", 0) + 1
                    self._save_locked()
                    return dict(item)
        return None

    def mark(self, path: str | Path, status: str, error: str | None = None) -> None:
        if status not in VALID_STATES:
            raise ValueError(status)
        key = str(Path(path).resolve())
        with self._lock:
            item = self._items.get(key)
            if item is None:
                return
            item["status"] = status
            item["error"] = error
            if status in ("completed", "failed", "skipped"):
                item["completed_at"] = _now()
            self._save_locked()

    def items(self, status: str | None = None) -> list[dict[str, Any]]:
        with self._lock:
            out = [dict(i) for i in self._items.values()]
        if status:
            out = [i for i in out if i["status"] == status]
        return out

    def counts(self) -> dict[str, int]:
        with self._lock:
            counts = {s: 0 for s in VALID_STATES}
            for item in self._items.values():
                counts[item["status"]] = counts.get(item["status"], 0) + 1
            return counts

    def clear(
        self, only_completed: bool = False, status: str | None = None
    ) -> int:
        with self._lock:
            if status:
                keys = [k for k, v in self._items.items() if v["status"] == status]
            elif only_completed:
                keys = [k for k, v in self._items.items() if v["status"] == "completed"]
            else:
                keys = list(self._items)
            for k in keys:
                del self._items[k]
            self._save_locked()
            return len(keys)
