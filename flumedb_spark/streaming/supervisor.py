"""View supervisor — always-on maintenance for every registered view
with restart-on-failure (SURVEY §4's custom-plumbing list: "per-view
supervisor that drops checkpoint+table and restarts the query"; the
reference's crash-restart loop `index.js:56-75` as a service).

One :class:`LiveViewRunner` per view; a monitor thread polls query
health. A failed query is handled exactly like the reference's sink
error: destroy the view, clear its checkpoint, restart from seq 0 —
the log is the source of truth, views are disposable.
"""

from __future__ import annotations

import shutil
import threading
import time


from .live import LiveViewRunner


class ViewSupervisor:
    """``ViewSupervisor(engine).start()`` — maintain all views live."""

    def __init__(
        self,
        engine,
        poll_interval: float = 1.0,
        max_restarts: int = 3,
        auto_compact: bool = False,
        compact_policy: dict | None = None,
    ):
        self.engine = engine
        self.poll_interval = poll_interval
        self.max_restarts = max_restarts
        # roadmap #7: the supervisor doubles as the maintenance daemon —
        # each poll runs any DUE compaction (cheap metadata-only check
        # when nothing is due)
        self.auto_compact = auto_compact
        self.compact_policy = compact_policy or {}
        self.runners: dict[str, LiveViewRunner] = {}
        self.restarts: dict[str, int] = {}
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self) -> "ViewSupervisor":
        for name in self.engine._views:
            self._launch(name)
        self._thread = threading.Thread(target=self._monitor, daemon=True)
        self._thread.start()
        return self

    def _launch(self, name: str) -> None:
        runner = LiveViewRunner(self.engine, name)
        runner.start()
        self.runners[name] = runner

    def _monitor(self) -> None:
        while not self._stop.is_set():
            for name, runner in list(self.runners.items()):
                q = runner.query
                if q is None or q.isActive:
                    continue
                if q.exception() is None:
                    continue  # stopped cleanly
                if self.restarts.get(name, 0) >= self.max_restarts:
                    continue  # give up; gated reads still self-heal
                self.restarts[name] = self.restarts.get(name, 0) + 1
                # the reference's recovery: wipe view + checkpoint, rebuild
                # from the log (index.js:56-75). Under engine._lock: a
                # read-driven catch-up fold mid-flight would otherwise
                # append its batch AFTER the destroy and commit partial
                # state as fully caught-up (since=upto over one batch's
                # records) — the same serialization every fold path uses.
                view = self.engine._views[name]
                with self.engine._lock:
                    view.destroy()
                    shutil.rmtree(runner.checkpoint_dir, ignore_errors=True)
                self._launch(name)
            if self.auto_compact:
                try:
                    self.engine.maintain(**self.compact_policy)
                except Exception:
                    pass  # maintenance must never kill the monitor
            self._stop.wait(self.poll_interval)

    def process_all_available(self) -> None:
        for runner in self.runners.values():
            if runner.query is not None and runner.query.isActive:
                runner.process_all_available()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
        for runner in self.runners.values():
            runner.stop()


def wait_until(predicate, timeout: float = 120.0, interval: float = 0.1) -> bool:
    """Poll helper for supervisor tests/clients. The generous default
    exists for loaded hosts: a streaming-query start + first micro-batch
    can exceed 30s under CPU contention (observed flaking the suite when
    run concurrently with a bench); a healthy run returns in seconds
    regardless."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(interval)
    return False
