"""Compile-event ledger: counts XLA backend compiles as they happen.

The e2e driver's keyframe adds were dominated by *silent* recompiles (new
BiNI bucket shapes, first fused-step trace, ...).  This taps JAX's
monitoring events (``/jax/core/compile/backend_compile_duration``) so any
driver can report, per region of interest, how many compiles fired and how
much wall they cost — the reference has no equivalent (torch eager), this
is TPU-specific observability.
"""

from __future__ import annotations

import threading


class CompileWatch:
    """Singleton-ish ledger of (fun_name, seconds) backend compiles."""

    _installed = None

    def __init__(self):
        self._lock = threading.Lock()
        self.events: list[tuple[str, float]] = []

    @classmethod
    def install(cls) -> "CompileWatch":
        if cls._installed is not None:
            return cls._installed
        watch = cls()
        from jax._src import monitoring

        def _on_duration(name: str, secs: float, **kw):
            if name == "/jax/core/compile/backend_compile_duration":
                with watch._lock:
                    watch.events.append((kw.get("fun_name", "?"), secs))

        monitoring.register_event_duration_secs_listener(_on_duration)
        cls._installed = watch
        return watch

    def mark(self) -> int:
        with self._lock:
            return len(self.events)

    def since(self, mark: int) -> list[tuple[str, float]]:
        with self._lock:
            return list(self.events[mark:])

    def summary_since(self, mark: int) -> str:
        evs = self.since(mark)
        if not evs:
            return "0 compiles"
        total = sum(s for _, s in evs)
        tops = sorted(evs, key=lambda e: -e[1])[:4]
        names = ", ".join(f"{n.replace('jit(', '').rstrip(')')}:{s:.1f}s" for n, s in tops)
        return f"{len(evs)} compiles {total:.1f}s [{names}]"
