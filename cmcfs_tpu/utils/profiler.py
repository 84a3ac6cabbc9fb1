"""Named-section wall-clock profiler (reference src/Common/Profiler.h).

Per-event count / total / average milliseconds, printed sorted by total time
in human or CSV form (the reference's CSV flag).  ``sync`` blocks on device
work (the TPU analogue of the reference's pre-event MPI_Barrier,
Profiler.h:57-59) so timings attribute correctly despite async dispatch.
Also exposes jax.profiler trace capture for deep dives.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class _Event:
    __slots__ = ("count", "total")

    def __init__(self) -> None:
        self.count = 0
        self.total = 0.0


class Profiler:
    def __init__(self, sync: bool = True, enabled: bool = True,
                 sync_fetch=None):
        """``sync_fetch``: optional zero-arg callable that forces a device
        round-trip (e.g. ``lambda: float(jnp.sum(solver.cur.u))``).
        Through the remote axon tunnel, blocking calls do NOT block
        (CLAUDE.md) — only a scalar fetch does — so without a fetch hook
        per-section times misattribute to whichever section fetches; with
        it, each boundary pays one round-trip but attributes correctly
        (the cost the reference pays with its per-event MPI_Barrier,
        Profiler.h:57-59)."""
        self.events: Dict[str, _Event] = {}
        self.sync = sync
        self.sync_fetch = sync_fetch
        self.enabled = enabled
        self._start: Optional[float] = None
        self._wall_start = time.perf_counter()

    def _sync_devices(self) -> None:
        if not self.sync:
            return
        if self.sync_fetch is not None:
            try:
                self.sync_fetch()
                return
            except Exception:
                pass
        try:
            import jax
            jax.effects_barrier()
        except Exception:
            pass

    def start(self) -> None:
        if not self.enabled:
            return
        self._sync_devices()
        self._start = time.perf_counter()

    def stop(self, name: str) -> None:
        if not self.enabled or self._start is None:
            return
        self._sync_devices()
        dt = time.perf_counter() - self._start
        ev = self.events.setdefault(name, _Event())
        ev.count += 1
        ev.total += dt
        self._start = None

    @contextlib.contextmanager
    def section(self, name: str):
        self.start()
        try:
            yield
        finally:
            self.stop(name)

    def report(self, csv: bool = False, overhead_ms: float = None) -> str:
        """``overhead_ms``: per-section sync cost (e.g. the measured axon
        tunnel fetch round-trip) to subtract — adds a net-of-overhead
        average column so event times compare across link conditions."""
        rows = sorted(self.events.items(), key=lambda kv: -kv[1].total)
        wall = time.perf_counter() - self._wall_start
        if csv:
            hdr = "event,count,total_ms,avg_ms"
            if overhead_ms is not None:
                hdr += ",net_avg_ms"
            out = [hdr]
            for name, ev in rows:
                line = (f"{name},{ev.count},{ev.total*1e3:.3f},"
                        f"{ev.total*1e3/max(ev.count,1):.3f}")
                if overhead_ms is not None:
                    net = max(ev.total*1e3/max(ev.count, 1) - overhead_ms, 0.0)
                    line += f",{net:.3f}"
                out.append(line)
            out.append(f"overall_sec,,{wall:.3f},")
            return "\n".join(out)
        hdr = f"{'event':<24}{'count':>8}{'total ms':>14}{'avg ms':>12}"
        if overhead_ms is not None:
            hdr += f"{'net avg ms':>14}"
        out = [hdr]
        for name, ev in rows:
            line = (f"{name:<24}{ev.count:>8}{ev.total*1e3:>14.3f}"
                    f"{ev.total*1e3/max(ev.count,1):>12.3f}")
            if overhead_ms is not None:
                net = max(ev.total*1e3/max(ev.count, 1) - overhead_ms, 0.0)
                line += f"{net:>14.3f}"
            out.append(line)
        if overhead_ms is not None:
            out.append(f"(net = avg - {overhead_ms:.1f} ms sync overhead)")
        out.append(f"overall: {wall:.3f} sec")
        return "\n".join(out)


@contextlib.contextmanager
def jax_trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
