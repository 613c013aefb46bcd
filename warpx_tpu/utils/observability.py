"""Runtime observability: warn manager, signal handling, step timing.

Mirrors the reference's operational plumbing:
  * WarnManager (ablastr/warn_manager/WarnManager.H:86,227): deduplicated,
    priority-tagged warnings printed as a summary at the end of the run and
    on demand;
  * SignalHandling (ablastr/utils/SignalHandling.H:43-53): named POSIX
    signals set break/checkpoint flags checked once per step
    (WarpXEvolve.cpp:118, :457-462, :1248-1259);
  * per-step timing print (WarpXEvolve.cpp:323-328).
"""

from __future__ import annotations

import signal as _signal
import sys
import time
from collections import OrderedDict

__all__ = ["WarnManager", "warn", "SignalFlags", "StepTimer"]


class WarnManager:
    """Collect warnings with priorities; dedupe; print a summary."""

    _GLOBAL: "WarnManager | None" = None

    def __init__(self):
        self._records: "OrderedDict[tuple, int]" = OrderedDict()

    @classmethod
    def instance(cls) -> "WarnManager":
        if cls._GLOBAL is None:
            cls._GLOBAL = cls()
        return cls._GLOBAL

    def record(self, topic: str, msg: str, priority: str = "medium"):
        key = (topic, msg, priority)
        self._records[key] = self._records.get(key, 0) + 1

    def summary(self) -> str:
        if not self._records:
            return "No recorded warnings.\n"
        lines = ["", "*" * 21 + " WARNINGS " + "*" * 21]
        for (topic, msg, priority), count in self._records.items():
            tag = f"[{priority}][raised {count}x]" if count > 1 else \
                f"[{priority}]"
            lines.append(f"* --> {tag} [{topic}] {msg}")
        lines.append("*" * 52)
        return "\n".join(lines) + "\n"

    def print_summary(self, stream=None):
        (stream or sys.stdout).write(self.summary())

    def reset(self):
        self._records.clear()


def warn(topic: str, msg: str, priority: str = "medium"):
    WarnManager.instance().record(topic, msg, priority)


class SignalFlags:
    """Register handlers for named signals that request a break or a
    checkpoint at the next step boundary (SignalHandling.H semantics)."""

    _NAMES = {
        "HUP": _signal.SIGHUP, "INT": _signal.SIGINT,
        "TERM": _signal.SIGTERM, "USR1": _signal.SIGUSR1,
        "USR2": _signal.SIGUSR2,
    }

    def __init__(self, break_signals=(), checkpoint_signals=()):
        self.break_requested = False
        self.checkpoint_requested = False
        for name in break_signals:
            self._install(name, "break")
        for name in checkpoint_signals:
            self._install(name, "checkpoint")

    def _install(self, name: str, action: str):
        signum = self._NAMES.get(str(name).upper().replace("SIG", ""))
        if signum is None:
            warn("SignalHandling", f"unknown signal name {name}", "low")
            return

        def handler(_sig, _frame):
            if action == "break":
                self.break_requested = True
            else:
                self.checkpoint_requested = True

        _signal.signal(signum, handler)

    def pop_checkpoint(self) -> bool:
        req, self.checkpoint_requested = self.checkpoint_requested, False
        return req


class StepTimer:
    """Per-step wall-time reporting (WarpXEvolve.cpp:323-328 format).

    Timing closes each step's span with wall clock around the dispatched
    work; on accelerators this measures dispatch unless the caller forces
    device synchronization between steps.
    """

    def __init__(self, stream=None):
        self.stream = stream or sys.stdout
        self.t_start = time.perf_counter()
        self.t_last = self.t_start
        self.n = 0

    def step_done(self, step: int, sim_time: float, dt: float):
        now = time.perf_counter()
        this = now - self.t_last
        self.n += 1
        avg = (now - self.t_start) / self.n
        self.t_last = now
        self.stream.write(
            f"STEP {step} ends. TIME = {sim_time:.10e} DT = {dt:.10e}\n"
            f"Evolve time = {now - self.t_start:.6g} s; This step = "
            f"{this:.6g} s; Avg. per step = {avg:.6g} s\n"
        )
        self.stream.flush()
