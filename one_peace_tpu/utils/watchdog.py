"""Hang watchdog.

Capability equivalent of fairseq's DistributedTimeoutWrapper
(ref: fairseq/distributed/distributed_timeout_wrapper.py:1-97): the
reference arms a timer around forward/backward and kills a rank that
stalls (a hung NCCL collective).  On TPU the failure mode is a wedged
remote dispatch; the watchdog wraps any blocking call and raises (or
kills the process) if it exceeds the timeout, so orchestration can
restart from the latest checkpoint.
"""

from __future__ import annotations

import os
import signal
import threading
from typing import Optional


class WatchdogTimeout(Exception):
    pass


class Watchdog:
    """Arm around blocking sections:

        wd = Watchdog(timeout=300, action="raise")
        with wd.guard("train_step"):
            metrics = trainer.train_step(batch)
    """

    def __init__(self, timeout: float, action: str = "raise"):
        assert action in ("raise", "kill")
        self.timeout = timeout
        self.action = action
        self._timer: Optional[threading.Timer] = None
        self._tripped = threading.Event()
        self._section = ""

    def _fire(self):
        self._tripped.set()
        if self.action == "kill":
            # the reference sends SIGKILL to the hung rank (ref :88-97)
            os.kill(os.getpid(), signal.SIGKILL)
        else:
            # raise in the main thread at the next interpreter checkpoint
            import _thread

            _thread.interrupt_main()

    def guard(self, section: str = ""):
        return _Guard(self, section)

    @property
    def tripped(self) -> bool:
        return self._tripped.is_set()


class _Guard:
    def __init__(self, wd: Watchdog, section: str):
        self.wd = wd
        self.section = section

    def __enter__(self):
        self.wd._section = self.section
        self.wd._timer = threading.Timer(self.wd.timeout, self.wd._fire)
        self.wd._timer.daemon = True
        self.wd._timer.start()
        return self

    def __exit__(self, exc_type, exc, tb):
        if self.wd._timer is not None:
            self.wd._timer.cancel()
            self.wd._timer = None
        if exc_type is KeyboardInterrupt and self.wd.tripped:
            raise WatchdogTimeout(
                f"section {self.section or self.wd._section!r} exceeded "
                f"{self.wd.timeout}s") from None
        return False
