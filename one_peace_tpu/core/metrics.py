"""Training metrics aggregation + logging.

Replaces fairseq's nested aggregation contexts over MetersDict
(ref: fairseq/logging/metrics.py:44-60, logging/meters.py:33-321):
``aggregate()`` contexts collect ``log_scalar`` calls into weighted
averages; ``log_speed``/``log_stop_watch`` cover the timing meters; a
simple/json console writer plus an optional TensorBoard sink mirror
progress_bar.py.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from collections import OrderedDict
from typing import Dict, List, Optional


class AverageMeter:
    def __init__(self, round_digits: Optional[int] = 3):
        self.sum = 0.0
        self.count = 0.0
        self.round = round_digits

    def update(self, value: float, weight: float = 1.0):
        self.sum += float(value) * weight
        self.count += weight

    @property
    def avg(self) -> float:
        v = self.sum / self.count if self.count > 0 else 0.0
        return round(v, self.round) if self.round is not None else v


class TimeMeter:
    """items/sec (ref meters.py TimeMeter)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.start = time.time()
        self.n = 0

    def update(self, n: int = 1):
        self.n += n

    @property
    def avg(self) -> float:
        dt = time.time() - self.start
        return round(self.n / dt, 2) if dt > 0 else 0.0


class MetersDict:
    def __init__(self):
        self.meters: "OrderedDict[str, AverageMeter]" = OrderedDict()

    def log_scalar(self, key: str, value: float, weight: float = 1.0,
                   round_digits: int = 3):
        if key not in self.meters:
            self.meters[key] = AverageMeter(round_digits)
        self.meters[key].update(value, weight)

    def as_dict(self) -> Dict[str, float]:
        return {k: m.avg for k, m in self.meters.items()}


_AGGREGATORS: List[MetersDict] = []


@contextlib.contextmanager
def aggregate(new_root: bool = False):
    """Nested aggregation context (ref metrics.py:44-60): scalars logged
    inside flow to every active context (or only this one if new_root)."""
    agg = MetersDict()
    if new_root:
        saved, _AGGREGATORS[:] = _AGGREGATORS[:], [agg]
    else:
        _AGGREGATORS.append(agg)
    try:
        yield agg
    finally:
        if new_root:
            _AGGREGATORS[:] = saved
        else:
            _AGGREGATORS.pop()


def log_scalar(key: str, value: float, weight: float = 1.0, round_digits: int = 3):
    for agg in _AGGREGATORS:
        agg.log_scalar(key, value, weight, round_digits)


class ProgressLogger:
    """simple/json console logging + optional TensorBoard
    (ref logging/progress_bar.py:27-583)."""

    def __init__(self, log_format: str = "simple", log_interval: int = 10,
                 tensorboard_logdir: str = "", tag: str = "train"):
        self.log_format = log_format
        self.log_interval = log_interval
        self.tag = tag
        self._tb = None
        if tensorboard_logdir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(tensorboard_logdir)
            except Exception:
                self._tb = None

    def log(self, stats: Dict[str, float], step: int):
        # log_interval <= 0 disables per-step printing (a modulo by zero
        # would kill the run at the first batch)
        if self.log_interval <= 0 or step % self.log_interval != 0:
            return
        self.print(stats, step)

    def print(self, stats: Dict[str, float], step: int):
        if self.log_format == "json":
            print(json.dumps({"step": step, "tag": self.tag, **stats}),
                  file=sys.stderr, flush=True)
        else:
            body = " | ".join(f"{k} {v}" for k, v in stats.items())
            print(f"[{self.tag}] step {step} | {body}", file=sys.stderr, flush=True)
        if self._tb is not None:
            for k, v in stats.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(f"{self.tag}/{k}", v, step)
