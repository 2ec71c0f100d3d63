"""RunnerInfo: dynamic attribute bag threaded through a run
(estimator/utils/runner.py:3-22)."""

from __future__ import annotations


class RunnerInfo:
    def __init__(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)

    def __repr__(self):
        return f"RunnerInfo({self.__dict__!r})"
