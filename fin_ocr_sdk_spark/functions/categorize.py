"""Size categorizers (S/M/L) — reference: src/categorizer.ts.

Two strategies, selectable by the segmentation operators:
  - ``ZScoreCategorizer``: z = (x - mean) / population-std; S below -1,
    L above +1 (thresholds configurable).  NOTE: population std
    (divisor N) — Spark's default ``stddev`` is the sample one; the SQL
    twin must use ``stddev_pop``.
  - ``StaticCategorizer``: fixed [min, max] band for M.
"""

from __future__ import annotations

import math
from collections.abc import Callable, Sequence


def average(nums: Sequence[float]) -> float:
    if not nums:
        return 0.0
    return sum(nums) / len(nums) or 0.0


def std_pop(nums: Sequence[float], avg: float | None = None) -> float:
    a = average(nums) if avg is None else avg
    var = sum((x - a) ** 2 for x in nums) / len(nums)
    return math.sqrt(var)


class ZScoreCategorizer:
    def __init__(
        self,
        eles: Sequence,
        fcn: Callable[[object], float] | None = None,
        small_thresh: float = -1.0,
        large_thresh: float = 1.0,
    ):
        self.fcn = fcn or (lambda x: x)
        self.small_thresh = small_thresh
        self.large_thresh = large_thresh
        nums = [self.fcn(e) for e in eles]
        self.avg = average(nums)
        self.std = std_pop(nums, self.avg)

    def get_num_zscore(self, num: float) -> float:
        return (num - self.avg) / self.std

    def get_num_category(self, num: float) -> str:
        z = self.get_num_zscore(num)
        if z < self.small_thresh:
            return "S"
        if z > self.large_thresh:
            return "L"
        return "M"

    def get_category(self, ele) -> str:
        return self.get_num_category(self.fcn(ele))


class StaticCategorizer:
    def __init__(self, min_medium: float, max_medium: float,
                 fcn: Callable[[object], float] | None = None):
        self.fcn = fcn or (lambda x: x)
        self.min_medium = min_medium
        self.max_medium = max_medium

    def get_num_category(self, num: float) -> str:
        if num < self.min_medium:
            return "S"
        if num > self.max_medium:
            return "L"
        return "M"

    def get_category(self, ele) -> str:
        return self.get_num_category(self.fcn(ele))
