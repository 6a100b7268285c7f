"""Curve follow & clear — signature-stroke removal over the MICR line.

Reference: /root/reference/src/curve.ts (Curves / Curve / Edge / Point /
DegreeWalker / Neighbor, lines 72-698) and src/image.ts:1191-1210
(clearByBoundary), invoked from line.ts:582-607
(performOverlapCorrection) for contours touching the ROI's top border.

A curve is tracked as two pixel edges followed in lock-step (bounce to
the other edge whenever the new point moves away from it).  An
intersection with a glyph is recognized when the two edges' directions
diverge by more than ``MAX_DELTA`` degrees outside the learn region;
crossing re-seeds the walk on the far side via directional probing.
After each section both edge point lists form a polygon boundary that
is erased from the image.

Constants mirror curve.ts:24-29.  Faithfully-kept reference quirks:

- ``clearByY`` skips a run that starts at x==0 and reaches the right
  border (curve.ts:115 ``if (x1)`` — JS falsy-zero);
- a degree of exactly 0.0 is treated as "no degree" in the delta checks
  (curve.ts:203,224,229 falsy tests);
- ``getDegree`` uses the asymmetric window [idx-1, idx+3].

One documented deviation: the reference's DegreeWalker never advances
its ``end`` point (curve.ts:588-602 reads ``this.end`` but never
assigns it), so every forward probe in crossIntersection re-tests the
same pixel and multi-pixel intersections can never be crossed.  The
walker here advances — the evident intent, and required for the
crossing caps (probeStartSteps / maxForwardProbes) to mean anything.
"""

from __future__ import annotations

import math
from collections.abc import Callable

import numpy as np

from ..functions.geometry import (degree_average, degree_delta,
                                  degree_normalize, degree_rotate,
                                  get_degree)
from .segment import jround

MAX_DELTA = 20
GOOD_SMALL_DELTA = 15
MAX_STEPS_BACK = 4
PROBE_START_STEPS = 2
MAX_FORWARD_PROBES = 20
MAX_EDGE_PROBE_FACTOR = 1.1

# (dx, dy, degree) in curve.ts:642-651 index order; y grows downward
_NEIGHBORS = (
    (1, 0, 0),      # right
    (1, -1, 45),    # above-right
    (0, -1, 90),    # above
    (-1, -1, 135),  # above-left
    (-1, 0, 180),   # left
    (-1, 1, 225),   # below-left
    (0, 1, 270),    # below
    (1, 1, 315),    # below-right
)
_N_BELOW = 6


def _opposite(idx: int) -> int:
    return (idx + 4) % 8


def _next_by_dir(idx: int, clockwise: bool) -> int:
    return (idx - 1) % 8 if clockwise else (idx + 1) % 8


def _nearest_by_degree(degree: float) -> int:
    idx = jround(degree_normalize(degree) / 45)
    return 0 if idx >= 8 else idx


def _surrounding_by_degree(degree: float) -> list[int]:
    nearest = _nearest_by_degree(degree)
    out = [nearest]
    nd = _NEIGHBORS[nearest][2]
    if nd < degree:
        out.append((nearest + 1) % 8)
    elif nd > degree:
        out.append((nearest - 1) % 8)
    return out


class _Point:
    __slots__ = ("x", "y", "edge", "n", "is_set", "idx", "nearest_other",
                 "width")

    def __init__(self, x: int, y: int, edge: "_Edge", n: int) -> None:
        self.x = x
        self.y = y
        self.edge = edge
        self.n = n
        r = edge.curve.rect  # (x_min, x_max, y_min, y_max) inclusive
        self.is_set = (r[0] <= x <= r[1] and r[2] <= y <= r[3]
                       and edge.curve.image[y, x] != 0)
        self.idx: int | None = None
        self.nearest_other: "_Point | None" = None
        self.width = -1.0

    def next_edge_point(self) -> "_Point | None":
        cw = self.edge.clockwise
        from_ = _opposite(self.n)
        n = _next_by_dir(from_, cw)
        while n != from_:
            p = _Point(self.x + _NEIGHBORS[n][0], self.y + _NEIGHBORS[n][1],
                       self.edge, n)
            if p.is_set:
                return p
            n = _next_by_dir(n, cw)
        return None

    def get_degree(self) -> float | None:
        pts = self.edge.points
        if len(pts) < 2:
            return None
        i = self.idx
        window = pts[max(i - 1, 0):min(i + 4, len(pts))]
        return get_degree([(p.x, p.y) for p in window])

    def get_degree_delta(self) -> float | None:
        d1 = self.get_degree()
        if not d1:        # quirk: exact 0.0 treated as missing (JS falsy)
            return None
        other = self.nearest_other
        if other is None:
            return None
        d2 = other.get_degree()
        if not d2:
            return None
        return degree_delta(d1, d2)


class _Edge:
    def __init__(self, curve: "Curve", clockwise: bool) -> None:
        self.curve = curve
        self.clockwise = clockwise
        self.points: list[_Point] = []
        self._coords: set[tuple[int, int]] = set()
        self.other: "_Edge | None" = None

    def reset(self) -> None:
        self.points.clear()
        self._coords.clear()

    def add_xy(self, x: int, y: int, n: int) -> None:
        self.add_point(_Point(x, y, self, n))

    def add_point(self, p: _Point) -> None:
        p.idx = len(self.points)
        self.points.append(p)
        self._coords.add((p.x, p.y))

    def contains(self, x: int, y: int) -> bool:
        return (x, y) in self._coords

    def last_point(self) -> _Point:
        return self.points[-1]

    def distance_to_other_edge(self, p: _Point) -> float:
        p2 = self.other.last_point()
        dist = math.hypot(p.x - p2.x, p.y - p2.y)
        if p.width < 0 or dist < p.width:
            p.width = dist
            p.nearest_other = p2
        if p2.width < 0 or dist < p2.width:
            p2.width = dist
            p2.nearest_other = p
        return dist

    def follow(self) -> bool:
        """Walk this edge until it pulls away from the other edge
        (bounce), diverges in direction outside the learn region
        (intersection candidate), meets the other edge, or dead-ends."""
        cur = self.last_point()
        while True:
            nxt = cur.next_edge_point()
            if nxt is None:
                self.curve.done = True
                return False
            if self.other.contains(nxt.x, nxt.y):
                self.curve.done = True
                return False
            if not self.curve.ilrf(nxt.x, nxt.y):
                dd = cur.get_degree_delta()
                if dd and dd > MAX_DELTA:
                    return False
            self.add_point(nxt)
            cur_dist = self.distance_to_other_edge(cur)
            nxt_dist = self.distance_to_other_edge(nxt)
            if nxt_dist > cur_dist:
                return True
            cur = nxt


class _DegreeWalker:
    def __init__(self, start: tuple[int, int], degree: float) -> None:
        self.start = start
        self.end = start
        self.degree = degree
        self.neighbors = _surrounding_by_degree(degree)

    def next(self) -> tuple[int, int]:
        best = None
        least = None
        for n in self.neighbors:
            p = (self.end[0] + _NEIGHBORS[n][0],
                 self.end[1] + _NEIGHBORS[n][1])
            d = get_degree([self.start, p])
            dd = degree_delta(d, self.degree)
            if best is None or dd < least:
                best, least = p, dd
        self.end = best  # deviation: advance (see module docstring)
        return best


class Curve:
    """One connected overlap stroke, followed section by section."""

    def __init__(self, image: np.ndarray,
                 rect: tuple[int, int, int, int],
                 ilrf: Callable[[int, int], bool]) -> None:
        self.image = image
        self.rect = rect  # (x_min, x_max, y_min, y_max) inclusive
        self.ilrf = ilrf
        self.edge1 = _Edge(self, clockwise=False)
        self.edge2 = _Edge(self, clockwise=True)
        self.edge1.other = self.edge2
        self.edge2.other = self.edge1
        self.done = False

    def follow_and_clear(self, p1: tuple[int, int], p2: tuple[int, int],
                         degree: float) -> None:
        sp = (p1, p2, degree)
        while sp is not None:
            q1, q2, _deg = sp
            self.edge1.reset()
            self.edge2.reset()
            self.edge1.add_xy(q1[0], q1[1], _N_BELOW)
            self.edge2.add_xy(q2[0], q2[1], _N_BELOW)
            while True:
                if not self.edge1.follow():
                    break
                if not self.edge2.follow():
                    break
            sp = self._cross_intersection()
            self._clear()

    def _cross_intersection(self):
        if self.done:
            return None
        # 1. search backwards on edge1 for the smallest degree delta
        steps = 0
        best_p = None
        best_delta = None
        best_steps = 0
        for i in range(len(self.edge1.points) - 1, -1, -1):
            if steps >= MAX_STEPS_BACK:
                break
            p = self.edge1.points[i]
            d = p.get_degree_delta()
            steps += 1
            # JS-falsy parity (curve.ts:203 'if (!d) continue'): an
            # exact 0.0 delta is skipped too, not just undefined
            if not d:
                continue
            if best_delta is None or d < best_delta:
                best_p, best_delta, best_steps = p, d, steps - 1
                if d < GOOD_SMALL_DELTA:
                    break
        if best_p is None:
            return None
        # 2. midpoint between the matched edge points + average degree
        other = best_p.nearest_other
        mid = (jround((best_p.x + other.x) / 2),
               jround((best_p.y + other.y) / 2))
        d1 = best_p.get_degree()
        if not d1:
            return None
        d2 = other.get_degree()
        if not d2:
            return None
        degree = degree_average(d1, d2)
        width = math.hypot(best_p.x - other.x, best_p.y - other.y)
        # 3. walk forward a little past the backtrack; all pixels set
        steps = best_steps + PROBE_START_STEPS
        lw = _DegreeWalker(mid, degree)
        p = None
        for _ in range(steps):
            p = lw.next()
            if not self._is_set(p):
                return None
        if p is None:
            return None
        # 4. probe sideways for the far edges of the crossed stroke
        right_deg = degree_rotate(degree, -90)
        left_deg = degree_rotate(degree, 90)
        max_edge_probes = math.ceil(width * MAX_EDGE_PROBE_FACTOR)
        for _ in range(MAX_FORWARD_PROBES):
            p1 = self._edge_probe(p, right_deg, max_edge_probes)
            p2 = (self._edge_probe(p, left_deg, max_edge_probes)
                  if p1 is not None else None)
            if p1 is not None and p2 is not None:
                return (p1, p2, degree)
            p = lw.next()
        return None

    def _edge_probe(self, sp, degree, max_iter):
        lw = _DegreeWalker(sp, degree)
        p = lw.next()
        for _ in range(max_iter):
            if not self._is_set(p):
                return p
            p = lw.next()
        return None

    def _is_set(self, p: tuple[int, int]) -> bool:
        x, y = p
        r = self.rect
        return (r[0] <= x <= r[1] and r[2] <= y <= r[3]
                and self.image[y, x] != 0)

    def _clear(self) -> None:
        pts = [(p.x, p.y) for p in self.edge1.points]
        pts += [(p.x, p.y) for p in reversed(self.edge2.points)]
        from . import kernels as K
        K.clear_by_boundary(self.image, pts)


def curves_clear(image: np.ndarray, ilrf: Callable[[int, int], bool],
                 rect: tuple[int, int, int, int] | None = None) -> None:
    """Clear every curve entering the region from its top border going
    downward (Curves.clear → clearByY("top", y_min, 270)).  ``rect`` is
    (x, y, w, h); defaults to the whole image."""
    h, w = image.shape
    if rect is None:
        rect = (0, 0, w, h)
    x0, y0, rw, rh = rect
    mm = (x0, x0 + rw - 1, y0, y0 + rh - 1)  # inclusive min/max
    y = mm[2]
    x1 = None
    for x in range(mm[0], mm[1] + 1):
        if image[y, x] != 0:
            if x1 is None:
                x1 = x
        elif x1 is not None:
            _clear_curve(image, mm, ilrf, x1, x - 1, y)
            x1 = None
    if x1:  # quirk: JS-falsy skips a border run starting at x == 0
        _clear_curve(image, mm, ilrf, x1, mm[1], y)


def _clear_curve(image, mm, ilrf, x1, x2, y):
    c = Curve(image, mm, ilrf)
    c.follow_and_clear((x1, y), (x2, y), 270)
