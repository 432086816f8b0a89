"""Scalar S2 geometry: regions, cells, cell unions, metrics, RegionCoverer.

Re-implements (from public knowledge of `sidewalklabs/s2sphere`
``s2sphere/sphere.py`` and the public C++ S2 library it ports — see
SURVEY.md §2.1 tables C, D, F, G, H, I) the per-region scalar algorithms the
engine's actor-pool stages run: region bounds/containment predicates, cell
geometry, cell-union normalization and set algebra, and the best-first
``RegionCoverer``. Per-region covering is inherently sequential and branchy
(SURVEY §3 Trace 2), so this layer stays scalar Python; parallelism comes
from running it over whole Arrow batches inside ``map_batches`` actor pools
(stages/cover.py).

Cell-id bit math delegates to the int copies of the Hilbert tables in
``cells.py`` so the scalar and vectorized paths share one source of truth.
"""

from __future__ import annotations

import math
from heapq import heappop, heappush

from . import cells as ck

MAX_LEVEL = ck.MAX_LEVEL
MAX_SIZE = ck.MAX_SIZE
POS_BITS = ck.POS_BITS
SWAP_MASK = ck.SWAP_MASK
INVERT_MASK = ck.INVERT_MASK
LOOKUP_BITS = ck.LOOKUP_BITS
_LOOKUP_POS = ck.LOOKUP_POS_PY
_LOOKUP_IJ = ck.LOOKUP_IJ_PY

_U64 = (1 << 64) - 1


# ---------------------------------------------------------------------------
# Scalar projection helpers (same math as cells.py, scalar form)
# ---------------------------------------------------------------------------


def st_to_uv(s: float) -> float:
    if s >= 0.5:
        return (1.0 / 3.0) * (4.0 * s * s - 1.0)
    return (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))


def uv_to_st(u: float) -> float:
    if u >= 0.0:
        return 0.5 * math.sqrt(1.0 + 3.0 * u)
    return 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * u)


def st_to_ij(s: float) -> int:
    return max(0, min(MAX_SIZE - 1, int(math.floor(MAX_SIZE * s))))


def face_uv_to_xyz(face: int, u: float, v: float):
    if face == 0:
        return (1.0, u, v)
    if face == 1:
        return (-u, 1.0, v)
    if face == 2:
        return (-u, -v, 1.0)
    if face == 3:
        return (-1.0, -v, -u)
    if face == 4:
        return (v, -1.0, -u)
    return (v, u, -1.0)


def valid_face_xyz_to_uv(face: int, p):
    x, y, z = p
    if face == 0:
        return (y / x, z / x)
    if face == 1:
        return (-x / y, z / y)
    if face == 2:
        return (-x / z, -y / z)
    if face == 3:
        return (z / x, y / x)
    if face == 4:
        return (z / y, -x / y)
    return (-y / z, -x / z)


def xyz_to_face_uv(p):
    x, y, z = p
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax > ay:
        face = 0 if ax > az else 2
    else:
        face = 1 if ay > az else 2
    if (x, y, z)[face] < 0.0:
        face += 3
    u, v = valid_face_xyz_to_uv(face, p)
    return face, u, v


def face_xyz_to_uv(face: int, p):
    """(u,v) if p is strictly on the hemisphere of ``face`` else None."""
    x, y, z = p
    if face < 3:
        if (x, y, z)[face] <= 0.0:
            return None
    elif (x, y, z)[face - 3] >= 0.0:
        return None
    return valid_face_xyz_to_uv(face, p)


# -- 3-vector helpers (sphere.py class Point, SURVEY §2.1 B2) ---------------


def dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def norm(a):
    return math.sqrt(dot(a, a))


def normalize(a):
    n = norm(a)
    if n == 0.0:
        return (0.0, 0.0, 0.0)
    return (a[0] / n, a[1] / n, a[2] / n)


def neg(a):
    return (-a[0], -a[1], -a[2])


def sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def scale(a, k):
    return (a[0] * k, a[1] * k, a[2] * k)


def robust_cross_prod(a, b):
    """Stable cross product for nearly (anti)parallel points
    (sphere.py def robust_cross_prod): (b+a)×(b−a) = 2 a×b exactly, but
    with cancellation pushed into the sums."""
    x = cross(add(b, a), sub(b, a))
    if x != (0.0, 0.0, 0.0):
        return x
    return ortho(a)


def ortho(a):
    """A unit vector orthogonal to a (sphere.py def ortho)."""
    k = 2 if abs(a[0]) > abs(a[1]) else 0
    temp = [0.012, 0.0053, 0.00457]
    temp[k] = 1.0
    return normalize(cross(a, tuple(temp)))


def origin():
    """Fixed reference point for crossing-parity containment
    (sphere.py def origin)."""
    return (0.00457, 1.0, 0.0043)


def simple_ccw(a, b, c) -> bool:
    """True if points a,b,c are counterclockwise (sphere.py def simple_ccw)."""
    return dot(cross(c, a), b) > 0.0


def robust_ccw(a, b, c) -> int:
    """Orientation sign with a deterministic tie-break (−1, 0, +1)."""
    det = dot(cross(a, b), c)
    if det > 1.626e-15:
        return 1
    if det < -1.626e-15:
        return -1
    return _expensive_ccw(a, b, c)


def _expensive_ccw(a, b, c) -> int:
    # Deterministic symbolic fallback: lexicographic comparison-based
    # perturbation (engine-defined; adequate for synthetic inputs which
    # avoid exact degeneracies).
    det = dot(cross(a, b), c)
    if det > 0.0:
        return 1
    if det < 0.0:
        return -1
    if a == b or b == c or c == a:
        return 0
    return 1 if (a, b, c) == tuple(sorted((a, b, c))) else -1


def drem(x: float, y: float) -> float:
    """IEEE round-half-even remainder (sphere.py def drem — the C drem /
    remainder function; Python's math.remainder has identical semantics)."""
    return math.remainder(x, y)


def is_unit_length(p) -> bool:
    """|‖p‖² − 1| ≤ 1e-15 (sphere.py def is_unit_length)."""
    return abs(dot(p, p) - 1.0) <= 1e-15


def ordered_ccw(a, b, c, o) -> bool:
    """True if edge OB is wedged between OA and OC in CCW order around o
    (sphere.py def ordered_ccw): at least two of the three orientation
    tests must agree. Equal points are allowed (a==b or b==c ⇒ True)."""
    total = 0
    if robust_ccw(b, o, a) >= 0:
        total += 1
    if robust_ccw(c, o, b) >= 0:
        total += 1
    if robust_ccw(a, o, c) > 0:
        total += 1
    return total >= 2


def planar_ccw(a, b) -> int:
    """Orientation of 2D vectors a, b about the origin (−1/0/+1), computed
    with cancellation pushed into a sum the way robust_cross_prod does
    (sphere.py def planar_ccw): the cross product is taken against
    a ± b (whichever sums constructively) instead of b directly."""
    sab = -1.0 if (a[0] * b[0] + a[1] * b[1]) > 0.0 else 1.0
    vab = (a[0] + sab * b[0], a[1] + sab * b[1])
    da = a[0] * a[0] + a[1] * a[1]
    db = b[0] * b[0] + b[1] * b[1]
    if da < db or (da == db and tuple(a) < tuple(b)):
        sign = (a[0] * vab[1] - a[1] * vab[0]) * sab
    else:
        sign = vab[0] * b[1] - vab[1] * b[0]
    if sign > 0.0:
        return 1
    if sign < 0.0:
        return -1
    return 0


def planar_ordered_ccw(a, b, c) -> bool:
    """2D analogue of :func:`ordered_ccw` (sphere.py def
    planar_ordered_ccw)."""
    total = 0
    if planar_ccw(a, b) >= 0:
        total += 1
    if planar_ccw(b, c) >= 0:
        total += 1
    if planar_ccw(c, a) > 0:
        total += 1
    return total >= 2


def simple_crossing(a, b, c, d) -> bool:
    """Do open great-circle edges AB and CD cross?
    (sphere.py def simple_crossing)."""
    ab = cross(a, b)
    acb = -dot(ab, c)
    bda = dot(ab, d)
    if acb * bda <= 0.0:
        return False
    cd = cross(c, d)
    cbd = -dot(cd, b)
    dac = dot(cd, a)
    return (acb * cbd > 0.0) and (cbd * dac > 0.0)


def triangle_area(a, b, c) -> float:
    """Spherical triangle area via L'Huilier (sphere.py def area)."""
    sa = b_angle = 0.0
    sa = _angle(b, c)
    b_angle = _angle(c, a)
    c_angle = _angle(a, b)
    s = 0.5 * (sa + b_angle + c_angle)
    if s >= 3e-4:
        s2 = s * s
        dmin = s - max(sa, max(b_angle, c_angle))
        if dmin < 1e-2 * s * s2 * s2:
            area = girard_area(a, b, c)
            if dmin < s * (0.1 * area):
                return area
    t = (
        math.tan(0.5 * s)
        * math.tan(0.5 * (s - sa))
        * math.tan(0.5 * (s - b_angle))
        * math.tan(0.5 * (s - c_angle))
    )
    return 4.0 * math.atan(math.sqrt(max(0.0, t)))


def girard_area(a, b, c) -> float:
    ab = robust_cross_prod(a, b)
    bc = robust_cross_prod(b, c)
    ac = robust_cross_prod(a, c)
    return max(
        0.0,
        _vec_angle(ab, ac) - _vec_angle(ab, bc) + _vec_angle(bc, ac),
    )


def _vec_angle(a, b) -> float:
    return math.atan2(norm(cross(a, b)), dot(a, b))


def _angle(a, b) -> float:
    return math.atan2(norm(cross(a, b)), dot(a, b))


# ---------------------------------------------------------------------------
# LatLng (sphere.py class LatLng, SURVEY §2.1 B3) — radians internally
# ---------------------------------------------------------------------------


class LatLng:
    __slots__ = ("lat", "lng")

    def __init__(self, lat_rad: float, lng_rad: float):
        self.lat = lat_rad
        self.lng = lng_rad

    @classmethod
    def from_degrees(cls, lat: float, lng: float) -> "LatLng":
        return cls(math.radians(lat), math.radians(lng))

    @classmethod
    def from_point(cls, p) -> "LatLng":
        return cls(
            math.atan2(p[2], math.sqrt(p[0] * p[0] + p[1] * p[1])),
            math.atan2(p[1], p[0]),
        )

    def to_point(self):
        phi, theta = self.lat, self.lng
        cosphi = math.cos(phi)
        return (math.cos(theta) * cosphi, math.sin(theta) * cosphi, math.sin(phi))

    def get_distance(self, other: "LatLng") -> float:
        """Great-circle distance in radians (haversine; sphere.py
        LatLng.get_distance)."""
        lat1, lat2 = self.lat, other.lat
        dlat = math.sin(0.5 * (lat2 - lat1))
        dlng = math.sin(0.5 * (other.lng - self.lng))
        x = dlat * dlat + dlng * dlng * math.cos(lat1) * math.cos(lat2)
        return 2.0 * math.asin(math.sqrt(min(1.0, x)))


# ---------------------------------------------------------------------------
# Intervals (sphere.py LineInterval / SphereInterval, SURVEY §2.1 C1/C2)
# ---------------------------------------------------------------------------


class LineInterval:
    """Closed interval on ℝ (latitudes)."""

    __slots__ = ("lo", "hi")

    def __init__(self, lo: float = 1.0, hi: float = 0.0):
        self.lo = lo
        self.hi = hi

    @classmethod
    def empty(cls) -> "LineInterval":
        return cls(1.0, 0.0)

    @classmethod
    def from_point_pair(cls, a: float, b: float) -> "LineInterval":
        return cls(min(a, b), max(a, b))

    def is_empty(self) -> bool:
        return self.lo > self.hi

    def get_center(self) -> float:
        return 0.5 * (self.lo + self.hi)

    def get_length(self) -> float:
        return self.hi - self.lo

    def contains(self, other) -> bool:
        if isinstance(other, LineInterval):
            if other.is_empty():
                return True
            return other.lo >= self.lo and other.hi <= self.hi
        return self.lo <= other <= self.hi

    def interior_contains(self, other) -> bool:
        if isinstance(other, LineInterval):
            if other.is_empty():
                return True
            return other.lo > self.lo and other.hi < self.hi
        return self.lo < other < self.hi

    def intersects(self, other: "LineInterval") -> bool:
        if self.lo <= other.lo:
            return other.lo <= self.hi and other.lo <= other.hi
        return self.lo <= other.hi and self.lo <= self.hi

    def interior_intersects(self, other: "LineInterval") -> bool:
        return (
            other.lo < self.hi
            and self.lo < other.hi
            and self.lo < self.hi
            and other.lo <= other.hi
        )

    def union(self, other: "LineInterval") -> "LineInterval":
        if self.is_empty():
            return LineInterval(other.lo, other.hi)
        if other.is_empty():
            return LineInterval(self.lo, self.hi)
        return LineInterval(min(self.lo, other.lo), max(self.hi, other.hi))

    def intersection(self, other: "LineInterval") -> "LineInterval":
        return LineInterval(max(self.lo, other.lo), min(self.hi, other.hi))

    def expanded(self, radius: float) -> "LineInterval":
        if self.is_empty():
            return LineInterval(self.lo, self.hi)
        return LineInterval(self.lo - radius, self.hi + radius)

    def approx_equals(self, other: "LineInterval", max_error: float = 1e-15) -> bool:
        if self.is_empty():
            return other.get_length() <= 2 * max_error
        if other.is_empty():
            return self.get_length() <= 2 * max_error
        return (
            abs(other.lo - self.lo) <= max_error
            and abs(other.hi - self.hi) <= max_error
        )


class SphereInterval:
    """Interval on the circle of longitudes; may wrap (lo > hi ⇒ inverted)."""

    __slots__ = ("lo", "hi")

    def __init__(self, lo: float = math.pi, hi: float = -math.pi):
        self.lo = lo
        self.hi = hi

    @classmethod
    def empty(cls) -> "SphereInterval":
        return cls(math.pi, -math.pi)

    @classmethod
    def full(cls) -> "SphereInterval":
        return cls(-math.pi, math.pi)

    @classmethod
    def from_point_pair(cls, p1: float, p2: float) -> "SphereInterval":
        if p1 == -math.pi:
            p1 = math.pi
        if p2 == -math.pi:
            p2 = math.pi
        if cls.positive_distance(p1, p2) <= math.pi:
            return cls(p1, p2)
        return cls(p2, p1)

    @staticmethod
    def positive_distance(a: float, b: float) -> float:
        d = b - a
        if d >= 0.0:
            return d
        return (b + math.pi) - (a - math.pi)

    def is_full(self) -> bool:
        return self.hi - self.lo == 2 * math.pi

    def is_empty(self) -> bool:
        return self.lo - self.hi == 2 * math.pi

    def is_inverted(self) -> bool:
        return self.lo > self.hi

    def is_valid(self) -> bool:
        return (
            abs(self.lo) <= math.pi
            and abs(self.hi) <= math.pi
            and not (self.lo == -math.pi and self.hi != math.pi)
            and not (self.hi == -math.pi and self.lo != math.pi)
        )

    def get_center(self) -> float:
        center = 0.5 * (self.lo + self.hi)
        if not self.is_inverted():
            return center
        if center <= 0.0:
            return center + math.pi
        return center - math.pi

    def get_length(self) -> float:
        length = self.hi - self.lo
        if length >= 0.0:
            return length
        length += 2 * math.pi
        return length if length > 0.0 else -1.0

    def fast_contains(self, p: float) -> bool:
        if self.is_inverted():
            return (p >= self.lo or p <= self.hi) and not self.is_empty()
        return self.lo <= p <= self.hi

    def contains(self, other) -> bool:
        if isinstance(other, SphereInterval):
            if self.is_inverted():
                if other.is_inverted():
                    return other.lo >= self.lo and other.hi <= self.hi
                return (other.lo >= self.lo or other.hi <= self.hi) and (
                    not self.is_empty()
                )
            if other.is_inverted():
                return self.is_full() or other.is_empty()
            return other.lo >= self.lo and other.hi <= self.hi
        p = other
        if p == -math.pi:
            p = math.pi
        return self.fast_contains(p)

    def interior_contains(self, other) -> bool:
        if isinstance(other, SphereInterval):
            if self.is_inverted():
                if not other.is_inverted():
                    return other.lo > self.lo or other.hi < self.hi
                return (other.lo > self.lo and other.hi < self.hi) or other.is_empty()
            if other.is_inverted():
                return self.is_full() or other.is_empty()
            return (other.lo > self.lo and other.hi < self.hi) or self.is_full()
        p = other
        if p == -math.pi:
            p = math.pi
        if self.is_inverted():
            return p > self.lo or p < self.hi
        return (self.lo < p < self.hi) or self.is_full()

    def intersects(self, other: "SphereInterval") -> bool:
        if self.is_empty() or other.is_empty():
            return False
        if self.is_inverted():
            return other.is_inverted() or other.lo <= self.hi or other.hi >= self.lo
        if other.is_inverted():
            return other.lo <= self.hi or other.hi >= self.lo
        return other.lo <= self.hi and other.hi >= self.lo

    def interior_intersects(self, other: "SphereInterval") -> bool:
        if self.is_empty() or other.is_empty() or self.lo == self.hi:
            return False
        if self.is_inverted():
            return (
                other.is_inverted() or other.lo < self.hi or other.hi > self.lo
            )
        if other.is_inverted():
            return other.lo < self.hi or other.hi > self.lo
        return (other.lo < self.hi and other.hi > self.lo) or self.is_full()

    def union(self, other: "SphereInterval") -> "SphereInterval":
        if other.is_empty():
            return SphereInterval(self.lo, self.hi)
        if self.fast_contains(other.lo):
            if self.fast_contains(other.hi):
                if self.contains(other):
                    return SphereInterval(self.lo, self.hi)
                return SphereInterval.full()
            return SphereInterval(self.lo, other.hi)
        if self.fast_contains(other.hi):
            return SphereInterval(other.lo, self.hi)
        if self.is_empty() or other.fast_contains(self.lo):
            return SphereInterval(other.lo, other.hi)
        dlo = SphereInterval.positive_distance(other.hi, self.lo)
        dhi = SphereInterval.positive_distance(self.hi, other.lo)
        if dlo < dhi:
            return SphereInterval(other.lo, self.hi)
        return SphereInterval(self.lo, other.hi)

    def intersection(self, other: "SphereInterval") -> "SphereInterval":
        if other.is_empty():
            return SphereInterval.empty()
        if self.fast_contains(other.lo):
            if self.fast_contains(other.hi):
                if other.get_length() < self.get_length():
                    return SphereInterval(other.lo, other.hi)
                return SphereInterval(self.lo, self.hi)
            return SphereInterval(other.lo, self.hi)
        if self.fast_contains(other.hi):
            return SphereInterval(self.lo, other.hi)
        if other.fast_contains(self.lo):
            return SphereInterval(self.lo, self.hi)
        return SphereInterval.empty()

    def expanded(self, radius: float) -> "SphereInterval":
        if radius >= 0.0:
            if self.is_empty():
                return SphereInterval(self.lo, self.hi)
            if self.get_length() + 2 * radius >= 2 * math.pi - 1e-15:
                return SphereInterval.full()
        else:
            if self.is_full():
                return SphereInterval(self.lo, self.hi)
            if self.get_length() + 2 * radius <= 1e-15:
                return SphereInterval.empty()
        lo = math.remainder(self.lo - radius, 2 * math.pi)
        hi = math.remainder(self.hi + radius, 2 * math.pi)
        if lo <= -math.pi:
            lo = math.pi
        return SphereInterval(lo, hi)

    def get_complement(self) -> "SphereInterval":
        """The complement interval (sphere.py SphereInterval.get_complement).
        A singleton's complement is Full (it has empty interior); swapping
        endpoints handles every other case (full↔empty included)."""
        if self.lo == self.hi:
            return SphereInterval.full()
        return SphereInterval(self.hi, self.lo)

    def approx_equals(self, other: "SphereInterval", max_error: float = 1e-15) -> bool:
        if self.is_empty():
            return other.get_length() <= max_error
        if other.is_empty():
            return self.get_length() <= max_error
        return (
            abs(math.remainder(other.lo - self.lo, 2 * math.pi)) <= max_error
            and abs(math.remainder(other.hi - self.hi, 2 * math.pi)) <= max_error
        )

    def add_point(self, p: float) -> "SphereInterval":
        if p == -math.pi:
            p = math.pi
        if self.fast_contains(p):
            return SphereInterval(self.lo, self.hi)
        if self.is_empty():
            return SphereInterval(p, p)
        dlo = SphereInterval.positive_distance(p, self.lo)
        dhi = SphereInterval.positive_distance(self.hi, p)
        if dlo < dhi:
            return SphereInterval(p, self.hi)
        return SphereInterval(self.lo, p)

    def get_complement_center(self) -> float:
        """Center of the complement interval; for a singleton, the
        antipodal point (sphere.py SphereInterval.get_complement_center)."""
        if self.lo != self.hi:
            return self.get_complement().get_center()
        return self.hi + math.pi if self.hi <= 0.0 else self.hi - math.pi

    def get_directed_hausdorff_distance(
        self, other: "SphereInterval"
    ) -> float:
        """Directed Hausdorff distance to ``other``: the max over points p
        in self of the distance from p to the closest point of other
        (sphere.py SphereInterval.get_directed_hausdorff_distance)."""
        if other.contains(self):
            return 0.0
        if other.is_empty():
            return math.pi
        other_complement_center = other.get_complement_center()
        if self.contains(other_complement_center):
            return SphereInterval.positive_distance(
                other.hi, other_complement_center
            )
        hi_hi = (
            SphereInterval.positive_distance(other.hi, self.hi)
            if SphereInterval(other.hi, other_complement_center).contains(
                self.hi
            )
            else 0.0
        )
        lo_lo = (
            SphereInterval.positive_distance(self.lo, other.lo)
            if SphereInterval(other_complement_center, other.lo).contains(
                self.lo
            )
            else 0.0
        )
        return max(hi_hi, lo_lo)


# ---------------------------------------------------------------------------
# Scalar CellId (pure-int mirror of cells.py; sphere.py class CellId)
# ---------------------------------------------------------------------------


class CellId:
    __slots__ = ("id",)

    def __init__(self, id_: int = 0):
        self.id = id_ & _U64

    def __eq__(self, other):
        return isinstance(other, CellId) and self.id == other.id

    def __lt__(self, other):
        return self.id < other.id

    def __le__(self, other):
        return self.id <= other.id

    def __hash__(self):
        return hash(self.id)

    def __repr__(self):
        return f"CellId({self.to_token()})"

    @classmethod
    def from_latlng(cls, ll: LatLng) -> "CellId":
        return cls.from_point(ll.to_point())

    @classmethod
    def from_point(cls, p) -> "CellId":
        face, u, v = xyz_to_face_uv(p)
        i = st_to_ij(uv_to_st(u))
        j = st_to_ij(uv_to_st(v))
        return cls.from_face_ij(face, i, j)

    @classmethod
    def from_face_ij(cls, face: int, i: int, j: int) -> "CellId":
        n = face << (POS_BITS - 1)
        bits = face & SWAP_MASK
        mask = (1 << LOOKUP_BITS) - 1
        for k in range(7, -1, -1):
            bits += ((i >> (k * LOOKUP_BITS)) & mask) << (LOOKUP_BITS + 2)
            bits += ((j >> (k * LOOKUP_BITS)) & mask) << 2
            bits = _LOOKUP_POS[bits]
            n |= (bits >> 2) << (k * 2 * LOOKUP_BITS)
            bits &= SWAP_MASK | INVERT_MASK
        return cls(n * 2 + 1)

    @classmethod
    def from_face_pos_level(cls, face: int, pos: int, level: int) -> "CellId":
        return cls((face << POS_BITS) + (pos | 1)).parent(level)

    @classmethod
    def from_token(cls, token: str) -> "CellId":
        if token in ("X", "x", ""):
            return cls(0)
        return cls(int(token, 16) << (4 * (16 - len(token))))

    def to_token(self) -> str:
        if self.id == 0:
            return "X"
        h = format(self.id, "016x")
        return h.rstrip("0") or "0"

    def to_face_ij_orientation(self):
        face = self.id >> POS_BITS
        bits = face & SWAP_MASK
        i = j = 0
        for k in range(7, -1, -1):
            nbits = (MAX_LEVEL - 7 * LOOKUP_BITS) if k == 7 else LOOKUP_BITS
            bits += (
                (self.id >> (k * 2 * LOOKUP_BITS + 1)) & ((1 << (2 * nbits)) - 1)
            ) << 2
            bits = _LOOKUP_IJ[bits]
            i += (bits >> (LOOKUP_BITS + 2)) << (k * LOOKUP_BITS)
            j += ((bits >> 2) & ((1 << LOOKUP_BITS) - 1)) << (k * LOOKUP_BITS)
            bits &= SWAP_MASK | INVERT_MASK
        if self.lsb() & 0x1111111111111110:
            bits ^= SWAP_MASK
        return face, i, j, bits

    def get_center_si_ti(self):
        face, i, j, _ = self.to_face_ij_orientation()
        if self.is_leaf():
            delta = 1
        elif (i ^ (self.id >> 2)) & 1:
            delta = 2
        else:
            delta = 0
        return face, 2 * i + delta, 2 * j + delta

    def to_point_raw(self):
        face, si, ti = self.get_center_si_ti()
        u = st_to_uv(si / (2.0 * MAX_SIZE))
        v = st_to_uv(ti / (2.0 * MAX_SIZE))
        return face_uv_to_xyz(face, u, v)

    def to_point(self):
        return normalize(self.to_point_raw())

    def to_latlng(self) -> LatLng:
        return LatLng.from_point(self.to_point_raw())

    def is_valid(self) -> bool:
        return (self.id >> POS_BITS) < 6 and bool(self.lsb() & 0x1555555555555555)

    def is_leaf(self) -> bool:
        return bool(self.id & 1)

    def is_face(self) -> bool:
        return (self.id & ((1 << 60) - 1)) == 0

    def face(self) -> int:
        return self.id >> POS_BITS

    def pos(self) -> int:
        return self.id & (_U64 >> FACE_BITS_CONST)

    def lsb(self) -> int:
        return self.id & (-self.id & _U64)

    @staticmethod
    def lsb_for_level(level: int) -> int:
        return 1 << (2 * (MAX_LEVEL - level))

    def level(self) -> int:
        if self.is_leaf():
            return MAX_LEVEL
        return MAX_LEVEL - (self.lsb().bit_length() - 1) // 2

    def parent(self, level: int | None = None) -> "CellId":
        if level is None:
            new_lsb = self.lsb() << 2
        else:
            new_lsb = CellId.lsb_for_level(level)
        return CellId((self.id & (-new_lsb & _U64)) | new_lsb)

    def child(self, pos: int) -> "CellId":
        new_lsb = self.lsb() >> 2
        return CellId(self.id + (2 * pos + 1 - 4) * new_lsb)

    def child_begin(self, level: int | None = None) -> "CellId":
        old_lsb = self.lsb()
        if level is None:
            return CellId(self.id - old_lsb + (old_lsb >> 2))
        return CellId(self.id - old_lsb + CellId.lsb_for_level(level))

    def child_end(self, level: int | None = None) -> "CellId":
        old_lsb = self.lsb()
        if level is None:
            return CellId(self.id + old_lsb + (old_lsb >> 2))
        return CellId(self.id + old_lsb + CellId.lsb_for_level(level))

    def range_min(self) -> "CellId":
        return CellId(self.id - (self.lsb() - 1))

    def range_max(self) -> "CellId":
        return CellId(self.id + (self.lsb() - 1))

    def contains(self, other: "CellId") -> bool:
        return self.range_min().id <= other.id <= self.range_max().id

    def intersects(self, other: "CellId") -> bool:
        return (
            other.range_min().id <= self.range_max().id
            and other.range_max().id >= self.range_min().id
        )

    def next(self) -> "CellId":
        return CellId(self.id + (self.lsb() << 1))

    def prev(self) -> "CellId":
        return CellId(self.id - (self.lsb() << 1))

    _WRAP_OFFSET = 6 << POS_BITS

    def next_wrap(self) -> "CellId":
        """next() wrapping face 5 → face 0 (sphere.py CellId.next_wrap)."""
        n = self.next()
        if n.id < CellId._WRAP_OFFSET:
            return n
        return CellId(n.id - CellId._WRAP_OFFSET)

    def prev_wrap(self) -> "CellId":
        p = self.prev()
        if p.id < CellId._WRAP_OFFSET:
            return p
        return CellId(p.id + CellId._WRAP_OFFSET)

    def advance(self, n: int) -> "CellId":
        step = self.lsb() << 1
        return CellId(self.id + n * step)

    def advance_wrap(self, n: int) -> "CellId":
        """advance() with modular wrap across the 6-face id space."""
        step = self.lsb() << 1
        num = CellId._WRAP_OFFSET // step
        pos = (self.id // step + n) % num
        return CellId(pos * step + (self.id % step))

    @staticmethod
    def begin(level: int) -> "CellId":
        """First cell at ``level`` in Hilbert order (sphere.py CellId.begin)."""
        return CellId.from_face_pos_level(0, 0, 0).child_begin(level)

    @staticmethod
    def end(level: int) -> "CellId":
        """One past the last cell at ``level`` (sphere.py CellId.end)."""
        return CellId.from_face_pos_level(5, 0, 0).child_end(level)

    @staticmethod
    def none() -> "CellId":
        return CellId(0)

    @staticmethod
    def sentinel() -> "CellId":
        return CellId(_U64)

    def children(self):
        out = []
        new_lsb = self.lsb() >> 2
        base = self.id - 3 * new_lsb
        for pos in range(4):
            out.append(CellId(base + 2 * pos * new_lsb))
        return out

    def get_size_ij(self, level: int | None = None) -> int:
        if level is None:
            level = self.level()
        return 1 << (MAX_LEVEL - level)

    @classmethod
    def _from_face_ij_wrap(cls, face: int, i: int, j: int) -> "CellId":
        i = max(-1, min(MAX_SIZE, i))
        j = max(-1, min(MAX_SIZE, j))
        k_scale = 1.0 / MAX_SIZE
        k_limit = math.nextafter(1.0, 2.0)
        u = max(-k_limit, min(k_limit, k_scale * (2 * i + 1 - MAX_SIZE)))
        v = max(-k_limit, min(k_limit, k_scale * (2 * j + 1 - MAX_SIZE)))
        nface, nu, nv = xyz_to_face_uv(face_uv_to_xyz(face, u, v))
        return cls.from_face_ij(nface, st_to_ij(0.5 * (nu + 1)), st_to_ij(0.5 * (nv + 1)))

    @classmethod
    def _from_face_ij_same(cls, face: int, i: int, j: int, same_face: bool) -> "CellId":
        if same_face:
            return cls.from_face_ij(face, i, j)
        return cls._from_face_ij_wrap(face, i, j)

    def get_edge_neighbors(self):
        level = self.level()
        size = self.get_size_ij(level)
        face, i, j, _ = self.to_face_ij_orientation()
        return [
            CellId._from_face_ij_same(face, i, j - size, j - size >= 0).parent(level),
            CellId._from_face_ij_same(face, i + size, j, i + size < MAX_SIZE).parent(level),
            CellId._from_face_ij_same(face, i, j + size, j + size < MAX_SIZE).parent(level),
            CellId._from_face_ij_same(face, i - size, j, i - size >= 0).parent(level),
        ]

    def get_vertex_neighbors(self, level: int):
        """Neighbors sharing the vertex closest to this cell's center, at a
        coarser ``level`` (sphere.py get_vertex_neighbors)."""
        face, i, j, _ = self.to_face_ij_orientation()
        halfsize = self.get_size_ij(level + 1)
        size = halfsize << 1
        if i & halfsize:
            ioffset, isame = size, (i + size) < MAX_SIZE
        else:
            ioffset, isame = -size, (i - size) >= 0
        if j & halfsize:
            joffset, jsame = size, (j + size) < MAX_SIZE
        else:
            joffset, jsame = -size, (j - size) >= 0
        out = [
            self.parent(level),
            CellId._from_face_ij_same(face, i + ioffset, j, isame).parent(level),
            CellId._from_face_ij_same(face, i, j + joffset, jsame).parent(level),
        ]
        if isame or jsame:
            out.append(
                CellId._from_face_ij_same(
                    face, i + ioffset, j + joffset, isame and jsame
                ).parent(level)
            )
        return out

    def get_all_neighbors(self, nbr_level: int):
        """All neighbors at ``nbr_level`` ≥ own level
        (sphere.py get_all_neighbors); may contain duplicates."""
        face, i, j, _ = self.to_face_ij_orientation()
        size = self.get_size_ij()
        i &= -size
        j &= -size
        nbr_size = self.get_size_ij(nbr_level)
        out = []
        k = -nbr_size
        while True:
            if k < 0:
                same_face = j + k >= 0
            elif k >= size:
                same_face = j + k < MAX_SIZE
            else:
                same_face = True
                out.append(
                    CellId._from_face_ij_same(
                        face, i + k, j - nbr_size, j - size >= 0
                    ).parent(nbr_level)
                )
                out.append(
                    CellId._from_face_ij_same(
                        face, i + k, j + size, j + size < MAX_SIZE
                    ).parent(nbr_level)
                )
            out.append(
                CellId._from_face_ij_same(
                    face, i - nbr_size, j + k, same_face and i - size >= 0
                ).parent(nbr_level)
            )
            out.append(
                CellId._from_face_ij_same(
                    face, i + size, j + k, same_face and i + size < MAX_SIZE
                ).parent(nbr_level)
            )
            if k >= size:
                break
            k += nbr_size
        return out


FACE_BITS_CONST = ck.FACE_BITS


# ---------------------------------------------------------------------------
# Metric family (sphere.py class Metric / module constants, SURVEY §2.1 H)
# Quadratic-projection derivative values, copied verbatim for parity.
# ---------------------------------------------------------------------------


class Metric:
    __slots__ = ("deriv", "dim")

    def __init__(self, deriv: float, dim: int):
        self.deriv = deriv
        self.dim = dim

    def get_value(self, level: int) -> float:
        return self.deriv * 2.0 ** (-self.dim * level)

    def get_closest_level(self, value: float) -> int:
        return self.get_min_level((math.sqrt(2.0) if self.dim == 1 else 2.0) * value)

    def get_min_level(self, value: float) -> int:
        """Minimum level such that the metric is at most ``value``."""
        if value <= 0.0:
            return MAX_LEVEL
        m, x = math.frexp(value / self.deriv)
        level = max(0, min(MAX_LEVEL, -((x - 1) >> (self.dim - 1))))
        return level

    def get_max_level(self, value: float) -> int:
        """Maximum level such that the metric is at least ``value``."""
        if value <= 0.0:
            return MAX_LEVEL
        m, x = math.frexp(self.deriv / value)
        level = max(0, min(MAX_LEVEL, (x - 1) >> (self.dim - 1)))
        return level


AVG_ANGLE_SPAN = Metric(math.pi / 2, 1)
MIN_ANGLE_SPAN = Metric(4.0 / 3, 1)
MAX_ANGLE_SPAN = Metric(1.704897179199218452, 1)
AVG_WIDTH = Metric(1.434523672886099389, 1)
MIN_WIDTH = Metric(2 * math.sqrt(2) / 3, 1)
MAX_WIDTH = Metric(MAX_ANGLE_SPAN.deriv, 1)
AVG_EDGE = Metric(1.459213746386106062, 1)
MIN_EDGE = Metric(2 * math.sqrt(2) / 3, 1)
MAX_EDGE = Metric(MAX_ANGLE_SPAN.deriv, 1)
AVG_DIAG = Metric(2.060422738998471683, 1)
MIN_DIAG = Metric(8 * math.sqrt(2) / 9, 1)
MAX_DIAG = Metric(2.438654594434021032, 1)
AVG_AREA = Metric(4 * math.pi / 6, 2)
MIN_AREA = Metric(8 * math.sqrt(2) / 9, 2)
MAX_AREA = Metric(2.635799256963161491, 2)
# Aspect-ratio bounds of the quadratic projection (sphere.py module
# constants MAX_EDGE_ASPECT / MAX_DIAG_ASPECT, SURVEY §2.1 H2).
MAX_EDGE_ASPECT = 1.442615274452682920
MAX_DIAG_ASPECT = math.sqrt(3)


# ---------------------------------------------------------------------------
# Cell (sphere.py class Cell, SURVEY §2.1 F)
# ---------------------------------------------------------------------------

_POLE_MIN_LAT = math.asin(math.sqrt(1.0 / 3.0))
_MAX_CELL_BOUND_ERROR = 1.0 / (1 << 51)


class Cell:
    __slots__ = ("cell_id", "face", "level", "orientation", "uv", "_ij_lo", "_verts")

    def __init__(self, cell_id: CellId):
        self.cell_id = cell_id
        face, i, j, orientation = cell_id.to_face_ij_orientation()
        self.face = face
        self.orientation = orientation
        self.level = cell_id.level()
        size = cell_id.get_size_ij(self.level)
        i_lo = i & -size
        j_lo = j & -size
        self._ij_lo = (i_lo, j_lo)
        self._verts = None
        self.uv = (
            (st_to_uv(i_lo / MAX_SIZE), st_to_uv((i_lo + size) / MAX_SIZE)),
            (st_to_uv(j_lo / MAX_SIZE), st_to_uv((j_lo + size) / MAX_SIZE)),
        )

    @classmethod
    def _from_parts(cls, cell_id, face, level, orientation, i_lo, j_lo):
        """Child construction without re-decoding the Hilbert id (the hot
        path of RegionCoverer expansion)."""
        self = cls.__new__(cls)
        self.cell_id = cell_id
        self.face = face
        self.level = level
        self.orientation = orientation
        self._ij_lo = (i_lo, j_lo)
        self._verts = None
        size = 1 << (MAX_LEVEL - level)
        self.uv = (
            (st_to_uv(i_lo / MAX_SIZE), st_to_uv((i_lo + size) / MAX_SIZE)),
            (st_to_uv(j_lo / MAX_SIZE), st_to_uv((j_lo + size) / MAX_SIZE)),
        )
        return self

    @classmethod
    def from_latlng(cls, ll: LatLng) -> "Cell":
        return cls(CellId.from_latlng(ll))

    def id(self) -> CellId:
        return self.cell_id

    def is_leaf(self) -> bool:
        return self.level == MAX_LEVEL

    def get_vertex_raw(self, k: int):
        # Vertices in CCW order: (lo,lo), (hi,lo), (hi,hi), (lo,hi).
        u = self.uv[0][(k >> 1) ^ (k & 1)]
        v = self.uv[1][k >> 1]
        return face_uv_to_xyz(self.face, u, v)

    def get_vertex(self, k: int):
        return self.vertices()[k]

    def vertices(self):
        """All 4 normalized vertices, computed once per Cell (the coverer
        evaluates several region predicates against the same cell)."""
        if self._verts is None:
            (u0, u1), (v0, v1) = self.uv
            face = self.face
            out = []
            for u, v in ((u0, v0), (u1, v0), (u1, v1), (u0, v1)):
                x, y, z = face_uv_to_xyz(face, u, v)
                n = math.sqrt(x * x + y * y + z * z)
                out.append((x / n, y / n, z / n))
            self._verts = tuple(out)
        return self._verts

    def get_edge_raw(self, k: int):
        """Inward-facing normal of edge k (sphere.py Cell.get_edge_raw)."""
        if k == 0:
            return get_v_norm(self.face, self.uv[1][0])
        if k == 1:
            return get_u_norm(self.face, self.uv[0][1])
        if k == 2:
            return neg(get_v_norm(self.face, self.uv[1][1]))
        return neg(get_u_norm(self.face, self.uv[0][0]))

    def get_edge(self, k: int):
        return normalize(self.get_edge_raw(k))

    def get_center_raw(self):
        return self.cell_id.to_point_raw()

    def get_center(self):
        return normalize(self.get_center_raw())

    def subdivide(self):
        """4 children in traversal order; each child's ij quadrant follows
        the Hilbert sub-cell tables (POS_TO_IJ / POS_TO_ORIENTATION), so no
        per-child id decode is needed."""
        half = 1 << (MAX_LEVEL - self.level - 1)
        i_lo, j_lo = self._ij_lo
        r = ck.POS_TO_IJ[self.orientation]
        out = []
        for pos, child_id in enumerate(self.cell_id.children()):
            ij = r[pos]
            out.append(
                Cell._from_parts(
                    child_id,
                    self.face,
                    self.level + 1,
                    self.orientation ^ ck.POS_TO_ORIENTATION[pos],
                    i_lo + (ij >> 1) * half,
                    j_lo + (ij & 1) * half,
                )
            )
        return out

    def exact_area(self) -> float:
        v0, v1, v2, v3 = (self.get_vertex(k) for k in range(4))
        return triangle_area(v0, v1, v2) + triangle_area(v0, v2, v3)

    def average_area(self) -> float:
        return AVG_AREA.get_value(self.level)

    def approx_area(self) -> float:
        if self.level < 2:
            return self.average_area()
        flat_area = 0.5 * norm(
            cross(
                sub(self.get_vertex(2), self.get_vertex(0)),
                sub(self.get_vertex(3), self.get_vertex(1)),
            )
        )
        return flat_area * 2 / (1 + math.sqrt(1 - min(1 / math.pi, flat_area / math.pi)))

    def contains_point(self, p) -> bool:
        uv = face_xyz_to_uv(self.face, p)
        if uv is None:
            return False
        u, v = uv
        return (
            self.uv[0][0] <= u <= self.uv[0][1]
            and self.uv[1][0] <= v <= self.uv[1][1]
        )

    def contains(self, other: "Cell") -> bool:
        return self.cell_id.contains(other.cell_id)

    def may_intersect(self, other: "Cell") -> bool:
        return self.cell_id.intersects(other.cell_id)

    def _latitude(self, i: int, j: int) -> float:
        p = face_uv_to_xyz(self.face, self.uv[0][i], self.uv[1][j])
        return math.atan2(p[2], math.sqrt(p[0] * p[0] + p[1] * p[1]))

    def _longitude(self, i: int, j: int) -> float:
        p = face_uv_to_xyz(self.face, self.uv[0][i], self.uv[1][j])
        return math.atan2(p[1], p[0])

    def get_cap_bound(self) -> "Cap":
        # Cap centered at the (u,v) center, covering all 4 vertices.
        u = 0.5 * (self.uv[0][0] + self.uv[0][1])
        v = 0.5 * (self.uv[1][0] + self.uv[1][1])
        cap = Cap.from_axis_height(normalize(face_uv_to_xyz(self.face, u, v)), 0.0)
        for k in range(4):
            cap = cap.add_point(self.get_vertex(k))
        return cap

    def get_rect_bound(self) -> "LatLngRect":
        if self.level > 0:
            u = self.uv[0][0] + self.uv[0][1]
            v = self.uv[1][0] + self.uv[1][1]
            # Pick the vertex where the lat/lng extremes are attained.
            i = (u < 0) if get_u_axis(self.face)[2] == 0.0 else (u > 0)
            j = (v < 0) if get_v_axis(self.face)[2] == 0.0 else (v > 0)
            i, j = int(i), int(j)
            lat = LineInterval.from_point_pair(
                self._latitude(i, j), self._latitude(1 - i, 1 - j)
            )
            lat = lat.expanded(_MAX_CELL_BOUND_ERROR).intersection(
                LineInterval(-math.pi / 2, math.pi / 2)
            )
            if lat.lo == -math.pi / 2 or lat.hi == math.pi / 2:
                return LatLngRect(lat, SphereInterval.full())
            lng = SphereInterval.from_point_pair(
                self._longitude(i, 1 - j), self._longitude(1 - i, j)
            )
            return LatLngRect(lat, lng.expanded(_MAX_CELL_BOUND_ERROR))
        # Face cells: hard-coded bounds.
        pi4 = math.pi / 4
        if self.face == 0:
            return LatLngRect(
                LineInterval(-pi4, pi4), SphereInterval(-pi4, pi4)
            )
        if self.face == 1:
            return LatLngRect(
                LineInterval(-pi4, pi4), SphereInterval(pi4, 3 * pi4)
            )
        if self.face == 2:
            return LatLngRect(
                LineInterval(_POLE_MIN_LAT, math.pi / 2), SphereInterval.full()
            )
        if self.face == 3:
            return LatLngRect(
                LineInterval(-pi4, pi4), SphereInterval(3 * pi4, -3 * pi4)
            )
        if self.face == 4:
            return LatLngRect(
                LineInterval(-pi4, pi4), SphereInterval(-3 * pi4, -pi4)
            )
        return LatLngRect(
            LineInterval(-math.pi / 2, -_POLE_MIN_LAT), SphereInterval.full()
        )


def get_u_axis(face: int):
    if face == 0:
        return (0.0, 1.0, 0.0)
    if face == 1:
        return (-1.0, 0.0, 0.0)
    if face == 2:
        return (-1.0, 0.0, 0.0)
    if face == 3:
        return (0.0, 0.0, -1.0)
    if face == 4:
        return (0.0, 0.0, -1.0)
    return (0.0, 1.0, 0.0)


def get_v_axis(face: int):
    if face == 0:
        return (0.0, 0.0, 1.0)
    if face == 1:
        return (0.0, 0.0, 1.0)
    if face == 2:
        return (0.0, -1.0, 0.0)
    if face == 3:
        return (0.0, -1.0, 0.0)
    if face == 4:
        return (1.0, 0.0, 0.0)
    return (1.0, 0.0, 0.0)


def get_norm(face: int):
    """Outward unit normal of ``face`` (sphere.py def get_norm) — the
    third axis of the face frame, u_axis × v_axis."""
    return cross(get_u_axis(face), get_v_axis(face))


def get_u_norm(face: int, u: float):
    """Outward normal of the constant-u edge (sphere.py def get_u_norm)."""
    if face == 0:
        return (u, -1.0, 0.0)
    if face == 1:
        return (1.0, u, 0.0)
    if face == 2:
        return (1.0, 0.0, u)
    if face == 3:
        return (-u, 0.0, 1.0)
    if face == 4:
        return (0.0, -u, 1.0)
    return (0.0, -1.0, -u)


def get_v_norm(face: int, v: float):
    if face == 0:
        return (-v, 0.0, 1.0)
    if face == 1:
        return (0.0, -v, 1.0)
    if face == 2:
        return (0.0, -1.0, -v)
    if face == 3:
        return (v, -1.0, 0.0)
    if face == 4:
        return (1.0, v, 0.0)
    return (1.0, 0.0, v)


# ---------------------------------------------------------------------------
# Regions: Cap, LatLngRect, convex Polygon (sphere.py classes Cap/LatLngRect;
# polygon is an engine composite per SURVEY §1.1)
# ---------------------------------------------------------------------------


class Cap:
    """Spherical disc: unit axis + height h = 1 − cos(angle)
    (sphere.py class Cap)."""

    __slots__ = ("axis", "height")

    def __init__(self, axis, height: float):
        self.axis = axis
        self.height = height

    @classmethod
    def from_axis_angle(cls, axis, angle_rad: float) -> "Cap":
        s = math.sin(0.5 * min(angle_rad, math.pi))
        return cls(axis, 2.0 * s * s)

    @classmethod
    def from_axis_height(cls, axis, height: float) -> "Cap":
        return cls(axis, height)

    @classmethod
    def from_axis_area(cls, axis, area: float) -> "Cap":
        """Cap of given solid-angle area: h = area / 2π (sphere.py
        Cap.from_axis_area)."""
        return cls(axis, area / (2.0 * math.pi))

    def area(self) -> float:
        return 2.0 * math.pi * max(0.0, self.height)

    @classmethod
    def empty(cls) -> "Cap":
        return cls((1.0, 0.0, 0.0), -1.0)

    @classmethod
    def full(cls) -> "Cap":
        return cls((1.0, 0.0, 0.0), 2.0)

    def angle(self) -> float:
        if self.is_empty():
            return -1.0
        return 2.0 * math.asin(math.sqrt(0.5 * self.height))

    def is_empty(self) -> bool:
        return self.height < 0.0

    def is_full(self) -> bool:
        return self.height >= 2.0

    def complement(self) -> "Cap":
        h = -1.0 if self.is_full() else 2.0 - max(self.height, 0.0)
        return Cap(neg(self.axis), h)

    def contains_point(self, p) -> bool:
        # Inlined chord test — the hottest predicate in the coverer loop.
        a = self.axis
        d0 = a[0] - p[0]
        d1 = a[1] - p[1]
        d2 = a[2] - p[2]
        return d0 * d0 + d1 * d1 + d2 * d2 <= 2.0 * self.height

    def interior_contains_point(self, p) -> bool:
        d = sub(self.axis, p)
        return self.is_full() or dot(d, d) < 2.0 * self.height

    interior_contains = interior_contains_point

    def add_point(self, p) -> "Cap":
        if self.is_empty():
            return Cap(p, 0.0)
        d = sub(self.axis, p)
        return Cap(self.axis, max(self.height, 0.5 * dot(d, d)))

    def expanded(self, distance_rad: float) -> "Cap":
        if self.is_empty():
            return Cap.empty()
        return Cap.from_axis_angle(self.axis, self.angle() + distance_rad)

    # --- Region interface (SURVEY §2.1 D2) ---

    def get_cap_bound(self) -> "Cap":
        return self

    def get_rect_bound(self) -> "LatLngRect":
        if self.is_empty():
            return LatLngRect.empty()
        axis_ll = LatLng.from_point(self.axis)
        cap_angle = self.angle()
        all_longitudes = False
        lat_lo = axis_ll.lat - cap_angle
        lat_hi = axis_ll.lat + cap_angle
        if lat_lo <= -math.pi / 2:
            lat_lo = -math.pi / 2
            all_longitudes = True
        if lat_hi >= math.pi / 2:
            lat_hi = math.pi / 2
            all_longitudes = True
        if not all_longitudes:
            sin_a = math.sin(cap_angle)
            sin_c = math.cos(axis_ll.lat)
            if sin_a <= sin_c:
                angle_a = math.asin(sin_a / sin_c)
                lng_lo = math.remainder(axis_ll.lng - angle_a, 2 * math.pi)
                lng_hi = math.remainder(axis_ll.lng + angle_a, 2 * math.pi)
                return LatLngRect(
                    LineInterval(lat_lo, lat_hi), SphereInterval(lng_lo, lng_hi)
                )
        return LatLngRect(LineInterval(lat_lo, lat_hi), SphereInterval.full())

    def _intersects(self, cell: Cell, vertices) -> bool:
        """True if the cap intersects any point of the cell excluding
        its vertices (which are assumed already checked)."""
        if self.height >= 1.0:
            return False
        if self.is_empty():
            return False
        if cell.contains_point(self.axis):
            return True
        sin2_angle = self.height * (2.0 - self.height)
        for k in range(4):
            edge = cell.get_edge_raw(k)
            d = dot(self.axis, edge)
            if d > 0.0:
                continue
            if d * d > sin2_angle * dot(edge, edge):
                return False
            direction = cross(edge, self.axis)
            if dot(direction, vertices[k]) < 0.0 and dot(
                direction, vertices[(k + 1) & 3]
            ) > 0.0:
                return True
        return False

    def contains_cell(self, cell: Cell) -> bool:
        vertices = cell.vertices()
        for v in vertices:
            if not self.contains_point(v):
                return False
        return not self.complement()._intersects(cell, vertices)

    def may_intersect_cell(self, cell: Cell) -> bool:
        vertices = cell.vertices()
        for v in vertices:
            if self.contains_point(v):
                return True
        return self._intersects(cell, vertices)


class LatLngRect:
    """Lat/lng-aligned rectangle region (sphere.py class LatLngRect)."""

    __slots__ = ("lat", "lng")

    def __init__(self, lat: LineInterval, lng: SphereInterval):
        self.lat = lat
        self.lng = lng

    @classmethod
    def empty(cls) -> "LatLngRect":
        return cls(LineInterval.empty(), SphereInterval.empty())

    @classmethod
    def full(cls) -> "LatLngRect":
        return cls(
            LineInterval(-math.pi / 2, math.pi / 2), SphereInterval.full()
        )

    @classmethod
    def from_degrees(
        cls, lat_lo: float, lng_lo: float, lat_hi: float, lng_hi: float
    ) -> "LatLngRect":
        return cls(
            LineInterval(math.radians(lat_lo), math.radians(lat_hi)),
            SphereInterval(math.radians(lng_lo), math.radians(lng_hi)),
        )

    @classmethod
    def from_point(cls, ll: LatLng) -> "LatLngRect":
        """Degenerate rect containing a single point (sphere.py
        LatLngRect.from_point)."""
        return cls(
            LineInterval(ll.lat, ll.lat), SphereInterval(ll.lng, ll.lng)
        )

    @classmethod
    def from_point_pair(cls, a: LatLng, b: LatLng) -> "LatLngRect":
        """Minimal rect containing both points; the lng interval takes the
        shorter way around (sphere.py LatLngRect.from_point_pair)."""
        return cls(
            LineInterval.from_point_pair(a.lat, b.lat),
            SphereInterval.from_point_pair(a.lng, b.lng),
        )

    @classmethod
    def from_center_size(cls, center: LatLng, size: LatLng) -> "LatLngRect":
        """Rect of the given angular ``size`` centered on ``center``, lat
        clamped to the poles (sphere.py LatLngRect.from_center_size):
        from_point(center) expanded by half the size."""
        return cls.from_point(center).expanded(
            LatLng(0.5 * size.lat, 0.5 * size.lng)
        )

    @classmethod
    def from_lat_lng(cls, lo: LatLng, hi: LatLng) -> "LatLngRect":
        """Rect from low/high corners (sphere.py LatLngRect(lo, hi))."""
        return cls(
            LineInterval(lo.lat, hi.lat), SphereInterval(lo.lng, hi.lng)
        )

    def is_empty(self) -> bool:
        return self.lat.is_empty()

    # --- corner accessors (sphere.py LatLngRect lat_lo/…/lo/hi) ---

    def lat_lo(self) -> float:
        return self.lat.lo

    def lat_hi(self) -> float:
        return self.lat.hi

    def lng_lo(self) -> float:
        return self.lng.lo

    def lng_hi(self) -> float:
        return self.lng.hi

    def lo(self) -> LatLng:
        return LatLng(self.lat.lo, self.lng.lo)

    def hi(self) -> LatLng:
        return LatLng(self.lat.hi, self.lng.hi)

    def get_center(self) -> LatLng:
        return LatLng(self.lat.get_center(), self.lng.get_center())

    def get_size(self) -> LatLng:
        """Width/height as a LatLng (sphere.py LatLngRect.get_size)."""
        return LatLng(self.lat.get_length(), self.lng.get_length())

    def area(self) -> float:
        """Surface area on the unit sphere (sphere.py LatLngRect.area):
        lng-width × (sin(lat_hi) − sin(lat_lo))."""
        if self.is_empty():
            return 0.0
        return self.lng.get_length() * (
            math.sin(self.lat.hi) - math.sin(self.lat.lo)
        )

    def get_vertex(self, k: int) -> LatLng:
        # CCW order: (lo,lo), (lo,hi), (hi,hi), (hi,lo).
        return LatLng(
            self.lat.lo if k < 2 else self.lat.hi,
            self.lng.hi if 1 <= k <= 2 else self.lng.lo,
        )

    def contains_latlng(self, ll: LatLng) -> bool:
        return self.lat.contains(ll.lat) and self.lng.contains(ll.lng)

    def contains_point(self, p) -> bool:
        return self.contains_latlng(LatLng.from_point(p))

    def contains_rect(self, other: "LatLngRect") -> bool:
        return self.lat.contains(other.lat) and self.lng.contains(other.lng)

    def interior_contains_latlng(self, ll: LatLng) -> bool:
        return self.lat.interior_contains(ll.lat) and self.lng.interior_contains(
            ll.lng
        )

    def interior_contains_rect(self, other: "LatLngRect") -> bool:
        return self.lat.interior_contains(other.lat) and self.lng.interior_contains(
            other.lng
        )

    def interior_intersects(self, other: "LatLngRect") -> bool:
        return self.lat.interior_intersects(
            other.lat
        ) and self.lng.interior_intersects(other.lng)

    def intersects_rect(self, other: "LatLngRect") -> bool:
        return self.lat.intersects(other.lat) and self.lng.intersects(other.lng)

    def union(self, other: "LatLngRect") -> "LatLngRect":
        return LatLngRect(self.lat.union(other.lat), self.lng.union(other.lng))

    def intersection(self, other: "LatLngRect") -> "LatLngRect":
        lat = self.lat.intersection(other.lat)
        lng = self.lng.intersection(other.lng)
        if lat.is_empty() or lng.is_empty():
            return LatLngRect.empty()
        return LatLngRect(lat, lng)

    def expanded(self, margin: LatLng) -> "LatLngRect":
        lat = self.lat.expanded(margin.lat).intersection(
            LineInterval(-math.pi / 2, math.pi / 2)
        )
        lng = self.lng.expanded(margin.lng)
        return LatLngRect(lat, lng)

    def convolve_with_cap(self, angle_rad: float) -> "LatLngRect":
        """Minkowski sum with a cap of radius ``angle_rad``: union of the
        rect with cap bounds centered on each vertex (sphere.py
        LatLngRect.convolve_with_cap)."""
        r = LatLngRect(self.lat, self.lng)
        for k in range(4):
            vertex_cap = Cap.from_axis_angle(
                self.get_vertex(k).to_point(), angle_rad
            )
            r = r.union(vertex_cap.get_rect_bound())
        return r

    # --- Region interface (SURVEY §2.1 D4) ---

    def get_cap_bound(self) -> Cap:
        if self.is_empty():
            return Cap.empty()
        if self.lat.lo + self.lat.hi < 0.0:
            pole_z, pole_angle = -1.0, math.pi / 2 + self.lat.hi
        else:
            pole_z, pole_angle = 1.0, math.pi / 2 - self.lat.lo
        pole_cap = Cap.from_axis_angle((0.0, 0.0, pole_z), pole_angle)
        lng_span = self.lng.hi - self.lng.lo
        if math.remainder(lng_span, 2 * math.pi) >= 0.0 and lng_span < 2 * math.pi:
            mid_cap = Cap.from_axis_angle(self.get_center().to_point(), 0.0)
            for k in range(4):
                mid_cap = mid_cap.add_point(self.get_vertex(k).to_point())
            if mid_cap.height < pole_cap.height:
                return mid_cap
        return pole_cap

    def get_rect_bound(self) -> "LatLngRect":
        return self

    def contains_cell(self, cell: Cell) -> bool:
        return self.contains_rect(cell.get_rect_bound())

    def may_intersect_cell(self, cell: Cell) -> bool:
        """Exact rect/cell intersection test (sphere.py
        LatLngRect.intersects(cell))."""
        if self.is_empty():
            return False
        if self.contains_point(cell.get_center_raw()):
            return True
        if cell.contains_point(self.get_center().to_point()):
            return True
        if not self.intersects_rect(cell.get_rect_bound()):
            return False
        cell_v = cell.vertices()
        cell_ll = [LatLng.from_point(v) for v in cell_v]
        for k in range(4):
            edge_lng = SphereInterval.from_point_pair(
                cell_ll[k].lng, cell_ll[(k + 1) & 3].lng
            )
            if not self.lng.intersects(edge_lng):
                continue
            a = cell_v[k]
            b = cell_v[(k + 1) & 3]
            if edge_lng.contains(self.lng.lo) and _intersects_lng_edge(
                a, b, self.lat, self.lng.lo
            ):
                return True
            if edge_lng.contains(self.lng.hi) and _intersects_lng_edge(
                a, b, self.lat, self.lng.hi
            ):
                return True
            if _intersects_lat_edge(a, b, self.lat.lo, self.lng):
                return True
            if _intersects_lat_edge(a, b, self.lat.hi, self.lng):
                return True
        return False


def _intersects_lng_edge(a, b, lat: LineInterval, lng: float) -> bool:
    return simple_crossing(
        a, b, LatLng(lat.lo, lng).to_point(), LatLng(lat.hi, lng).to_point()
    )


def _intersects_lat_edge(a, b, lat: float, lng: SphereInterval) -> bool:
    """Does great-circle edge AB intersect the constant-latitude edge
    (lat, lng-interval)? (sphere.py LatLngRect.intersects_lat_edge)."""
    z = normalize(robust_cross_prod(a, b))
    if z[2] < 0.0:
        z = neg(z)
    y = normalize(robust_cross_prod(z, (0.0, 0.0, 1.0)))
    x = cross(y, z)
    sin_lat = math.sin(lat)
    if abs(sin_lat) >= x[2]:
        return False
    cos_theta = sin_lat / x[2]
    sin_theta = math.sqrt(1.0 - cos_theta * cos_theta)
    theta = math.atan2(sin_theta, cos_theta)
    ab_theta = SphereInterval.from_point_pair(
        math.atan2(dot(a, y), dot(a, x)), math.atan2(dot(b, y), dot(b, x))
    )
    if ab_theta.contains(theta):
        isect = add(scale(x, cos_theta), scale(y, sin_theta))
        if lng.contains(math.atan2(isect[1], isect[0])):
            return True
    if ab_theta.contains(-theta):
        isect = sub(scale(x, cos_theta), scale(y, sin_theta))
        if lng.contains(math.atan2(isect[1], isect[0])):
            return True
    return False


class ConvexPolygon:
    """Engine-defined convex spherical polygon region (SURVEY §1.1: s2sphere
    has no polygon type; this composite builds on the reference's CCW / edge
    predicates A7–A10). Vertices must be in CCW order; containment is
    'strictly left of every directed edge'."""

    __slots__ = ("vertices", "_cap", "_rect")

    def __init__(self, latlng_deg_pairs):
        self.vertices = [
            LatLng.from_degrees(lat, lng).to_point() for lat, lng in latlng_deg_pairs
        ]
        self._cap = None
        self._rect = None

    def contains_point(self, p) -> bool:
        vs = self.vertices
        n = len(vs)
        for k in range(n):
            if dot(cross(vs[k], vs[(k + 1) % n]), p) < 0.0:
                return False
        return True

    def get_cap_bound(self) -> Cap:
        if self._cap is None:
            centroid = (0.0, 0.0, 0.0)
            for v in self.vertices:
                centroid = add(centroid, v)
            axis = normalize(centroid)
            cap = Cap.from_axis_height(axis, 0.0)
            for v in self.vertices:
                cap = cap.add_point(v)
            self._cap = cap
        return self._cap

    def get_rect_bound(self) -> LatLngRect:
        if self._rect is None:
            # Conservative: rect bound of the cap bound.
            self._rect = self.get_cap_bound().get_rect_bound()
        return self._rect

    def contains_cell(self, cell: Cell) -> bool:
        # All 4 vertices inside AND no polygon edge crosses a cell edge.
        cell_v = cell.vertices()
        for v in cell_v:
            if not self.contains_point(v):
                return False
        vs = self.vertices
        n = len(vs)
        for k in range(n):
            a, b = vs[k], vs[(k + 1) % n]
            for m in range(4):
                if simple_crossing(a, b, cell_v[m], cell_v[(m + 1) & 3]):
                    return False
        return True

    def may_intersect_cell(self, cell: Cell) -> bool:
        cell_v = cell.vertices()
        for v in cell_v:
            if self.contains_point(v):
                return True
        for v in self.vertices:
            if cell.contains_point(v):
                return True
        vs = self.vertices
        n = len(vs)
        for k in range(n):
            a, b = vs[k], vs[(k + 1) % n]
            for m in range(4):
                if simple_crossing(a, b, cell_v[m], cell_v[(m + 1) & 3]):
                    return True
        return False


class Loop:
    """Engine-defined GENERAL (possibly concave) spherical polygon region.

    Upstream s2sphere has no S2Loop (SURVEY §1.1 `[v]`); this composite
    builds crossing-parity containment from the reference's predicates
    A7–A10 (`sphere.py def simple_crossing` / `def origin` anchors).

    ``contains_point(p)`` = odd number of strict great-circle crossings
    (A9 ``simple_crossing``) between the geodesic ref→p and the loop
    edges, where ``ref`` is a point known to lie OUTSIDE the loop. The
    default ref is the antipode of the normalized vertex centroid —
    valid for any loop contained in an open hemisphere, which the
    engine's region tables guarantee (regions.make_loop_regions caps the
    vertex radius). Boundary points are engine-defined (strict-crossing
    parity), deterministic, and bit-identical to the vectorized
    ``stages.join.refine_mask`` kind="loop" kernel and the DuckDB oracle
    expression (same IEEE op order).
    """

    __slots__ = ("vertices", "ref", "_cap", "_rect")

    def __init__(self, latlng_deg_pairs, ref=None):
        self.vertices = [
            LatLng.from_degrees(lat, lng).to_point() for lat, lng in latlng_deg_pairs
        ]
        if ref is None:
            c = (0.0, 0.0, 0.0)
            for v in self.vertices:
                c = add(c, v)
            ref = neg(normalize(c))
        self.ref = ref
        self._cap = None
        self._rect = None

    def contains_point(self, p) -> bool:
        vs, r = self.vertices, self.ref
        n = len(vs)
        # Mirrors simple_crossing(a, b, r, p) term-for-term so the
        # vectorized refine_mask produces identical float comparisons.
        cd = cross(r, p)
        inside = False
        for k in range(n):
            a, b = vs[k], vs[(k + 1) % n]
            ab = cross(a, b)
            acb = -dot(ab, r)
            bda = dot(ab, p)
            cbd = -dot(cd, b)
            dac = dot(cd, a)
            if acb * bda > 0.0 and acb * cbd > 0.0 and cbd * dac > 0.0:
                inside = not inside
        return inside

    def get_cap_bound(self) -> Cap:
        # Cap of all vertices contains every geodesic edge (caps are
        # convex) and hence the loop interior for hemisphere-bounded
        # loops.
        if self._cap is None:
            centroid = (0.0, 0.0, 0.0)
            for v in self.vertices:
                centroid = add(centroid, v)
            cap = Cap.from_axis_height(normalize(centroid), 0.0)
            for v in self.vertices:
                cap = cap.add_point(v)
            self._cap = cap
        return self._cap

    def get_rect_bound(self) -> LatLngRect:
        if self._rect is None:
            self._rect = self.get_cap_bound().get_rect_bound()
        return self._rect

    def contains_cell(self, cell: Cell) -> bool:
        # All 4 vertices inside AND no loop edge crosses a cell edge ⇒
        # the (simply-connected) cell lies inside the loop: its boundary
        # is inside and the loop's boundary never enters it.
        cell_v = cell.vertices()
        for v in cell_v:
            if not self.contains_point(v):
                return False
        vs = self.vertices
        n = len(vs)
        for k in range(n):
            a, b = vs[k], vs[(k + 1) % n]
            for m in range(4):
                if simple_crossing(a, b, cell_v[m], cell_v[(m + 1) & 3]):
                    return False
        return True

    def may_intersect_cell(self, cell: Cell) -> bool:
        cell_v = cell.vertices()
        for v in cell_v:
            if self.contains_point(v):
                return True
        for v in self.vertices:
            if cell.contains_point(v):
                return True
        vs = self.vertices
        n = len(vs)
        for k in range(n):
            a, b = vs[k], vs[(k + 1) % n]
            for m in range(4):
                if simple_crossing(a, b, cell_v[m], cell_v[(m + 1) & 3]):
                    return True
        return False


# ---------------------------------------------------------------------------
# CellUnion (sphere.py class CellUnion, SURVEY §2.1 G)
# ---------------------------------------------------------------------------


class CellUnion:
    """Normalized sorted list of CellIds representing a region."""

    __slots__ = ("cell_ids",)

    def __init__(self, cell_ids=None, raw: bool = False):
        ids = [c if isinstance(c, CellId) else CellId(int(c)) for c in (cell_ids or [])]
        if not raw:
            ids = CellUnion._normalized(ids)
        self.cell_ids = ids

    @staticmethod
    def _normalized(ids):
        """Sort; drop contained ids; merge any complete 4-sibling group
        (sphere.py CellUnion.normalize)."""
        ids = sorted(ids, key=lambda c: c.id)
        output: list[CellId] = []
        for cid in ids:
            if output and output[-1].contains(cid):
                continue
            while output and cid.contains(output[-1]):
                output.pop()
            while len(output) >= 3 and not cid.is_face():
                # The 4 cells must share the bits above the child-position pair.
                mask = cid.lsb() << 1
                mask = ~(mask + (mask << 1)) & _U64
                id_masked = cid.id & mask
                if (
                    (output[-3].id & mask) != id_masked
                    or (output[-2].id & mask) != id_masked
                    or (output[-1].id & mask) != id_masked
                    or (output[-3].id ^ output[-2].id ^ output[-1].id) != cid.id
                ):
                    break
                del output[-3:]
                cid = cid.parent()
            output.append(cid)
        return output

    def __len__(self):
        return len(self.cell_ids)

    def __eq__(self, other):
        return isinstance(other, CellUnion) and self.cell_ids == other.cell_ids

    def num_cells(self) -> int:
        return len(self.cell_ids)

    def ids(self):
        return [c.id for c in self.cell_ids]

    def tokens(self):
        return [c.to_token() for c in self.cell_ids]

    def denormalize(self, min_level: int, level_mod: int = 1):
        """Expand to at-least-min_level granularity respecting level_mod
        (sphere.py CellUnion.denormalize)."""
        out = []
        for cid in self.cell_ids:
            level = cid.level()
            new_level = max(min_level, level)
            if level_mod > 1:
                new_level += (MAX_LEVEL - (new_level - min_level)) % level_mod
                new_level = min(MAX_LEVEL, new_level)
            if new_level == level:
                out.append(cid)
            else:
                end = cid.child_end(new_level)
                child = cid.child_begin(new_level)
                while child.id != end.id:
                    out.append(child)
                    child = child.next()
        return out

    def contains_cellid(self, cid: CellId) -> bool:
        """Bisect on sorted ids vs range_min/max (sphere.py
        CellUnion.contains)."""
        import bisect

        ids = self.cell_ids
        idx = bisect.bisect_left([c.id for c in ids], cid.id)
        if idx < len(ids) and ids[idx].range_min().id <= cid.id:
            return True
        return idx > 0 and ids[idx - 1].range_max().id >= cid.id

    def intersects_cellid(self, cid: CellId) -> bool:
        import bisect

        ids = self.cell_ids
        idx = bisect.bisect_left([c.id for c in ids], cid.id)
        if idx < len(ids) and ids[idx].range_min().id <= cid.range_max().id:
            return True
        return idx > 0 and ids[idx - 1].range_max().id >= cid.range_min().id

    def contains_cellunion(self, other: "CellUnion") -> bool:
        return all(self.contains_cellid(c) for c in other.cell_ids)

    def intersects_cellunion(self, other: "CellUnion") -> bool:
        return any(self.intersects_cellid(c) for c in other.cell_ids)

    @staticmethod
    def get_union(x: "CellUnion", y: "CellUnion") -> "CellUnion":
        return CellUnion(x.cell_ids + y.cell_ids)

    @staticmethod
    def get_intersection(x: "CellUnion", y: "CellUnion") -> "CellUnion":
        """Two-pointer merge on Hilbert ranges (sphere.py
        CellUnion.get_intersection)."""
        out = []
        i = j = 0
        xs, ys = x.cell_ids, y.cell_ids
        while i < len(xs) and j < len(ys):
            imin = xs[i].range_min().id
            jmin = ys[j].range_min().id
            if imin > jmin:
                if xs[i].id <= ys[j].range_max().id:
                    out.append(xs[i])
                    i += 1
                else:
                    j += 1
            elif jmin > imin:
                if ys[j].id <= xs[i].range_max().id:
                    out.append(ys[j])
                    j += 1
                else:
                    i += 1
            else:
                if xs[i].id < ys[j].id:
                    out.append(xs[i])
                    i += 1
                else:
                    out.append(ys[j])
                    j += 1
        u = CellUnion()
        u.cell_ids = CellUnion._normalized(out)
        return u

    @staticmethod
    def get_difference(x: "CellUnion", y: "CellUnion") -> "CellUnion":
        out = []

        def _subtract(cid: CellId):
            if not y.intersects_cellid(cid):
                out.append(cid)
            elif not y.contains_cellid(cid):
                for child_ in cid.children():
                    _subtract(child_)

        for cid in x.cell_ids:
            _subtract(cid)
        return CellUnion(out)

    def expand_level(self, level: int) -> "CellUnion":
        """Add all neighbors at ``level`` (sphere.py CellUnion.expand)."""
        output = []
        level_lsb = CellId.lsb_for_level(level)
        i = len(self.cell_ids) - 1
        while i >= 0:
            cid = self.cell_ids[i]
            if cid.lsb() < level_lsb:
                cid = cid.parent(level)
                while i > 0 and cid.contains(self.cell_ids[i - 1]):
                    i -= 1
            output.append(cid)
            output.extend(cid.get_all_neighbors(level))
            i -= 1
        return CellUnion(output)

    def expand_radius(self, min_radius_rad: float, max_level_diff: int) -> "CellUnion":
        min_level = MAX_LEVEL
        for cid in self.cell_ids:
            min_level = min(min_level, cid.level())
        radius_level = MIN_WIDTH.get_max_level(min_radius_rad)
        if radius_level == 0 and min_radius_rad > MIN_WIDTH.get_value(0):
            return self.expand_level(0)
        return self.expand_level(min(min_level + max_level_diff, radius_level))

    def leaf_cells_covered(self) -> int:
        total = 0
        for cid in self.cell_ids:
            total += 1 << ((MAX_LEVEL - cid.level()) << 1)
        return total

    def average_based_area(self) -> float:
        return AVG_AREA.get_value(MAX_LEVEL) * self.leaf_cells_covered()

    def approx_area(self) -> float:
        return sum(Cell(cid).approx_area() for cid in self.cell_ids)

    def exact_area(self) -> float:
        return sum(Cell(cid).exact_area() for cid in self.cell_ids)

    # Region interface so a CellUnion can itself be covered.
    def get_cap_bound(self) -> Cap:
        if not self.cell_ids:
            return Cap.empty()
        centroid = (0.0, 0.0, 0.0)
        for cid in self.cell_ids:
            area = AVG_AREA.get_value(cid.level())
            centroid = add(centroid, scale(cid.to_point(), area))
        if centroid == (0.0, 0.0, 0.0):
            axis = (1.0, 0.0, 0.0)
        else:
            axis = normalize(centroid)
        cap = Cap.from_axis_height(axis, 0.0)
        for cid in self.cell_ids:
            cell = Cell(cid)
            for k in range(4):
                cap = cap.add_point(cell.get_vertex(k))
        return cap

    def get_rect_bound(self) -> LatLngRect:
        rect = LatLngRect.empty()
        for cid in self.cell_ids:
            r = Cell(cid).get_rect_bound()
            if rect.is_empty():
                rect = r
            else:
                rect = rect.union(r)
        return rect

    def contains_cell(self, cell: Cell) -> bool:
        return self.contains_cellid(cell.cell_id)

    def may_intersect_cell(self, cell: Cell) -> bool:
        return self.intersects_cellid(cell.cell_id)


# ---------------------------------------------------------------------------
# RegionCoverer (sphere.py class RegionCoverer, SURVEY §2.1 I / §3 Trace 2)
# ---------------------------------------------------------------------------

FACE_CELLS = [CellId.from_face_pos_level(f, 0, 0) for f in range(6)]


class _Candidate:
    __slots__ = ("cell", "is_terminal", "num_children", "children")

    def __init__(self, cell: Cell, is_terminal: bool):
        self.cell = cell
        self.is_terminal = is_terminal
        self.num_children = 0
        self.children: list = []


class RegionCoverer:
    """Best-first cell covering of an arbitrary region.

    Deterministic given (region, config): the priority queue orders by
    (level, num_children, num_terminals) with a monotone insertion sequence
    number as the final tie-break (engine-defined tie-break; the reference's
    heap tie behaviour is unspecified for equal priorities).
    Config mirrors sphere.py RegionCoverer: min_level=0, max_level=30,
    level_mod=1, max_cells=8.
    """

    def __init__(
        self,
        min_level: int = 0,
        max_level: int = MAX_LEVEL,
        level_mod: int = 1,
        max_cells: int = 8,
        interior_work_budget: int = 4000,
    ):
        self.min_level = max(0, min(MAX_LEVEL, min_level))
        self.max_level = max(0, min(MAX_LEVEL, max_level))
        self.level_mod = max(1, min(3, level_mod))
        self.max_cells = max_cells
        # Interior coverings can grind the region boundary to max_level when
        # the result stalls just below max_cells (boundary cell count doubles
        # per level). An interior cover is conservative — any subset of fully
        # contained cells is valid — so we bound the best-first search with a
        # deterministic pop budget. Engine-documented deviation; exterior
        # covers are unaffected (their expansion is bounded by max_cells).
        self.interior_work_budget = interior_work_budget
        self._region = None
        self._pq: list = []
        self._result: list[CellId] = []
        self._seq = 0
        self._interior = False

    # -- region adapter: regions expose contains_cell / may_intersect_cell --

    def _new_candidate(self, cell: Cell):
        if not self._region.may_intersect_cell(cell):
            return None
        is_terminal = False
        if cell.level >= self.min_level:
            if self._interior:
                if self._region.contains_cell(cell):
                    is_terminal = True
                elif cell.level + self.level_mod > self.max_level:
                    return None
            else:
                if (
                    cell.level + self.level_mod > self.max_level
                    or self._region.contains_cell(cell)
                ):
                    is_terminal = True
        return _Candidate(cell, is_terminal)

    def _max_children_shift(self) -> int:
        return 2 * self.level_mod

    def _expand_children(self, candidate: _Candidate, cell: Cell, num_levels: int) -> int:
        num_levels -= 1
        num_terminals = 0
        for child_cell in cell.subdivide():
            if num_levels > 0:
                if self._region.may_intersect_cell(child_cell):
                    num_terminals += self._expand_children(
                        candidate, child_cell, num_levels
                    )
                continue
            child = self._new_candidate(child_cell)
            if child is not None:
                candidate.children.append(child)
                candidate.num_children += 1
                if child.is_terminal:
                    num_terminals += 1
        return num_terminals

    def _add_candidate(self, candidate):
        if candidate is None:
            return
        if candidate.is_terminal:
            self._result.append(candidate.cell.cell_id)
            return
        num_levels = self.level_mod if candidate.cell.level >= self.min_level else 1
        num_terminals = self._expand_children(candidate, candidate.cell, num_levels)
        if candidate.num_children == 0:
            return
        if (
            not self._interior
            and num_terminals == 1 << self._max_children_shift()
            and candidate.cell.level >= self.min_level
        ):
            candidate.is_terminal = True
            self._add_candidate(candidate)
            return
        priority = (
            (
                (candidate.cell.level << self._max_children_shift())
                + candidate.num_children
            )
            << self._max_children_shift()
        ) + num_terminals
        self._seq += 1
        heappush(self._pq, (priority, self._seq, candidate))

    def _get_initial_candidates(self):
        if self.max_cells >= 4:
            cap = self._region.get_cap_bound()
            level = min(
                MIN_WIDTH.get_max_level(2 * cap.angle()),
                min(self.max_level, MAX_LEVEL - 1),
            )
            if self.level_mod > 1 and level > self.min_level:
                level -= (level - self.min_level) % self.level_mod
            if level > 0:
                cid = CellId.from_point(cap.axis)
                for base in cid.get_vertex_neighbors(level):
                    self._add_candidate(self._new_candidate(Cell(base)))
                return
        for face_cell in FACE_CELLS:
            self._add_candidate(self._new_candidate(Cell(face_cell)))

    def _get_covering_internal(self, region, interior: bool):
        self._region = region
        self._interior = interior
        self._pq = []
        self._result = []
        self._seq = 0
        self._get_initial_candidates()
        # Exterior coverings drain the queue (late candidates are emitted
        # terminal); interior coverings stop once max_cells are emitted or
        # the work budget is exhausted (see __init__).
        pops = 0
        while self._pq and (not interior or len(self._result) < self.max_cells):
            pops += 1
            if interior and pops > self.interior_work_budget:
                break
            _, _, candidate = heappop(self._pq)
            if (
                candidate.cell.level < self.min_level
                or candidate.num_children == 1
                or len(self._result)
                + (0 if interior else len(self._pq))
                + candidate.num_children
                <= self.max_cells
            ):
                for child in candidate.children:
                    self._add_candidate(child)
            elif not interior:
                candidate.is_terminal = True
                self._result.append(candidate.cell.cell_id)
        self._pq = []
        self._region = None
        return self._result

    def get_covering(self, region, raw: bool = False):
        """Exterior cover. Normalized ``CellUnion`` by default; ``raw=True``
        returns the sorted pre-normalization id list, which is what satisfies
        the min_level/level_mod constraints exactly (normalization may merge
        4 siblings into a parent below min_level)."""
        ids = self._get_covering_internal(region, interior=False)
        if raw:
            return sorted(ids, key=lambda c: c.id)
        return CellUnion(ids)

    def get_interior_covering(self, region, raw: bool = False):
        ids = self._get_covering_internal(region, interior=True)
        if raw:
            return sorted(ids, key=lambda c: c.id)
        return CellUnion(ids)

    @staticmethod
    def get_simple_covering(region, start, level: int):
        """BFS flood fill at a fixed level from the cell containing ``start``
        (sphere.py RegionCoverer.get_simple_covering / flood_fill)."""
        start_cell = CellId.from_point(start).parent(level)
        output = []
        all_seen = {start_cell.id}
        frontier = [start_cell]
        while frontier:
            cid = frontier.pop()
            if not region.may_intersect_cell(Cell(cid)):
                continue
            output.append(cid)
            for nbr in cid.get_edge_neighbors():
                if nbr.id not in all_seen:
                    all_seen.add(nbr.id)
                    frontier.append(nbr)
        return sorted(output, key=lambda c: c.id)
