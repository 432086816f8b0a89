"""Reference-compatible API surface (drop-in names for s2sphere users).

``from s2sphere_ray import sphere`` exposes the public names of the
reference library (`sidewalklabs/s2sphere` ``s2sphere/__init__.py``
re-exports — SURVEY.md §2.1) mapped onto this engine's scalar layer, so
code written against the reference keeps working while batch pipelines use
the vectorized `cells` kernels. An ``Angle`` wrapper restores the
reference's unit-safe angle type.
"""

from __future__ import annotations

import math

from .geometry import (  # noqa: F401
    Cap,
    Cell,
    CellId,
    CellUnion,
    ConvexPolygon,
    LatLng as _LatLng,
    LatLngRect,
    LineInterval,
    Metric,
    RegionCoverer,
    SphereInterval,
    AVG_ANGLE_SPAN,
    AVG_AREA,
    AVG_DIAG,
    AVG_EDGE,
    AVG_WIDTH,
    MAX_ANGLE_SPAN,
    MAX_AREA,
    MAX_DIAG,
    MAX_EDGE,
    MAX_WIDTH,
    MIN_ANGLE_SPAN,
    MIN_AREA,
    MIN_DIAG,
    MIN_EDGE,
    MIN_WIDTH,
    face_uv_to_xyz,
    xyz_to_face_uv,
    st_to_uv,
    uv_to_st,
    origin,
    ortho,
    robust_cross_prod,
    simple_ccw,
    simple_crossing,
    triangle_area as area,
    girard_area,
)


class Angle:
    """Unit-safe 1-D angle (sphere.py class Angle, SURVEY §2.1 B1)."""

    __slots__ = ("_radians",)

    def __init__(self, radians: float = 0.0):
        self._radians = radians

    @classmethod
    def from_radians(cls, radians: float) -> "Angle":
        return cls(radians)

    @classmethod
    def from_degrees(cls, degrees: float) -> "Angle":
        return cls(math.radians(degrees))

    @property
    def radians(self) -> float:
        return self._radians

    @property
    def degrees(self) -> float:
        return math.degrees(self._radians)

    def __eq__(self, other):
        return isinstance(other, Angle) and self._radians == other._radians

    def __lt__(self, other):
        return self._radians < other._radians

    def __add__(self, other):
        return Angle(self._radians + other._radians)

    def __sub__(self, other):
        return Angle(self._radians - other._radians)

    def __repr__(self):
        return f"Angle({self.degrees} degrees)"


class LatLng(_LatLng):
    """Reference-style LatLng whose accessors return :class:`Angle`."""

    __slots__ = ()

    @classmethod
    def from_angles(cls, lat: Angle, lng: Angle) -> "LatLng":
        return cls(lat.radians, lng.radians)

    def lat_angle(self) -> Angle:
        return Angle(self.lat)

    def lng_angle(self) -> Angle:
        return Angle(self.lng)

    def normalized(self) -> "LatLng":
        lat = max(-math.pi / 2, min(math.pi / 2, self.lat))
        lng = math.remainder(self.lng, 2 * math.pi)
        return LatLng(lat, lng)

    def is_valid(self) -> bool:
        return abs(self.lat) <= math.pi / 2 and abs(self.lng) <= math.pi

    def approx_equals(self, other: "_LatLng", max_error: float = 1e-15) -> bool:
        return (
            abs(self.lat - other.lat) <= max_error
            and abs(self.lng - other.lng) <= max_error
        )


__all__ = [
    "Angle",
    "Cap",
    "Cell",
    "CellId",
    "CellUnion",
    "ConvexPolygon",
    "LatLng",
    "LatLngRect",
    "LineInterval",
    "Metric",
    "RegionCoverer",
    "SphereInterval",
    "area",
    "girard_area",
    "face_uv_to_xyz",
    "xyz_to_face_uv",
    "st_to_uv",
    "uv_to_st",
    "origin",
    "ortho",
    "robust_cross_prod",
    "simple_ccw",
    "simple_crossing",
]
