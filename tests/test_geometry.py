"""Scalar geometry invariants — ports of the reference's interval / cap /
rect / cell / cellunion / coverer test families (SURVEY.md §5)."""

import math

import numpy as np
import pytest

from s2sphere_ray import geometry as g

RNG = np.random.default_rng(42)


def rand_point():
    return g.normalize(tuple(RNG.normal(size=3)))


def rand_cap(max_angle=0.5):
    return g.Cap.from_axis_angle(rand_point(), RNG.uniform(0.001, max_angle))


def cap_sample(cap):
    angle = cap.angle()
    z = math.cos(RNG.uniform(0, angle))
    phi = RNG.uniform(0, 2 * math.pi)
    r = math.sqrt(max(0.0, 1 - z * z))
    zax = cap.axis
    xax = g.ortho(zax)
    yax = g.cross(zax, xax)
    return g.add(
        g.add(g.scale(xax, r * math.cos(phi)), g.scale(yax, r * math.sin(phi))),
        g.scale(zax, z),
    )


# --- intervals -------------------------------------------------------------


def test_line_interval():
    i = g.LineInterval(1, 2)
    assert i.contains(1.5) and i.contains(1) and i.contains(2)
    assert not i.contains(2.5)
    assert i.union(g.LineInterval(3, 4)).hi == 4
    assert i.intersection(g.LineInterval(1.5, 3)).lo == 1.5
    assert g.LineInterval.empty().is_empty()
    assert i.expanded(0.5).contains(0.6)


def test_sphere_interval_wrap():
    # Inverted (dateline-crossing) interval semantics.
    s = g.SphereInterval(3.0, -3.0)  # crosses ±π
    assert s.is_inverted()
    assert s.contains(math.pi) and s.contains(-math.pi) and s.contains(3.1)
    assert not s.contains(0.0)
    assert abs(abs(s.get_center()) - math.pi) < 1e-12
    full = g.SphereInterval.full()
    assert full.is_full() and full.contains(1.23)
    assert g.SphereInterval.empty().is_empty()
    # from_point_pair picks the shorter arc
    fp = g.SphereInterval.from_point_pair(-3.1, 3.1)
    assert fp.is_inverted()
    assert fp.get_length() < 1.0


def test_cap_basic():
    cap = g.Cap.from_axis_angle((1.0, 0.0, 0.0), 0.5)
    assert cap.contains_point(g.normalize((1.0, 0.1, 0.0)))
    assert not cap.contains_point((0.0, 1.0, 0.0))
    assert abs(cap.angle() - 0.5) < 1e-14
    comp = cap.complement()
    assert not comp.contains_point((1.0, 0.0, 0.0))
    assert comp.contains_point((-1.0, 0.0, 0.0))
    assert g.Cap.empty().is_empty() and g.Cap.full().is_full()
    # expanded monotone
    assert g.Cap.from_axis_angle((1, 0, 0), 0.1).expanded(0.2).contains_point(
        g.normalize((1.0, 0.25, 0.0))
    )


def test_cap_rect_bound_contains_samples():
    for _ in range(50):
        cap = rand_cap()
        rect = cap.get_rect_bound()
        for _ in range(20):
            p = cap_sample(cap)
            assert rect.contains_point(p)


def test_rect_basic():
    r = g.LatLngRect.from_degrees(10, 20, 30, 50)
    assert r.contains_latlng(g.LatLng.from_degrees(20, 30))
    assert not r.contains_latlng(g.LatLng.from_degrees(5, 30))
    assert r.get_vertex(0).lat == math.radians(10)
    u = r.union(g.LatLngRect.from_degrees(25, 40, 40, 60))
    assert u.contains_latlng(g.LatLng.from_degrees(35, 55))
    i = r.intersection(g.LatLngRect.from_degrees(20, 30, 40, 60))
    assert i.contains_latlng(g.LatLng.from_degrees(25, 40))
    assert not i.contains_latlng(g.LatLng.from_degrees(15, 25))


def test_rect_cap_bound_contains_samples():
    for _ in range(30):
        lat_lo = RNG.uniform(-80, 60)
        lat_hi = lat_lo + RNG.uniform(1, 20)
        lng_lo = RNG.uniform(-180, 150)
        lng_hi = lng_lo + RNG.uniform(1, 30)
        rect = g.LatLngRect.from_degrees(lat_lo, lng_lo, lat_hi, lng_hi)
        cap = rect.get_cap_bound()
        for _ in range(10):
            ll = g.LatLng.from_degrees(
                RNG.uniform(lat_lo, lat_hi), RNG.uniform(lng_lo, lng_hi)
            )
            assert cap.contains_point(ll.to_point())


def test_metrics():
    # Known quadratic-projection values and level relations (SURVEY §2.1 H).
    assert abs(g.MIN_WIDTH.deriv - 2 * math.sqrt(2) / 3) < 1e-15
    assert abs(g.AVG_AREA.deriv - 4 * math.pi / 6) < 1e-15
    for m in (g.MIN_WIDTH, g.MAX_EDGE, g.AVG_DIAG):
        for lvl in (0, 5, 17, 30):
            v = m.get_value(lvl)
            assert m.get_min_level(v) <= lvl <= m.get_max_level(v)
    assert g.MIN_WIDTH.get_max_level(0.0) == 30
    assert g.AVG_AREA.get_value(1) == g.AVG_AREA.deriv / 4


def test_cell_subdivide_property():
    # Children partition the parent: areas sum, bounds nest, centers inside
    # (reference test_subdivide, shallow recursion).
    for _ in range(10):
        cid = g.CellId.from_point(rand_point()).parent(int(RNG.integers(0, 10)))
        cell = g.Cell(cid)
        children = cell.subdivide()
        assert len(children) == 4
        area = sum(c.exact_area() for c in children)
        assert abs(area - cell.exact_area()) < 1e-9 * max(1.0, cell.exact_area())
        rect = cell.get_rect_bound()
        for ch in children:
            assert cell.cell_id.contains(ch.cell_id)
            assert cell.contains_point(ch.get_center())
            assert rect.contains_point(ch.get_center())


def test_cell_contains_point_matches_cap_bound():
    for _ in range(20):
        cid = g.CellId.from_point(rand_point()).parent(int(RNG.integers(2, 15)))
        cell = g.Cell(cid)
        cap = cell.get_cap_bound()
        assert cell.contains_point(cell.get_center())
        assert cap.contains_point(cell.get_center())
        for k in range(4):
            assert cap.contains_point(cell.get_vertex(k))


def test_cellunion_normalize_property():
    # Random hierarchy: a parent plus all 4 children normalizes to parent;
    # containment is preserved (reference test_normalize).
    for _ in range(20):
        base = g.CellId.from_point(rand_point()).parent(int(RNG.integers(3, 12)))
        ids = [base] + base.children()
        u = g.CellUnion(ids)
        assert u.cell_ids == [base]
        children = base.children()
        u2 = g.CellUnion(children)
        assert u2.cell_ids == [base]  # 4 siblings merge
        u3 = g.CellUnion(children[:3])
        assert len(u3) == 3
        for c in children[:3]:
            assert u3.contains_cellid(c)
        assert not u3.contains_cellid(children[3])


def test_cellunion_set_ops():
    cov = g.RegionCoverer(max_cells=12)
    a = cov.get_covering(rand_cap(0.3))
    b = cov.get_covering(rand_cap(0.3))
    un = g.CellUnion.get_union(a, b)
    inter = g.CellUnion.get_intersection(a, b)
    diff = g.CellUnion.get_difference(a, b)
    for c in a.cell_ids:
        assert un.contains_cellid(c)
    for c in inter.cell_ids:
        assert a.intersects_cellid(c) and b.intersects_cellid(c)
    for c in diff.cell_ids:
        assert a.intersects_cellid(c) and not b.intersects_cellid(c)


def test_cellunion_expand_contains_original():
    cov = g.RegionCoverer(max_cells=8)
    u = cov.get_covering(rand_cap(0.1))
    ex = u.expand_level(10)
    assert ex.contains_cellunion(u)
    ex2 = u.expand_radius(0.05, 2)
    assert ex2.contains_cellunion(u)


def check_covering(region, union, interior, samples):
    ids = union.cell_ids
    for a in range(len(ids) - 1):
        assert ids[a].id < ids[a + 1].id
        assert not ids[a].contains(ids[a + 1])
    for c in ids:
        cell = g.Cell(c)
        assert region.may_intersect_cell(cell)
        if interior:
            assert region.contains_cell(cell)
    if not interior:
        for p in samples:
            assert union.contains_cellid(g.CellId.from_point(p))


def test_region_coverer_random_caps():
    # Reference test_random_caps invariant checker.
    for trial in range(25):
        max_cells = int(RNG.integers(4, 17))
        cov = g.RegionCoverer(max_cells=max_cells)
        cap = rand_cap(0.4)
        cover = cov.get_covering(cap)
        assert 0 < len(cover) <= max_cells + 4
        samples = [cap_sample(cap) for _ in range(20)]
        check_covering(cap, cover, False, samples)
        interior = cov.get_interior_covering(cap)
        check_covering(cap, interior, True, [])


def test_region_coverer_levels():
    cov = g.RegionCoverer(min_level=4, max_level=8, max_cells=16)
    cover = cov.get_covering(rand_cap(0.05), raw=True)
    for c in cover:
        assert 4 <= c.level() <= 8


def test_region_coverer_level_mod():
    cov = g.RegionCoverer(min_level=4, max_level=30, level_mod=2, max_cells=8)
    cover = cov.get_covering(rand_cap(0.1), raw=True)
    for c in cover:
        assert (c.level() - 4) % 2 == 0


def test_simple_covering_flood_fill():
    cap = g.Cap.from_axis_angle((1.0, 0.0, 0.0), 0.1)
    cells = g.RegionCoverer.get_simple_covering(cap, (1.0, 0.0, 0.0), 8)
    assert len(cells) > 0
    assert all(c.level() == 8 for c in cells)
    union = g.CellUnion(cells, raw=True)
    for _ in range(30):
        p = cap_sample(cap)
        assert union.contains_cellid(g.CellId.from_point(p))


def test_crossing_predicates():
    a = g.LatLng.from_degrees(0, 0).to_point()
    b = g.LatLng.from_degrees(0, 10).to_point()
    c = g.LatLng.from_degrees(5, 5).to_point()
    d = g.LatLng.from_degrees(-5, 5).to_point()
    assert g.simple_crossing(a, b, c, d)
    assert g.simple_crossing(c, d, a, b)  # symmetry
    e = g.LatLng.from_degrees(5, 20).to_point()
    f = g.LatLng.from_degrees(-5, 20).to_point()
    assert not g.simple_crossing(a, b, e, f)
    assert g.simple_ccw(a, b, c) != g.simple_ccw(b, a, c)


def test_triangle_area():
    # Octant triangle has area π/2.
    a, b, c = (1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0)
    assert abs(g.triangle_area(a, b, c) - math.pi / 2) < 1e-12
    assert abs(g.girard_area(a, b, c) - math.pi / 2) < 1e-10


def test_latlng_distance():
    p = g.LatLng.from_degrees(0, 0)
    assert abs(p.get_distance(g.LatLng.from_degrees(0, 180)) - math.pi) < 1e-12
    assert abs(p.get_distance(g.LatLng.from_degrees(90, 0)) - math.pi / 2) < 1e-12


def test_wrap_iteration():
    # next_wrap from the last cell of face 5 lands on the first of face 0
    # (reference test_wrapping).
    for level in (0, 3, 11):
        first = g.CellId.from_face_pos_level(0, 0, level)
        last = g.CellId.from_face_pos_level(5, 0, 0).child_end(level).prev()
        assert last.next_wrap() == first
        assert first.prev_wrap() == last
        n_cells = 6 * (1 << (2 * level))
        assert first.advance_wrap(n_cells) == first
        assert first.advance_wrap(-1) == last


def test_cap_from_axis_area():
    cap = g.Cap.from_axis_area((1.0, 0.0, 0.0), math.pi)  # quarter sphere
    assert abs(cap.height - 0.5) < 1e-15
    assert abs(cap.area() - math.pi) < 1e-12


def test_convolve_with_cap():
    r = g.LatLngRect.from_degrees(10, 10, 20, 20)
    grown = r.convolve_with_cap(math.radians(5.0))
    assert grown.contains_rect(r)
    assert grown.contains_latlng(g.LatLng.from_degrees(24.0, 15.0))
    assert not grown.contains_latlng(g.LatLng.from_degrees(40.0, 15.0))


def test_sphere_compat_surface():
    # Reference-style import surface (s2sphere drop-in names).
    from s2sphere_ray import sphere

    a = sphere.Angle.from_degrees(90.0)
    assert abs(a.radians - math.pi / 2) < 1e-15
    ll = sphere.LatLng.from_degrees(48.8584, 2.2945)
    cid = sphere.CellId.from_latlng(ll)
    assert cid.to_token() == "47e66fe1f36a36a5"
    cov = sphere.RegionCoverer()
    cap = sphere.Cap.from_axis_angle(ll.to_point(), 0.01)
    union = cov.get_covering(cap)
    assert isinstance(union, sphere.CellUnion) and 0 < len(union) <= 8
    assert sphere.MIN_WIDTH.get_value(0) == 2 * math.sqrt(2) / 3


def test_cellid_begin_end_iteration():
    # begin/end iterate all 6*4^L cells at level L (reference CellId.begin/end).
    level = 2
    count = 0
    c = g.CellId.begin(level)
    end = g.CellId.end(level)
    seen_faces = set()
    while c.id != end.id:
        assert c.is_valid() and c.level() == level
        seen_faces.add(c.face())
        c = c.next()
        count += 1
    assert count == 6 * 4 ** level
    assert seen_faces == set(range(6))
    assert g.CellId.none().id == 0


def test_interval_complement_and_interior():
    s = g.SphereInterval(0.5, 1.5)
    comp = s.get_complement()
    assert comp.contains(2.0) and not comp.contains(1.0)
    assert s.approx_equals(g.SphereInterval(0.5, 1.5 + 1e-16))
    assert g.LineInterval(1, 2).approx_equals(g.LineInterval(1, 2 + 1e-16))
    r = g.LatLngRect.from_degrees(10, 10, 20, 20)
    assert r.interior_contains_latlng(g.LatLng.from_degrees(15, 15))
    assert not r.interior_contains_latlng(g.LatLng.from_degrees(10, 15))
    assert r.interior_intersects(g.LatLngRect.from_degrees(15, 15, 25, 25))
    assert not r.interior_intersects(g.LatLngRect.from_degrees(20, 10, 30, 20))
    cap = g.Cap.from_axis_angle((1.0, 0.0, 0.0), 0.5)
    assert cap.interior_contains((1.0, 0.0, 0.0))


# ---------------------------------------------------------------------------
# Round-2 API additions: drem / is_unit_length / ordered_ccw / planar_ccw /
# get_norm / SphereInterval hausdorff / LatLngRect ctors / aspect constants
# ---------------------------------------------------------------------------


def test_drem_and_is_unit_length():
    import math

    assert g.drem(5.0, 2.0) == 1.0
    assert g.drem(3.0, 2.0) == -1.0  # round-half-even: 3/2 rounds to 2
    assert g.drem(-5.5, 2.0) == 0.5
    assert g.is_unit_length((1.0, 0.0, 0.0))
    assert g.is_unit_length(g.normalize((3.0, 4.0, 12.0)))
    assert not g.is_unit_length((1.0, 1.0, 0.0))
    assert not g.is_unit_length((0.0, 0.0, 0.0))


def test_ordered_ccw():
    o = (0.0, 0.0, 1.0)
    a = (1.0, 0.0, 0.0)
    b = g.normalize((1.0, 1.0, 0.0))
    c = (0.0, 1.0, 0.0)
    assert g.ordered_ccw(a, b, c, o)
    assert not g.ordered_ccw(c, b, a, o) or g.ordered_ccw(a, b, c, o)
    # Reversing outer edge flips the wedge unless degenerate.
    assert not g.ordered_ccw(a, c, b, o)
    # Equal points are allowed.
    assert g.ordered_ccw(a, a, c, o)
    assert g.ordered_ccw(a, c, c, o)


def test_planar_ccw_and_ordered():
    assert g.planar_ccw((1.0, 0.0), (0.0, 1.0)) == 1
    assert g.planar_ccw((0.0, 1.0), (1.0, 0.0)) == -1
    assert g.planar_ccw((1.0, 0.0), (2.0, 0.0)) == 0
    assert g.planar_ordered_ccw((1.0, 0.0), (1.0, 1.0), (0.0, 1.0))
    assert not g.planar_ordered_ccw((1.0, 0.0), (0.0, 1.0), (1.0, 1.0))


def test_get_norm_faces():
    for face in range(6):
        n = g.get_norm(face)
        # Unit length, orthogonal to both in-face axes, right-handed.
        assert g.is_unit_length(n)
        assert abs(g.dot(n, g.get_u_axis(face))) < 1e-15
        assert abs(g.dot(n, g.get_v_axis(face))) < 1e-15
        # The face normal is where (u,v)=(0,0) maps on the sphere.
        import s2sphere_ray.cells as ck
        import numpy as np

        x, y, z = ck.face_uv_to_xyz(
            np.array([face]), np.array([0.0]), np.array([0.0])
        )
        v = g.normalize((float(x[0]), float(y[0]), float(z[0])))
        assert all(abs(v[i] - n[i]) < 1e-15 for i in range(3))


def test_sphere_interval_directed_hausdorff():
    import math

    SI = g.SphereInterval
    a = SI(0.0, 1.0)
    assert a.get_directed_hausdorff_distance(SI(-0.5, 1.5)) == 0.0
    assert a.get_directed_hausdorff_distance(SI.empty()) == math.pi
    # Disjoint: farthest point of a from [2, 3] is 0.0 → distance to 3
    # going the short way: min over other pts; directed HD = max over a.
    d = a.get_directed_hausdorff_distance(SI(2.0, 3.0))
    # Farthest point in a from the interval [2,3]: distance from 0 is
    # min(2, 2π-3)=2π-3... compute brute force.
    import numpy as np

    pts = np.linspace(0.0, 1.0, 20001)
    other = np.linspace(2.0, 3.0, 20001)

    def circ(x, y):
        r = abs(x - y) % (2 * math.pi)
        return min(r, 2 * math.pi - r)

    brute = max(min(circ(p, q) for q in (2.0, 3.0)) for p in pts)
    assert abs(d - brute) < 1e-9
    # Self distance zero; singleton cases.
    assert a.get_directed_hausdorff_distance(a) == 0.0
    s = SI(1.0, 1.0)
    assert abs(
        s.get_directed_hausdorff_distance(SI(1.0 + 0.3, 1.0 + 0.5)) - 0.3
    ) < 1e-15


def test_latlngrect_ctors():
    import math

    ll = g.LatLng.from_degrees(10.0, 20.0)
    r = g.LatLngRect.from_point(ll)
    assert r.contains_latlng(ll)
    assert r.lat.get_length() == 0.0 and r.lng.get_length() == 0.0

    a = g.LatLng.from_degrees(10.0, 170.0)
    b = g.LatLng.from_degrees(-5.0, -170.0)
    pp = g.LatLngRect.from_point_pair(a, b)
    assert pp.contains_latlng(a) and pp.contains_latlng(b)
    # Takes the short way across the dateline: 20°, not 340°.
    assert abs(pp.lng.get_length() - math.radians(20.0)) < 1e-12

    c = g.LatLng.from_degrees(80.0, 0.0)
    size = g.LatLng.from_degrees(40.0, 60.0)
    cs = g.LatLngRect.from_center_size(c, size)
    # Lat clamped at the pole.
    assert abs(cs.lat.hi - math.pi / 2) < 1e-15
    assert abs(cs.lat.lo - math.radians(60.0)) < 1e-12
    assert abs(cs.lng.get_length() - math.radians(60.0)) < 1e-12
    assert cs.contains_latlng(c)


def test_aspect_constants():
    import math

    assert abs(g.MAX_DIAG_ASPECT - math.sqrt(3)) < 1e-15
    assert 1.0 < g.MAX_EDGE_ASPECT < g.MAX_DIAG_ASPECT
    # Edge aspect bound must be consistent with the edge metrics:
    # max/min edge length ratio at any level is <= MAX_EDGE/MIN_EDGE.
    assert g.MAX_EDGE_ASPECT <= g.MAX_EDGE.deriv / g.MIN_EDGE.deriv + 1e-9


def test_latlngrect_accessors_and_area():
    import math

    r = g.LatLngRect.from_degrees(10.0, 20.0, 30.0, 50.0)
    assert r.lat_lo() == math.radians(10.0)
    assert r.lat_hi() == math.radians(30.0)
    assert r.lng_lo() == math.radians(20.0)
    assert r.lng_hi() == math.radians(50.0)
    assert r.lo().lat == r.lat_lo() and r.lo().lng == r.lng_lo()
    assert r.hi().lat == r.lat_hi() and r.hi().lng == r.lng_hi()
    sz = r.get_size()
    assert abs(sz.lat - math.radians(20.0)) < 1e-15
    assert abs(sz.lng - math.radians(30.0)) < 1e-15
    # area: lng width × (sin hi − sin lo); full sphere sanity.
    want = math.radians(30.0) * (
        math.sin(math.radians(30.0)) - math.sin(math.radians(10.0))
    )
    assert abs(r.area() - want) < 1e-15
    assert abs(g.LatLngRect.full().area() - 4 * math.pi) < 1e-12
    assert g.LatLngRect.empty().area() == 0.0
    # from_lat_lng corner ctor round-trips from_degrees.
    r2 = g.LatLngRect.from_lat_lng(r.lo(), r.hi())
    assert r2.lat.lo == r.lat.lo and r2.lng.hi == r.lng.hi
