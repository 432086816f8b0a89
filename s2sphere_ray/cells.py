"""Vectorized S2 cell-id kernels over numpy arrays.

This module re-expresses the scalar ``CellId`` math of the reference
(`sidewalklabs/s2sphere`, ``s2sphere/sphere.py`` — class CellId, free
functions ``st_to_uv``/``uv_to_st``/``face_uv_to_xyz``/``xyz_to_face_uv``;
see SURVEY.md §2.1 tables A and E) as batch kernels: every function takes
numpy arrays (float64 / int64 / uint64) and returns arrays, so a whole
Arrow batch is encoded/decoded per call with no per-row Python.

Semantics pinned to the public S2 quadratic-projection cell decomposition:

* 64-bit id = 3 face bits ‖ 61 position bits; the position is the
  Hilbert-curve index at level 30 followed by a trailing ``1`` bit at
  2*(30-level) from the bottom (``sphere.py`` class CellId, SURVEY §2.1 E-a).
* Hilbert encode/decode uses the standard 4-bits-at-a-time lookup tables
  built by the recursive ``_init_lookup_cell`` (SURVEY §2.1 E-b).
* ``st_to_ij`` uses the floor convention of the pure-Python reference
  (``int(floor(MAX_SIZE * s))`` clamped), not the newer C++ ``lround``.

All ids are ``np.uint64``; all (face, i, j, level) are ``np.int64``.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Constants (SURVEY §2.1 E-a)
# ---------------------------------------------------------------------------

MAX_LEVEL = 30
NUM_FACES = 6
FACE_BITS = 3
POS_BITS = 2 * MAX_LEVEL + 1  # 61
MAX_SIZE = 1 << MAX_LEVEL  # 2**30
MAX_SI_TI = 2 * MAX_SIZE

SWAP_MASK = 1
INVERT_MASK = 2
LOOKUP_BITS = 4

_U = np.uint64  # shorthand for uint64 scalar constants


def _u(x: int) -> np.uint64:
    return np.uint64(x)


# Hilbert sub-cell traversal tables (SURVEY §2.1 E-b).
POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
POS_TO_ORIENTATION = (SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK)

LOOKUP_POS = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)
LOOKUP_IJ = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)


def _init_lookup_cell(level, i, j, orig_orientation, orientation, pos):
    if level == LOOKUP_BITS:
        ij = (i << LOOKUP_BITS) + j
        LOOKUP_POS[(ij << 2) + orig_orientation] = (pos << 2) + orientation
        LOOKUP_IJ[(pos << 2) + orig_orientation] = (ij << 2) + orientation
    else:
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = POS_TO_IJ[orientation]
        for index in range(4):
            _init_lookup_cell(
                level,
                i + (r[index] >> 1),
                j + (r[index] & 1),
                orig_orientation,
                orientation ^ POS_TO_ORIENTATION[index],
                pos + index,
            )


for _o in (0, SWAP_MASK, INVERT_MASK, SWAP_MASK | INVERT_MASK):
    _init_lookup_cell(0, 0, 0, _o, _o, 0)

# Int-tuple copies for the scalar (pure-python) geometry layer.
LOOKUP_POS_PY = tuple(int(x) for x in LOOKUP_POS)
LOOKUP_IJ_PY = tuple(int(x) for x in LOOKUP_IJ)


# ---------------------------------------------------------------------------
# Projection kernels (SURVEY §2.1 A2–A5)
# ---------------------------------------------------------------------------


def st_to_uv(s):
    """Quadratic cell-space → cube-space projection (sphere.py def st_to_uv)."""
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def uv_to_st(u):
    """Inverse quadratic projection (sphere.py def uv_to_st)."""
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0.0,
            0.5 * np.sqrt(1.0 + 3.0 * u),
            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u),
        )


def st_to_ij(s):
    """ST coordinate → leaf-grid index, floor convention (SURVEY §2.1 E2)."""
    return np.clip(
        np.floor(MAX_SIZE * np.asarray(s, dtype=np.float64)), 0, MAX_SIZE - 1
    ).astype(np.int64)


def ij_to_st_min(i):
    """Minimum ST coordinate of leaf-grid column ``i``."""
    return np.asarray(i, dtype=np.float64) * (1.0 / MAX_SIZE)


def si_ti_to_st(si):
    return np.asarray(si, dtype=np.float64) * (1.0 / MAX_SI_TI)


def face_uv_to_xyz(face, u, v):
    """Cube-face (u,v) → ℝ³ direction (sphere.py def face_uv_to_xyz).

    Face axes: 0:(1,u,v) 1:(−u,1,v) 2:(−u,−v,1) 3:(−1,−v,−u) 4:(v,−1,−u)
    5:(v,u,−1).
    """
    face = np.asarray(face)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(u)
    x = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [one, -u, -u, -one, v],
        default=v,
    )
    y = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [u, one, -v, -v, -one],
        default=u,
    )
    z = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [v, v, one, -u, -u],
        default=-one,
    )
    return x, y, z


def valid_face_xyz_to_uv(face, x, y, z):
    """(u,v) of point on a given face (sphere.py def valid_face_xyz_to_uv)."""
    face = np.asarray(face)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [y / x, -x / y, -x / z, z / x, z / y],
            default=-y / z,
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [z / x, z / y, -y / z, y / x, -x / y],
            default=-x / z,
        )
    return u, v


def xyz_to_face_uv(x, y, z):
    """Point → (face, u, v) via dominant axis (sphere.py def xyz_to_face_uv)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    comp = np.where(face == 0, x, np.where(face == 1, y, z))
    face = np.where(comp < 0.0, face + 3, face).astype(np.int64)
    u, v = valid_face_xyz_to_uv(face, x, y, z)
    return face, u, v


def latlng_to_xyz(lat_deg, lng_deg):
    """Degrees lat/lng → unit-sphere xyz (sphere.py LatLng.to_point)."""
    phi = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    theta = np.deg2rad(np.asarray(lng_deg, dtype=np.float64))
    cosphi = np.cos(phi)
    return np.cos(theta) * cosphi, np.sin(theta) * cosphi, np.sin(phi)


def xyz_to_latlng(x, y, z):
    """xyz → degrees lat/lng (sphere.py LatLng.from_point)."""
    lat = np.arctan2(z, np.sqrt(x * x + y * y))
    lng = np.arctan2(y, x)
    return np.rad2deg(lat), np.rad2deg(lng)


# ---------------------------------------------------------------------------
# Hilbert encode / decode (SURVEY §2.1 E1, E4; Trace 1 in §3)
# ---------------------------------------------------------------------------


def cell_id_from_face_ij(face, i, j):
    """(face, i, j) at leaf level → 64-bit cell id (sphere.py from_face_ij).

    8 iterations consuming 4 bits of i and j per step through LOOKUP_POS,
    threading swap/invert orientation state — vectorized as fancy-indexed
    table lookups over the whole batch.
    """
    face = np.asarray(face).astype(np.uint64)
    i = np.asarray(i).astype(np.uint64)
    j = np.asarray(j).astype(np.uint64)
    n = face << _u(POS_BITS - 1)
    bits = face & _u(SWAP_MASK)
    mask = _u((1 << LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        kk = _u(k * LOOKUP_BITS)
        bits = bits + (((i >> kk) & mask) << _u(LOOKUP_BITS + 2))
        bits = bits + (((j >> kk) & mask) << _u(2))
        bits = LOOKUP_POS[bits]
        n |= (bits >> _u(2)) << _u(k * 2 * LOOKUP_BITS)
        bits &= _u(SWAP_MASK | INVERT_MASK)
    return n * _u(2) + _u(1)


def cell_id_to_face_ij_orientation(cell_id):
    """Inverse Hilbert decode: id → (face, i, j, orientation) at leaf grid."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    face = (cell_id >> _u(POS_BITS)).astype(np.int64)
    bits = cell_id >> _u(POS_BITS) & _u(SWAP_MASK)
    i = np.zeros_like(cell_id)
    j = np.zeros_like(cell_id)
    nibble_mask = _u((1 << LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        nbits = (MAX_LEVEL - 7 * LOOKUP_BITS) if k == 7 else LOOKUP_BITS
        bits = bits + (
            ((cell_id >> _u(k * 2 * LOOKUP_BITS + 1)) & _u((1 << (2 * nbits)) - 1))
            << _u(2)
        )
        bits = LOOKUP_IJ[bits]
        i = i + ((bits >> _u(LOOKUP_BITS + 2)) << _u(k * LOOKUP_BITS))
        j = j + (((bits >> _u(2)) & nibble_mask) << _u(k * LOOKUP_BITS))
        bits &= _u(SWAP_MASK | INVERT_MASK)
    orientation = bits.astype(np.int64)
    # Correction: if lsb lies at an odd bit pair, the orientation gains a swap
    # (sphere.py to_face_ij_orientation).
    swap = (lsb(cell_id) & _u(0x1111111111111110)) != 0
    orientation = np.where(swap, orientation ^ SWAP_MASK, orientation)
    return face, i.astype(np.int64), j.astype(np.int64), orientation


def cell_id_from_latlng(lat_deg, lng_deg):
    """Leaf (level-30) cell id for degree lat/lng columns (E1/E3 kernel)."""
    x, y, z = latlng_to_xyz(lat_deg, lng_deg)
    return cell_id_from_point(x, y, z)


def cell_id_from_point(x, y, z):
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    return cell_id_from_face_ij(face, i, j)


def cell_id_to_center_st(cell_id):
    """Cell id → (face, s, t) of the cell center (sphere.py get_center_si_ti)."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    face, i, j, _ = cell_id_to_face_ij_orientation(cell_id)
    is_leaf = (cell_id & _u(1)) != 0
    # For non-leaf cells the center is displaced by the second-lowest id bit.
    shifted = (cell_id >> _u(2)).astype(np.int64)
    delta = np.where(is_leaf, 1, np.where(((i ^ shifted) & 1) != 0, 2, 0))
    si = 2 * i + delta
    ti = 2 * j + delta
    return face, si_ti_to_st(si), si_ti_to_st(ti)


def cell_id_to_point(cell_id):
    """Cell id → unit xyz of the cell center (sphere.py to_point)."""
    face, s, t = cell_id_to_center_st(cell_id)
    x, y, z = face_uv_to_xyz(face, st_to_uv(s), st_to_uv(t))
    norm = np.sqrt(x * x + y * y + z * z)
    return x / norm, y / norm, z / norm


def cell_id_to_latlng(cell_id):
    """Cell id → degrees (lat, lng) of the cell center (sphere.py to_lat_lng)."""
    return xyz_to_latlng(*cell_id_to_point(cell_id))


# ---------------------------------------------------------------------------
# Id arithmetic (SURVEY §2.1 E5–E8)
# ---------------------------------------------------------------------------


def lsb(cell_id):
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    return cell_id & (~cell_id + _u(1))


def lsb_for_level(level):
    level = np.asarray(level, dtype=np.int64)
    return _u(1) << (2 * (MAX_LEVEL - level)).astype(np.uint64)


def level(cell_id):
    """Decomposition level from trailing-zero count: 30 − ctz/2."""
    l = lsb(cell_id)
    ctz = np.log2(l.astype(np.float64)).astype(np.int64)
    return MAX_LEVEL - (ctz >> 1)


def is_valid(cell_id):
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    face_ok = (cell_id >> _u(POS_BITS)) < _u(NUM_FACES)
    lsb_ok = (lsb(cell_id) & _u(0x1555555555555555)) != 0
    return face_ok & lsb_ok


def is_leaf(cell_id):
    return (np.asarray(cell_id, dtype=np.uint64) & _u(1)) != 0


def is_face(cell_id):
    return (np.asarray(cell_id, dtype=np.uint64) & _u((1 << 60) - 1)) == 0


def face(cell_id):
    return (np.asarray(cell_id, dtype=np.uint64) >> _u(POS_BITS)).astype(np.int64)


def parent(cell_id, level):
    """Ancestor at ``level`` (sphere.py CellId.parent): (id & −lsb) | lsb."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    new_lsb = lsb_for_level(level)
    return (cell_id & (~new_lsb + _u(1))) | new_lsb


def child(cell_id, pos):
    """Child ``pos`` ∈ 0..3 (sphere.py CellId.child): id − 3·lsb' + 2·pos·lsb'
    (id ≥ 4·lsb', so the subtraction never underflows)."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    new_lsb = lsb(cell_id) >> _u(2)
    pos = np.asarray(pos).astype(np.uint64)
    return cell_id - _u(3) * new_lsb + _u(2) * pos * new_lsb


def child_begin(cell_id, level):
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    old_lsb = lsb(cell_id)
    return cell_id - old_lsb + lsb_for_level(level)


def child_end(cell_id, level):
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    old_lsb = lsb(cell_id)
    return cell_id + old_lsb + lsb_for_level(level)


def range_min(cell_id):
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    return cell_id - (lsb(cell_id) - _u(1))


def range_max(cell_id):
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    return cell_id + (lsb(cell_id) - _u(1))


def contains(cell_id, other):
    """cell contains other ⇔ range_min ≤ other ≤ range_max (SURVEY §1.1)."""
    return (range_min(cell_id) <= np.asarray(other, dtype=np.uint64)) & (
        np.asarray(other, dtype=np.uint64) <= range_max(cell_id)
    )


def advance(cell_id, n):
    """Advance n positions in Hilbert order at this cell's level."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    step = lsb(cell_id) << _u(1)
    n = np.asarray(n)
    signed = cell_id.astype(np.int64) + n * step.astype(np.int64)
    return signed.astype(np.uint64)


def get_size_ij(level):
    level = np.asarray(level, dtype=np.int64)
    return (np.int64(1) << (MAX_LEVEL - level)).astype(np.int64)


# ---------------------------------------------------------------------------
# Tokens (SURVEY §2.1 E3 → engine op E4)
# ---------------------------------------------------------------------------

_HEX = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
_HEX_VAL = np.full(256, 255, dtype=np.uint8)
for _c, _v in [(ord(c), i) for i, c in enumerate("0123456789abcdef")] + [
    (ord(c), i) for i, c in enumerate("0123456789ABCDEF")
]:
    _HEX_VAL[_c] = _v


def _token_bytes(cell_id):
    """Shared token-encode core: (utf8 data bytes, int64 offsets)."""
    cell_id = np.atleast_1d(np.asarray(cell_id, dtype=np.uint64))
    n = cell_id.shape[0]
    digits = np.empty((n, 16), dtype=np.uint8)
    for k in range(16):
        digits[:, k] = _HEX[
            ((cell_id >> _u(4 * (15 - k))) & _u(0xF)).astype(np.uint8)
        ]
    nz = cell_id != 0
    tz = np.zeros(n, dtype=np.int64)
    ctz_bits = np.zeros(n, dtype=np.int64)
    ctz_bits[nz] = np.log2(lsb(cell_id[nz]).astype(np.float64)).astype(np.int64)
    tz[nz] = ctz_bits[nz] >> 2  # trailing zero nibbles
    lengths = np.where(nz, 16 - tz, 1)
    col = np.arange(16)
    mask = col[None, :] < lengths[:, None]
    digits[~nz, 0] = ord("X")
    data = digits[mask]
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return data, offsets


def token_from_cell_id(cell_id):
    """Vectorized token encode: 16 hex digits, trailing zeros stripped.

    Returns a list of Python strings (compat path; batch stages use
    :func:`token_array_from_cell_id` to skip the per-row str slicing).
    Token of id 0 is "X" (sphere.py CellId.to_token).
    """
    data, offsets = _token_bytes(cell_id)
    flat = data.tobytes().decode("ascii")
    return [flat[offsets[r] : offsets[r + 1]] for r in range(len(offsets) - 1)]


def token_array_from_cell_id(cell_id):
    """Token encode straight into an Arrow string array — the (offsets,
    data) buffers are handed to Arrow without materializing Python
    strings.  Same values as ``token_from_cell_id`` (cross-pinned in
    tests).  Tokens are ≤16 B/row, so int32 offsets hold for any block
    below ~134M rows — far past the 250k-row block target."""
    import pyarrow as pa

    data, offsets = _token_bytes(cell_id)
    if offsets[-1] > np.iinfo(np.int32).max:  # pragma: no cover
        raise ValueError("token block exceeds int32 offsets; split batches")
    return pa.Array.from_buffers(
        pa.string(),
        len(offsets) - 1,
        [None, pa.py_buffer(offsets.astype(np.int32)), pa.py_buffer(data)],
    )


def token_to_cell_id_array(tokens):
    """Vectorized token decode: right-pad to 16 hex digits → uint64 ids.

    Accepts an Arrow string array/chunked array (zero per-row Python —
    nibble math over the raw UTF-8 buffer) or any sequence of str
    (converted once).  ``None``/``""``/``"X"``/``"x"`` decode to 0, the
    inverse of ``token_from_cell_id``'s id-0 convention."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(tokens, pa.ChunkedArray):
        arr = tokens.combine_chunks()
    elif isinstance(tokens, pa.Array):
        arr = tokens
    else:
        arr = pa.array(list(tokens), pa.string())
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    invalid = pc.or_(
        pc.is_null(arr), pc.is_in(arr, value_set=pa.array(["", "X", "x"]))
    )
    arr = pc.if_else(invalid, "0000000000000000", arr)
    max_len = pc.max(pc.utf8_length(arr)).as_py()
    if max_len is not None and max_len > 16:
        # rpad never truncates; a >16-char token would misalign the
        # dense nibble matrix and corrupt every later row
        raise ValueError("token longer than 16 hex digits")
    arr = pc.ascii_rpad(arr, width=16, padding="0")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offs = np.frombuffer(arr.buffers()[1], np.int32)
    off0 = int(offs[arr.offset])
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    # every row is exactly 16 bytes after the pad, so the value buffer
    # slice is a dense (n, 16) nibble matrix; all math stays uint8
    nib = data[off0 : off0 + 16 * n].reshape(n, 16) - np.uint8(48)
    nib[nib >= 49] -= np.uint8(39)  # 'a'-'f'
    nib[nib >= 17] -= np.uint8(7)  # 'A'-'F'
    if nib.size and nib.max() > 15:
        # non-hex byte (the scalar path's int(t, 16) ValueError)
        raise ValueError("token holds a non-hex character")
    out = np.zeros(n, dtype=np.uint64)
    for k in range(16):  # 16 vector shifts, not a per-row loop
        out = (out << np.uint64(4)) | nib[:, k]
    return out


# ---------------------------------------------------------------------------
# Neighbors (SURVEY §2.1 E9 → engine op E10)
# ---------------------------------------------------------------------------


def _from_face_ij_wrap(face, i, j):
    """from_face_ij with cross-face wrapping (sphere.py from_face_ij_wrap).

    Converts the (possibly out-of-range) ij to the linear-projection (u,v),
    maps through xyz to the correct face, and re-derives ij there — the
    linear projection is deliberate (matches reference semantics).
    """
    i = np.clip(np.asarray(i, dtype=np.int64), -1, MAX_SIZE)
    j = np.clip(np.asarray(j, dtype=np.int64), -1, MAX_SIZE)
    scale = 1.0 / MAX_SIZE
    limit = np.nextafter(1.0, 2.0)
    u = np.clip(scale * (2.0 * i + 1.0 - MAX_SIZE), -limit, limit)
    v = np.clip(scale * (2.0 * j + 1.0 - MAX_SIZE), -limit, limit)
    x, y, z = face_uv_to_xyz(face, u, v)
    nface, nu, nv = xyz_to_face_uv(x, y, z)
    ni = st_to_ij(0.5 * (nu + 1.0))
    nj = st_to_ij(0.5 * (nv + 1.0))
    return cell_id_from_face_ij(nface, ni, nj)


def _from_face_ij_same(face, i, j, same_face):
    out = np.empty(np.asarray(face).shape, dtype=np.uint64)
    same_face = np.asarray(same_face)
    if np.any(same_face):
        ids_in = cell_id_from_face_ij(
            np.where(same_face, face, 0),
            np.where(same_face, np.maximum(i, 0), 0),
            np.where(same_face, np.maximum(j, 0), 0),
        )
        out[same_face] = ids_in[same_face]
    wrap = ~same_face
    if np.any(wrap):
        fa = np.asarray(face)
        ia = np.asarray(i)
        ja = np.asarray(j)
        out[wrap] = _from_face_ij_wrap(fa[wrap], ia[wrap], ja[wrap])
    return out


def edge_neighbors(cell_id):
    """4 edge neighbors at the cell's own level (sphere.py get_edge_neighbors).

    Returns array shape (n, 4) of uint64.
    """
    cell_id = np.atleast_1d(np.asarray(cell_id, dtype=np.uint64))
    lvl = level(cell_id)
    size = get_size_ij(lvl)
    f, i, j, _ = cell_id_to_face_ij_orientation(cell_id)
    n = cell_id.shape[0]
    out = np.empty((n, 4), dtype=np.uint64)
    out[:, 0] = parent(_from_face_ij_same(f, i, j - size, j - size >= 0), lvl)
    out[:, 1] = parent(_from_face_ij_same(f, i + size, j, i + size < MAX_SIZE), lvl)
    out[:, 2] = parent(_from_face_ij_same(f, i, j + size, j + size < MAX_SIZE), lvl)
    out[:, 3] = parent(_from_face_ij_same(f, i - size, j, i - size >= 0), lvl)
    return out


def all_neighbors(cell_id, nbr_level=None):
    """8 surrounding neighbors at ``nbr_level`` ≥ own level (may repeat at cube
    corners — callers dedupe), per sphere.py get_all_neighbors.

    Returns array shape (n, 8) of uint64.
    """
    cell_id = np.atleast_1d(np.asarray(cell_id, dtype=np.uint64))
    lvl = level(cell_id)
    if nbr_level is None:
        nbr_lvl = lvl
    else:
        nbr_lvl = np.broadcast_to(np.asarray(nbr_level, dtype=np.int64), lvl.shape)
    size = get_size_ij(lvl)
    nbr_size = get_size_ij(nbr_lvl)
    f, i, j, _ = cell_id_to_face_ij_orientation(cell_id)
    i = i & ~(size - 1)
    j = j & ~(size - 1)
    n = cell_id.shape[0]
    out = np.empty((n, 8), dtype=np.uint64)
    jm_ok = j - nbr_size >= 0  # reference checks j-size>=0; equal at same level
    jp_ok = j + size < MAX_SIZE
    im_ok = i - nbr_size >= 0
    ip_ok = i + size < MAX_SIZE
    offs = [
        (-1, -1, jm_ok & im_ok),
        (0, -1, jm_ok),
        (1, -1, jm_ok & ip_ok),
        (-1, 0, im_ok),
        (1, 0, ip_ok),
        (-1, 1, jp_ok & im_ok),
        (0, 1, jp_ok),
        (1, 1, jp_ok & ip_ok),
    ]
    for idx, (di, dj, same) in enumerate(offs):
        ii = i + (di * nbr_size if di < 0 else di * size)
        jj = j + (dj * nbr_size if dj < 0 else dj * size)
        out[:, idx] = parent(_from_face_ij_same(f, ii, jj, same), nbr_lvl)
    return out


def vertex_neighbors(cell_id, nbr_level):
    """Neighbors sharing the vertex closest to each cell's center, at the
    coarser ``nbr_level`` (sphere.py get_vertex_neighbors; scalar twin
    ``geometry.CellId.get_vertex_neighbors`` — cross-tested).

    Returns array shape (n, 4) of uint64; column 3 is the 0 SENTINEL
    where the diagonal neighbor does not exist (neither i- nor j-offset
    stays on the face — cube corners).  Callers drop zeros.
    """
    cell_id = np.atleast_1d(np.asarray(cell_id, dtype=np.uint64))
    f, i, j, _ = cell_id_to_face_ij_orientation(cell_id)
    halfsize = int(get_size_ij(np.int64(nbr_level + 1)))
    size = halfsize << 1
    ihalf = (i & halfsize) != 0
    jhalf = (j & halfsize) != 0
    ioffset = np.where(ihalf, size, -size).astype(np.int64)
    isame = np.where(ihalf, i + size < MAX_SIZE, i - size >= 0)
    joffset = np.where(jhalf, size, -size).astype(np.int64)
    jsame = np.where(jhalf, j + size < MAX_SIZE, j - size >= 0)
    n = cell_id.shape[0]
    out = np.empty((n, 4), dtype=np.uint64)
    out[:, 0] = parent(cell_id, nbr_level)
    out[:, 1] = parent(
        _from_face_ij_same(f, i + ioffset, j, isame), nbr_level
    )
    out[:, 2] = parent(
        _from_face_ij_same(f, i, j + joffset, jsame), nbr_level
    )
    diag = parent(
        _from_face_ij_same(f, i + ioffset, j + joffset, isame & jsame),
        nbr_level,
    )
    out[:, 3] = np.where(isame | jsame, diag, np.uint64(0))
    return out


# ---------------------------------------------------------------------------
# Great-circle distance (SURVEY §2.1 B3 — LatLng.get_distance)
# ---------------------------------------------------------------------------


def haversine_rad(lat1_deg, lng1_deg, lat2_deg, lng2_deg):
    """Great-circle distance in radians between degree coordinate columns."""
    lat1 = np.deg2rad(np.asarray(lat1_deg, dtype=np.float64))
    lat2 = np.deg2rad(np.asarray(lat2_deg, dtype=np.float64))
    dlat = lat2 - lat1
    dlng = np.deg2rad(
        np.asarray(lng2_deg, dtype=np.float64) - np.asarray(lng1_deg, dtype=np.float64)
    )
    a = np.sin(dlat * 0.5) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlng * 0.5) ** 2
    return 2.0 * np.arcsin(np.minimum(1.0, np.sqrt(a)))
