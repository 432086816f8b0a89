"""Generated DuckDB SQL that reproduces the S2 cell-token computation.

This upgrades cell-token queries from rows-only checks to exact oracle
checks: the SQL performs the whole encode chain — lat/lng → xyz → cube face
→ quadratic (u,v) → (s,t) → leaf (i,j) → 4-bits-at-a-time Hilbert encode
via the embedded 1024-entry LOOKUP_POS table (8 chained joins) → ancestor
at ``level`` → hex token — mirroring cells.py op-for-op so results match
bit-for-bit (the only nondeterminism is libm-vs-numpy trig at ~1 ulp,
which flips a level-L token with probability ~2^(2L−60) per point).

Restriction: ``level`` must be EVEN, so the ancestor id is A·2^m with
m = 2·(30−level) divisible by 4 and the 16-digit hex token reduces to
``rtrim(lpad(hex(A)), '0')`` entirely within BIGINT range.
"""

from __future__ import annotations

import numpy as np

from . import cells as ck


def _lookup_values() -> str:
    rows = ",".join(
        f"({i},{int(v)})" for i, v in enumerate(ck.LOOKUP_POS_PY)
    )
    return f"(VALUES {rows})"


def _lookup_ij_values() -> str:
    rows = ",".join(
        f"({i},{int(v)})" for i, v in enumerate(ck.LOOKUP_IJ_PY)
    )
    return f"(VALUES {rows})"


def s2_neighbors_sql(level: int, points_sql: str, id_col: str = "doc_id") -> str:
    """SQL producing ``({id_col}, neighbor_token)`` — the 4 edge neighbors
    of each point's level-``level`` cell, mirroring cells.py
    ``edge_neighbors`` bit-for-bit (upgrades q_neighbors_l8 from rows-only
    to an exact oracle).

    Chain: encode point → level cell id (reuses :func:`s2_token_sql`'s
    leaf key ``n`` = id>>1) → inverse Hilbert decode to the cell's leaf
    (face, i, j) via 8 chained joins against the embedded 1024-entry
    LOOKUP_IJ table → i/j ± cell size in the 4 lateral directions →
    same-face re-encode, or the cross-face wrap (clip → LINEAR (u,v)
    projection → xyz → dominant-axis face → exact-IEEE divisions →
    st → ij, sphere.py from_face_ij_wrap semantics — mul/div only, no
    trig, so DuckDB and numpy agree bit-for-bit) → Hilbert re-encode →
    ancestor at ``level`` → hex token. Orientation is NOT decoded (edge
    neighbors never read it). Works in id>>1 space throughout so every
    intermediate fits signed BIGINT even on faces 4–5.
    """
    if level % 2 != 0 or not 2 <= level <= 28:
        raise ValueError("SQL neighbor oracle requires an even level in [2, 28]")
    m = 2 * (30 - level)
    width = 16 - m // 4
    max_size = ck.MAX_SIZE
    size = 1 << (30 - level)
    lim = repr(float(np.nextafter(1.0, 2.0)))
    fmax = f"{float(max_size)!r}"

    # --- inverse Hilbert: h (= id>>1) → (face, i, j), 8 LOOKUP_IJ joins.
    dec = [
        f"d0 AS (SELECT {id_col}, h, CAST(h >> 60 AS BIGINT) AS face,"
        " (h >> 60) & 1 AS bits, CAST(0 AS BIGINT) AS i,"
        " CAST(0 AS BIGINT) AS j FROM h8)"
    ]
    prev = "d0"
    for k in range(7, -1, -1):
        nxt = f"d{8 - k}"
        # k=7 consumes the 2 level-0/1 bits (mask 15 after the id>>1 shift
        # folds the face lsb away), lower k's consume full 4-level nibbles.
        mask = 15 if k == 7 else 255
        dec.append(
            f"{nxt} AS (SELECT {id_col}, h, face,"
            f" CAST(luti.v & 3 AS BIGINT) AS bits,"
            f" i | ((CAST(luti.v AS BIGINT) >> 6) << {k * 4}) AS i,"
            f" j | (((CAST(luti.v AS BIGINT) >> 2) & 15) << {k * 4}) AS j"
            f" FROM {prev} JOIN luti ON luti.k ="
            f" bits + ((h >> {k * 8}) & {mask}) * 4)"
        )
        prev = nxt
    dec_sql = ",".join(dec)

    # --- forward Hilbert re-encode of the (possibly wrapped) neighbor ij.
    enc = [
        f"e0 AS (SELECT {id_col}, CAST(f2 * {1 << 60} AS BIGINT) AS n,"
        " f2 & 1 AS bits, i2, j2 FROM pick)"
    ]
    prev_e = "e0"
    for k in range(7, -1, -1):
        nxt = f"e{8 - k}"
        enc.append(
            f"{nxt} AS (SELECT {id_col},"
            f" n | ((CAST(lutp.v AS BIGINT) >> 2) << {k * 8}) AS n,"
            f" lutp.v & 3 AS bits, i2, j2"
            f" FROM {prev_e} JOIN lutp ON lutp.k ="
            f" bits + ((i2 >> {k * 4}) & 15) * 64 + ((j2 >> {k * 4}) & 15) * 4)"
        )
        prev_e = nxt
    enc_sql = ",".join(enc)

    return (
        f"WITH lutp(k, v) AS {_lookup_values()},"
        f" luti(k, v) AS {_lookup_ij_values()},"
        f" enc AS (SELECT {id_col}, n FROM ({s2_token_sql(level, points_sql, id_col)})),"
        f" h8 AS (SELECT {id_col}, ((n >> {m - 1}) | 1) << {m - 1} AS h FROM enc),"
        f" {dec_sql},"
        # 4 lateral directions × cell size at this level.
        f" nb AS (SELECT {id_col}, face, i + di * {size} AS ii,"
        f" j + dj * {size} AS jj FROM {prev} CROSS JOIN"
        " (VALUES (0, -1), (1, 0), (0, 1), (-1, 0)) AS dirs(di, dj)),"
        f" sm AS (SELECT {id_col}, face, ii, jj,"
        f" (ii >= 0 AND ii < {max_size} AND jj >= 0 AND jj < {max_size})"
        " AS same FROM nb),"
        # Cross-face wrap: clip → linear uv (computed for every row; only
        # selected when NOT same — all ops are total, no div-by-zero).
        f" wr0 AS (SELECT *, GREATEST(-1, LEAST(ii, {max_size})) AS icl,"
        f" GREATEST(-1, LEAST(jj, {max_size})) AS jcl FROM sm),"
        f" wr1 AS (SELECT {id_col}, face, ii, jj, same,"
        f" LEAST(GREATEST((1.0 / {fmax}) * ((2.0 * icl + 1.0) - {fmax}),"
        f" -{lim}), {lim}) AS uw,"
        f" LEAST(GREATEST((1.0 / {fmax}) * ((2.0 * jcl + 1.0) - {fmax}),"
        f" -{lim}), {lim}) AS vw FROM wr0),"
        f" xyzc AS (SELECT {id_col}, ii, jj, same, face,"
        " CASE face WHEN 0 THEN 1.0 WHEN 1 THEN -uw WHEN 2 THEN -uw"
        " WHEN 3 THEN -1.0 WHEN 4 THEN vw ELSE vw END AS x,"
        " CASE face WHEN 0 THEN uw WHEN 1 THEN 1.0 WHEN 2 THEN -vw"
        " WHEN 3 THEN -vw WHEN 4 THEN -1.0 ELSE uw END AS y,"
        " CASE face WHEN 0 THEN vw WHEN 1 THEN vw WHEN 2 THEN 1.0"
        " WHEN 3 THEN -uw WHEN 4 THEN -uw ELSE -1.0 END AS z FROM wr1),"
        f" nf AS (SELECT *, CASE WHEN abs(x) > abs(y) THEN"
        " (CASE WHEN abs(x) > abs(z) THEN 0 ELSE 2 END) ELSE"
        " (CASE WHEN abs(y) > abs(z) THEN 1 ELSE 2 END) END AS fz FROM xyzc),"
        f" nfc AS (SELECT *, CASE WHEN"
        " (CASE fz WHEN 0 THEN x WHEN 1 THEN y ELSE z END) < 0.0"
        " THEN fz + 3 ELSE fz END AS nface FROM nf),"
        f" nuv AS (SELECT {id_col}, ii, jj, same, face, nface,"
        " CASE nface WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z"
        " WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS nu,"
        " CASE nface WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z"
        " WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS nv FROM nfc),"
        f" nij AS (SELECT {id_col}, ii, jj, same, face, nface,"
        f" GREATEST(0, LEAST({max_size - 1},"
        f" CAST(floor({fmax} * (0.5 * (nu + 1.0))) AS BIGINT))) AS ni,"
        f" GREATEST(0, LEAST({max_size - 1},"
        f" CAST(floor({fmax} * (0.5 * (nv + 1.0))) AS BIGINT))) AS nj FROM nuv),"
        f" pick AS (SELECT {id_col},"
        " CASE WHEN same THEN face ELSE nface END AS f2,"
        " CASE WHEN same THEN ii ELSE ni END AS i2,"
        " CASE WHEN same THEN jj ELSE nj END AS j2 FROM nij),"
        f" {enc_sql}"
        f" SELECT {id_col},"
        f" rtrim(format('{{:0{width}x}}', (n >> {m - 1}) | 1), '0')"
        f" AS neighbor_token FROM {prev_e}"
    )


def s2_token_sql(level: int, points_sql: str, id_col: str = "doc_id") -> str:
    """SQL producing ``({id_col}, cell_token)`` at an even ``level``.

    ``points_sql`` must select ``{id_col}, lat, lng`` (degrees).
    """
    if level % 2 != 0:
        raise ValueError("SQL token oracle requires an even level")
    m = 2 * (30 - level)
    width = 16 - m // 4
    max_size = ck.MAX_SIZE
    if m == 0:
        # Leaf level: id = 2n+1 may exceed int64 (faces 4-5). Build the hex
        # from n piecewise: id >> 4 = n >> 3 (fits BIGINT) and the last
        # nibble is 2·(n&7)+1 — always odd, so nothing strips.
        token_expr = (
            "format('{:015x}', n >> 3) || format('{:x}', (n & 7) * 2 + 1)"
        )
    else:
        token_expr = f"rtrim(format('{{:0{width}x}}', (n >> {m - 1}) | 1), '0')"

    # Hilbert chain: thread (n_acc, bits) through 8 lookup joins.
    chain = []
    prev = "s0"
    chain.append(
        f"s0 AS (SELECT {id_col}, face, i, j, CAST(face * {1 << 60} AS BIGINT)"
        f" AS n, face & 1 AS bits FROM ij)"
    )
    for k in range(7, -1, -1):
        nxt = f"s{8 - k}"
        chain.append(
            f"{nxt} AS (SELECT {id_col}, face, i, j,"
            f" n | ((CAST(lut.v AS BIGINT) >> 2) << {k * 8}) AS n,"
            f" lut.v & 3 AS bits"
            f" FROM {prev} JOIN lut ON lut.k ="
            f" bits + ((i >> {k * 4}) & 15) * 64 + ((j >> {k * 4}) & 15) * 4)"
        )
        prev = nxt
    chain_sql = ",".join(chain)

    return (
        f"WITH lut(k, v) AS {_lookup_values()},"
        f" pts AS ({points_sql}),"
        f" xyz AS (SELECT {id_col},"
        " cos(radians(lng)) * cos(radians(lat)) AS x,"
        " sin(radians(lng)) * cos(radians(lat)) AS y,"
        " sin(radians(lat)) AS z FROM pts),"
        f" f0 AS (SELECT {id_col}, x, y, z,"
        " CASE WHEN abs(x) > abs(y) THEN (CASE WHEN abs(x) > abs(z) THEN 0"
        " ELSE 2 END) ELSE (CASE WHEN abs(y) > abs(z) THEN 1 ELSE 2 END) END"
        " AS fc FROM xyz),"
        f" fce AS (SELECT {id_col}, x, y, z, CASE WHEN"
        " (CASE fc WHEN 0 THEN x WHEN 1 THEN y ELSE z END) < 0.0"
        " THEN fc + 3 ELSE fc END AS face FROM f0),"
        f" uv AS (SELECT {id_col}, face,"
        " CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z"
        " WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u,"
        " CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z"
        " WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v FROM fce),"
        f" st AS (SELECT {id_col}, face,"
        " CASE WHEN u >= 0.0 THEN 0.5 * sqrt(1.0 + 3.0 * u)"
        " ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * u) END AS s,"
        " CASE WHEN v >= 0.0 THEN 0.5 * sqrt(1.0 + 3.0 * v)"
        " ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * v) END AS t FROM uv),"
        f" ij AS (SELECT {id_col}, face,"
        f" GREATEST(0, LEAST({max_size - 1},"
        f" CAST(floor({max_size} * s) AS BIGINT))) AS i,"
        f" GREATEST(0, LEAST({max_size - 1},"
        f" CAST(floor({max_size} * t) AS BIGINT))) AS j FROM st),"
        f" {chain_sql}"
        f" SELECT {id_col}, n,"
        f" {token_expr}"
        f" AS cell_token FROM {prev}"
    )
