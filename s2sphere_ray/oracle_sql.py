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

from . import cells as ck


def _lookup_values() -> str:
    rows = ",".join(
        f"({i},{int(v)})" for i, v in enumerate(ck.LOOKUP_POS_PY)
    )
    return f"(VALUES {rows})"


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
