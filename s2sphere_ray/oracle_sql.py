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


def s2_leafpos_sql(points_sql: str, id_col: str = "doc_id") -> str:
    """SQL producing ``({id_col}, n)`` — the 61-bit leaf position
    ``face·2^60 | hilbert_pos`` (fits BIGINT; the full uint64 leaf id is
    ``2n+1``).  ``points_sql`` must select ``{id_col}, lat, lng``
    (degrees).  The shared encode core: lat/lng → xyz → cube face →
    quadratic (u,v) → (s,t) → leaf (i,j) → 8 chained Hilbert lookup
    joins, mirroring cells.py bit-for-bit."""
    max_size = ck.MAX_SIZE
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
        f" SELECT {id_col}, n FROM {prev}"
    )


def s2_token_sql(level: int, points_sql: str, id_col: str = "doc_id") -> str:
    """SQL producing ``({id_col}, n, cell_token)`` at an even ``level``.

    ``points_sql`` must select ``{id_col}, lat, lng`` (degrees).
    """
    if level % 2 != 0:
        raise ValueError("SQL token oracle requires an even level")
    m = 2 * (30 - level)
    width = 16 - m // 4
    if m == 0:
        # Leaf level: id = 2n+1 may exceed int64 (faces 4-5). Build the hex
        # from n piecewise: id >> 4 = n >> 3 (fits BIGINT) and the last
        # nibble is 2·(n&7)+1 — always odd, so nothing strips.
        token_expr = (
            "format('{:015x}', n >> 3) || format('{:x}', (n & 7) * 2 + 1)"
        )
    else:
        token_expr = f"rtrim(format('{{:0{width}x}}', (n >> {m - 1}) | 1), '0')"
    return (
        f"SELECT {id_col}, n, {token_expr} AS cell_token"
        f" FROM ({s2_leafpos_sql(points_sql, id_col)})"
    )


# ---------------------------------------------------------------------------
# Near-duplicate sketch oracles: MinHash-LSH / SimHash replayed in SQL.
# ---------------------------------------------------------------------------

_M64 = "18446744073709551616"  # 2^64 (uint64 wraparound modulus)
_M61S = "2305843009213693951"  # 2^61 - 1 (minhash permutation modulus)
_FNV_P = "1099511628211"  # FNV-1a prime (token hash + rolling combine)
_FNV_OFF = "14695981039346656037"  # FNV-1a offset basis


def _hex_byte_values() -> str:
    rows = ",".join(f"('{i:02X}',{i})" for i in range(256))
    return f"(VALUES {rows})"


def _minhash_perm_values(num_hashes: int, seed: int) -> str:
    """The EXACT affine permutation constants MinHashStage builds
    (functions/dedup.py:310-313): default_rng(seed) uint64 draws."""
    rng = np.random.default_rng(seed)
    m61 = (1 << 61) - 1
    a = rng.integers(1, m61, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, m61, size=num_hashes, dtype=np.uint64)
    rows = ",".join(f"({j},{int(a[j])},{int(b[j])})" for j in range(num_hashes))
    return f"(VALUES {rows})"


def _sketch_ctes(
    docs_sql: str, num_hashes: int, bands: int, shingle_n: int, seed: int
) -> str:
    """The shared CTE chain from raw ``(doc_id, text, …)`` rows to the
    banded-LSH candidate-pair set ``cands(id_a, id_b)``, replaying
    functions/dedup.py bit-for-bit:

    - FNV-1a token hashing byte-by-byte via a recursive CTE over a
      256-row hex LUT (``fnv_over_offsets``, dedup.py:60-125);
    - word-``shingle_n``-gram rolling uint64 combine with the short-doc
      token fallback and the empty-doc 0 sentinel (``_shingle_batch``,
      dedup.py:170-222);
    - the affine (a·h+b) mod 2^61−1 permutations with the EXACT
      default_rng(seed) constants (``MinHashStage``, dedup.py:307-341);
    - the per-band FNV-prime signature fold and the distinct a<b
      candidate emission (``explode_bands`` / ``bucket_pairs``,
      dedup.py:400-493; the star-run fallback only fires past 10k-row
      collision runs, far beyond oracle scale, and preserves the a<b
      pair set shape it emits).

    Tokenization: ``\\s+`` regex split (ASCII whitespace) — matches
    ``utf8_split_whitespace`` on ASCII corpora (the testdata domain);
    Unicode-only whitespace (U+00A0 …) would diverge and is absent from
    the generated tables.

    Exposes (for extension by the callers): ``src`` (the raw docs rows),
    ``seq`` (doc_id, pos, token hash), ``ntok``, ``alldocs``, ``shing``
    (distinct shingle sets), ``sigs``, ``bh``, ``cands``.  Callers embed
    this inside ``WITH RECURSIVE …`` and append their own CTEs.
    """
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    rpb = num_hashes // bands
    # Rolling n-gram combine ((h1*P + h2) mod 2^64)*P + h3 ... generic n.
    joins = ["FROM seq t0"]
    expr = "CAST(t0.h AS HUGEINT)"
    for k in range(1, shingle_n):
        joins.append(
            f"JOIN seq t{k} ON t{k}.doc_id = t0.doc_id"
            f" AND t{k}.pos = t0.pos + {k}"
        )
        expr = f"(({expr}) * {_FNV_P} + t{k}.h) % {_M64}"
    gram_sql = (
        f"SELECT t0.doc_id, CAST({expr} AS UBIGINT) AS sh " + " ".join(joins)
    )
    # Band hash: FNV-prime fold over the band's rows_per_band signature
    # values in j order (explode_bands, dedup.py:400-421).
    fold = f"CAST(MAX(CASE WHEN j % {rpb} = 0 THEN mh END) AS HUGEINT)"
    for c in range(1, rpb):
        fold = (
            f"(({fold}) * {_FNV_P} + MAX(CASE WHEN j % {rpb} = {c} THEN mh END))"
            f" % {_M64}"
        )
    return f"""
hx(hb, hv) AS MATERIALIZED {_hex_byte_values()},
perms(j, pa, pb) AS MATERIALIZED {_minhash_perm_values(num_hashes, seed)},
src AS MATERIALIZED ({docs_sql}),
toks0 AS MATERIALIZED (
  SELECT doc_id, i, list_extract(ws, i) AS tok
  FROM (SELECT doc_id, regexp_split_to_array(COALESCE(text, ''), '\\s+') AS ws
        FROM src) s,
       unnest(range(1, len(ws) + 1)) AS t(i)
  WHERE list_extract(ws, i) <> ''
),
toks AS MATERIALIZED (SELECT doc_id,
  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS pos, tok
  FROM toks0),
tokhex AS MATERIALIZED (SELECT tok, hex(encode(tok)) AS hs,
  octet_length(encode(tok)) AS nb
  FROM (SELECT DISTINCT tok FROM toks)),
fnv(tok, i, h) AS (
  SELECT tok, 0, CAST({_FNV_OFF} AS UBIGINT) FROM tokhex
  UNION ALL
  SELECT f.tok, f.i + 1,
    CAST((CAST(xor(f.h, CAST(hx.hv AS UBIGINT)) AS HUGEINT) * {_FNV_P})
         % {_M64} AS UBIGINT)
  FROM fnv f JOIN tokhex tx ON tx.tok = f.tok
  JOIN hx ON hx.hb = substr(tx.hs, f.i * 2 + 1, 2)
  WHERE f.i < tx.nb
),
tokh AS (SELECT f.tok, f.h FROM fnv f
  JOIN tokhex tx ON tx.tok = f.tok AND f.i = tx.nb),
seq AS MATERIALIZED (SELECT t.doc_id, t.pos, th.h FROM toks t
  JOIN tokh th ON th.tok = t.tok),
ntok AS MATERIALIZED (SELECT doc_id, COUNT(*) AS nt FROM seq GROUP BY doc_id),
alldocs AS (SELECT doc_id FROM src),
gN AS MATERIALIZED ({gram_sql}),
shing AS MATERIALIZED (
  SELECT DISTINCT doc_id, sh FROM gN
  UNION
  SELECT DISTINCT s.doc_id, s.h AS sh FROM seq s
    JOIN ntok USING (doc_id) WHERE ntok.nt < {shingle_n}
  UNION
  SELECT d.doc_id, CAST(0 AS UBIGINT) FROM alldocs d
    LEFT JOIN ntok USING (doc_id) WHERE ntok.doc_id IS NULL
),
sigs AS MATERIALIZED (SELECT doc_id, j,
  MIN(CAST((CAST(sh AS HUGEINT) * pa + pb) % {_M64} % {_M61S} AS UBIGINT))
    AS mh
  FROM shing CROSS JOIN perms GROUP BY doc_id, j),
bh AS MATERIALIZED (SELECT doc_id, CAST(j // {rpb} AS INTEGER) AS band,
  CAST(({fold}) AS UBIGINT) AS bhash
  FROM sigs GROUP BY doc_id, j // {rpb}),
cands AS MATERIALIZED (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bh a JOIN bh b ON b.band = a.band AND b.bhash = a.bhash
   AND a.doc_id < b.doc_id)"""


def neardup_pairs_sql(
    docs_sql: str = "SELECT doc_id, text FROM documents",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
    max_hamming: int = 3,
    seed: int = 42,
) -> str:
    """SQL producing ``(id_a, id_b, method)`` — the union of the
    MinHash-LSH (exact-Jaccard-verified) and SimHash pigeonhole
    near-duplicate pair streams.  Sketch chain: :func:`_sketch_ctes`;
    this wrapper adds the exact distinct-shingle Jaccard verification
    (``minhash_lsh_pairs`` verify="exact", dedup.py:344-) and the
    per-token-hash strict-majority bit voting + all-pairs hamming filter
    (``simhash_neardup_pairs``).

    All-pairs caveat: the SimHash leg joins ``simdocs × simdocs`` and the
    recursive FNV walks max(token bytes) iterations — an ORACLE for
    sf≤0.01-scale correctness replays, not a scalable implementation (the
    Ray side banding/pigeonhole IS the scale path).
    """
    body = _sketch_ctes(docs_sql, num_hashes, bands, shingle_n, seed)
    # SimHash: 64 per-bit vote columns, strict-majority sign.
    votes = ",".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE 0 END) AS v{b}"
        for b in range(64)
    )
    lo = " + ".join(
        f"(CASE WHEN 2 * v{b} > nt THEN {1 << b} ELSE 0 END)" for b in range(32)
    )
    hi = " + ".join(
        f"(CASE WHEN 2 * v{b} > nt THEN {1 << (b - 32)} ELSE 0 END)"
        for b in range(32, 64)
    )
    return f"""
WITH RECURSIVE
{body},
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS ns FROM shing
  GROUP BY doc_id),
inters AS (SELECT c.id_a, c.id_b, COUNT(*) AS ni
  FROM cands c JOIN shing sa ON sa.doc_id = c.id_a
               JOIN shing sb ON sb.doc_id = c.id_b AND sb.sh = sa.sh
  GROUP BY c.id_a, c.id_b),
mh_pairs AS (SELECT i.id_a, i.id_b FROM inters i
  JOIN sizes za ON za.doc_id = i.id_a
  JOIN sizes zb ON zb.doc_id = i.id_b
  WHERE CAST(i.ni AS DOUBLE) / (za.ns + zb.ns - i.ni)
        >= {jaccard_threshold!r}),
votes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS nt, {votes} FROM seq
  GROUP BY doc_id),
ssig AS (SELECT doc_id, {lo} AS lo, {hi} AS hi FROM votes),
simdocs AS MATERIALIZED (SELECT d.doc_id, COALESCE(s.lo, 0) AS lo,
  COALESCE(s.hi, 0) AS hi
  FROM alldocs d LEFT JOIN ssig s USING (doc_id)),
sim_pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM simdocs a JOIN simdocs b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
        <= {max_hamming})
SELECT id_a, id_b, 'minhash_lsh' AS method FROM mh_pairs
UNION ALL SELECT id_a, id_b, 'simhash' AS method FROM sim_pairs
"""


def curation_export_sql(
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
) -> str:
    """SQL producing ``(lang, n_docs)`` — the full q_curation_export
    pipeline replayed: quality gate (≥10 whitespace tokens, ≥30%%
    ASCII-alpha) → exact dedup by text keeping the min-doc_id ROW (lang
    travels with the survivor, matching exact_dedup's full-row filter,
    dedup.py:283-) → drop the id_b side of every verify="none" banded-LSH
    candidate pair over the deduped corpus (:func:`_sketch_ctes`'s
    ``cands`` — verify="none" consumes candidates unfiltered,
    dedup.py:489-) → per-language survivor counts.  The Ray side
    additionally round-trips the survivors through a lang-partitioned
    parquet write + manifest assert; the COUNTS are the query contract.
    """
    gate = (
        "SELECT doc_id, text, lang FROM documents"
        " WHERE CAST(len(string_split(text,' ')) AS BIGINT) >= 10"
        " AND CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS"
        " BIGINT) * 1000 // CAST(greatest(length(text), 1) AS BIGINT)"
        " >= 300"
    )
    dedup = (
        f"SELECT doc_id, text, lang FROM (SELECT q.*, ROW_NUMBER() OVER"
        f" (PARTITION BY text ORDER BY doc_id) AS rn FROM ({gate}) q)"
        f" WHERE rn = 1"
    )
    body = _sketch_ctes(dedup, num_hashes, bands, shingle_n, seed)
    return f"""
WITH RECURSIVE
{body}
SELECT lang, COUNT(*) AS n_docs FROM src
WHERE doc_id NOT IN (SELECT id_b FROM cands)
GROUP BY lang
"""


def _mulmod64(x_expr: str, c: int) -> str:
    """uint64 wraparound product ``x * c`` for an arbitrary uint64
    constant ``c`` — split into 32-bit halves so no intermediate exceeds
    HUGEINT (uint64 × uint64 overflows signed int128)."""
    c_lo = c & 0xFFFFFFFF
    two32 = 1 << 32
    return (
        f"(CAST(({x_expr}) % {two32} AS HUGEINT) * {c}"
        f" + ((CAST(({x_expr}) >> 32 AS HUGEINT) * {c_lo}) % {two32})"
        f" * {two32})"
    )


def hll_distinct_sql(
    vals_sql: str = "SELECT user_id AS v FROM events", p: int = 12
) -> str:
    """SQL producing ``(n_distinct_est)`` — the HyperLogLog estimate
    replayed exactly (functions/sketch.py): splitmix64 over the int64
    value (``_hash_column``), top-``p`` bits → register, leading-zero
    rank of the low ``64-p`` bits via exact bit length (``_rho``),
    max-merge per register, then the Flajolet small/large-range-corrected
    estimate.  INTEGER value columns only (string columns hash through
    the polynomial buffer hash, which this oracle does not replay).

    Float determinism: 2^-rho terms are exact powers of two; the sum
    order differs from numpy's pairwise sum by ≤1 ulp on ≤2^p terms and
    the estimate is rounded to an integer — a mismatch needs the true
    estimate within ~1e-10 of a .5 boundary.
    """
    m = 1 << p
    bits = 64 - p
    mask = (1 << bits) - 1
    c1 = 0x9E3779B97F4A7C15
    c2 = 0xBF58476D1CE4E5B9
    c3 = 0x94D049BB133111EB
    alpha = 0.7213 / (1 + 1.079 / m)
    return f"""
WITH vals AS (SELECT CAST((CAST(v AS HUGEINT) % {_M64} + {_M64}) % {_M64}
                          AS UBIGINT) AS x FROM ({vals_sql})),
z1 AS (SELECT CAST((CAST(x AS HUGEINT) + {c1}) % {_M64} AS UBIGINT) AS z
       FROM vals),
z2 AS (SELECT CAST(({_mulmod64("xor(z, z >> 30)", c2)}) % {_M64}
                   AS UBIGINT) AS z FROM z1),
z3 AS (SELECT CAST(({_mulmod64("xor(z, z >> 27)", c3)}) % {_M64}
                   AS UBIGINT) AS z FROM z2),
h AS (SELECT xor(z, z >> 31) AS h FROM z3),
rw AS (SELECT CAST(h >> {bits} AS BIGINT) AS reg,
              h & CAST({mask} AS UBIGINT) AS w FROM h),
regs AS (SELECT reg, MAX(CASE WHEN w = 0 THEN {bits + 1}
                              ELSE {bits} - length(bin(w)) + 1 END) AS rho
         FROM rw GROUP BY reg),
st AS (SELECT COUNT(*) AS present,
              SUM(power(2.0, -rho)) AS s FROM regs),
e0 AS (SELECT present,
              CAST({alpha!r} AS DOUBLE) * {m} * {m}
                / (s + ({m} - present)) AS est
       FROM st),
e1 AS (SELECT CASE
         WHEN est <= 2.5 * {m} AND present < {m}
           THEN {m} * ln(CAST({m} AS DOUBLE) / ({m} - present))
         WHEN est > CAST({(1 << 32) / 30.0!r} AS DOUBLE)
           THEN -{1 << 32} * ln(1.0 - est / {1 << 32})
         ELSE est END AS est FROM e0)
SELECT CAST(round(est) AS BIGINT) AS n_distinct_est FROM e1
"""


# ---------------------------------------------------------------------------
# CellUnion set-algebra oracle (G1-G4): normalize + pair algebra in SQL.
# ---------------------------------------------------------------------------

_MAXU = (1 << 64) - 1


def _lsb_expr(col: str) -> str:
    return f"({col} & (xor({col}, {_MAXU}) + 1))"


def _contained_removal_cte(name: str, src: str, keys: list[str]) -> str:
    """CellUnion._normalized's containment drop as one running-max window
    sweep: nested-or-disjoint ranges ordered by (range_min asc, range_max
    desc) put every container before its containees, so a cell is
    contained iff its range_max ≤ the max range_max of earlier rows."""
    kc = ", ".join(keys)
    return (
        f"{name} AS MATERIALIZED (SELECT {kc}, cell FROM ("
        f" SELECT {kc}, cell, rmax, MAX(rmax) OVER (PARTITION BY {kc}"
        f" ORDER BY rmin ASC, rmax DESC"
        f" ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax"
        f" FROM (SELECT {kc}, cell, cell - (l - 1) AS rmin,"
        f" cell + (l - 1) AS rmax"
        f" FROM (SELECT {kc}, cell, {_lsb_expr('cell')} AS l FROM {src})))"
        f" WHERE prevmax IS NULL OR rmax > prevmax)"
    )


def _collapse_round_ctes(
    prefix: str, src: str, keys: list[str], rounds: int
) -> tuple[list[str], str]:
    """CellUnion._normalized's complete-4-sibling collapse as ``rounds``
    unrolled fixpoint iterations (each lifts complete quads one level;
    cascades to the face level in ≤ max-input-level rounds — faces never
    collapse, matching ``not cid.is_face()``)."""
    kc = ", ".join(keys)
    ctes: list[str] = []
    prev = src
    for r in range(1, rounds + 1):
        p, gname, c = f"{prefix}p{r}", f"{prefix}g{r}", f"{prefix}c{r}"
        ctes.append(
            f"{p} AS (SELECT {kc}, cell, CASE WHEN l < {1 << 60} THEN"
            f" (cell & xor(4 * l - 1, {_MAXU})) | (4 * l) END AS par"
            f" FROM (SELECT {kc}, cell, {_lsb_expr('cell')} AS l"
            f" FROM {prev}))"
        )
        ctes.append(
            f"{gname} AS (SELECT {kc}, par FROM {p} WHERE par IS NOT NULL"
            f" GROUP BY {kc}, par HAVING COUNT(*) = 4)"
        )
        on = " AND ".join(f"g.{k} = p.{k}" for k in keys)
        pkeys = ", ".join(f"p.{k}" for k in keys)
        ctes.append(
            f"{c} AS MATERIALIZED ("
            f"SELECT {kc}, par AS cell FROM {gname}"
            f" UNION ALL SELECT {pkeys}, p.cell"
            f" FROM {p} p LEFT JOIN {gname} g ON {on} AND g.par = p.par"
            f" WHERE g.par IS NULL)"
        )
        prev = c
    return ctes, prev


def cellset_ops_sql(
    points_sql: str,
    level_even: int = 6,
    level_odd: int = 8,
    rounds: int = 9,
) -> str:
    """SQL producing ``(lang_a, lang_b, n_a, n_b, n_inter, n_union,
    n_diff_ab, n_diff_ba)`` — the q_cellset_ops derivation replayed
    independently end to end:

    - per-doc S2 cell via the in-SQL Hilbert encode
      (:func:`s2_leafpos_sql`) at ``level_even``/``level_odd`` by doc-id
      parity (full uint64 id = ``(n >> m) << (m+1) | 2^m``);
    - per-language CellUnion normalize (``CellUnion._normalized``,
      geometry.py:119-144): containment removal as a running-max window
      sweep + ``rounds`` unrolled quad-collapse iterations;
    - pair intersection per ``get_intersection`` (the deeper cell of
      every nested pair, both directions, deduped);
    - pair union = normalize of the concatenation (same machinery keyed
      by the pair);
    - pair differences per ``get_difference``: a recursive CTE
      subdividing partially-overlapping cells into 4 children until
      disjoint (kept) or contained (dropped) — depth bounded by the
      other union's deepest level.

    ``points_sql`` must select ``doc_id, lat, lng``; ``lang`` is joined
    from ``documents``.
    """
    m_e = 2 * (30 - level_even)
    m_o = 2 * (30 - level_odd)
    # id = (n >> m)·2^(m+1) + 2^m — via HUGEINT multiply (DuckDB's <<
    # overflow-checks against int64 even on UBIGINT operands).
    cell_e = (
        f"CAST(CAST(b.n >> {m_e} AS HUGEINT) * {1 << (m_e + 1)}"
        f" + {1 << m_e} AS UBIGINT)"
    )
    cell_o = (
        f"CAST(CAST(b.n >> {m_o} AS HUGEINT) * {1 << (m_o + 1)}"
        f" + {1 << m_o} AS UBIGINT)"
    )
    lang_ctes = [_contained_removal_cte("lnr0", "cells0", ["lang"])]
    cr, lang_final = _collapse_round_ctes("l", "lnr0", ["lang"], rounds)
    lang_ctes += cr
    pair_ctes = [_contained_removal_cte("pnr0", "pu0", ["la", "lb"])]
    cr, pair_final = _collapse_round_ctes("u", "pnr0", ["la", "lb"], rounds)
    pair_ctes += cr
    lsb_w = _lsb_expr("w.cell")
    other = "CASE WHEN w.dirn = 'ab' THEN w.lb ELSE w.la END"
    overlaps = (
        f"EXISTS (SELECT 1 FROM unir y WHERE y.lang = {other}"
        f" AND y.rmin <= w.cell + ({lsb_w} - 1)"
        f" AND y.rmax >= w.cell - ({lsb_w} - 1))"
    )
    contained = (
        f"EXISTS (SELECT 1 FROM unir y WHERE y.lang = {other}"
        f" AND y.rmin <= w.cell - ({lsb_w} - 1)"
        f" AND w.cell + ({lsb_w} - 1) <= y.rmax)"
    )
    return f"""
WITH RECURSIVE
base AS MATERIALIZED (SELECT doc_id, n FROM ({s2_leafpos_sql(points_sql)})),
cells0 AS MATERIALIZED (
  SELECT DISTINCT d.lang,
    CASE WHEN d.doc_id % 2 = 0 THEN {cell_e} ELSE {cell_o} END AS cell
  FROM base b JOIN documents d ON d.doc_id = b.doc_id),
{",".join(lang_ctes)},
uni AS MATERIALIZED (SELECT lang, cell FROM {lang_final}),
unir AS MATERIALIZED (SELECT lang, cell, cell - (l - 1) AS rmin,
  cell + (l - 1) AS rmax
  FROM (SELECT lang, cell, {_lsb_expr('cell')} AS l FROM uni)),
sizes AS (SELECT lang, COUNT(*) AS n_cells FROM uni GROUP BY lang),
pairs AS MATERIALIZED (SELECT a.lang AS la, b.lang AS lb FROM sizes a
  JOIN sizes b ON a.lang < b.lang),
inter AS (SELECT la, lb, COUNT(*) AS n_inter FROM (
  SELECT p.la, p.lb, x.cell FROM pairs p JOIN unir x ON x.lang = p.la
   WHERE EXISTS (SELECT 1 FROM unir y WHERE y.lang = p.lb
     AND y.rmin <= x.rmin AND x.rmax <= y.rmax)
  UNION
  SELECT p.la, p.lb, x.cell FROM pairs p JOIN unir x ON x.lang = p.lb
   WHERE EXISTS (SELECT 1 FROM unir y WHERE y.lang = p.la
     AND y.rmin <= x.rmin AND x.rmax <= y.rmax)) GROUP BY la, lb),
pu0 AS MATERIALIZED (SELECT DISTINCT p.la, p.lb, x.cell FROM pairs p
  JOIN uni x ON x.lang = p.la OR x.lang = p.lb),
{",".join(pair_ctes)},
usize AS (SELECT la, lb, COUNT(*) AS n_union FROM {pair_final}
  GROUP BY la, lb),
walk(la, lb, dirn, cell) AS (
  SELECT p.la, p.lb, d.dirn, x.cell FROM pairs p
    CROSS JOIN (VALUES ('ab'), ('ba')) d(dirn)
    JOIN uni x ON x.lang = CASE WHEN d.dirn = 'ab' THEN p.la ELSE p.lb END
  UNION ALL
  SELECT w.la, w.lb, w.dirn,
    w.cell - 3 * ({lsb_w} >> 2) + 2 * k.i * ({lsb_w} >> 2)
  FROM walk w CROSS JOIN (VALUES (CAST(0 AS UBIGINT)), (CAST(1 AS UBIGINT)),
    (CAST(2 AS UBIGINT)), (CAST(3 AS UBIGINT))) k(i)
  WHERE {overlaps} AND NOT {contained}
),
kept AS (SELECT la, lb, dirn, COUNT(*) AS n FROM walk w
  WHERE NOT {overlaps} GROUP BY la, lb, dirn)
SELECT p.la AS lang_a, p.lb AS lang_b,
  sa.n_cells AS n_a, sb.n_cells AS n_b,
  COALESCE(i.n_inter, 0) AS n_inter, u.n_union AS n_union,
  COALESCE(dab.n, 0) AS n_diff_ab, COALESCE(dba.n, 0) AS n_diff_ba
FROM pairs p
JOIN sizes sa ON sa.lang = p.la
JOIN sizes sb ON sb.lang = p.lb
LEFT JOIN inter i ON i.la = p.la AND i.lb = p.lb
JOIN usize u ON u.la = p.la AND u.lb = p.lb
LEFT JOIN kept dab ON dab.la = p.la AND dab.lb = p.lb AND dab.dirn = 'ab'
LEFT JOIN kept dba ON dba.la = p.la AND dba.lb = p.lb AND dba.dirn = 'ba'
"""


def bpe_leg_sql(num_merges: int = 8) -> str:
    """Unrolled BPE merge-round CTEs replaying functions/bpe.py
    bit-for-bit over the corpus word histogram (the classifier/pagerank
    unrolled-iteration idiom):

    - word histogram = single-space fields of ``documents.text``
      (``string_split``, matching ``pc.split_pattern(text, ' ')``);
    - initial symbols = UTF-8 BYTES of each word via the 256-row hex
      LUT (``_word_bytes``, bpe.py:90-108 — byte-level, so multibyte
      code points match numpy exactly);
    - per round k: freq-weighted adjacent-pair counts over the live
      symbol sequences (adjacency = next row in pos order —
      ``_pair_counts``), argmax with the (count DESC, packed ASC)
      tie-break (``_best_pair``), then greedy left-to-right
      non-overlapping replacement with new id 255+k — runs of
      consecutive matches keep every other one, the gaps-and-islands
      window replay of ``_apply_merge``'s parity rule;
    - outputs, long format (lang, n_docs): 'merge:kk' = packed (a<<32|b)
      per learned merge, 'mcnt:kk' = its count, 'ntok:<doc_id>' = each
      document's total BPE token count under the trained vocab
      (``bpe_token_counts``), 'tsum:<doc_id>' = the sum of its token
      IDS (pins ``bpe_encode``'s emitted id sequences, order-free).

    Rounds where no adjacent pair remains emit no merge/mcnt row and
    leave the state unchanged — the same early-stop the engine takes.
    """
    ctes = [
        "bpehx AS MATERIALIZED (SELECT h2, sym FROM "
        + _hex_byte_values()
        + " t(h2, sym))",
        "bpehist AS MATERIALIZED (SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq"
        " FROM (SELECT unnest(string_split(text, ' ')) AS w"
        " FROM documents) GROUP BY w)",
        "bpes0a AS MATERIALIZED (SELECT word, freq, hex(encode(word)) AS h,"
        " unnest(range(octet_length(encode(word)))) AS pos FROM bpehist)",
        "bpes0 AS MATERIALIZED (SELECT a.word, a.freq, a.pos,"
        " CAST(m.sym AS BIGINT) AS sym FROM bpes0a a"
        " JOIN bpehx m ON substr(a.h, CAST(2 * a.pos + 1 AS BIGINT), 2)"
        " = m.h2)",
    ]
    for k in range(1, num_merges + 1):
        p, nid = k - 1, 255 + k
        ctes += [
            f"bpea{k} AS MATERIALIZED (SELECT word, freq, pos, sym,"
            " ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS i,"
            " LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt"
            f" FROM bpes{p})",
            f"bpeb{k} AS MATERIALIZED (SELECT sym * 4294967296 + nxt AS packed,"
            f" SUM(freq) AS cnt FROM bpea{k} WHERE nxt IS NOT NULL"
            " GROUP BY 1)",
            f"bpebest{k} AS MATERIALIZED (SELECT packed, CAST(cnt AS BIGINT) AS cnt"
            f" FROM bpeb{k} ORDER BY cnt DESC, packed ASC LIMIT 1)",
            f"bpem{k} AS MATERIALIZED (SELECT a.word, a.i FROM bpea{k} a, bpebest{k} t"
            " WHERE a.sym = t.packed // 4294967296"
            " AND a.nxt = t.packed % 4294967296)",
            f"bpek{k} AS MATERIALIZED (SELECT word, i FROM (SELECT word, i,"
            " ROW_NUMBER() OVER (PARTITION BY word, i - rn ORDER BY i)"
            " AS rk FROM (SELECT word, i,"
            " ROW_NUMBER() OVER (PARTITION BY word ORDER BY i) AS rn"
            f" FROM bpem{k})) WHERE rk % 2 = 1)",
            f"bpes{k} AS MATERIALIZED (SELECT a.word, a.freq, a.i AS pos,"
            f" CASE WHEN x.i IS NOT NULL THEN {nid} ELSE a.sym END AS sym"
            f" FROM bpea{k} a"
            f" LEFT JOIN bpek{k} x ON x.word = a.word AND x.i = a.i"
            f" LEFT JOIN bpek{k} y ON y.word = a.word AND y.i = a.i - 1"
            " WHERE y.i IS NULL)",
        ]
    last = f"bpes{num_merges}"
    ctes += [
        f"bpevocab AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS nt,"
        f" CAST(SUM(sym) AS BIGINT) AS ts FROM {last} GROUP BY word)",
        "bpedt AS MATERIALIZED (SELECT doc_id, unnest(string_split(text, ' ')) AS w"
        " FROM documents)",
        "bpedoc AS MATERIALIZED (SELECT d.doc_id,"
        " CAST(COALESCE(SUM(v.nt), 0) AS BIGINT) AS nt,"
        " CAST(COALESCE(SUM(v.ts), 0) AS BIGINT) AS ts FROM bpedt d"
        " LEFT JOIN bpevocab v ON v.word = d.w GROUP BY d.doc_id)",
    ]
    legs = []
    for k in range(1, num_merges + 1):
        legs.append(
            f"SELECT 'merge:{k - 1:02d}' AS lang, packed AS n_docs"
            f" FROM bpebest{k}"
        )
        legs.append(f"SELECT 'mcnt:{k - 1:02d}', cnt FROM bpebest{k}")
    legs.append(
        "SELECT 'ntok:' || CAST(doc_id AS VARCHAR), nt FROM bpedoc"
    )
    legs.append(
        "SELECT 'tsum:' || CAST(doc_id AS VARCHAR), ts FROM bpedoc"
    )
    return "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(legs)


def _mulmod64_xy(x: str, y: str) -> str:
    """uint64 wraparound product of two COLUMN expressions (the constant
    variant ``_mulmod64`` cannot express): split both into 32-bit halves
    so no intermediate exceeds HUGEINT."""
    t = 1 << 32
    return (
        f"(CAST(({x}) % {t} AS HUGEINT) * CAST(({y}) % {t} AS HUGEINT)"
        f" + ((CAST(({x}) % {t} AS HUGEINT) * CAST(({y}) >> 32 AS HUGEINT)"
        f" + CAST(({x}) >> 32 AS HUGEINT) * CAST(({y}) % {t} AS HUGEINT))"
        f" % {t}) * {t})"
    )


def bloom_flag_sql(
    key_expr: str,
    m_bits: int = 1 << 10,
    k: int = 5,
    ref_mod: int = 3,
) -> str:
    """SQL producing ``(doc_id, lang)`` of new-shard documents
    (``doc_id % ref_mod != 0``) whose key (``key_expr`` over the
    ``documents`` view) probes positive against the Bloom bitmap built
    from the reference shard (``doc_id % ref_mod == 0``) — replaying
    functions/dedup.bloom_build / _bloom_positions /
    bloom_dedup_against bit for bit, INCLUDING false positives:

    - ``poly_hash_strings`` (dedup.py:57-125): key bytes → zero-padded
      little-endian uint64 words via the 256-row hex LUT,
      ``h = Σ word_j · r^(kw−1−j) mod 2^64`` with
      ``r = 0x9E3779B97F4A7C15`` (powers from a recursive CTE, variable
      × variable products via 32-bit-split ``_mulmod64_xy``), XOR the
      byte length, splitmix64 finalizer;
    - ``_bloom_positions``: ``h2 = ((h ^ h>>33)·0xFF51AFD7ED558CCD)|1``
      and k probe positions ``(h + i·h2) mod 2^64 & (m_bits−1)``;
    - membership: every one of the k probes present in the reference
      shard's distinct set-bit positions (``HAVING COUNT(*) = k`` over
      the probe→bit join — duplicate probe positions both match,
      exactly like the engine's ``bits.all(axis=1)``).
    """
    assert m_bits & (m_bits - 1) == 0
    r_const = 0x9E3779B97F4A7C15
    c2 = 0xBF58476D1CE4E5B9
    c3 = 0x94D049BB133111EB
    h2c = 0xFF51AFD7ED558CCD
    return f"""
WITH RECURSIVE
blhx(h2s, sym) AS (SELECT * FROM {_hex_byte_values()} t(h2s, sym)),
blk AS MATERIALIZED (SELECT doc_id, lang, {key_expr} AS key
  FROM documents),
bl0 AS MATERIALIZED (SELECT doc_id, lang, hex(encode(key)) AS hx,
  octet_length(encode(key)) AS len,
  (octet_length(encode(key)) + 7) // 8 AS kw FROM blk),
blpw(e, v) AS (SELECT 0, CAST(1 AS UBIGINT)
  UNION ALL SELECT e + 1,
    CAST({_mulmod64("v", r_const)} % {_M64} AS UBIGINT)
  FROM blpw WHERE e < (SELECT COALESCE(MAX(kw), 1) FROM bl0)),
blb AS MATERIALIZED (SELECT doc_id, p // 8 AS j, p % 8 AS i,
  CAST(m.sym AS HUGEINT) AS byte
  FROM (SELECT doc_id, hx, unnest(range(len)) AS p FROM bl0) b
  JOIN blhx m ON substr(b.hx, CAST(2 * p + 1 AS BIGINT), 2) = m.h2s),
blw AS MATERIALIZED (SELECT doc_id, j,
  CAST(SUM(byte << CAST(8 * i AS INTEGER)) AS UBIGINT) AS w
  FROM blb GROUP BY doc_id, j),
blsum AS MATERIALIZED (SELECT b.doc_id,
  CAST(SUM(CAST({_mulmod64_xy("w.w", "p.v")} % {_M64} AS HUGEINT))
       % {_M64} AS UBIGINT) AS hraw
  FROM blw w JOIN bl0 b ON b.doc_id = w.doc_id
  JOIN blpw p ON p.e = b.kw - 1 - w.j
  GROUP BY b.doc_id),
blz1 AS (SELECT b.doc_id,
  xor(CAST(COALESCE(s.hraw, 0) AS UBIGINT), CAST(b.len AS UBIGINT)) AS z
  FROM bl0 b LEFT JOIN blsum s ON s.doc_id = b.doc_id),
blz2 AS (SELECT doc_id,
  CAST({_mulmod64("xor(z, z >> 30)", c2)} % {_M64} AS UBIGINT) AS z
  FROM blz1),
blz3 AS (SELECT doc_id,
  CAST({_mulmod64("xor(z, z >> 27)", c3)} % {_M64} AS UBIGINT) AS z
  FROM blz2),
blh AS MATERIALIZED (SELECT doc_id, xor(z, z >> 31) AS h FROM blz3),
blh2 AS MATERIALIZED (SELECT doc_id, h,
  xor(CAST({_mulmod64("xor(h, h >> 33)", h2c)} % {_M64} AS UBIGINT),
      CAST(0 AS UBIGINT)) | CAST(1 AS UBIGINT) AS h2
  FROM blh),
blprobe AS MATERIALIZED (SELECT doc_id, t.i,
  CAST((CAST(h AS HUGEINT) + t.i * CAST(h2 AS HUGEINT)) % {_M64}
       AS UBIGINT) & CAST({m_bits - 1} AS UBIGINT) AS pos
  FROM blh2, unnest(range({k})) AS t(i)),
blref AS MATERIALIZED (SELECT DISTINCT pos FROM blprobe
  WHERE doc_id % {ref_mod} = 0),
blflag AS (SELECT p.doc_id FROM blprobe p JOIN blref r ON r.pos = p.pos
  WHERE p.doc_id % {ref_mod} <> 0 GROUP BY p.doc_id
  HAVING COUNT(*) = {k})
SELECT b.doc_id, b.lang FROM bl0 b JOIN blflag f ON f.doc_id = b.doc_id
"""
