"""DuckDB SQL builders that replay the engine's deterministic generators.

The image catalog queries run over the synthetic image table
(``sources/images.py``), which is a pure function of the row id — so an
ANSI-SQL oracle can re-derive every metadata column (w, h, fmt, lon, lat)
from ``range(n)`` alone and verify the Spark pipeline end-to-end without any
shared files. These builders emit SQL that reproduces the numpy math
BIT-FOR-BIT (validated exhaustively in tests/test_oracle_sql.py over the
exact id range the driver uses):

- splitmix64 on UBIGINT/HUGEINT (64x64 multiplies split into 32-bit halves
  because a full product overflows signed INT128),
- the stateless u01/gauss (Box-Muller) generators,
- the hot-spot mixture lon/lat model and w/h size draws.

Float caveat: ln/cos/sin come from different libm implementations, so
continuous values can differ in the last ulp; every oracle built on these
compares DISCRETE outputs (floor'd tile indices, counts) and the parity test
proves no boundary flip occurs for the fixed driver inputs.
"""

from __future__ import annotations

_C1 = 0x9E3779B97F4A7C15
_C2 = 0xBF58476D1CE4E5B9
_C3 = 0x94D049BB133111EB
_M64 = 1 << 64


def _mulmod_sql(x: str, c: int) -> str:
    """(x * c) mod 2^64 with the multiply split into 32-bit halves."""
    return (
        f"((((CAST({x} AS HUGEINT) % 4294967296) * {c}) + "
        f"(((CAST({x} AS HUGEINT) // 4294967296) * {c}) % 4294967296) * 4294967296) % {_M64})"
    )


def splitmix64_sql(x: str) -> str:
    """splitmix64 of a non-negative HUGEINT/UBIGINT-compatible expression.

    Single nested expression (no CTE) so callers can inline it per column;
    the input expression is duplicated ~16x — keep it short.
    """
    s1 = f"CAST((CAST({x} AS HUGEINT) + {_C1}) % {_M64} AS UBIGINT)"
    x1 = f"xor({s1}, {s1} >> 30)"
    s2 = f"CAST({_mulmod_sql(x1, _C2)} AS UBIGINT)"
    x2 = f"xor({s2}, {s2} >> 27)"
    s3 = f"CAST({_mulmod_sql(x2, _C3)} AS UBIGINT)"
    return f"xor({s3}, {s3} >> 31)"


def _salt_const(salt: int, seed: int = 42) -> int:
    """The engine XORs ids with splitmix64(salt + SEED) — a constant we fold
    at SQL-build time (images.py _u01). Pure-int math (no uint64 overflow
    warnings)."""
    m = (1 << 64) - 1
    x = (salt + seed + _C1) & m
    x = ((x ^ (x >> 30)) * _C2) & m
    x = ((x ^ (x >> 27)) * _C3) & m
    return x ^ (x >> 31)


def u01_sql(id_expr: str, salt: int) -> str:
    """images.py _u01: uniform [0,1) from a row id + salt, bit-identical."""
    k = _salt_const(salt)
    mixed = splitmix64_sql(f"xor(CAST({id_expr} AS UBIGINT), CAST('{k}' AS UBIGINT))")
    return f"(CAST(({mixed}) >> 11 AS DOUBLE) / 9007199254740992.0)"


def gauss_sql(id_expr: str, salt: int) -> str:
    """images.py _gauss: Box-Muller on two stateless uniforms. The float ops
    mirror numpy's evaluation order (constants pre-folded: 2*pi)."""
    u1 = f"greatest({u01_sql(id_expr, salt)}, 1e-12)"
    u2 = u01_sql(id_expr, salt + 1)
    return f"(sqrt(-2.0 * ln({u1})) * cos(6.283185307179586 * {u2}))"


# city centers from images.py (kept in sync by the parity test)
_CITIES = [
    (-74.006, 40.713),
    (2.352, 48.857),
    (139.692, 35.69),
    (-118.244, 34.052),
    (151.209, -33.868),
]


def images_meta_cte(n: int, ids: str = "range(0, {n})") -> str:
    """CTE body producing the image table's metadata from ids alone:
    imgs(id, image_id, w, h, fmt, lon, lat). Mirrors images.py
    lonlat_of/generate_batch (no hot-city override)."""
    upick = u01_sql("id", 1)
    cityi = f"CAST(floor({u01_sql('id', 2)} * {len(_CITIES)}) AS INTEGER)"
    glon = gauss_sql("id", 3)
    glat = gauss_sql("id", 4)
    ulon = f"({u01_sql('id', 5)} * 360.0 - 180.0)"
    ulat = f"({u01_sql('id', 6)} * 180.0 - 90.0)"
    cx = "CASE ci " + " ".join(
        f"WHEN {i} THEN {c[0]!r}" for i, c in enumerate(_CITIES)
    ) + " END"
    cy = "CASE ci " + " ".join(
        f"WHEN {i} THEN {c[1]!r}" for i, c in enumerate(_CITIES)
    ) + " END"
    # pixels_of: h uses salt 10, w uses salt 11 (h is the FIRST draw)
    w = f"(8 + CAST(floor({u01_sql('id', 11)} * 57) AS INTEGER))"
    h = f"(8 + CAST(floor({u01_sql('id', 10)} * 57) AS INTEGER))"
    fmt = "CASE id % 3 WHEN 0 THEN 'raw' WHEN 1 THEN 'png' ELSE 'qjz' END"
    return f"""
ids AS (SELECT unnest(range(0, {n})) AS id),
cm AS (SELECT id, {upick} < 0.8 AS clustered, {cityi} AS ci FROM ids),
imgs AS (
  SELECT id,
         'img' || lpad(CAST(id AS VARCHAR), 10, '0') AS image_id,
         {w} AS w, {h} AS h, {fmt} AS fmt,
         least(greatest(CASE WHEN clustered THEN ({cx}) + ({glon}) * 0.1
                             ELSE {ulon} END, -180.0), 179.999999) AS lon,
         least(greatest(CASE WHEN clustered THEN ({cy}) + ({glat}) * 0.1
                             ELSE {ulat} END, -90.0), 89.999999) AS lat
  FROM cm
)"""


def tile_xi_sql(lon: str, col: str, pitch: float, res: int) -> str:
    """raster.py tile x-index: floor((lon + col*pitch + 180) * 2^res / 360),
    clamped — identical float op order."""
    n = 1 << res
    return (
        f"least(greatest(CAST(floor((({lon}) + ({col}) * {pitch!r} + 180.0) * {n}.0 / 360.0) "
        f"AS BIGINT), 0), {n - 1})"
    )


def tile_yi_sql(lat: str, row: str, pitch: float, res: int) -> str:
    n = 1 << res
    return (
        f"least(greatest(CAST(floor((({lat}) - ({row}) * {pitch!r} + 90.0) * {n}.0 / 180.0) "
        f"AS BIGINT), 0), {n - 1})"
    )


def images_pixel_gray_ctes(n: int) -> str:
    """CTE chain regenerating every image's PIXELS and 8x8 gray block sums
    from ids alone, mirroring images.py pixels_of + functions.image.phash64:
    ... imgs -> par (per-image wave params) -> noise (8x8 structured noise)
    -> px (pixel grid) -> grayrc (integer fixed-point gray per (r, c);
    reused by the resize oracle) -> gray (gray + block index)
    -> blocks(id, rb, cb, s, a) -> tot(id, st, n).

    The only float steps are the sin/cos/u01 pixel values, truncated to
    uint8 exactly like numpy (verified pixel-for-pixel); everything after is
    integer-exact, so block sums are independent of aggregation order.
    """
    fx = u01_sql("id", 12)
    fy = u01_sql("id", 13)
    ph = u01_sql("id", 14)
    nz = u01_sql("nid", 15)
    return f"""{images_meta_cte(n)},
par AS (SELECT id, w, h, (1.0 + {fx} * 7.0) AS fx, (1.0 + {fy} * 7.0) AS fy,
               ({ph} * 6.283185307179586) AS ph FROM imgs),
noise AS (SELECT id, cell, ({nz} - 0.5) * 160.0 AS nv
          FROM (SELECT id, unnest(range(0, 64)) AS cell FROM ids),
               LATERAL (SELECT id * 64 + cell AS nid)),
px AS (SELECT p.id, r.r, c.c, p.w, p.h, p.fx, p.fy, p.ph
       FROM par p, (SELECT unnest(range(0, 64)) AS r) r,
            (SELECT unnest(range(0, 64)) AS c) c
       WHERE r.r < p.h AND c.c < p.w),
pxn AS (SELECT px.*, n.nv FROM px JOIN noise n ON n.id = px.id
         AND n.cell = least(CAST(floor((CAST(px.r AS DOUBLE) * 8) / px.h) AS BIGINT), 7) * 8
                    + least(CAST(floor((CAST(px.c AS DOUBLE) * 8) / px.w) AS BIGINT), 7)),
grayrc AS (SELECT id, r, c, w, h,
   299 * CAST(floor(least(greatest(
     127.5 + 60.0 * sin(6.283185307179586 * fx * c / w + ph)
           + 60.0 * cos(6.283185307179586 * fy * r / h) + nv, 0.0), 255.0)) AS BIGINT)
 + 587 * CAST(floor(least(greatest(255.0 * c / greatest(w - 1, 1) + nv, 0.0), 255.0)) AS BIGINT)
 + 114 * CAST(floor(least(greatest(255.0 * r / greatest(h - 1, 1) + nv, 0.0), 255.0)) AS BIGINT) AS g
   FROM pxn),
gray AS (SELECT id, (r * 8) // h AS rb, (c * 8) // w AS cb, g FROM grayrc),
blocks AS (SELECT id, rb, cb, sum(g) AS s, count(*) AS a FROM gray GROUP BY 1, 2, 3),
tot AS (SELECT id, sum(s) AS st, sum(a) AS n FROM blocks GROUP BY 1)"""


def phash_bits_cte() -> str:
    """Continues images_pixel_gray_ctes: bits(id, bi, bv) — bit bi of the
    integer-exact block-mean aHash (blocksum*n > total*area)."""
    return """
bits AS (SELECT b.id, b.rb * 8 + b.cb AS bi,
                CASE WHEN b.s * t.n > t.st * b.a THEN 1 ELSE 0 END AS bv
         FROM blocks b JOIN tot t ON t.id = b.id)"""


def morton_spread_sql(v: str) -> str:
    """Morton spread of a <=30-bit value onto even bits (cells._spread_sql)."""
    masks = (
        (16, 0x0000FFFF0000FFFF),
        (8, 0x00FF00FF00FF00FF),
        (4, 0x0F0F0F0F0F0F0F0F),
        (2, 0x3333333333333333),
        (1, 0x5555555555555555),
    )
    expr = v
    for shift, mask in masks:
        expr = f"(({expr}) | (({expr}) * {1 << shift})) & {mask}"
    return expr
