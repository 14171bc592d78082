"""Property fuzzes pinning the DUAL-ENGINE SQL formula builders against
independent Python models, evaluated in DuckDB (no JVM — hundreds of
examples per second).  Combined with the Spark-vs-oracle hard gates,
this transitively pins the Spark kernels to the models: gate proves
Spark == SQL text, these prove SQL text == model.
"""

import hashlib
import math

import duckdb
from hypothesis import given, settings, strategies as st


# --- hex cube-rounding ------------------------------------------------------
def _hex_model(x, y, s):
    qf = ((3 ** 0.5) / 3.0 * x - (1.0 / 3.0) * y) / s
    rf = ((2.0 / 3.0) * y) / s
    sf = -qf - rf
    rq, rr, rs = (math.floor(v + 0.5) for v in (qf, rf, sf))
    dq, dr, ds = abs(rq - qf), abs(rr - rf), abs(rs - sf)
    if dq > dr and dq > ds:
        rq = -rr - rs
    elif dr > ds:
        rr = -rq - rs
    return int(rq), int(rr)


coords = st.floats(min_value=-1e4, max_value=1e4,
                   allow_nan=False, allow_infinity=False)


@given(st.lists(st.tuples(coords, coords), min_size=1, max_size=40),
       st.sampled_from([0.5, 1.0, 2.5, 3.7, 10.0]))
@settings(max_examples=60, deadline=None)
def test_hex_sql_matches_model(pts, size):
    from spatial_spark.operators.tiles import hex_qr_ctes
    vals = ", ".join(
        f"({i}, CAST({x!r} AS DOUBLE), CAST({y!r} AS DOUBLE))"
        for i, (x, y) in enumerate(pts))
    base = f"SELECT * FROM (VALUES {vals}) AS t(id, x, y)"
    rows = duckdb.sql("SELECT id, hex_q, hex_r FROM ("
                      + hex_qr_ctes(base, size, "x", "y")
                      + ") ORDER BY id").fetchall()
    for (i, q, r), (x, y) in zip(rows, pts):
        assert (q, r) == _hex_model(x, y, size), (x, y, size)


# --- CDC boundary hashing ---------------------------------------------------
def _cdc_model(text, k, divisor):
    t = text.strip()
    n = len(t)
    cuts = [i for i in range(k, n + 1)
            if int(hashlib.md5(t[i - k:i].encode()).hexdigest()[:8], 16)
            % divisor == 0]
    if not cuts or cuts[-1] != n:
        cuts.append(n)
    out, prev = [], 0
    for c in cuts:
        out.append((prev + 1, c - prev, hashlib.md5(
            t[prev:c].encode()).hexdigest()))
        prev = c
    return out


texts = st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
                min_size=1, max_size=120)


@given(texts, st.sampled_from([4, 8]), st.sampled_from([4, 16, 64]))
@settings(max_examples=60, deadline=None)
def test_cdc_sql_matches_model(text, k, divisor):
    import __spark_entry__ as entry
    u32 = entry._md5_u32_sql(f"substr(t, i - {k - 1}, {k})")
    esc = text.replace("'", "''")
    rows = duckdb.sql(f"""
        WITH sized AS (SELECT trim('{esc}') AS t,
                              length(trim('{esc}')) AS len),
        pos AS (SELECT t, len, unnest(generate_series({k},
                       greatest(len, {k}))) AS i FROM sized),
        hits AS (SELECT i AS cut FROM pos
                 WHERE i <= len AND ({u32}) % {divisor} = 0),
        cuts AS (SELECT cut FROM hits
                 UNION SELECT len AS cut FROM sized),
        ordered AS (
          SELECT s.t, c.cut,
                 COALESCE(lag(c.cut) OVER (ORDER BY c.cut), 0) AS prev
          FROM cuts c CROSS JOIN sized s)
        SELECT prev + 1, cut - prev,
               md5(substr(t, CAST(prev + 1 AS INT),
                          CAST(cut - prev AS INT)))
        FROM ordered ORDER BY cut
    """).fetchall()
    assert [tuple(r) for r in rows] == _cdc_model(text, k, divisor)


# --- Luhn -------------------------------------------------------------------
def _luhn_model(s):
    ds = [int(c) for c in s if c.isdigit()]
    total = 0
    for i, d in enumerate(reversed(ds)):
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return 13 <= len(ds) <= 19 and total % 10 == 0


@given(st.lists(st.integers(0, 9), min_size=10, max_size=22),
       st.sampled_from(["", " ", "-"]))
@settings(max_examples=120, deadline=None)
def test_luhn_sql_matches_model(digits, sep):
    cand = sep.join(str(d) for d in digits)
    d = "regexp_replace(c, '[ -]', '', 'g')"
    n = f"length({d})"
    dig = f"CAST(substr({d}, CAST(i AS INT), 1) AS INT)"
    term = (f"CASE WHEN ({n} - i) % 2 = 1 THEN "
            f"CASE WHEN {dig} * 2 > 9 THEN {dig} * 2 - 9 "
            f"ELSE {dig} * 2 END ELSE {dig} END")
    got = duckdb.sql(f"""
        SELECT ({n} >= 13 AND {n} <= 19 AND
                list_sum(list_transform(generate_series(1, {n}),
                                        i -> {term})) % 10 = 0)
        FROM (SELECT '{cand}' AS c)
    """).fetchone()[0]
    assert bool(got) == _luhn_model(cand), cand


# --- KMV estimator ----------------------------------------------------------
@given(st.integers(min_value=1, max_value=4000), st.sampled_from([64, 256]))
@settings(max_examples=30, deadline=None)
def test_kmv_sql_replay_matches_model(n, k):
    """Bottom-k of md5-u60 hashes + the (k-1)*2^60/h_k estimator,
    DuckDB vs pure Python."""
    import __spark_entry__ as entry
    u60 = entry._md5_u60_sql("CAST(i AS VARCHAR)")
    got_n, got_max, got_est = duckdb.sql(f"""
        WITH h AS (SELECT DISTINCT CAST({u60} AS BIGINT) AS h
                   FROM (SELECT unnest(generate_series(1, {n})) AS i)),
        sk AS (SELECT h FROM h ORDER BY h LIMIT {k})
        SELECT count(*), max(h),
               round(CASE WHEN count(*) < {k}
                     THEN CAST(count(*) AS DOUBLE)
                     ELSE CAST({k - 1}.0 AS DOUBLE)
                          * CAST(1152921504606846976 AS DOUBLE)
                          / CAST(max(h) AS DOUBLE) END, 4)
        FROM sk
    """).fetchone()
    hs = sorted({int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
                 for i in range(1, n + 1)})[:k]
    assert got_n == len(hs) and got_max == hs[-1]
    if len(hs) < k:
        assert got_est == float(len(hs))
    else:
        assert abs(got_est
                   - round((k - 1) * float(1 << 60) / float(hs[-1]), 4)) \
            <= 1e-4
        # the estimate is in the right ballpark of the true count
        assert 0.4 * n < got_est < 2.5 * n
