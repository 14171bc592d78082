"""Hexagonal binning: assignment is nearest-hex-center (brute-force
model), the SQL text is engine-portable (DuckDB replay equals Spark),
and hex_counts conserves rows."""

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F


def _hex_model(x, y, s):
    """Exact Python model: fractional axial + cube rounding with
    round = floor(v + 0.5) — the operator's definition."""
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


def _center(q, r, s):
    return (s * 3 ** 0.5 * (q + r / 2.0), s * 1.5 * r)


def test_hex_assignment_is_nearest_center(spark):
    """Every assigned hex center is at least as close as ALL 6 axial
    neighbors (ties allowed — cube rounding resolves them one way)."""
    from spatial_spark.operators.tiles import with_hex
    rng = random.Random(42)
    s = 3.7
    pts = [(i, rng.uniform(-100, 100), rng.uniform(-100, 100))
           for i in range(400)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    rows = with_hex(df, s, "x", "y").collect()
    assert len(rows) == 400
    for rr in rows:
        q, r = rr["hex_q"], rr["hex_r"]
        assert (q, r) == _hex_model(rr["x"], rr["y"], s)
        cx, cy = _center(q, r, s)
        d0 = math.hypot(rr["x"] - cx, rr["y"] - cy)
        for dq, dr in [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)]:
            nx, ny = _center(q + dq, r + dr, s)
            assert d0 <= math.hypot(rr["x"] - nx, rr["y"] - ny) + 1e-9
        # point is inside the hex's circumradius
        assert d0 <= s + 1e-9


def test_hex_sql_text_identical_in_duckdb(spark):
    """The expression texts ARE the oracle: DuckDB evaluates the same
    chain to the same (hex_q, hex_r) for the same doubles."""
    from spatial_spark.operators.tiles import hex_qr_ctes, with_hex
    rng = random.Random(7)
    pts = [(i, round(rng.uniform(-50, 50), 4), round(rng.uniform(-50, 50), 4))
           for i in range(300)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = {r["id"]: (r["hex_q"], r["hex_r"])
           for r in with_hex(df, 2.5, "x", "y").collect()}
    vals = ", ".join(f"({i}, CAST({x!r} AS DOUBLE), CAST({y!r} AS DOUBLE))"
                     for i, x, y in pts)
    base = f"SELECT * FROM (VALUES {vals}) AS t(id, x, y)"
    res = duckdb.sql(
        "SELECT id, hex_q, hex_r FROM ("
        + hex_qr_ctes(base, 2.5, "x", "y") + ")").fetchall()
    want = {i: (q, r) for i, q, r in res}
    assert got == want


def test_hex_counts_conserve_and_center_roundtrip(spark):
    from spatial_spark.operators.tiles import hex_center, hex_counts
    rng = random.Random(3)
    pts = [(i, rng.uniform(0, 40), rng.uniform(0, 40)) for i in range(500)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    counts = hex_counts(df, 5.0, "x", "y")
    assert counts.agg(F.sum("n")).first()[0] == 500
    cx, cy = hex_center(5.0)
    centered = counts.select(cx.alias("cx"), cy.alias("cy"), "n").collect()
    # every occupied hex center lies inside the data extent padded by s
    for r in centered:
        assert -5.0 <= r["cx"] <= 45.0 and -5.0 <= r["cy"] <= 45.0


def test_windowed_hex_counts_stream_matches_batch(spark, tmp_path):
    """Streaming per-window hex counts equal the batch formulation over
    the same events (same Column math on both paths)."""
    import datetime as dt
    from spatial_spark.operators.tiles import windowed_hex_counts
    from spatial_spark.streaming.events import run_batchlike
    t0 = dt.datetime(2024, 3, 1, 10, 30)
    rows = [(i, t0 + dt.timedelta(minutes=20 * i),
             float((i * 37) % 360 - 180), float((i * 23) % 160 - 80))
            for i in range(60)]
    schema = "event_id long, ts timestamp, lon double, lat double"
    src = tmp_path / "hexev"
    src.mkdir()
    spark.createDataFrame(rows[:30], schema).write.parquet(str(src / "p1"))
    spark.createDataFrame(rows[30:], schema).write.parquet(str(src / "p2"))
    batch = {(r.window_start, r.hex_q, r.hex_r): r.n
             for r in windowed_hex_counts(
                 spark.read.parquet(str(src) + "/p*"), 10.0).collect()}
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src) + "/p*"))
    got = {(r.window_start, r.hex_q, r.hex_r): r.n
           for r in run_batchlike(windowed_hex_counts(stream, 10.0),
                                  out_mode="complete").collect()}
    assert got == batch and sum(got.values()) == 60
