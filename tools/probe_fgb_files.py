"""Probe: FlatGeobuf source planning / reading / exporting over
SCALED FILE COUNTS (VERDICT r13 ask #5 — the r13 probes scaled row
counts via the part table; this one scales the FILE count, the axis a
100 TB .fgb corpus actually grows on).

Synthesizes 1x/4x/16x/64x directories of small .fgb files (base 16
files), then measures:

* plan_headers  — fgb_source(bbox=) construction wall: above
  _HEADER_JOB_THRESHOLD files this is ONE distributed mapInPandas
  header job (r14), never a serial driver loop, so driver wall grows
  like one job over N tiny tasks, not N serial opens;
* plan_manifest — the same construction fed by the export manifest:
  ZERO header reads for pruning (one schema read), flat in N;
* read          — count() over the bbox-pruned source (the window
  keeps a FIXED number of files, so this should be flat in N);
* export        — export_fgb_dir wall for the same rows repartitioned
  to the scaled file count (one file per partition, written from
  tasks).

Prints one JSON object; asserts only structural facts (pruned file
count fixed; manifest path does no per-file header I/O) — wall times
and fitted exponents are recorded for SCALE.md, not asserted (host
noise).

Run: python tools/probe_fgb_files.py
"""
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from spatial_spark.geom.core import Geometry  # noqa: E402
from spatial_spark.io import flatgeobuf as fgb  # noqa: E402
from spatial_spark.io.flatgeobuf import (export_fgb_dir, fgb_source,  # noqa: E402
                                         write_fgb)
from spatial_spark.session import get_spark  # noqa: E402

BASE_FILES = 16
FEATS_PER_FILE = 20
COLS = [("tag", 11)]


def synth_dir(root: str, n_files: int) -> list:
    d = os.path.join(root, f"set_{n_files}")
    os.makedirs(d)
    paths = []
    for i in range(n_files):
        # file i occupies lon band [i, i+0.5] — a window over the first
        # BASE_FILES bands keeps a FIXED file count at every scale
        feats = [(Geometry.point(i + j / (2 * FEATS_PER_FILE), 10.0),
                  {"tag": f"f{i}_{j}"}) for j in range(FEATS_PER_FILE)]
        p = os.path.join(d, f"part-{i:05d}.fgb")
        with open(p, "wb") as f:
            f.write(write_fgb(feats, name="probe", columns=COLS))
        paths.append(p)
    return paths


def main():
    spark = get_spark()
    root = tempfile.mkdtemp(prefix="fgb_probe_")
    window = (0.0, 0.0, float(BASE_FILES) - 0.25, 20.0)
    out = {}
    try:
        for mult in (1, 4, 16, 64):
            n = BASE_FILES * mult
            paths = synth_dir(root, n)

            t0 = time.time()
            src = fgb_source(spark, paths, bbox=window)
            t_plan = time.time() - t0
            n_planned = src.rdd.getNumPartitions()

            # manifest path: envelopes from metadata, no header reads
            # for pruning (count actual header opens to prove it)
            manifest = [{"path": p,
                         "xmin": float(i), "ymin": 10.0,
                         "xmax": float(i) + 0.5, "ymax": 10.0}
                        for i, p in enumerate(paths)]
            opens = {"n": 0}
            real = fgb.read_fgb_header

            def counting(path):
                opens["n"] += 1
                return real(path)
            fgb.read_fgb_header = counting
            t0 = time.time()
            src_m = fgb_source(spark, paths, bbox=window,
                               manifest=manifest)
            t_plan_m = time.time() - t0
            fgb.read_fgb_header = real
            assert opens["n"] == 1, opens   # ONE schema read, 0 prunes

            t0 = time.time()
            rows = src.count()
            t_read = time.time() - t0
            assert rows == BASE_FILES * FEATS_PER_FILE, rows
            assert src_m.count() == rows
            assert n_planned == BASE_FILES, n_planned

            # export the same row volume into n files from tasks
            df = src.repartition(min(n, 256))
            t0 = time.time()
            man = export_fgb_dir(
                df.drop("fid"), os.path.join(root, f"exp_{n}"),
                name="probe")
            n_out = man.count()
            t_export = time.time() - t0
            assert n_out >= 1

            out[f"{mult}x"] = {
                "n_files": n, "files_planned": n_planned,
                "plan_headers_s": round(t_plan, 3),
                "plan_manifest_s": round(t_plan_m, 3),
                "read_s": round(t_read, 3),
                "export_s": round(t_export, 3),
                "export_parts": n_out}
        for k in ("plan_headers_s", "plan_manifest_s", "read_s",
                  "export_s"):
            a, b = out["1x"][k], out["64x"][k]
            out[f"exp_{k}"] = round(
                math.log(max(b, 1e-3) / max(a, 1e-3)) / math.log(64), 3)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
