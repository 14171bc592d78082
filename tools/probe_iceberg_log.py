"""Probe: Iceberg planning cost over SCALED APPEND COUNTS (r15).

The Iceberg twin of probe_delta_log: a long-lived table accumulates
one snapshot per append, and the planner replays metadata.json →
manifest list → manifests.  Without manifest merging that's one Avro
read PER APPEND; with the r15 merge-at-threshold behaviour the live
manifest list stays bounded, so planning cost must go FLAT in append
count.  This probe synthesizes tables of 8 -> 512 appends (1 file
each, no data files needed — read_iceberg_meta never touches data)
through the real commit path and measures:

* plan wall  — read_iceberg_meta on the newest snapshot;
* log reads  — Avro objects opened during that plan (counted via a
  wrapping LogStore);
* tail commit wall — the LAST append's commit time (includes any
  merge rewrite it performed).

Structural asserts: live file count equals append count at every
scale; plan log-reads bounded by _MERGE_MANIFESTS_AT + 2 at every
scale (the flatness the merge exists to buy); snapshot lineage
intact.  Walls land in SCALE.md §17.

Run: python tools/probe_iceberg_log.py
"""
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from spatial_spark.io.delta import LogStore  # noqa: E402
from spatial_spark.io.iceberg import (_MERGE_MANIFESTS_AT,  # noqa: E402
                                      _commit_snapshot,
                                      _data_file_record,
                                      _read_table_meta,
                                      read_iceberg_meta)

SCALES = [8, 32, 128, 512]

ICE_SCHEMA = {"type": "struct", "schema-id": 0, "fields": [
    {"id": 1, "name": "id", "required": False, "type": "long"}]}


class CountingStore(LogStore):
    def __init__(self):
        super().__init__()
        self.reads = 0

    def read_text(self, path):
        self.reads += 1
        return super().read_text(path)

    def read_bytes(self, path):
        self.reads += 1
        return super().read_bytes(path)


def synth_table(root: str, n_appends: int) -> str:
    tab = os.path.join(root, f"tab_{n_appends}")
    st = LogStore()
    prev = None
    t_last = 0.0
    for v in range(n_appends):
        entries = [{
            "status": 1, "snapshot_id": None,
            "sequence_number": v + 1, "file_sequence_number": v + 1,
            "data_file": _data_file_record(
                f"/data/part-{v:06d}.parquet", 1024, ICE_SCHEMA,
                {"numRecords": 100,
                 "minValues": {"id": v * 100},
                 "maxValues": {"id": v * 100 + 99},
                 "nullCount": {"id": 0}})}]
        t0 = time.perf_counter()
        _commit_snapshot(tab, st, ICE_SCHEMA, entries,
                         "overwrite" if v == 0 else "append",
                         prev, v + 1, v + 1, None)
        t_last = time.perf_counter() - t0
        prev = _read_table_meta(tab, st)
    return tab, t_last


def expo(xs, ys):
    lx = [math.log(x) for x in xs]
    ly = [math.log(max(y, 1e-5)) for y in ys]
    n = len(xs)
    mx, my = sum(lx) / n, sum(ly) / n
    return (sum((a - mx) * (b - my) for a, b in zip(lx, ly))
            / sum((a - mx) ** 2 for a in lx))


def main():
    root = tempfile.mkdtemp(prefix="probe_iceberg_log_")
    rows = []
    try:
        for n in SCALES:
            tab, t_commit = synth_table(root, n)
            cs = CountingStore()
            t0 = time.perf_counter()
            meta = read_iceberg_meta(tab, store=cs)
            t_plan = time.perf_counter() - t0
            assert len(meta["files"]) == n, (n, len(meta["files"]))
            assert len(meta["snapshots"]) == n
            assert cs.reads <= _MERGE_MANIFESTS_AT + 3, \
                (n, cs.reads)
            rows.append((n, t_plan, cs.reads, t_commit))
            print(f"appends={n:4d} plan={t_plan*1000:7.1f}ms "
                  f"log_reads={cs.reads:2d} "
                  f"tail_commit={t_commit*1000:7.1f}ms", flush=True)
        xs = [r[0] for r in rows]
        print(json.dumps({
            "plan_exponent": round(expo(xs, [r[1] for r in rows]), 3),
            "max_log_reads": max(r[2] for r in rows),
            "merge_threshold": _MERGE_MANIFESTS_AT,
            "tail_commit_exponent": round(
                expo(xs, [r[3] for r in rows]), 3),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
