"""Probe: manifest commit cost vs store file count (VERDICT r11 ask #2).

Measures, for an APPEND of one file into a store already holding N
files, the bytes the commit writes and the wall time — under the
in-memory FS fake so only protocol cost is measured.  The v1 layout
rewrote the full O(N) file array every commit; the sharded
manifest-list should hold append cost ~flat (one shard + a list of
N/SHARD_TARGET entries) as N grows 1x -> 64x.

Run: python tools/probe_manifest_shards.py
"""
import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from spatial_spark.manifest import Manifest  # noqa: E402
from test_layers import _FakeManifestIO  # noqa: E402


class _CountingIO(_FakeManifestIO):
    def __init__(self):
        super().__init__()
        self.bytes_written = 0
        self.writes = 0

    def write_file(self, p, data):
        self.bytes_written += len(data)
        self.writes += 1
        super().write_file(p, data)

    def create_excl(self, p, data):
        self.bytes_written += len(data)
        self.writes += 1
        return super().create_excl(p, data)


def probe(n_files: int) -> dict:
    io = _CountingIO()
    man = Manifest("/mem/store", io=io)
    names = [f"part-{i:06d}" for i in range(n_files)]
    stats = {n: {"zmin": i, "zmax": i + 1, "xmin": float(i % 360 - 180),
                 "ymin": -1.0, "xmax": float(i % 360 - 179), "ymax": 1.0,
                 "rows": 1000}
             for i, n in enumerate(names)}
    man.commit(names, stats=stats)              # build the base snapshot
    io.bytes_written = io.writes = 0
    # count shard-doc READS too: a delta append must open none
    reads = {"shard": 0}
    real_read = io.read_text
    def counting_read(path):
        if "/shard-" in path:
            reads["shard"] += 1
        return real_read(path)
    io.read_text = counting_read
    t0 = time.perf_counter()
    reps = 5
    for r in range(reps):                        # steady-state appends
        new = f"part-new-{r:06d}"
        man.commit_delta(add=[new],
                         stats={new: {"zmin": 0, "zmax": 1, "xmin": 0.0,
                                      "ymin": 0.0, "xmax": 1.0,
                                      "ymax": 1.0, "rows": 1000}})
    dt = (time.perf_counter() - t0) / reps
    io.read_text = real_read
    return {"n_files": n_files,
            "shard_doc_reads": reads["shard"] / reps,
            "append_bytes": io.bytes_written // reps,
            "append_writes": io.writes / reps,
            "append_sec": round(dt, 5),
            "v1_bytes_equiv": len(json.dumps(
                {"epoch": 1, "files": names}).encode())}


if __name__ == "__main__":
    rows = [probe(n) for n in (64, 512, 4096)]
    for r in rows:
        print(json.dumps(r))
    b1, b64 = rows[0]["append_bytes"], rows[-1]["append_bytes"]
    print(f"append-bytes growth 1x->64x: {b64 / b1:.2f}x "
          f"(v1 equivalent grows {rows[-1]['v1_bytes_equiv'] / rows[0]['v1_bytes_equiv']:.1f}x)")
