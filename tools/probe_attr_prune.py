"""Probe: attribute-range shard pruning opens O(matching shards) docs
(VERDICT r12 ask #5).

A store of N files carries a monotone numeric attribute ``score`` (file
i holds scores [100*i, 100*i+99]); commits carry amin:/amax: stats.  A
selective property filter (one 100-wide score range) must open only the
shard docs whose aggregate range intersects it — flat in N — while an
unpruned plan would open all N/SHARD_TARGET shard docs.  Runs at 1x-64x
file counts under the in-memory FS fake so only protocol cost shows.

Run: python tools/probe_attr_prune.py
"""
import json
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from spatial_spark.manifest import Manifest  # noqa: E402
from test_layers import _FakeManifestIO  # noqa: E402


def probe(n_files: int) -> dict:
    io = _FakeManifestIO()
    man = Manifest("/mem/store", io=io)
    names = [f"part-{i:06d}" for i in range(n_files)]
    stats = {n: {"rows": 100, "amin:score": 100.0 * i,
                 "amax:score": 100.0 * i + 99.0}
             for i, n in enumerate(names)}
    man.commit(names, stats=stats)
    reads = {"shard": 0}
    real_read = io.read_text

    def counting_read(path):
        if "/shard-" in path:
            reads["shard"] += 1
        return real_read(path)
    io.read_text = counting_read
    total_shards = len(man.shard_stats())
    # selective filter: score in [mid, mid+99] — exactly one file's range
    mid = 100.0 * (n_files // 2)

    def keep(st):
        amin, amax = st.get("amin:score"), st.get("amax:score")
        if amin is None or amax is None:
            return True
        return amin <= mid + 99.0 and amax >= mid

    files = man.files_where(keep)
    # exactly one file's score range matches the selective filter
    matching = [n for i, n in enumerate(names)
                if 100.0 * i <= mid + 99.0 and 100.0 * i + 99.0 >= mid]
    return {"n_files": n_files, "total_shards": total_shards,
            "docs_opened": reads["shard"], "files_planned": len(files),
            "files_matching": len(matching)}


def main():
    out = {}
    base = None
    for mult in (1, 4, 16, 64):
        r = probe(64 * mult)
        out[f"{mult}x"] = r
        if base is None:
            base = r["docs_opened"]
        # O(matching shards): the ONE covering shard, flat as N grows
        assert r["docs_opened"] <= max(1, base), r
        assert r["docs_opened"] < r["total_shards"] or \
            r["total_shards"] == 1, r
    # at 64x the unpruned plan would open every shard doc
    r = out["64x"]
    out["prune_ratio_64x"] = round(
        r["docs_opened"] / r["total_shards"], 4)
    assert out["prune_ratio_64x"] <= 0.2, out
    # r14 (VERDICT r13 ask #2): per-FILE pruning inside the opened
    # shard doc — the plan lists ~the matching files, not the whole
    # surviving shard (previously 512 files at 64x for a 1-file
    # filter), flat in N
    for mult in (1, 4, 16, 64):
        rr = out[f"{mult}x"]
        assert rr["files_planned"] == rr["files_matching"], rr
    print(json.dumps(out))


if __name__ == "__main__":
    main()
