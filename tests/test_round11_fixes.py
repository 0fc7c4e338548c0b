"""Round-11 regression gates (VERDICT r10 mandates + ADVICE r10).

* The stage-wise parquet-mediated corpus oracle must reproduce the
  registered monolithic oracle's census exactly (it exists to make the
  sf5 oracle feasible — >90 GB of DuckDB spill in one CTE tree — by
  bounding the working set to one stage, and chunking the quadratic
  pair count by pair owner so the threshold applies inside each chunk).
* spill_report's gate must flag superlinear SHUFFLE growth even when
  the big-rung reading stays under 1 GiB (ADVICE r10: the shared spill
  noise floor silently passed small-rung shuffle regressions).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_corpus_stage_oracle_matches_monolithic_small_rung(tmp_path):
    """check mode at sf0.001: the per-stage replay (including the
    owner-chunked pair count with a chunk count that actually splits
    the id space) must equal the single-CTE oracle row for row."""
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "corpus_stage_oracle.py"),
            "check",
            "/root/testdata/sf0.001",
            "--pair-chunks",
            "4",
            "--out",
            str(tmp_path / "ledger.json"),
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    ledger = json.load(open(tmp_path / "ledger.json"))
    assert ledger["match_monolithic"] is True
    assert ledger["census"] == ledger["monolithic"]
    assert ledger["census"][0][1] == "raw" and ledger["census"][0][2] > 0
    assert all(s["ok"] for s in ledger["stages"].values())


def test_spill_gate_flags_sub_gib_shuffle_regression(tmp_path):
    """ADVICE r10: shuffle bytes are deterministic plan output, so a
    10x shuffle jump must fail the gate even under 1 GiB; spill keeps
    the 1 GiB noise floor; near-empty shuffles stay under the 16 MiB
    shuffle floor."""
    import spill_report as sr

    def ledger(path, shuffle, spill):
        with open(path, "w") as f:
            json.dump(
                {
                    "results": {
                        "q": {
                            "query": "q",
                            "shuffle_write_bytes": shuffle,
                            "memory_bytes_spilled": spill,
                            "disk_bytes_spilled": 0,
                        }
                    }
                },
                f,
            )

    small, big = str(tmp_path / "s.json"), str(tmp_path / "b.json")
    MIB = 1 << 20

    # 10x shuffle growth at ratio 2 (allowed 4x), entirely sub-GiB: FAIL
    ledger(small, 60 * MIB, 0)
    ledger(big, 600 * MIB, 0)
    assert sr.gate(small, big, ratio=2.0, slack=2.0) == 1

    # proportional sub-GiB shuffle growth: OK
    ledger(big, 120 * MIB, 0)
    assert sr.gate(small, big, ratio=2.0, slack=2.0) == 0

    # near-empty shuffle under the 16 MiB shuffle floor: OK (noise)
    ledger(small, 0, 0)
    ledger(big, 10 * MIB, 0)
    assert sr.gate(small, big, ratio=2.0, slack=2.0) == 0

    # sub-GiB spill is still noise: OK
    ledger(small, 60 * MIB, 0)
    ledger(big, 120 * MIB, 800 * MIB)
    assert sr.gate(small, big, ratio=2.0, slack=2.0) == 0


def test_reclaim_blocks_frees_dead_checkpoint_storage(spark):
    """Dead localCheckpoint blocks must be reclaimable on demand:
    pin a frame, drop every Python reference, call reclaim_blocks,
    and poll the block manager until its RDD storage entry is gone
    (the ContextCleaner drains asynchronously). Guards the round-11
    degradation fix: without prompt reclamation, bench/sweep sessions
    accumulated dead checkpoint blocks and later queries slowed 2-4x."""
    import time

    from easy_etl_spark.session import reclaim_blocks

    def stored_rdd_ids():
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        return {infos[i].id() for i in range(len(infos))}

    before = stored_rdd_ids()
    pinned = spark.range(0, 100000).localCheckpoint(eager=True)
    assert pinned.count() == 100000
    new_ids = stored_rdd_ids() - before
    assert new_ids, "localCheckpoint should register storage blocks"

    del pinned
    reclaim_blocks(spark)
    deadline = time.time() + 30
    while time.time() < deadline:
        if not (stored_rdd_ids() & new_ids):
            break
        time.sleep(0.5)
        reclaim_blocks(spark)
    assert not (stored_rdd_ids() & new_ids), (
        "dead checkpoint blocks were not reclaimed"
    )
