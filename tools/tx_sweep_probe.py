#!/usr/bin/env python3
"""100-round transactional-iterative sweep probe (VERDICT r08 Next #5).

``IterativeRunner.run_transactional`` stages every sink of every round
under ONE ``_tx_*`` root and promotes everything with a single commit
(reference ``DirectOutputSetup/Prepare/CommitForIterative``).  The
scale question is driver-side bookkeeping: does staging cost stay flat
per round as the transaction accumulates hundreds of staged datasets,
and is the end-of-run commit fan-out (one rename per dataset) the only
super-round cost?

This probe runs a 100-round parameter sweep with 2 sinks per round
(200 staged datasets in one transaction) and records:

- per-round staging wall (first-10 avg vs last-10 avg — flat means no
  per-round cost grows with accumulated staging);
- staging-dir count just before commit (must be exactly
  rounds x sinks, all under one ``_tx_`` root);
- commit wall and fan-out (renames = staged datasets; at 100 TB each
  rename is one namenode/objectstore metadata op, NOT a data copy);
- visibility invariants: nothing readable before commit, everything
  readable + ``_TRANSACTION_SUCCESS`` sealed after.

Usage: python tools/tx_sweep_probe.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from asakusafw_spark_spark.session import get_spark  # noqa: E402
from asakusafw_spark_spark.plans.iterative import IterativeRunner  # noqa: E402

BASE = "/tmp/spark_graft_tx_sweep"
ROUNDS = 100
SINKS = 2


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    shutil.rmtree(BASE, ignore_errors=True)
    spark = get_spark(app_name="tx_sweep_probe")

    # Tiny in-memory frame: the probe measures PROTOCOL overhead
    # (staging dirs, promotion renames), not parquet write throughput.
    base_df = spark.range(64).withColumnRenamed("id", "k")

    r = IterativeRunner()
    r.node(
        "rows",
        lambda spark, params, df=base_df: df.where(
            (df.k % 7) == params["m"] % 7
        ),
        always=True,
    )
    r.sink("rows", "out/m={m}/round={round}")
    r.sink("rows", "mirror/m={m}/round={round}")

    round_walls: list[float] = []
    t_prev = [time.monotonic()]

    def on_round(ridx, params):
        now = time.monotonic()
        round_walls.append(now - t_prev[0])
        t_prev[0] = now

    rounds = [{"m": i} for i in range(ROUNDS)]

    # hook the moment before commit: count staging dirs on disk
    pre_commit: dict = {}
    orig_commit = None

    from asakusafw_spark_spark.sources import write as write_mod

    orig_commit = write_mod.TransactionalOutput.commit

    def counting_commit(self):
        tx_roots = [
            n for n in os.listdir(BASE) if n.startswith("_tx_")
        ]
        staged = []
        for root in tx_roots:
            for dirpath, dirnames, filenames in os.walk(
                os.path.join(BASE, root)
            ):
                if any(f.startswith("part-") for f in filenames):
                    staged.append(dirpath)
        pre_commit["tx_roots"] = len(tx_roots)
        pre_commit["staged_datasets"] = len(staged)
        # nothing visible outside staging before commit
        pre_commit["visible_before"] = sorted(
            n for n in os.listdir(BASE) if not n.startswith("_tx_")
        )
        t0 = time.monotonic()
        out = orig_commit(self)
        pre_commit["commit_wall_s"] = round(time.monotonic() - t0, 3)
        return out

    write_mod.TransactionalOutput.commit = counting_commit
    t_all = time.monotonic()
    try:
        tx = r.run_transactional(spark, rounds, BASE, on_round=on_round)
    finally:
        write_mod.TransactionalOutput.commit = orig_commit
    total_wall = time.monotonic() - t_all

    success = os.path.exists(os.path.join(BASE, "_TRANSACTION_SUCCESS"))
    committed_rounds = sum(
        1
        for dirpath, _, filenames in os.walk(os.path.join(BASE, "out"))
        if any(f.startswith("part-") for f in filenames)
    )
    # spot-read one early and one late round through Spark
    n_first = spark.read.parquet(f"{BASE}/out/m=0/round=0").count()
    n_last = spark.read.parquet(f"{BASE}/mirror/m=99/round=99").count()

    first10 = sum(round_walls[:10]) / 10
    last10 = sum(round_walls[-10:]) / 10
    report = {
        "probe": "tx_sweep_100round",
        "rounds": ROUNDS,
        "sinks_per_round": SINKS,
        "staged_datasets_pre_commit": pre_commit.get("staged_datasets"),
        "tx_roots_pre_commit": pre_commit.get("tx_roots"),
        "visible_dirs_before_commit": pre_commit.get("visible_before"),
        "commit_wall_s": pre_commit.get("commit_wall_s"),
        "commit_fanout_renames": len(tx._staged),
        "total_wall_s": round(total_wall, 2),
        "round_wall_first10_avg_s": round(first10, 3),
        "round_wall_last10_avg_s": round(last10, 3),
        "round_wall_ratio_last_over_first": round(last10 / first10, 3),
        "success_marker": success,
        "committed_out_rounds": committed_rounds,
        "spot_counts": {"m0_r0": n_first, "m99_r99": n_last},
    }
    line = json.dumps(report)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
