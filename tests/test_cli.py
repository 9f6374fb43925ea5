from __future__ import annotations

import os


def test_cli_runs_and_resumes(spark, world_dir, tmp_path):
    """CLI drives rounds; re-invocation with same checkpoint resumes
    without seeds (P8 resume semantics, /root/reference/getDirection.py:232-234)."""
    from spider_spark.cli import main

    ckpt = str(tmp_path / "cli_ckpt")
    base = [
        "--pages", os.path.join(world_dir, "pages.parquet"),
        "--robots", os.path.join(world_dir, "robots.parquet"),
        "--checkpoint", ckpt,
        "--max-per-host", "4",
        "--round-ms", "2000",
        "--partitions", "4",
    ]
    s1 = main(
        base + ["--seeds", os.path.join(world_dir, "seeds.parquet"), "--rounds", "2"],
        spark=spark,
    )
    assert s1["last_round"] == 2 and s1["pages_crawled"] > 0

    s2 = main(base + ["--rounds", "3"], spark=spark)  # no seeds: resume
    assert s2["last_round"] == 5
    assert s2["pages_crawled"] > s1["pages_crawled"]
