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


def test_spark_submit_pyfiles(world_dir, tmp_path):
    """north_rule packaging evidence: the engine runs via
    `spark-submit --py-files spider_spark.zip` — the package reaches the
    driver and the python workers through the zip alone (cwd stripped
    from PYTHONPATH), exactly how a multi-executor cluster would ship it."""
    import json
    import shutil
    import subprocess
    import sys

    import pytest

    submit = shutil.which("spark-submit") or (
        "/opt/spark/bin/spark-submit"
        if os.path.isfile("/opt/spark/bin/spark-submit")
        else None
    )
    if submit is None:
        pytest.skip("no spark-submit on PATH")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = shutil.make_archive(
        str(tmp_path / "spider_spark"), "zip", root_dir=repo,
        base_dir="spider_spark",
    )
    launcher = tmp_path / "launch_crawl.py"
    launcher.write_text(
        "import sys\nfrom spider_spark.cli import main\nmain(sys.argv[1:])\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            submit, "--master", "local[2]", "--py-files", zip_path,
            str(launcher),
            "--pages", os.path.join(world_dir, "pages.parquet"),
            "--robots", os.path.join(world_dir, "robots.parquet"),
            "--seeds", os.path.join(world_dir, "seeds.parquet"),
            "--checkpoint", str(tmp_path / "ckpt_submit"),
            "--rounds", "1", "--partitions", "2", "--master", "local[2]",
        ],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    summary = json.loads(
        [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert summary["last_round"] == 1 and summary["pages_crawled"] > 0
