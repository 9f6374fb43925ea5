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


def _submit_setup(tmp_path):
    """(spark-submit path, package zip, launcher script, clean env) — or
    skip if spark-submit is absent. The env strips PYTHONPATH and the run
    cwd is tmp, so the package can only reach the driver and workers
    through the --py-files zip, exactly how a cluster would ship it."""
    import shutil
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
    return submit, zip_path, str(launcher), env


def test_spark_submit_pyfiles(world_dir, tmp_path):
    """north_rule packaging evidence: the engine runs via
    `spark-submit --py-files spider_spark.zip` — the package reaches the
    driver and the python workers through the zip alone (cwd stripped
    from PYTHONPATH), exactly how a multi-executor cluster would ship it."""
    import json
    import subprocess

    submit, zip_path, launcher, env = _submit_setup(tmp_path)
    out = subprocess.run(
        [
            submit, "--master", "local[2]", "--py-files", zip_path,
            launcher,
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


def test_spark_submit_local_cluster_matches_oracle(
    spark, world_dir, tmp_path
):
    """north_rule multi-executor evidence: a FULL crawl drain submitted via
    spark-submit --py-files onto local-cluster[2,2,2048] — two executor
    backends in SEPARATE JVM processes with real serialization/shuffle/
    broadcast boundaries, the closest a single-box sandbox gets to a
    cluster — reproduces the pure-Python oracle's crawl ordering, URL-seen
    set, and byte-identical extracted text. Anything that silently relied
    on driver-shared memory (a non-broadcast dict, a driver-local bloom,
    an unserialized closure) breaks under this master and not under
    local[N]."""
    import json
    import subprocess

    from test_engine_vs_oracle import POLICY, _oracle_inputs

    from spider_spark.engine import CrawlEngine
    from spider_spark.oracle import crawl

    submit, zip_path, launcher, env = _submit_setup(tmp_path)
    ckpt = str(tmp_path / "ckpt_lc")
    master = "local-cluster[2,2,2048]"
    out = subprocess.run(
        [
            submit, "--master", master, "--py-files", zip_path, launcher,
            "--pages", os.path.join(world_dir, "pages.parquet"),
            "--robots", os.path.join(world_dir, "robots.parquet"),
            "--seeds", os.path.join(world_dir, "seeds.parquet"),
            "--checkpoint", ckpt,
            "--partitions", "4", "--master", master,
            "--max-per-host", str(POLICY.max_per_host),
            "--round-ms", str(POLICY.round_ms),
            "--max-retries", str(POLICY.max_retries),
            "--max-rounds-total", str(POLICY.max_rounds),
        ],
        capture_output=True, text=True, timeout=900, env=env, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    summary = json.loads(
        [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    )

    pages, seeds, robots = _oracle_inputs(world_dir)
    want = crawl(pages, seeds, robots, POLICY)
    assert summary["pages_crawled"] == len(want.order)

    # read the committed checkpoint back in THIS session and compare
    eng = CrawlEngine(
        spark,
        pages_path=os.path.join(world_dir, "pages.parquet"),
        robots_path=os.path.join(world_dir, "robots.parquet"),
        checkpoint_dir=ckpt,
        policy=POLICY,
        n_partitions=4,
    )
    got = {
        r["url"]: r["seq"] for r in eng.results().select("url", "seq").collect()
    }
    assert got == dict(want.order)
    seen = {r["url"] for r in eng.seen().select("url").collect()}
    assert seen == want.seen

    golden = spark.read.parquet(os.path.join(world_dir, "pages.parquet"))
    joined = (
        eng.results()
        .select("url", "text")
        .join(golden.select("url", golden["text"].alias("g")), "url")
    )
    assert joined.filter("text <> g").count() == 0
