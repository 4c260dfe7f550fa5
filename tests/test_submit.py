"""North-rule packaging check: the crawl ships as a spark-submit
--py-files job. Builds dist/crawler_spark.zip, runs jobs/submit_crawl.py in
a fresh spark-submit JVM against a tiny corpus, resumes from the
checkpoint, and asserts the reported seen-set size both times."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_submit(zip_path, pages, state, seeds, extra=()):
    cmd = [
        shutil.which("spark-submit") or "spark-submit",
        "--master", "local[2]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "submit_crawl.py"),
        "--pages", pages, "--state", state,
        "--max-waves", "20", "--no-lineage",
        "--seeds", *seeds, *extra,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON result in stdout: {proc.stdout[-1500:]}")


@pytest.mark.slow
def test_spark_submit_pyfiles_and_resume(tmp_path):
    if not shutil.which("spark-submit"):
        pytest.skip("spark-submit not on PATH")
    sys.path.insert(0, REPO)
    from crawler_spark.fixtures.gen import generate_corpus, write_parquet

    rows, cfg = generate_corpus(n_hosts=2, pages_per_host=10)
    pages = str(tmp_path / "pages.parquet")
    write_parquet(rows, pages)

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package.py")],
        capture_output=True, text=True, check=True,
    )
    zip_path = out.stdout.strip().splitlines()[-1]
    assert zip_path.endswith("crawler_spark.zip") and os.path.exists(zip_path)

    state = str(tmp_path / "state")
    res = _run_submit(zip_path, pages, state, cfg["seed_urls"])
    assert res["seen_count"] > 20
    assert res["waves"] >= 2

    # resume on a completed state dir: no new work, same seen count
    res2 = _run_submit(zip_path, pages, state, cfg["seed_urls"], extra=("--resume",))
    assert res2["seen_count"] == res["seen_count"]

    # recrawl + maintenance pass over the same state dir: the per-run seen
    # set rebuilds to the same size and the compacted state stays readable
    res3 = _run_submit(zip_path, pages, state, cfg["seed_urls"],
                       extra=("--recrawl", "--compact"))
    assert res3["seen_count"] == res["seen_count"]
    res4 = _run_submit(zip_path, pages, state, cfg["seed_urls"], extra=("--resume",))
    assert res4["seen_count"] == res3["seen_count"]

    # bloom-sidecar admission path through the packaged job: identical
    # seen count, sidecar deltas materialized in the state dir
    state_b = str(tmp_path / "state_bloom")
    res5 = _run_submit(zip_path, pages, state_b, cfg["seed_urls"], extra=("--bloom",))
    assert res5["seen_count"] == res["seen_count"]
    assert os.path.isdir(os.path.join(state_b, "seen_bloom"))
