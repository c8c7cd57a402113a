"""North-rule launch path: ``spark-submit --py-files`` onto a REAL
multi-executor cluster.

``local-cluster[2,2,1024]`` spawns two SEPARATE executor JVMs (plus
their own Python workers) wired to the driver over the standalone-mode
RPC — the honest single-box analog of a multi-executor cluster. The
executors' Python workers can import ``crawler_spark`` ONLY from the
``--py-files`` zip (PYTHONPATH is scrubbed from the subprocess env), so
this exercises the exact packaging path a production
``spark-submit --py-files dist/crawler_spark.zip run_crawl.py`` uses:
every pandas UDF in the wave loop is pickled by reference and resolved
from the shipped zip on the executor side.

Parity contract (north rule: same seed list + politeness budget ⇒ same
crawl): the cluster-launched crawl must produce the IDENTICAL URL-seen
set and wave-by-wave crawl ordering as the plain-local run of the same
config — real executors, real shuffles, zero behavioral drift.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(
    os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
)


def _submit_crawl(
    corpus_dir: str, workdir: str, master: str, py_files: str | None
) -> None:
    """Launch run_crawl.py through spark-submit with a scrubbed env."""
    env = {
        k: v
        for k, v in os.environ.items()
        # no repo on the workers' import path, no engine env leaking a
        # master/memory override into either leg
        if k not in ("PYTHONPATH",) and not k.startswith("SPARK_GRAFT")
    }
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    cmd = [SPARK_SUBMIT, "--master", master, "--driver-memory", "4g"]
    if py_files:
        cmd += ["--py-files", py_files]
    cmd += [
        os.path.join(REPO, "run_crawl.py"),
        "--corpus", corpus_dir,
        "--workdir", workdir,
        "--mode", "fifo",
        "--waves", "4",
        "--batch-size", "25",
    ]
    proc = subprocess.run(
        cmd,
        cwd=os.path.dirname(workdir),  # neutral cwd: not the repo
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, (
        f"spark-submit crawl failed on {master}\n"
        f"--- stdout ---\n{proc.stdout[-4000:]}\n"
        f"--- stderr ---\n{proc.stderr[-4000:]}"
    )


def _read_crawl_state(spark, workdir: str):
    """(url_hash seen set, canonical_url → wave map) of a finished run."""
    from crawler_spark.tableio import APPEND, BUCKET_APPEND, TableCatalog

    cat = TableCatalog(spark, workdir)
    cat.register("seen", BUCKET_APPEND, n_buckets=32)
    cat.register("crawled", APPEND)
    seen = {r["url_hash"] for r in cat.read("seen").select("url_hash").collect()}
    waves = {
        r["canonical_url"]: r["wave"]
        for r in cat.read("crawled").select("canonical_url", "wave").collect()
    }
    return seen, waves


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="no spark-submit on this host"
)
def test_spark_submit_local_cluster_parity(spark, corpus, tmp_path_factory):
    # package exactly what production ships
    from make_pyfiles import main as make_zip

    make_zip()
    zip_path = os.path.join(REPO, "dist", "crawler_spark.zip")
    assert os.path.getsize(zip_path) > 10_000

    base = tmp_path_factory.mktemp("submit")
    w_cluster = str(base / "cluster")
    w_local = str(base / "local")
    _submit_crawl(corpus["dir"], w_cluster, "local-cluster[2,2,1024]", zip_path)
    _submit_crawl(corpus["dir"], w_local, "local[4]", zip_path)

    seen_c, waves_c = _read_crawl_state(spark, w_cluster)
    seen_l, waves_l = _read_crawl_state(spark, w_local)
    assert len(waves_c) > 0 and len(seen_c) > len(waves_c) // 2
    assert seen_c == seen_l
    assert waves_c == waves_l
