"""North-rule launch path: spark-submit --py-files + cross-process resume.

The rule requires the engine to run "via spark-submit --py-files on a
multi-executor cluster" and to "resume mid-crawl from any checkpoint"
(reference: eyjs/crawler restarts its crawl loop from its queue state,
src/crawler.py). This test exercises both through real OS processes:

1. package crawler_spark into dist/crawler_spark.zip (make_pyfiles),
2. copy run_crawl.py into a temp dir that does NOT contain the package,
   so the import can only resolve through the --py-files zip,
3. spark-submit a 2-wave crawl, assert the summary JSON,
4. spark-submit again in a fresh JVM and assert it resumes from the
   committed wave instead of restarting.

Each submit is a full JVM spin-up, so the crawl itself is kept tiny.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or (
    "/opt/spark/bin/spark-submit"
    if os.path.exists("/opt/spark/bin/spark-submit")
    else None
)

pytestmark = pytest.mark.skipif(
    SPARK_SUBMIT is None, reason="spark-submit not on PATH"
)


def _submit(script_dir: str, zip_path: str, workdir: str, corpus: str,
            waves: int, gen_pages: int) -> tuple[dict, str]:
    env = {k: v for k, v in os.environ.items() if k != "SPARK_GRAFT_MASTER"}
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", zip_path,
            os.path.join(script_dir, "run_crawl.py"),
            "--corpus", corpus,
            "--workdir", workdir,
            "--waves", str(waves),
            "--batch-size", "60",
            "--gen-pages", str(gen_pages),
        ],
        cwd=script_dir,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stderr[-4000:]}"
    last = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(last), proc.stderr


def test_pyfiles_launch_and_cross_process_resume(tmp_path):
    # Package. make_pyfiles writes to REPO/dist; run it as a module so the
    # test exercises the same artifact the docs tell the operator to build.
    subprocess.run([sys.executable, os.path.join(REPO, "make_pyfiles.py")],
                   check=True, cwd=REPO, capture_output=True)
    zip_path = os.path.join(REPO, "dist", "crawler_spark.zip")
    assert os.path.exists(zip_path)

    # Stage run_crawl.py where the crawler_spark package is NOT importable
    # from the filesystem — only from the zip shipped via --py-files.
    stage = tmp_path / "stage"
    stage.mkdir()
    shutil.copy(os.path.join(REPO, "run_crawl.py"), stage / "run_crawl.py")
    assert not (stage / "crawler_spark").exists()

    corpus = str(tmp_path / "corpus")
    workdir = str(tmp_path / "work")

    first, _ = _submit(str(stage), zip_path, workdir, corpus,
                       waves=2, gen_pages=240)
    assert first["waves"] == 2
    assert first["resumed_from"] == -1  # fresh state
    assert first["fetched"] > 0
    committed = first["committed_wave"]
    assert committed >= 1

    # Fresh JVM, same workdir: must resume from the committed checkpoint,
    # not refetch wave 1.
    second, err = _submit(str(stage), zip_path, workdir, corpus,
                          waves=1, gen_pages=240)
    assert second["resumed_from"] == committed
    assert second["committed_wave"] == committed + 1
    assert second["waves"] == 1
