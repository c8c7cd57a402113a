from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="crawler_spark_tests",
        master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[4]"),
        shuffle_partitions=8,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus(tmp_path_factory):
    """Deterministic synthetic web corpus (dir + oracle manifest)."""
    from crawler_spark.synthgen import generate_corpus

    out = tmp_path_factory.mktemp("corpus")
    manifest = generate_corpus(str(out), n_pages=400, seed=42)
    return {"dir": str(out), "manifest": manifest}


@pytest.fixture(scope="session")
def corpus_dir(corpus):
    return corpus["dir"]
