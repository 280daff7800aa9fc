from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


@pytest.fixture(scope="session")
def spark():
    from pvsyst_pdf_parser_spark.session import get_spark

    spark = get_spark(
        "pytest",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    yield spark


@pytest.fixture(scope="session")
def fixture_docs():
    from fixtures.gen import make_docs

    return make_docs(24)  # ≥2 docs per scenario (11 scenarios, mixed kinds)


@pytest.fixture(scope="session")
def pages_parquet(fixture_docs, tmp_path_factory):
    from fixtures.gen import write_pages_parquet

    path = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    write_pages_parquet(fixture_docs, path)
    return path


@pytest.fixture(scope="session")
def goldens(fixture_docs, tmp_path_factory):
    from fixtures.refharness import generate_goldens

    out = str(tmp_path_factory.mktemp("golden"))
    return generate_goldens(fixture_docs, out)


@pytest.fixture(scope="session")
def reference():
    from fixtures.refharness import load_reference

    return load_reference()
