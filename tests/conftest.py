from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from penr_oz_agent_memory_rust_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="poz-tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "4"))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def make_memories(spark, rows):
    """rows: list of (id, text, metadata, session, embedding)."""
    from penr_oz_agent_memory_rust_spark.schemas import MEMORIES_SCHEMA

    full = [(*r, None) for r in rows]  # created_at
    return spark.createDataFrame(full, MEMORIES_SCHEMA)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: suite-wide sweeps that take minutes (deselect with -m 'not slow')"
    )
