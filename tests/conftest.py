from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graph500_bfs_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    sp = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield sp
    sp.stop()


def edges_df(spark, pairs, symmetric=True):
    """Small edge-list fixture → (src,dst) DataFrame (symmetrized both ways)."""
    from graph500_bfs_spark.operators.prep import symmetrize

    df = spark.createDataFrame([(int(s), int(d)) for s, d in pairs], "src long, dst long")
    return symmetrize(df) if symmetric else df


# F5 oracle fixtures — edge cases from FIXTURES.md
PATH_GRAPH = [(0, 1), (1, 2), (2, 3), (3, 4)]
STAR_GRAPH = [(0, i) for i in range(1, 8)]
TWO_COMPONENTS = [(0, 1), (1, 2), (10, 11), (11, 12), (12, 10)]
TRIANGLE_PENDANT = [(0, 1), (1, 2), (2, 0), (2, 3)]
WITH_SELF_LOOP = [(0, 0), (0, 1), (1, 2)]
WITH_DUPS = [(0, 1), (0, 1), (1, 0), (1, 2)]
HUB_SKEW = [(0, i) for i in range(1, 50)] + [(1, 2), (3, 4)]
