from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mini_etl_project_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def half_up(v: float, scale: int = 1) -> int:
    """Mirror Spark F.round(v * scale): HALF_UP on the shortest decimal
    repr of the double (BigDecimal.valueOf semantics). Python's built-in
    round() is banker's half-to-even and silently diverges on .5 cases,
    so test replays must use this instead."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        Decimal(repr(v * scale)).quantize(
            Decimal("1"), rounding=ROUND_HALF_UP
        )
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "4"))
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
