from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rivulus_spark import LazyFrame, get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark("rivulus-tests")
    yield s


@pytest.fixture()
def people(spark):
    """Canonical 3-row people fixture (FIXTURES.md §1, 5-row demo variant)."""
    return LazyFrame.from_dataframe(spark, {
        "name": ["Alice", "Bob", "Charlie", "Diana", "Eve"],
        "age": [25, 30, 35, 28, 42],
        "score": [85.5, 92.0, 78.5, 94.5, 88.0],
    })


@pytest.fixture()
def users(spark):
    return LazyFrame.from_dataframe(spark, {
        "user_id": [1, 2, 3, 4],
        "name": ["Alice", "Bob", "Charlie", "Diana"],
        "city": ["NYC", "LA", "Chicago", "Boston"],
    })


@pytest.fixture()
def orders(spark):
    return LazyFrame.from_dataframe(spark, {
        "order_id": [101, 102, 103, 104, 105],
        "user_id": [1, 2, 1, 3, 99],
        "amount": [25.99, 15.50, 99.99, 45.00, 12.99],
    })
