from __future__ import annotations

import pytest

from dataquality_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dq_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(autouse=True)
def _release_caches():
    """Paired persist/unpersist: drop every cached() frame after each test
    so the shared session never accumulates dead cached blocks."""
    yield
    from dataquality_spark.caching import release_all

    release_all()
