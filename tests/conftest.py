from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_sliding_window_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="rtsw-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.streaming.checkpointLocation.deleteOnExit": "true"},
    )
    yield s
    s.stop()


@pytest.fixture()
def tmp_ckpt(tmp_path):
    return str(tmp_path / "ckpt")
