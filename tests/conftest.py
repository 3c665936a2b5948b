import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icepack.session import get_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_session("icepack-tests", cpus=8)
    yield s


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "wh")


def rows_sorted(df):
    """Order-insensitive row list for equality checks."""
    return sorted([tuple(r) for r in df.collect()], key=lambda t: tuple(map(repr, t)))
