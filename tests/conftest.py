from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from cc_extract.session import build_session

    s = build_session(cpus=4, app_name="cc_extract-tests", shuffle_partitions=16)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
