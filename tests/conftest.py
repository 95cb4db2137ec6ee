from __future__ import annotations

import signal
import sys
import threading
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from project_orbit_spark.catalog import TABLES  # noqa: E402
from project_orbit_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# The driver records official correctness at sf0.01 — tests that make
# claims about the DRIVER's records (not just engine semantics) must
# run at this SF (ADVICE r15 #4: the record-SF rationale lives here,
# on the constant, not in per-test comments).
RECORD_SF_DIR = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "timeout(seconds): fail the test if it outlives the bound. "
        "pytest-timeout is not installed in this container, so the "
        "mark is enforced here with SIGALRM (VERDICT r12 #4) — a hung "
        "streaming await raises TimeoutError instead of hanging the "
        "suite. Main-thread only (SIGALRM semantics), which is where "
        "pytest runs tests.",
    )


@pytest.hookimpl(wrapper=True)
def pytest_runtest_call(item):
    marker = item.get_closest_marker("timeout")
    seconds = int(marker.args[0]) if marker and marker.args else 0
    if (
        seconds <= 0
        or not hasattr(signal, "SIGALRM")
        or threading.current_thread() is not threading.main_thread()
    ):
        return (yield)

    def on_alarm(signum, frame):
        raise TimeoutError(f"test exceeded its {seconds}s timeout mark")

    old = signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)
    try:
        return (yield)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", master="local[4]")
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
