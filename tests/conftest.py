import os
import tempfile

import pytest

from tachyon_spark.connection import Connection
from tachyon_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark("tachyon_spark_tests", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def db(spark, tmp_path):
    return Connection(str(tmp_path / "db"), spark)


def make_stream(conn: Connection, selector: str, vt: str, points):
    conn.create_stream(selector, vt)
    ins = conn.prepare_insert(selector)
    for ts, v in points:
        ins.insert(ts, v)
    ins.flush()


@pytest.fixture(scope="session")
def golden_db(spark):
    """One shared database holding every reference golden fixture
    (FIXTURES.md A-D); built once per test session."""
    conn = Connection(tempfile.mkdtemp(prefix="tachyon_golden_"), spark)
    ts4 = [10, 20, 30, 40]
    # Fixture A — canonical selector streams (lib.rs:613-757)
    make_stream(conn, 'http_requests_total{service="web"}', "u64",
                [(23, 45), (29, 47), (40, 23), (51, 48)])
    make_stream(conn, 'http_requests_total{service="cool"}', "u64",
                [(12, 1), (15, 5), (30, 40), (67, 20)])
    make_stream(conn, 'http_requests_total{service="mobile"}', "u64",
                [(23, 9), (29, 18), (40, 0), (51, 100)])
    # Fixture B — typed operator streams (lib.rs:805-860)
    make_stream(conn, 'ints{t="i"}', "i64", list(zip(ts4, [2, 4, 6, 8])))
    make_stream(conn, 'uints{t="u"}', "u64", list(zip(ts4, [1, 2, 3, 4])))
    make_stream(conn, 'floats{t="f"}', "f64", list(zip(ts4, [4.1, 3.2, 2.3, 1.4])))
    # Fixture C — interpolation streams (lib.rs:1395-1470)
    make_stream(conn, "ia", "u64", list(zip(ts4, [0, 20, 0, 20])))
    make_stream(conn, "ib", "u64", list(zip([5, 15, 25, 35, 45], [10] * 5)))
    make_stream(conn, "ia3", "u64",
                list(zip([1, 2, 4, 6, 10, 12, 13, 14, 15, 16],
                         [10, 20, 30, 20, 20, 10, 15, 20, 80, 100])))
    make_stream(conn, "ib3", "u64",
                list(zip([3, 5, 7, 8, 9, 11, 16], [30, 30, 10, 20, 20, 10, 10])))
    # Fixture D — edge cases (lib.rs:1647-1807)
    make_stream(conn, "neg", "i64", [(1, -5), (2, -7), (3, -1), (4, -1000)])
    make_stream(conn, "fl", "f64", [(1, 3.8), (2, -23.1)])
    # grouped-agg extension streams
    make_stream(conn, 'mg{service="web"}', "u64", [(1, 10), (2, 20)])
    make_stream(conn, 'mg{service="mobile"}', "u64", [(1, 1), (2, 2)])
    # vector-matching extension streams (on/ignoring/group_left)
    make_stream(conn, 'vm_req{service="web"}', "f64",
                [(10, 10.0), (20, 20.0), (30, 30.0)])
    make_stream(conn, 'vm_req{service="mobile"}', "f64",
                [(10, 4.0), (20, 8.0), (30, 12.0)])
    make_stream(conn, 'vm_lim{service="web"}', "f64", [(10, 100.0), (30, 200.0)])
    make_stream(conn, 'vm_lim{service="mobile"}', "f64", [(20, 40.0)])
    make_stream(conn, 'vm_multi{service="web",host="a"}', "f64",
                [(10, 1.0), (20, 2.0)])
    make_stream(conn, 'vm_multi{service="web",host="b"}', "f64", [(10, 3.0)])
    make_stream(conn, 'vm_lim2{service="web",tier="gold"}', "f64", [(10, 100.0)])
    # histogram_quantile extension streams: cumulative le-bucket counts
    make_stream(conn, 'hq{le="0.5"}', "u64", [(10, 1), (20, 2)])
    make_stream(conn, 'hq{le="1"}', "u64", [(10, 2), (20, 5)])
    make_stream(conn, 'hq{le="+Inf"}', "u64", [(10, 4), (20, 5)])
    return conn


@pytest.fixture(scope="session")
def fixture_b(golden_db):
    return golden_db
