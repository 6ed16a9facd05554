import numpy as np
import pytest

# the reference's shared golden fixture (tests/signature/test_simple.py:5-8)
X_1 = np.array([
    [[-4.0, 0.8, 0.0, 5.0, -3.0], [2.0, 1.0, 0.0, 0.0, -7.0]],
    [[5.0, 8.0, 2.0, 6.0, 0.0], [-5.0, -1.0, -4.0, -0.5, -8.0]],
])


@pytest.fixture
def x1():
    return X_1.copy()


@pytest.fixture(scope="session")
def spark():
    from fruits_spark.engine.session import build_session

    s = build_session(master="local[4]", shuffle_partitions=4, app="tests")
    yield s
    s.stop()
