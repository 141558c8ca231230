import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from concept_catalog_etl_spark.session import get_spark  # noqa: E402

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def scratch_factory(request):
    """Mint a FRESH scratch dir per call — for hypothesis tests, where the
    function-scoped ``scratch`` fixture would be reused across examples."""
    safe = "".join(c if c.isalnum() or c in "._-" else "_"
                   for c in request.node.name)[:60]
    base = os.path.join(SCRATCH, safe)
    shutil.rmtree(base, ignore_errors=True)
    counter = [0]

    def mint():
        counter[0] += 1
        d = os.path.join(base, f"ex{counter[0]}")
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
        return d

    yield mint
    shutil.rmtree(base, ignore_errors=True)


@pytest.fixture()
def scratch(request):
    # sanitize: Spark/Hadoop treat paths as glob patterns, so a parametrized
    # test's "[32]" in the directory name becomes a character class and
    # every read fails with PATH_NOT_FOUND
    safe = "".join(c if c.isalnum() or c in "._-" else "_"
                   for c in request.node.name)
    d = os.path.join(SCRATCH, safe[:80])
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)
