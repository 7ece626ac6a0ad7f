import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force the block-max pruned path on tiny test corpora so the
# pruned == unpruned equivalence tests actually exercise it; disable the
# driver hot-postings cache so it can't shadow the WAND paths (it has its
# own dedicated equivalence tests that re-enable it)
os.environ.setdefault("LUCENE_SPARK_MIN_PRUNABLE", "0")
os.environ.setdefault("LUCENE_SPARK_HOT_CACHE_POSTINGS", "0")


@pytest.fixture(scope="session")
def spark():
    from lucene_spark.session import get_spark

    s = get_spark(app="lucene_spark_tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
