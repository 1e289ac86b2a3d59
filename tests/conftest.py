import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    import docling_rag_spark
    from docling_rag_spark.session import get_spark

    s = get_spark(app_name="tests", cores=4, shuffle_partitions=4)
    docling_rag_spark.ship(s)
    yield s
    s.stop()
