import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from rclip_server_spark.session import get_spark

    s = get_spark(app_name="rclip_server_spark_tests", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def embeddings(spark):
    from rclip_server_spark.sources import load_table

    return load_table(spark, SF_DIR, "embeddings").cache()


@pytest.fixture(scope="session")
def documents(spark):
    from rclip_server_spark.sources import load_table

    return load_table(spark, SF_DIR, "documents").cache()


@pytest.fixture(scope="session")
def events(spark):
    from rclip_server_spark.sources import load_table

    return load_table(spark, SF_DIR, "events").cache()
