import pytest


@pytest.fixture(scope="session")
def spark():
    from ethereum_raw_data_crawler_spark.session import get_spark

    s = get_spark(cores=8, shuffle_partitions=8, app_name="tests")
    yield s


@pytest.fixture(scope="session")
def t1_tables():
    from ethereum_raw_data_crawler_spark.sources import synth

    return synth.gen_all(synth.T1)
