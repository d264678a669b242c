import pytest

from minhash_rs_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("minhash-rs-spark-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_corpus(spark):
    """Seeded transcripts + planted ground truth (FIXTURES.md F1/F2)."""
    from minhash_rs_spark.data.transcripts import transcripts_spark

    turns, pairs = transcripts_spark(spark, n_base=120, seed=7)
    turns = turns.cache()
    turns.count()
    return turns, pairs
