"""Structured Streaming operators: file source + availableNow trigger."""

import pytest
from pyspark.sql import functions as F

from minhash_rs_spark.config import MinHashConfig
from minhash_rs_spark.streaming.dedup_stream import (
    streaming_exact_dedup,
    streaming_minhash_sigs,
)


@pytest.fixture()
def stream_src(spark, tmp_path):
    rows = [
        ("c1", "same text here", "2024-01-01 00:00:00"),
        ("c2", "same text here", "2024-01-01 00:00:10"),   # exact dup of c1
        ("c3", "different text entirely", "2024-01-01 00:01:00"),
        ("c4", "same text here", "2024-01-01 00:02:00"),   # dup again
    ]
    df = spark.createDataFrame(rows, ["conv_id", "text", "ts_s"]) \
        .select("conv_id", "text", F.to_timestamp("ts_s").alias("ts"))
    src = tmp_path / "src"
    df.coalesce(1).write.parquet(str(src))
    return spark.readStream.schema(df.schema).parquet(str(src))


def _run_stream(df, tmp_path, name):
    out = tmp_path / f"out_{name}"
    ck = tmp_path / f"ck_{name}"
    q = (df.writeStream.format("parquet")
         .option("path", str(out)).option("checkpointLocation", str(ck))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return out


def test_streaming_exact_dedup(spark, stream_src, tmp_path):
    dedup = streaming_exact_dedup(stream_src, watermark="10 minutes")
    out = _run_stream(dedup, tmp_path, "dedup")
    got = spark.read.parquet(str(out))
    texts = [r["text"] for r in got.collect()]
    assert sorted(texts) == ["different text entirely", "same text here"]


def test_streaming_minhash_sigs_match_batch(spark, stream_src, tmp_path):
    cfg = MinHashConfig()
    sigs = streaming_minhash_sigs(stream_src, cfg)
    out = _run_stream(sigs, tmp_path, "sigs")
    got = spark.read.parquet(str(out))
    assert got.count() == 4 * cfg.num_bands
    # streamed signatures == batch signatures on the same docs
    from minhash_rs_spark.functions.udfs import band_signature_rows, shingle_sets

    batch_docs = (spark.read.parquet(str(tmp_path / "src"))
                  .select("conv_id", F.col("text").alias("doc_text")))
    batch = band_signature_rows(shingle_sets(batch_docs, cfg), cfg)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_streaming_stateful_band_dedup(spark, tmp_path):
    """Custom stateful operator: same LSH bucket arriving twice across
    microbatches -> second arrival flagged matched against the first."""
    from minhash_rs_spark.streaming.dedup_stream import (
        streaming_stateful_band_dedup,
    )

    rows1 = [("a", 0, 11, 22), ("b", 0, 99, 99)]
    rows2 = [("c", 0, 11, 22), ("d", 1, 5, 5)]  # c hits a's bucket
    schema = "conv_id string, band_id int, sig_hi long, sig_lo long"
    src = tmp_path / "sig_src"
    src.mkdir()
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append").parquet(str(src))
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append").parquet(str(src))
    stream = (spark.readStream
              .schema("conv_id string, band_id int, sig_hi long, sig_lo long")
              .option("maxFilesPerTrigger", "1").parquet(str(src)))
    out = streaming_stateful_band_dedup(stream)
    res = _run_stream(out, tmp_path, "stateful")
    got = {r["conv_id"]: (r["matched"], r["first_conv_id"])
           for r in spark.read.parquet(str(res)).collect()}
    assert got["b"] == (False, "b")
    assert got["d"] == (False, "d")
    # a and c share a bucket: exactly one is the claimer, the other matched
    assert {got["a"][0], got["c"][0]} == {False, True}
    claimer = "a" if not got["a"][0] else "c"
    other = "c" if claimer == "a" else "a"
    assert got[other] == (True, claimer)


def test_stateful_band_dedup_timeout_path():
    """A ProcessingTimeTimeout firing delivers an EMPTY data iterator:
    the kernel must hit the timeout branch before any concat (a
    pd.concat([]) here killed the query pre-fix) and clear the state."""
    from minhash_rs_spark.streaming.dedup_stream import _band_dedup_fn

    class FakeState:
        hasTimedOut = True
        exists = True
        removed = False

        def remove(self):
            self.removed = True

    st = FakeState()
    out = list(_band_dedup_fn((0, 1, 2), iter(()), st, 60))
    assert out == []
    assert st.removed

    # non-timeout call with only empty batches must also be a no-op
    import pandas as pd

    class IdleState(FakeState):
        hasTimedOut = False

    empty = pd.DataFrame({"conv_id": pd.Series([], dtype=str)})
    out = list(_band_dedup_fn((0, 1, 2), iter([empty]), IdleState(), 60))
    assert out == []


def test_streaming_exact_dedup_128bit_fp(spark, tmp_path):
    """The streaming fingerprint is 128-bit (two seeded xxhash64 halves):
    distinct texts survive, exact repeats are dropped."""
    from minhash_rs_spark.streaming.dedup_stream import streaming_exact_dedup

    rows = [("a", "same text", "2024-01-01 00:00:00"),
            ("b", "same text", "2024-01-01 00:00:01"),
            ("c", "other text", "2024-01-01 00:00:02")]
    src = tmp_path / "fp_src"
    src.mkdir()
    df = spark.createDataFrame(rows, "conv_id string, text string, ts_s string")
    df = df.withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    df.coalesce(1).write.mode("append").parquet(str(src))
    stream = (spark.readStream.schema("conv_id string, text string, ts timestamp")
              .parquet(str(src)))
    out = streaming_exact_dedup(stream)
    res = _run_stream(out, tmp_path, "fp128")
    got = spark.read.parquet(str(res)).collect()
    texts = sorted(r["text"] for r in got)
    assert texts == ["other text", "same text"]


def test_stateful_band_dedup_state_survives_across_query_runs(
        spark, tmp_path):
    """VERDICT r4 #5: drive >= 3 microbatches through the SAME
    checkpoint as three separate availableNow query runs (a restart
    between each), so first-claimant state must be recovered from the
    state store, not the live session: a bucket claimed in batch 1
    stays claimed in batches 2 AND 3 (later arrivals matched=True
    against the original claimer), and a bucket first seen in batch 2
    is claimed there and matched in batch 3."""
    from minhash_rs_spark.streaming.dedup_stream import (
        streaming_stateful_band_dedup,
    )

    schema = "conv_id string, band_id int, sig_hi long, sig_lo long"
    src = tmp_path / "sig_src3"
    src.mkdir()
    out, ck = tmp_path / "out3", tmp_path / "ck3"
    batches = [
        [("a", 0, 11, 22), ("z", 7, 70, 70)],
        [("c", 0, 11, 22), ("m", 2, 33, 44)],  # c hits a's bucket
        [("e", 0, 11, 22), ("n", 2, 33, 44)],  # e hits a's, n hits m's
    ]
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append").parquet(str(src))
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (streaming_stateful_band_dedup(stream, state_timeout_min=None)
             .writeStream.format("parquet")
             .option("path", str(out)).option("checkpointLocation", str(ck))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
    got = {r["conv_id"]: (r["matched"], r["first_conv_id"])
           for r in spark.read.parquet(str(out)).collect()}
    assert got["a"] == (False, "a")
    assert got["z"] == (False, "z")
    assert got["c"] == (True, "a")    # claimed two runs earlier
    assert got["m"] == (False, "m")
    assert got["e"] == (True, "a")    # still the batch-1 claimer
    assert got["n"] == (True, "m")    # batch-2 claimer recovered
