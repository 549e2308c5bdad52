"""Multimodal binary plumbing: schema/batching real, codecs stubbed."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def media_df(spark):
    rows = [
        ("m1", b"\x89PNG fake payload one", 2000),
        ("m2", b"\x89PNG fake payload two!", 3500),
        ("m3", b"x", None),  # truncated payload
    ]
    return spark.createDataFrame(
        rows, "id string, bytes binary, dur_ms int"
    )


def test_image_features_plumbing(media_df):
    from voluptuous_spark.multimodal import image_features

    out = image_features(media_df).collect()
    by_id = {r["id"]: r for r in out}
    assert set(by_id) == {"m1", "m2", "m3"}
    ok = by_id["m1"]
    assert ok["err"] is None and ok["channels"] == 3
    assert 8 <= ok["height"] <= 15 and 8 <= ok["width"] <= 15
    assert 0.0 <= ok["mean_luma"] <= 255.0
    # deterministic fake: same payload -> same features
    again = {r["id"]: r for r in image_features(media_df).collect()}
    assert again["m1"] == ok
    # decode failure becomes a data row, not a job failure
    assert by_id["m3"]["err"] is not None and by_id["m3"]["height"] is None


def test_image_resize_stub_fails_loudly(media_df):
    from voluptuous_spark.multimodal import image_resize_stub

    df = image_resize_stub(media_df, (32, 32))
    assert df.schema.simpleString() == (
        "struct<id:string,resized:binary,h:int,w:int>"
    )
    with pytest.raises(Exception, match="NotImplementedError|image codec"):
        df.collect()


def test_video_frame_sample_fanout(media_df):
    from voluptuous_spark.multimodal import video_frame_sample

    out = video_frame_sample(media_df, every_ms=1000)
    rows = out.filter(F.col("id") == "m2").orderBy("frame_idx").collect()
    # 3500ms at 1000ms cadence -> frames at 0,1000,2000,3000
    assert [r["ts_ms"] for r in rows] == [0, 1000, 2000, 3000]
    assert out.filter(F.col("id") == "m3").count() == 0  # null duration
    # bytes column is not carried through the plan
    assert "bytes" not in out.columns
