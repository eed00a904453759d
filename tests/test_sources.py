"""Aloha CSV typed-schema reader + multimodal plumbing."""

import pytest

from aloha_spark.sources.multimodal import (
    decode_image,
    extract_media_features,
    synthesize_media,
)
from aloha_spark.sources.tables import parse_csv_type, read_aloha_csv


def test_parse_csv_type_lattice():
    from pyspark.sql.types import DoubleType, IntegerType, StringType
    assert parse_csv_type("i") == (IntegerType(), False, False)
    assert parse_csv_type("oi") == (IntegerType(), True, False)
    assert parse_csv_type("vd") == (DoubleType(), False, True)
    assert parse_csv_type("vos") == (StringType(), True, True)
    with pytest.raises(ValueError):
        parse_csv_type("zz")


def test_read_aloha_csv(spark, tmp_path):
    p = tmp_path / "data.tsv"
    p.write_text("MALE\t170\t1,2,3\nFEMALE\t\t4\n")
    df = read_aloha_csv(spark, str(p),
                        {"gender": "e", "height": "oi", "nums": "vi"})
    rows = {r.gender: r for r in df.collect()}
    assert rows["MALE"].height == 170
    assert rows["MALE"].nums == [1, 2, 3]
    assert rows["FEMALE"].height is None  # empty string is missing
    assert rows["FEMALE"].nums == [4]


def test_multimodal_stub_and_plumbing(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = synthesize_media(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    feats = extract_media_features(media, fake=True).toPandas()
    assert len(feats) == 20
    assert (feats["n_bytes"] > 0).all()
    # mean_intensity is an image feature: decoded for images, NULL for
    # audio/video (the image decoder must never run on those payloads)
    img = feats[feats["kind"] == "image"]
    assert len(img) > 0
    assert img["mean_intensity"].between(0, 255).all()
    assert feats.loc[feats["kind"] != "image", "mean_intensity"] \
        .isna().all()
    # real decode: the built-in numpy decoder rejects unrecognized
    # magic bytes loudly (PNG/BMP/PPM are the formats it handles)
    with pytest.raises(ValueError, match="unrecognized image payload"):
        decode_image(b"bytes", fake=False)
    # deterministic fake decode
    assert (decode_image(b"abc", fake=True) == decode_image(b"abc", fake=True)).all()


class TestMultimodalFrames:
    def test_resize_is_real_numpy(self):
        import numpy as np

        from aloha_spark.sources.multimodal import resize_image
        img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        up = resize_image(img, 8, 8)
        assert up.shape == (8, 8, 3)
        assert (up[::2, ::2] == img).all()  # nearest-neighbor grid
        down = resize_image(img, 2, 2)
        assert down.shape == (2, 2, 3)

    def test_frame_sampling_deterministic(self):
        from aloha_spark.sources.multimodal import sample_frames
        a = sample_frames(b"hello video bytes" * 10, 4, fake=True)
        b = sample_frames(b"hello video bytes" * 10, 4, fake=True)
        assert len(a) == 4
        import numpy as np
        assert all(np.array_equal(x, y) for x, y in zip(a, b))
        assert sample_frames(b"x", 0, fake=True) == []

    def test_frame_features_explode(self, spark, sf_dir):
        from aloha_spark.sources.multimodal import (
            extract_frame_features, synthesize_media)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
        media = synthesize_media(docs)
        n_videos = media.where("kind = 'video'").count()
        out = extract_frame_features(media, n_frames=3).collect()
        assert len(out) == 3 * n_videos
        assert {r.frame_idx for r in out} == {0, 1, 2}
        assert all(r.resized_h == 2 and r.resized_w == 2 for r in out)
        # deterministic across runs
        again = extract_frame_features(media, n_frames=3).collect()
        assert sorted((r.media_id, r.frame_idx, r.mean_intensity)
                      for r in out) == \
            sorted((r.media_id, r.frame_idx, r.mean_intensity)
                   for r in again)


def test_csv_declared_enum(spark, tmp_path):
    from aloha_spark.sources.tables import AlohaEnum

    p = tmp_path / "g.csv"
    p.write_text("u1\tMALE\tMALE,FEMALE\nu2\tFEMALE\t\nu3\tOTHER\tMALE\n")
    gender = AlohaEnum("com.example.GenderProto",
                       [("MALE", 1), ("FEMALE", 2)])
    df = read_aloha_csv(
        spark, str(p), {"uid": "s", "g": "e", "gv": "voe"},
        enums={"g": gender, "gv": gender})
    rows = {r.uid: r for r in df.collect()}
    assert rows["u1"].g.name == "MALE"
    assert rows["u1"].g.ordinal == 0 and rows["u1"].g.number == 1
    assert rows["u2"].g.number == 2
    assert rows["u3"].g is None          # undeclared constant -> NULL
    assert [x.name for x in rows["u1"].gv] == ["MALE", "FEMALE"]
    assert rows["u2"].gv is None

    # strict mode raises with the reference's message
    import pytest as _pytest
    strict = read_aloha_csv(
        spark, str(p), {"uid": "s", "g": "e", "gv": "voe"},
        enums={"g": gender}, strict_enums=True)
    with _pytest.raises(Exception, match="No enum const class "
                        "com.example.GenderProto.OTHER"):
        strict.collect()

    # duplicate numbers rejected (enum.scala:22-24)
    with _pytest.raises(ValueError, match="same associated number"):
        AlohaEnum("x.Y", [("A", 1), ("B", 1)])


def test_csv_enum_feeds_spec_accessors(spark, tmp_path):
    from aloha_spark.plans.pipeline import FeaturePipeline
    from aloha_spark.plans.spec import PipelineSpec
    from aloha_spark.sources.tables import AlohaEnum

    p = tmp_path / "g2.csv"
    p.write_text("u1\tMALE\nu2\tFEMALE\nu3\t\n")
    gender = AlohaEnum("x.G", [("MALE", 1), ("FEMALE", 2)])
    df = read_aloha_csv(spark, str(p), {"uid": "s", "g": "e"},
                        enums={"g": gender})
    spec = PipelineSpec.from_json({
        "features": [{"name": "gn", "spec": "ind(${g.name})"},
                     {"name": "gnum", "spec": "${g.number}"}],
        "namespaces": {}})
    out = {r.uid: r for r in FeaturePipeline(spec)
           .featurize(df, keep_cols=["uid"]).collect()}
    assert out["u1"].features[0] == {"gn=MALE": 1.0}
    assert out["u2"].features[1] == {"gnum": 2.0}
    assert out["u3"].features[0] == {"gn=UNK": 1.0}
    assert sorted(out["u3"].missing_features) == ["gn", "gnum"]
