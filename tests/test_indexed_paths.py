"""Indexed / repeated-field accessor paths: ``${photos[0].height}``
(reference CompiledSemanticsProtoPlugin.scala:51-60 dereference
semantics, SchemaBasedTokenizer.scala:18-68 null-safe repeated deref;
docs example dataset.md:364-367)."""

from pyspark.sql import functions as F  # noqa: F401

from aloha_spark.plans.pipeline import FeaturePipeline
from aloha_spark.plans.spec import (
    PipelineSpec,
    parse_feature_spec,
    path_root_column,
    path_to_column,
    try_compile_column,
)


def _photos_df(spark):
    return spark.createDataFrame(
        [(1, [(180, 240), (90, 120)], ("alice", "hi there")),
         (2, [(100, 100)], ("bob", "hello world")),
         (3, [], ("carol", None)),
         (4, None, None)],
        "id long, photos array<struct<height:int,width:int>>, "
        "meta struct<name:string,title:string>")


def test_parse_and_compile_indexed_path(spark):
    p = parse_feature_spec("h", "${photos[0].height}")
    assert p.variables == ["photos_0___height"]
    assert p.sources["photos_0___height"] == "photos[0].height"
    assert try_compile_column(p) is not None
    assert path_root_column("photos[0].height") == "photos"

    df = _photos_df(spark)
    got = {r.id: r.h for r in df.select(
        "id", path_to_column("photos[0].height").alias("h")).collect()}
    # null-safe: empty array and null array both deref to NULL
    assert got == {1: 180, 2: 100, 3: None, 4: None}


def test_indexed_path_column_tier(spark):
    df = _photos_df(spark)
    spec = PipelineSpec.from_json({
        "features": [
            {"name": "h0", "spec": "${photos[0].height}"},
            {"name": "aspect", "spec": "${photos[0].width} / ${photos[0].height}"},
            {"name": "h1", "spec": "${photos[1].height:-0}"},
        ],
        "namespaces": {}, "numBits": 18})
    out = {r.id: r for r in FeaturePipeline(spec)
           .featurize(df, keep_cols=["id"]).collect()}
    assert out[1].features[0] == {"h0": 180.0}
    assert abs(out[1].features[1]["aspect"] - 240 / 180) < 1e-12
    assert out[1].features[2] == {"h1": 90.0}
    assert out[2].features[2] == {"h1": 0.0}     # default fills the miss
    assert out[3].features[0] == {"h0=UNK": 1.0}
    assert "h0" in out[3].missing_features
    assert "h0" in out[4].missing_features


def test_indexed_path_batch_and_flat_tiers(spark):
    df = _photos_df(spark)
    spec = PipelineSpec.from_json({
        "features": [
            {"name": "hbin", "spec": "ind(${photos[0].height})"},
            {"name": "title_bow", "spec": "bag(${meta.title})"},
        ],
        "namespaces": {}, "numBits": 18})
    pipe = FeaturePipeline(spec)
    out = {r.id: r for r in pipe.featurize(df, keep_cols=["id"]).collect()}
    assert out[1].features[0] == {"hbin=180": 1.0}
    assert out[2].features[1] == {"title_bow=hello": 1.0,
                                  "title_bow=world": 1.0}
    assert sorted(out[4].missing_features) == ["hbin", "title_bow"]
    # flat tier (hashed vectors) resolves the same extraction columns
    vecs = {r.id: r for r in pipe.to_sparse_vectors(
        df, keep_cols=["id"]).collect()}
    assert len(vecs[2].indices) == 3   # hbin=100, hello, world
    assert sorted(vecs[4].missing_features) == ["hbin", "title_bow"]
    # the extraction never leaks helper columns into the output
    assert all(not c.startswith("__als_") for c in vecs[1].asDict())


def test_indexed_path_label_dv(spark):
    df = _photos_df(spark)
    spec = PipelineSpec.from_json({
        "features": [{"name": "n", "spec": "ind(${meta.name})"}],
        "namespaces": {}, "label": "${photos[0].height} / 4.0"})
    lines = {r.id: r.vw_line for r in FeaturePipeline(spec)
             .to_vw_lines(df, keep_cols=["id"]).collect()}
    assert lines[1].startswith("45 ")
    # missing label -> unlabeled line
    assert lines[4].startswith("|")
