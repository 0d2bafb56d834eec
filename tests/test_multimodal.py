"""Multimodal operator tests: binary payload contract, mapInPandas feature
extraction (deterministic fake encoder), and the codec gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rtdl_spark.catalog import table
from rtdl_spark.operators.multimodal import (
    FEATURE_DIM,
    _fake_features,
    attach_binary_payload,
    extract_features,
)


def test_attach_binary_payload_contract(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(5)
    mm = attach_binary_payload(docs)
    assert dict(mm.dtypes) == {
        "doc_id": "bigint",
        "payload": "binary",
        "meta": "struct<modality:string,mime:string,n_chars:int>",
    }
    row = mm.filter(F.col("doc_id") == 0).collect()[0]
    assert bytes(row["payload"]).decode("utf-8").startswith("the fast")
    assert row["meta"]["modality"] == "text"


def test_extract_features_deterministic(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    out = extract_features(attach_binary_payload(docs), fake_decode=True)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 20
    # pin one feature vector against the pure-python encoder
    src = docs.filter(F.col("doc_id") == 0).collect()[0]["text"].encode()
    expected = _fake_features(src)
    got = rows[0]["features"]
    assert len(got) == FEATURE_DIM
    assert got == pytest.approx(expected, abs=1e-6)
    assert rows[0]["n_bytes"] == len(src)
    assert rows[0]["modality"] == "text"


def test_decode_gate_raises_without_codec(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(1)
    out = extract_features(attach_binary_payload(docs), fake_decode=False)
    with pytest.raises(Exception, match="NotImplementedError|media codecs"):
        out.collect()
