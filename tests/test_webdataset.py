"""operators/webdataset — TAR shard member explode + sample
grouping."""

from __future__ import annotations

import io
import tarfile

import pytest

from flycatcher_spark.operators import jpeg, webdataset


def _tar(entries):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, body in entries:
            info = tarfile.TarInfo(name=name)
            info.size = len(body)
            tf.addfile(info, io.BytesIO(body))
    return buf.getvalue()


class TestTarMembers:
    def test_members_and_extension_split(self, spark):
        shard = _tar([
            ("a.txt", b"hello"),
            ("a.json", b"{}"),
            ("noext", b"x"),
            ("dir/b.cls", b"7"),
        ])
        df = spark.createDataFrame(
            [(1, bytearray(shard))], "doc_id long, payload binary"
        )
        rows = webdataset.tar_members(df).orderBy("sample_key", "ext").collect()
        got = [(r.sample_key, r.ext, r.n_bytes) for r in rows]
        assert got == [
            ("a", "json", 2), ("a", "txt", 5),
            ("dir/b", "cls", 1), ("noext", "", 1),
        ]

    def test_corrupt_shard_null_row(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(b"not a tar")), (2, None)],
            "doc_id long, payload binary",
        )
        rows = webdataset.tar_members(df).collect()
        assert all(r.sample_key is None for r in rows)
        assert sorted(r.doc_id for r in rows) == [1, 2]


class TestWebdatasetSamples:
    def test_adjacent_grouping(self, spark):
        shard = _tar([
            ("k1.txt", b"t1"), ("k1.jpg", b"j1"),
            ("k2.txt", b"t2"), ("k2.jpg", b"j2"), ("k2.cls", b"0"),
        ])
        df = spark.createDataFrame(
            [(1, bytearray(shard))], "doc_id long, payload binary"
        )
        rows = webdataset.webdataset_samples(df).orderBy("sample_key").collect()
        assert [(r.sample_key, r.n_members) for r in rows] == [
            ("k1", 2), ("k2", 3),
        ]
        assert bytes(rows[0].parts["txt"]) == b"t1"
        assert sorted(rows[1].parts.keys()) == ["cls", "jpg", "txt"]

    def test_fixture_round_trip_with_decode(self, spark):
        docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
        shards = webdataset.make_webdataset_payload(docs)
        rows = webdataset.webdataset_samples(shards).collect()
        assert len(rows) == sum(2 + i % 3 for i in range(5))
        for r in rows:
            i = r.doc_id
            k = int(r.sample_key.rsplit("_", 1)[1])
            assert bytes(r.parts["txt"]) == f"caption {i} {k}".encode()
            img = jpeg.parse_jpeg(bytes(r.parts["jpg"]))
            dc = ((i * 5 + k * 9) % 160) - 80
            assert set(img["pixels"].tolist()) == {128 + dc}
