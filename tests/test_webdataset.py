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


class TestWriteWebdataset:
    """r8 write side: write_webdataset re-shards samples into real
    tar shards with deterministic md5-order assignment; reading them
    back through the ingest path must reproduce the input exactly."""

    def _samples(self, spark, n=23):
        rows = [
            (f"s{i}", {"txt": f"caption {i}".encode(),
                       "bin": bytes([i % 251]) * (i % 7)})
            for i in range(n)
        ]
        return rows, spark.createDataFrame(
            rows, "sample_key string, parts map<string, binary>"
        )

    def test_round_trip_identity(self, spark):
        rows, samples = self._samples(spark)
        shards = webdataset.write_webdataset(samples, samples_per_shard=10)
        back = webdataset.webdataset_samples(shards, id_col="shard_id")
        got = {r.sample_key: dict(r.parts) for r in back.collect()}
        want = {k: {e: bytes(b) for e, b in p.items()} for k, p in rows}
        assert {k: {e: bytes(b) for e, b in p.items()}
                for k, p in got.items()} == want

    def test_shards_exactly_size_bounded(self, spark):
        _, samples = self._samples(spark, n=23)
        shards = webdataset.write_webdataset(samples, samples_per_shard=10)
        sizes = {r.shard_id: r.n_samples for r in shards.collect()}
        assert sizes == {0: 10, 1: 10, 2: 3}

    def test_members_adjacent_and_ordered(self, spark):
        import io
        import tarfile

        _, samples = self._samples(spark, n=12)
        shards = webdataset.write_webdataset(
            samples, samples_per_shard=100
        ).collect()
        assert len(shards) == 1
        names = [
            m.name
            for m in tarfile.open(fileobj=io.BytesIO(bytes(shards[0].payload)))
        ]
        keys = [n.split(".", 1)[0] for n in names]
        # every sample's members contiguous, extensions sorted
        assert all(keys[i] == keys[i + 1] for i in range(0, len(keys), 2))
        assert all(names[i].endswith(".bin") and names[i + 1].endswith(".txt")
                   for i in range(0, len(names), 2))

    def test_assignment_deterministic_and_seeded(self, spark):
        _, samples = self._samples(spark)
        a = {(r.shard_id, r.n_bytes)
             for r in webdataset.write_webdataset(
                 samples, samples_per_shard=10).collect()}
        b = {(r.shard_id, r.n_bytes)
             for r in webdataset.write_webdataset(
                 samples, samples_per_shard=10).collect()}
        assert a == b  # byte-reproducible (mtime 0, sorted members)
        c = webdataset.write_webdataset(
            samples, samples_per_shard=10, seed="epoch1"
        ).collect()
        # a different seed reshuffles: some shard's byte size changes
        assert {(r.shard_id, r.n_bytes) for r in c} != a

    def test_save_webdataset_files(self, spark, tmp_path):
        import tarfile

        rows, samples = self._samples(spark, n=8)
        shards = webdataset.write_webdataset(samples, samples_per_shard=5)
        webdataset.save_webdataset(shards, str(tmp_path))
        files = sorted(p.name for p in tmp_path.iterdir())
        assert files == ["shard-000000.tar", "shard-000001.tar"]
        seen = {}
        for p in sorted(tmp_path.iterdir()):
            with tarfile.open(p) as tf:
                for m in tf:
                    key, ext = m.name.split(".", 1)
                    seen.setdefault(key, {})[ext] = tf.extractfile(m).read()
        want = {k: {e: bytes(b) for e, b in p.items()} for k, p in rows}
        assert seen == want


class TestZipSamples:
    """ZIP-shard ingest (r10): zipfile counterpart of the tar walk —
    same parts-map sample shape, no adjacency contract."""

    def _mk(self, files: dict, comp=None) -> bytes:
        import io
        import zipfile

        comp = comp if comp is not None else zipfile.ZIP_DEFLATED
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", compression=comp) as zf:
            for name, body in files.items():
                zf.writestr(name, body)
        return buf.getvalue()

    def test_fixture_roundtrip_both_compressions(self, spark):
        from flycatcher_spark.operators import webdataset

        docs = spark.createDataFrame([(i,) for i in range(9)], "doc_id long")
        rows = webdataset.zip_samples(
            webdataset.make_zip_payload(docs)
        ).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        for i in range(9):  # even ids STORED, odd DEFLATED — both decode
            samples = sorted(by_doc[i], key=lambda r: r.sample_key)
            assert len(samples) == 2 + i % 3
            for k, r in enumerate(samples):
                assert r.sample_key == f"z{i}_{k}"
                assert r.n_members == 2
                assert bytes(r.parts["txt"]).decode() == f"caption {i} {k}"
                assert f'"n":{10 + (i + k) % 50}' in bytes(
                    r.parts["json"]
                ).decode()

    def test_non_adjacent_members_still_group(self, spark):
        # ZIP has no adjacency contract: interleave two samples' files
        from flycatcher_spark.operators import webdataset

        buf = self._mk(
            {
                "a.txt": "A", "b.txt": "B", "a.json": "{}", "b.json": "[]",
            }
        )
        df = spark.createDataFrame([(1, bytearray(buf))],
                                   "doc_id long, payload binary")
        rows = {r.sample_key: r for r in webdataset.zip_samples(df).collect()}
        assert set(rows) == {"a", "b"}
        assert rows["a"].n_members == 2
        assert bytes(rows["a"].parts["json"]) == b"{}"

    def test_directories_and_pathed_names(self, spark):
        from flycatcher_spark.operators import webdataset

        buf = self._mk({"shard/x/a.txt": "deep", "shard/": ""})
        df = spark.createDataFrame([(1, bytearray(buf))],
                                   "doc_id long, payload binary")
        rows = webdataset.zip_samples(df).collect()
        assert len(rows) == 1 and rows[0].sample_key == "a"
        assert bytes(rows[0].parts["txt"]) == b"deep"

    def test_corrupt_and_null_yield_null_rows(self, spark):
        from flycatcher_spark.operators import webdataset

        df = spark.createDataFrame(
            [(1, bytearray(b"PK\x03\x04garbage")), (2, None)],
            "doc_id long, payload binary",
        )
        rows = sorted(webdataset.zip_samples(df).collect(),
                      key=lambda r: r.doc_id)
        assert [r.sample_key for r in rows] == [None, None]

    def test_decompression_bomb_yields_null_row(self, spark, monkeypatch):
        # ADVICE r10: a member whose declared file_size (zipfile's
        # inflate output bound) exceeds the WARC cap — or members
        # cumulatively past it — must yield the attributable null
        # row, not expand unbounded into executor memory
        from flycatcher_spark.operators import warc, webdataset

        monkeypatch.setattr(warc, "MAX_DECODED_BYTES", 1024)
        big = self._mk({"a.txt": "z" * 4096})  # one member over the cap
        cum = self._mk(
            {"a.txt": "z" * 600, "b.txt": "y" * 600}  # cumulative over
        )
        ok = self._mk({"a.txt": "fine"})
        df = spark.createDataFrame(
            [(1, bytearray(big)), (2, bytearray(cum)), (3, bytearray(ok))],
            "doc_id long, payload binary",
        )
        rows = sorted(webdataset.zip_samples(df).collect(),
                      key=lambda r: r.doc_id)
        assert [r.sample_key for r in rows] == [None, None, "a"]
        assert bytes(rows[2].parts["txt"]) == b"fine"

    def test_map_only_arrow_plan(self, spark):
        from flycatcher_spark.operators import webdataset

        docs = spark.createDataFrame([(i,) for i in range(3)], "doc_id long")
        out = webdataset.zip_samples(webdataset.make_zip_payload(docs))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan


class TestWriteZipShards:
    """ZIP write side (r11): zipfile counterpart of write_webdataset
    — deterministic md5('zip:'||key) shard assignment, DOS-epoch
    timestamps, adjacent sorted members, byte-stable output."""

    def _samples(self, spark, n=23):
        rows = [
            (f"s{i}", {"txt": f"caption {i}".encode(),
                       "bin": bytes([i % 251]) * (i % 7)})
            for i in range(n)
        ]
        return rows, spark.createDataFrame(
            rows, "sample_key string, parts map<string, binary>"
        )

    def test_round_trip_identity(self, spark):
        rows, samples = self._samples(spark)
        shards = webdataset.write_zip_shards(samples, samples_per_shard=10)
        back = webdataset.zip_samples(shards, id_col="shard_id")
        got = {r.sample_key: dict(r.parts) for r in back.collect()}
        want = {k: {e: bytes(b) for e, b in p.items()} for k, p in rows}
        assert {k: {e: bytes(b) for e, b in p.items()}
                for k, p in got.items()} == want

    def test_shards_exactly_size_bounded(self, spark):
        _, samples = self._samples(spark, n=23)
        shards = webdataset.write_zip_shards(samples, samples_per_shard=10)
        sizes = {r.shard_id: r.n_samples for r in shards.collect()}
        assert sizes == {0: 10, 1: 10, 2: 3}

    def test_members_adjacent_sorted_and_epoch_pinned(self, spark):
        import io
        import zipfile

        _, samples = self._samples(spark, n=12)
        shards = webdataset.write_zip_shards(
            samples, samples_per_shard=100
        ).collect()
        assert len(shards) == 1
        with zipfile.ZipFile(io.BytesIO(bytes(shards[0].payload))) as zf:
            infos = zf.infolist()
        names = [i.filename for i in infos]
        keys = [n.split(".", 1)[0] for n in names]
        assert all(keys[i] == keys[i + 1] for i in range(0, len(keys), 2))
        assert all(names[i].endswith(".bin") and names[i + 1].endswith(".txt")
                   for i in range(0, len(names), 2))
        # DOS epoch + pinned create_system: byte-stable across hosts
        assert all(i.date_time == (1980, 1, 1, 0, 0, 0) for i in infos)
        assert all(i.create_system == 3 for i in infos)

    def test_byte_stable_and_seeded(self, spark):
        _, samples = self._samples(spark)
        a = {(r.shard_id, r.n_bytes)
             for r in webdataset.write_zip_shards(
                 samples, samples_per_shard=10).collect()}
        b = {(r.shard_id, r.n_bytes)
             for r in webdataset.write_zip_shards(
                 samples, samples_per_shard=10).collect()}
        assert a == b
        c = webdataset.write_zip_shards(
            samples, samples_per_shard=10, seed="epoch1"
        ).collect()
        assert {(r.shard_id, r.n_bytes) for r in c} != a

    def test_compress_arm_round_trips(self, spark):
        rows, samples = self._samples(spark, n=8)
        shards = webdataset.write_zip_shards(
            samples, samples_per_shard=5, compress=True
        )
        back = webdataset.zip_samples(shards, id_col="shard_id")
        got = {r.sample_key: dict(r.parts) for r in back.collect()}
        want = {k: {e: bytes(b) for e, b in p.items()} for k, p in rows}
        assert {k: {e: bytes(b) for e, b in p.items()}
                for k, p in got.items()} == want

    def test_zip_members_order_matches_write_order(self, spark):
        _, samples = self._samples(spark, n=6)
        shards = webdataset.write_zip_shards(samples, samples_per_shard=100)
        members = webdataset.zip_members(shards, id_col="shard_id").collect()
        ordered = sorted(members, key=lambda r: r.member_idx)
        # bin at even positions, txt at odd, same key per pair
        for i in range(0, len(ordered), 2):
            assert ordered[i].ext == "bin" and ordered[i + 1].ext == "txt"
            assert ordered[i].sample_key == ordered[i + 1].sample_key

    def test_zip_members_corrupt_yields_null_row(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(b"PK\x03\x04nope")), (2, None)],
            "doc_id long, payload binary",
        )
        rows = sorted(webdataset.zip_members(df).collect(),
                      key=lambda r: r.doc_id)
        assert [r.sample_key for r in rows] == [None, None]

    def test_save_zip_shards_files(self, spark, tmp_path):
        import zipfile

        rows, samples = self._samples(spark, n=8)
        shards = webdataset.write_zip_shards(samples, samples_per_shard=5)
        webdataset.save_zip_shards(shards, str(tmp_path))
        files = sorted(p.name for p in tmp_path.iterdir())
        assert files == ["shard-000000.zip", "shard-000001.zip"]
        seen = {}
        for p in sorted(tmp_path.iterdir()):
            with zipfile.ZipFile(p) as zf:
                for info in zf.infolist():
                    key, ext = info.filename.split(".", 1)
                    seen.setdefault(key, {})[ext] = zf.read(info)
        want = {k: {e: bytes(b) for e, b in p.items()} for k, p in rows}
        assert seen == want


class TestZipHostility:
    """Single-byte mutations of a valid shard must never raise out of
    the Arrow stage: every payload yields sample rows or the
    attributable null row (the webp mutation-hostility discipline,
    batched through ONE Spark job)."""

    def test_mutations_never_fail_stage(self, spark):
        import io
        import zipfile

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr("a.txt", "hello world")
            zf.writestr("a.json", "{}")
            zf.writestr("b.txt", "more text here")
        base = buf.getvalue()
        step = max(1, len(base) // 200)
        rows = [
            (i, bytearray(bytes(base[:p]) + bytes([(base[p] + 1) % 256])
                          + bytes(base[p + 1:])))
            for i, p in enumerate(range(0, len(base), step))
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got_s = webdataset.zip_samples(df).collect()
        got_m = webdataset.zip_members(df).collect()
        # every input row surfaces (as samples or one null row)
        assert {r.doc_id for r in got_s} == {i for i, _ in rows}
        assert {r.doc_id for r in got_m} == {i for i, _ in rows}
